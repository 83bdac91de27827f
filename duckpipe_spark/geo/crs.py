"""Transverse-Mercator CRS transform (EPSG:4326 ↔ EPSG:5179), pure numpy.

Replaces the reference's `ST_Transform(g,'EPSG:4326','EPSG:5179',
always_xy:=true)` (`duckpipe/core.py:143-150`,
`CoordinateCalculator.py:50-61`). No pyproj in this environment, so the
transform is implemented directly with the Krüger n-series (6th order), the
standard public formulation of the transverse Mercator projection (as in
Karney 2011, "Transverse Mercator with an accuracy of a few nanometers");
truncation error at 6th order is sub-micrometer inside Korea.

EPSG:5179 (Korea 2000 / Unified CS): GRS80 ellipsoid, lat_0=38, lon_0=127.5,
k_0=0.9996, x_0=1_000_000, y_0=2_000_000.  EPSG:5179's geographic base
(KGD2002) and WGS84 differ by centimeters at most — treated as identical,
exactly like PROJ's null transformation between them.

All functions are vectorized over numpy arrays (used inside Arrow-batched
pandas UDFs).
"""

from __future__ import annotations

import math

import numpy as np

# GRS80
_A = 6378137.0
_F = 1.0 / 298.257222101
_N = _F / (2.0 - _F)

# rectifying radius
_A_RECT = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

# Krüger series coefficients (6th order in n)
_ALPHA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180 - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
        13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630 - 1983433 * _N**6 / 1935360,
        61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880 + 167603 * _N**6 / 181440,
        49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
        34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
        212378941 * _N**6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360 - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
        _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105 - 1118711 * _N**6 / 3870720,
        17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480 + 5569 * _N**6 / 90720,
        4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
        4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
        20648693 * _N**6 / 638668800,
    ]
)

_E2 = _F * (2.0 - _F)  # first eccentricity squared
_SQRT_N2 = 2.0 * math.sqrt(_N) / (1.0 + _N)

# EPSG:5179 parameters
K0 = 0.9996
LAT0 = math.radians(38.0)
LON0 = math.radians(127.5)
FE = 1_000_000.0
FN = 2_000_000.0


def _conformal_lat_term(phi: np.ndarray) -> np.ndarray:
    """tau' (tangent of conformal latitude) via the sinh/atanh identity."""
    s = np.sin(phi)
    return np.sinh(np.arctanh(s) - _SQRT_N2 * np.arctanh(_SQRT_N2 * s))


def _tm_forward_raw(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unscaled TM coordinates (ξ·A, η·A) for GRS80, lon0-relative."""
    phi = np.radians(lat)
    dlam = np.radians(lon) - LON0
    t = _conformal_lat_term(phi)
    cos_dlam = np.cos(dlam)
    xi_p = np.arctan2(t, cos_dlam)
    eta_p = np.arcsinh(np.sin(dlam) / np.sqrt(t * t + cos_dlam * cos_dlam))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    return _A_RECT * xi, _A_RECT * eta


# meridian arc northing of lat0 (computed once, consistent with the series)
_M0 = float(_tm_forward_raw(np.array([math.degrees(LON0)]), np.array([math.degrees(LAT0)]))[0][0])


def lonlat_to_tm(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 (lon, lat degrees, always_xy) → EPSG:5179 (x, y meters)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    northing, easting = _tm_forward_raw(lon, lat)
    x = FE + K0 * easting
    y = FN + K0 * (northing - _M0)
    return x, y


def tm_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:5179 (x, y meters) → EPSG:4326 (lon, lat degrees, always_xy)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xi = ((y - FN) / K0 + _M0) / _A_RECT
    eta = (x - FE) / K0 / _A_RECT
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p -= _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    t = np.sinh(eta_p)
    dlam = np.arctan2(t, np.cos(xi_p))
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal → geographic latitude by fixed-point iteration (contraction ~e²)
    phi = chi.copy()
    s_chi = np.sin(chi)
    for _ in range(8):
        phi = np.arcsin(
            np.tanh(np.arctanh(s_chi) + _SQRT_N2 * np.arctanh(_SQRT_N2 * np.sin(phi)))
        )
    lon = np.degrees(LON0 + dlam)
    lat = np.degrees(phi)
    return lon, lat


def transform(x, y, src_epsg: int, dst_epsg: int) -> tuple[np.ndarray, np.ndarray]:
    """Generic entry point mirroring `ST_Transform(..., always_xy:=true)`.
    Supported pairs: 4326↔5179 (identity when src==dst)."""
    if src_epsg == dst_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if (src_epsg, dst_epsg) == (4326, 5179):
        return lonlat_to_tm(x, y)
    if (src_epsg, dst_epsg) == (5179, 4326):
        return tm_to_lonlat(x, y)
    raise ValueError(f"unsupported CRS pair {src_epsg}->{dst_epsg} (supported: 4326<->5179)")
