"""Deterministic synthetic geospatial fixtures mirroring the reference data
model (FIXTURES.md §A; schemas inferred from the queries that scan them).

All geometry is WKB in EPSG:5179 meters inside a box around
x∈[900_000, 960_000], y∈[1_700_000, 1_760_000].
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from duckpipe_spark.geo import wkb
from duckpipe_spark.geo.crs import tm_to_lonlat

X0, X1 = 900_000.0, 960_000.0
Y0, Y1 = 1_700_000.0, 1_760_000.0

N_POINTS = 30


def make_fixtures(data_dir: str) -> dict:
    rng = np.random.default_rng(42)
    info: dict = {}

    # --- input points (lon/lat, EPSG:4326) --------------------------------
    px = rng.uniform(X0 + 5000, X1 - 5000, N_POINTS)
    py = rng.uniform(Y0 + 5000, Y1 - 5000, N_POINTS)
    lon, lat = tm_to_lonlat(px, py)
    points = pd.DataFrame({"pid": np.arange(N_POINTS), "longitude": lon, "latitude": lat})
    info["points"] = points
    info["px"], info["py"] = px, py

    # --- airport: point features, one EMPTY row, year 2015 has ZERO rows ---
    rows = []
    per_year = {}
    for year in [2000, 2005, 2010, 2020]:
        ax = rng.uniform(X0, X1, 12)
        ay = rng.uniform(Y0, Y1, 12)
        per_year[year] = (ax, ay)
        rows += [
            {"geometry": wkb.to_wkb(wkb.point(x, y)), "year": year}
            for x, y in zip(ax, ay)
        ]
    rows.append({"geometry": wkb.to_wkb(wkb.Geometry("Point", None)), "year": 2000})
    pd.DataFrame(rows).to_parquet(f"{data_dir}/airport.parquet")
    info["airport"] = per_year

    # --- coastline: one high-vertex wiggly line per year -------------------
    rows = []
    coast = {}
    for year in [2000, 2005]:
        t = np.linspace(0, 1, 400)
        cx = X0 + t * (X1 - X0)
        cy = Y0 + 20_000 + 800 * np.sin(t * 40 * np.pi) + 3000 * np.sin(t * 3 * np.pi)
        coords = np.column_stack([cx, cy])
        coast[year] = coords
        rows.append({"geometry": wkb.to_wkb(wkb.linestring(coords)), "year": year})
    pd.DataFrame(rows).to_parquet(f"{data_dir}/coastline.parquet")
    info["coastline"] = coast

    # --- roads: attributed polylines --------------------------------------
    rows = []
    roads = []
    rid = 0
    for year in [2005, 2010]:
        for _ in range(40):
            x = rng.uniform(X0, X1)
            y = rng.uniform(Y0, Y1)
            n = rng.integers(2, 6)
            steps = rng.uniform(-4000, 4000, size=(n, 2))
            coords = np.vstack([[x, y], [x, y] + np.cumsum(steps, axis=0)])
            lanes = int(rng.integers(1, 9))
            width = float(rng.uniform(3.0, 40.0))
            roads.append({"id": rid, "coords": coords, "lanes": lanes, "width": width, "year": year})
            rows.append(
                {
                    "id": rid,
                    "geometry": wkb.to_wkb(wkb.linestring(coords)),
                    "lanes": lanes,
                    "width": width,
                    "year": year,
                }
            )
            rid += 1
    pd.DataFrame(rows).to_parquet(f"{data_dir}/roads.parquet")
    info["roads"] = roads

    # --- mr1: FK table into roads ------------------------------------------
    road_ids_2005 = [r["id"] for r in roads if r["year"] == 2005]
    picked = road_ids_2005[::3]
    mr_rows = []
    for i, rid_fk in enumerate(picked):
        mr_rows.append(
            {
                "geometry": wkb.to_wkb(wkb.point(X0, Y0)),  # distance path unused here
                "year": 2005,
                "roads_2005_id": rid_fk if i % 4 != 0 else None,  # ~25% NULL
                "roads_2010_id": None,
            }
        )
    pd.DataFrame(mr_rows).to_parquet(f"{data_dir}/mr1.parquet")
    info["mr1_fk"] = [r["roads_2005_id"] for r in mr_rows if r["roads_2005_id"] is not None]

    # --- landuse_2000: polygons with 3 codes --------------------------------
    rows = []
    lu = []
    for _ in range(60):
        cx = rng.uniform(X0, X1)
        cy = rng.uniform(Y0, Y1)
        w = rng.uniform(500, 6000)
        h = rng.uniform(500, 6000)
        code = int(rng.choice([110, 210, 310]))
        ring = [(cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2), (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2)]
        lu.append({"code": code, "ring": np.array(ring)})
        rows.append(
            {
                "code": code,
                "geometry": wkb.to_wkb(wkb.polygon([ring])),
                "xmin": cx - w / 2,
                "xmax": cx + w / 2,
                "ymin": cy - h / 2,
                "ymax": cy + h / 2,
            }
        )
    pd.DataFrame(rows).to_parquet(f"{data_dir}/landuse_2000.parquet")
    info["landuse"] = lu

    # --- dem: raster-as-table cells around the first few points ------------
    res = 30.0
    cells = []
    for cx0 in np.arange(X0, X1, 6000):  # sparse coverage is fine
        pass
    # dense grid around each point (donut reach ≤ 1030 m)
    seen = set()
    for x, y in zip(px, py):
        gx0 = np.floor((x - 1200) / res) * res
        gy0 = np.floor((y - 1200) / res) * res
        for i in range(int(2400 / res) + 1):
            for j in range(int(2400 / res) + 1):
                key = (round(gx0 + i * res, 3), round(gy0 + j * res, 3))
                if key in seen:
                    continue
                seen.add(key)
                xmin, ymin = key
                val = 100.0 + 80.0 * np.sin(xmin / 997.0) + 60.0 * np.cos(ymin / 1313.0)
                cells.append(
                    {
                        "value": val,
                        "xmin": xmin,
                        "xmax": xmin + res,
                        "ymin": ymin,
                        "ymax": ymin + res,
                    }
                )
    pd.DataFrame(cells).to_parquet(f"{data_dir}/dem.parquet")
    info["dem"] = pd.DataFrame(cells)

    # --- jgg_borders_2023: output areas ------------------------------------
    rows = []
    oa = []
    for k in range(25):
        cx = rng.uniform(X0, X1)
        cy = rng.uniform(Y0, Y1)
        w = rng.uniform(2000, 12000)
        h = rng.uniform(2000, 12000)
        ring = [(cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2), (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2)]
        code = f"OA{k:04d}"
        oa.append({"tot_reg_cd": code, "ring": np.array(ring), "area": w * h})
        rows.append(
            {
                "tot_reg_cd": code,
                "geometry": wkb.to_wkb(wkb.polygon([ring])),
                "xmin": cx - w / 2,
                "xmax": cx + w / 2,
                "ymin": cy - h / 2,
                "ymax": cy + h / 2,
            }
        )
    pd.DataFrame(rows).to_parquet(f"{data_dir}/jgg_borders_2023.parquet")
    info["oa"] = oa

    return info
