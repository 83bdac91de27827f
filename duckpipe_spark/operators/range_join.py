"""Distributed range (interval) join: points ⋈ intervals on containment.

Joins a "points" relation (one ordering value per row: a timestamp, a
price, a position) to an "intervals" relation (``lo``/``hi`` bounds per
row) on ``lo <= point < hi`` (or closed-right variants), optionally with
additional equi-keys.

Spark has no native inequality-join physical operator — a bare
``points.join(intervals, (lo <= p) & (p < hi))`` plans as
BroadcastNestedLoopJoin (O(|P|·|I|), driver-OOM on a big build side) or a
cartesian product. The standard scale formulation used here is **bin
bucketing** (the same trick behind Databricks' range-join hints and
KDB-style interval indexes, built only from public DataFrame ops):

1. pick a ``bin_width`` in the units of the ordering value;
2. each point maps to exactly ONE bin: ``floor(p / bin_width)``;
3. each interval explodes to EVERY bin it covers —
   ``sequence(floor(lo/w), floor(hi/w))`` rows;
4. equi-join on the bin id (+ caller equi-keys) — a plain shuffled hash
   join Catalyst/AQE can plan, skew-split, and whole-stage-codegen;
5. apply the exact residual predicate ``lo <= p < hi``.

Because a point lives in exactly one bin, every qualifying (point,
interval) pair is produced exactly once — no post-join dedup shuffle.

Scale tuning (the only knob): ``bin_width`` ≈ the typical interval
length. Much smaller → intervals explode to many bin rows (row bloat =
len/width); much larger → each bin pairs points with intervals that fail
the residual (probe bloat). Both directions are linear and local — there
is no cliff — and the explode factor ``(hi-lo)/bin_width + 2`` is a plain
column computation, so a mis-sized width shows up as row counts in the
Spark UI, not as a wrong answer.

Reference parity: the duckpipe reference (batch geospatial SQL) has no
1-D range join; its 2-D analog is the grid-binned bbox join
(`operators/spatial_join.py` grid_join, reference
AirportDistanceCalculator.py buffer joins). This operator is the
SURVEY.md §2.14 beyond-reference family, timeseries/interval flavor.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BIN = "__rj_bin"


def _as_numeric(col: Column, dtype: str) -> Column:
    """Timestamps join on epoch microseconds; numerics pass through.

    TIMESTAMP_NTZ has no epoch, so ``unix_micros`` rejects it; a
    ``timestampdiff`` against the NTZ epoch literal is the monotone,
    timezone-independent equivalent (no session-tz dependency, unlike a
    cast through TIMESTAMP)."""
    if dtype == "timestamp_ntz":
        return F.timestamp_diff("MICROSECOND", F.lit("1970-01-01").cast("timestamp_ntz"), col)
    if dtype.startswith("timestamp"):
        return F.unix_micros(col)
    return col


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _bin_expr(tmp_name: str, dtype: str, bin_width: int) -> Column:
    """floor(<tmp_name> / bin_width) as BIGINT over a materialized numeric
    column — exact integer floor division for integer/timestamp keys.

    Correctness note: ANY binning function works for candidate generation
    as long as it is monotone and applied identically to points and
    interval endpoints (lo <= p <= hi then implies bin(lo) <= bin(p) <=
    bin(hi), and the sequence-explode covers every bin between), with the
    exact residual deciding membership — so even double floor-division,
    whose quotient ULP near 2^50-scale epoch micros is coarser than 1
    unit, never drops a pair. Exact BIGINT floors are still preferable:
    bins land on true width boundaries, so the interval→bin explode
    factor, skew diagnostics, and bin_width tuning behave as documented
    instead of drifting by a ULP near edges. ``(n - pmod(n, w)) DIV w``
    stays integer end to end and is true floor division for negative
    values too (pmod is the non-negative remainder); fractional keys keep
    the double path, which the argument above covers."""
    if dtype in _INTEGRAL or dtype.startswith("timestamp"):
        return F.expr(
            f"({tmp_name} - pmod({tmp_name}, {bin_width}L)) DIV {bin_width}L"
        )
    return F.floor(F.col(tmp_name) / F.lit(bin_width)).cast("bigint")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    *,
    bin_width: int,
    equi_keys: Sequence[str] = (),
    closed: str = "left",
) -> DataFrame:
    """INNER join each point row to every interval row containing it.

    Output columns: all of ``points`` + all of ``intervals`` (names must not
    collide except ``equi_keys``, which are kept once). ``closed`` is
    ``"left"`` (lo <= p < hi), ``"right"`` (lo < p <= hi) or ``"both"``.
    ``bin_width`` is in the ordering value's own units — microseconds for
    timestamp columns (cast internally), plain units for numerics.

    LEFT/outer semantics are deliberately not built in: zero-fill against
    the interval skeleton after aggregating (the repo's J6 pattern) — an
    outer flag here would force a second shuffle for every caller that
    doesn't need it.
    """
    if closed not in ("left", "right", "both"):
        raise ValueError(f"closed must be left|right|both, got {closed!r}")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if _BIN in points.columns or _BIN in intervals.columns:
        raise ValueError(f"column name {_BIN!r} is reserved by range_join")

    p_type = dict(points.dtypes)[point_col]
    lo_type = dict(intervals.dtypes)[lo_col]
    hi_type = dict(intervals.dtypes)[hi_col]

    # materialize the numeric ordering values as temp columns so the exact
    # DIV-based bin expression can name them, then drop them after binning
    p = (
        points.withColumn("__rj_pnum", _as_numeric(F.col(point_col), p_type))
        .withColumn(_BIN, _bin_expr("__rj_pnum", p_type, bin_width))
        .drop("__rj_pnum")
    )
    iv = (
        intervals.withColumn("__rj_lonum", _as_numeric(F.col(lo_col), lo_type))
        .withColumn("__rj_hinum", _as_numeric(F.col(hi_col), hi_type))
        .withColumn(
            _BIN,
            F.explode(
                F.sequence(
                    _bin_expr("__rj_lonum", lo_type, bin_width),
                    _bin_expr("__rj_hinum", hi_type, bin_width),
                )
            ),
        )
        .drop("__rj_lonum", "__rj_hinum")
    )

    keys = [_BIN, *equi_keys]
    joined = p.join(iv, on=keys, how="inner")

    # residual: recompute on the joined frame (names are unique by contract)
    jp = _as_numeric(F.col(point_col), p_type)
    jlo = _as_numeric(F.col(lo_col), lo_type)
    jhi = _as_numeric(F.col(hi_col), hi_type)
    if closed == "left":
        pred = (jlo <= jp) & (jp < jhi)
    elif closed == "right":
        pred = (jlo < jp) & (jp <= jhi)
    else:
        pred = (jlo <= jp) & (jp <= jhi)
    return joined.where(pred).drop(_BIN)
