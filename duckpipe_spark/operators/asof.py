"""Distributed as-of join.

Matches each left row to the closest right row on an ordering key (time,
usually), optionally per group key, in a given direction:

- ``backward``: greatest right key <= left key (the classic "latest value
  as of t"; DuckDB/pandas default)
- ``forward``: smallest right key >= left key
- ``nearest``: whichever of the two is closer (backward wins ties)

Implementation is the union-merge formulation, not a range-join probe: tag
both sides, union, one shuffle on the group key, one in-partition sort on
(key, side), then a running ``last(ignorenulls)`` window carries the most
recent right-side payload onto each left row. Cost is one shuffle + one sort
over |L|+|R| rows regardless of the left/right ratio — at 100 TB this is the
only formulation that doesn't degenerate (a per-row range probe is O(|L|·k),
and Spark has no native as-of physical operator to fall back on).

``tolerance`` bounds the match distance (in the key's own units — use seconds
for timestamps cast to long upstream, or pass numeric keys directly); rows
whose best match is farther than the tolerance get NULLs, like
``pandas.merge_asof(tolerance=...)``.

Reference parity note: the duckpipe reference has no as-of operator (batch
geospatial only); this is a beyond-reference training-pipeline operator in
the SURVEY.md §2.14 family.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _with_side(df: DataFrame, is_left: int, payload: list[str], all_payload: list[str]) -> DataFrame:
    cols = [F.col(c) for c in df.columns]
    cols.append(F.lit(is_left).alias("__side"))
    for c in all_payload:
        if c in payload:
            continue
        cols.append(F.lit(None).alias(c))
    return df.select(*cols)


def _merge_one_direction(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    forward: bool,
    payload: list[str],
    key_out: str,
) -> DataFrame:
    """Union-merge as-of in one direction; returns left columns + payload +
    ``key_out`` (the matched right key, for tolerance/nearest arbitration)."""
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.col(on).alias(key_out),
        *[F.col(c) for c in payload],
    )
    l_tagged = _with_side(left, 1, [], payload + [key_out])
    r_tagged = _with_side(r, 0, payload + [key_out], payload + [key_out])
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # backward: ascending scan, right rows sort before left at equal key so a
    # left row sees a same-instant right row (inclusive <=). forward: the
    # mirror — descending scan, right still first within the tie.
    order = [F.col(on).desc() if forward else F.col(on).asc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in payload + [key_out]]
    left_cols = [c for c in left.columns]
    return (
        merged.select(*left_cols, F.col("__side"), *carried)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] = (),
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join ``left`` with ``right`` on ordering column ``on`` (same name
    both sides), optionally grouped by ``by``. Right payload columns (all
    right columns except ``on``/``by``) are appended to each left row, NULL
    when no match exists in the chosen direction (left-outer semantics).

    ``tolerance``: optional Column/literal; matches farther than this from the
    left key are nulled out. The subtraction ``on - matched_on`` must be valid
    for the key type (numeric or timestamp-interval).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    payload = [c for c in right.columns if c != on and c not in by]
    # disambiguate payload columns that collide with left names
    renames = {c: c + suffix for c in payload if c in left.columns}
    right = right.select(
        *[F.col(c) for c in by], F.col(on), *[F.col(c).alias(renames.get(c, c)) for c in payload]
    )
    payload = [renames.get(c, c) for c in payload]

    def _bounded(df: DataFrame, key_col: str, cols: list[str]) -> DataFrame:
        if tolerance is None:
            return df
        dist = F.abs(F.col(on).cast("double") - F.col(key_col).cast("double"))
        keep = F.col(key_col).isNotNull() & (dist <= tolerance)
        out = [F.when(keep, F.col(c)).alias(c) for c in cols + [key_col]]
        others = [c for c in df.columns if c not in cols and c != key_col]
        return df.select(*others, *out)

    if direction in ("backward", "forward"):
        out = _merge_one_direction(
            left, right, on, by, direction == "forward", payload, "__match_key"
        )
        return _bounded(out, "__match_key", payload).drop("__match_key")

    # nearest: run both directions, pick the closer match (backward on ties).
    # Join the two passes on a stamped unique row id — left rows need not be
    # distinct on their natural columns.
    orig_cols = list(left.columns)
    left = left.withColumn("__rowid", F.monotonically_increasing_id())
    back = _merge_one_direction(left, right, on, by, False, payload, "__bkey")
    back = _bounded(back, "__bkey", payload)
    fwd_payload = [c + "__f" for c in payload]
    fwd_right = right.select(
        *[F.col(c) for c in by], F.col(on), *[F.col(c).alias(c + "__f") for c in payload]
    )
    fwd = _merge_one_direction(left, fwd_right, on, by, True, fwd_payload, "__fkey")
    fwd = _bounded(fwd, "__fkey", fwd_payload)

    merged = back.join(fwd.select("__rowid", *fwd_payload, "__fkey"), "__rowid", "inner")
    bdist = F.abs(F.col(on).cast("double") - F.col("__bkey").cast("double"))
    fdist = F.abs(F.col("__fkey").cast("double") - F.col(on).cast("double"))
    use_fwd = F.col("__fkey").isNotNull() & (F.col("__bkey").isNull() | (fdist < bdist))
    picked = [
        F.when(use_fwd, F.col(c + "__f")).otherwise(F.col(c)).alias(c) for c in payload
    ]
    return merged.select(*orig_cols, *picked)
