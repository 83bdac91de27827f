"""Long-form result contract and final assembly.

Reference semantics replicated exactly (`duckpipe/common.py:9-12`,
`duckpipe/core.py:169-214`): every operator appends long-form rows
``(id, varname, year, value)``; ``assemble_result`` pivots to one row per
``(id, year)`` (NULL years form their own rows — verified against pandas
``pivot_table(dropna=False)`` behavior), sorts pivot columns
alphabetically (`core.py:197`), left-joins the original attributes so points
with no computed rows survive with NULLs (`core.py:203-209`), and orders by
``(id, year)``.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

LONG_SCHEMA = "id bigint, varname string, year int, value double"

ID, VAR, YEAR, VAL = "id", "varname", "year", "value"


def union_results(parts: list[DataFrame]) -> DataFrame | None:
    if not parts:
        return None
    return reduce(lambda a, b: a.unionByName(b), parts)


def pivot_wide(long_df: DataFrame) -> DataFrame:
    """(id, varname, year, value) → one row per (id, year), one column per
    varname, sorted alphabetically. The varname list is collected first so
    `.pivot()` skips its implicit distinct scan (SURVEY §7 risk note); the
    list is small (≤ hundreds) and bounded by calculator configs."""
    names = sorted(r[0] for r in long_df.select(VAR).distinct().collect())
    piv = long_df.groupBy(ID, YEAR).pivot(VAR, names).agg(F.first(VAL))
    # backtick-quote: varnames may contain dots (e.g. Alt_k_above_20_1000.0)
    return piv.select(ID, YEAR, *[F.col(f"`{n}`") for n in names])


def assemble_result(
    attrs: DataFrame, long_df: DataFrame | None, pivot: bool = True
) -> DataFrame:
    """Final assembly mirroring `core.py:169-214`."""
    if long_df is None:
        return attrs
    if pivot:
        wide = pivot_wide(long_df)
        out = attrs.join(wide, on=ID, how="left")
        return out.orderBy(ID, YEAR)
    long_sorted = long_df.orderBy(ID, YEAR, VAR)
    out = attrs.join(long_sorted, on=ID, how="left")
    return out.orderBy(ID, YEAR, VAR)
