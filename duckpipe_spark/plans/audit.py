"""Physical-plan auditing: machine-checkable assertions on what Catalyst
actually planned.

The reference hand-optimizes its generated SQL (SURVEY.md §4); in this
engine the optimizer does that work, and this module is how we *verify* it
did — scans prune columns and push filters, small sides broadcast, hot paths
stay inside whole-stage codegen, shuffles are bounded. Tests in
`tests/test_plans.py` pin these properties so a regression in plan shape
fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanAudit:
    text: str
    scans: list[dict] = field(default_factory=list)
    broadcast_hash_joins: int = 0
    broadcast_nl_joins: int = 0
    sort_merge_joins: int = 0
    shuffle_hash_joins: int = 0
    exchanges: int = 0
    spread_exchanges: int = 0
    codegen_spans: int = 0
    python_stages: int = 0

    def pushed_filters(self) -> list[str]:
        return [f for s in self.scans for f in s.get("pushed", [])]

    def read_columns(self) -> list[list[str]]:
        return [s.get("columns", []) for s in self.scans]


from contextlib import contextmanager


@contextmanager
def no_aqe(spark):
    """Disable AQE while building+explaining a query so the static physical
    plan (with codegen span markers and exchange counts) is inspectable;
    physical planning is lazy, so the conf applies at first explain."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def audit_plan(df: DataFrame) -> PlanAudit:
    text = explain_formatted(df)
    simple = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    a = PlanAudit(text=text)
    a.broadcast_hash_joins = len(re.findall(r"BroadcastHashJoin", text))
    a.broadcast_nl_joins = len(re.findall(r"BroadcastNestedLoopJoin", text))
    a.sort_merge_joins = len(re.findall(r"SortMergeJoin", text))
    a.shuffle_hash_joins = len(re.findall(r"ShuffledHashJoin", text))
    # count unique Exchange nodes via their detail-section headers
    # ("(12) Exchange"); falls back to tree lines when no detail section.
    # Round-robin exchanges are counted SEPARATELY (`spread_exchanges`):
    # they come only from explicit input spreading
    # (`sources.tables.spread_small_scan`, a no-op on well-split 100 TB
    # inputs), never from joins/aggregations/sorts — the `exchanges` pins
    # guard against accidental KEY-partitioned shuffles of corpus bytes,
    # which all plan as HashPartitioning/RangePartitioning and stay counted.
    headers = re.findall(r"\n\(\d+\) Exchange", text)
    if headers:
        spread = 0
        for section in text.split("\n\n"):
            if re.match(r"\(\d+\) Exchange", section) and "RoundRobinPartitioning" in section:
                spread += 1
        a.spread_exchanges = spread
        a.exchanges = len(headers) - spread
    else:
        a.exchanges = len(re.findall(r"\+- Exchange", text))
    # whole-stage-codegen span ids appear as `*(N)` in the simple plan
    a.codegen_spans = len(set(re.findall(r"\*\((\d+)\)", simple)))
    a.python_stages = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", text))

    # parse per-scan details from the formatted plan's detail section
    for m in re.finditer(
        r"Scan parquet[^\n]*\n(?:[^\n]*\n)*?Location:[^\n]*?([\w./-]+\.parquet)[^\n]*\n"
        r"(?:ReadSchema: struct<([^\n]*)>)?",
        text,
    ):
        pass
    # simpler: section-based parse
    for section in text.split("\n\n"):
        if "Scan parquet" not in section:
            continue
        scan: dict = {}
        loc = re.search(r"Location: \w+ \[([^\]]*)\]", section)
        if loc:
            scan["location"] = loc.group(1)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", section)
        if pushed:
            scan["pushed"] = [p.strip() for p in pushed.group(1).split(",") if p.strip()]
        rs = re.search(r"ReadSchema: struct<([^>]*)>", section)
        if rs:
            scan["columns"] = [
                c.split(":")[0].strip() for c in rs.group(1).split(",") if c.strip()
            ]
        if scan:
            a.scans.append(scan)
    return a


def print_audit(df: DataFrame) -> PlanAudit:  # pragma: no cover - debug helper
    a = audit_plan(df)
    print(
        f"scans={len(a.scans)} bhj={a.broadcast_hash_joins} bnlj={a.broadcast_nl_joins} "
        f"smj={a.sort_merge_joins} shj={a.shuffle_hash_joins} exch={a.exchanges} "
        f"codegen={a.codegen_spans} python={a.python_stages}"
    )
    for s in a.scans:
        print("  scan:", s)
    return a
