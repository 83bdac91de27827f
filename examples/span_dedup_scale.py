"""doc_span_dedup scale datapoint (VERDICT r5 item 4): measure both
engines on a document corpus large enough that per-query work clears the
~0.3-0.8 s Spark job floor (the confound in the sf0.1/sf1 ratios).

Corpus synthesis follows the GROW discipline of the sf1 replicator
(`sf1_scale_smoke.py`): each of the COPIES replicas shifts doc_id by the
domain span, and — the text analog of remapping l_partkey — every copy
after the first SALTS its tokens with the copy index. Span structure
(token counts, window boundaries, within-copy duplicate rate) is
preserved exactly, but copies share no span hashes: the corpus grows the
way a real crawl grows (new content, constant duplication rate) instead
of densifying into a 99%-duplicate corpus that would measure the
replication artifact, not the operator.

Both engines are timed through the SAME reduction wrapper
(sum of clean_text lengths + drop counts) so neither pays a
500k-document result transfer the other doesn't, and Spark cannot prune
the clean_text reconstruction (.count() would - BASELINE §5).

    PYTHONPATH=. python examples/span_dedup_scale.py [--regen] [copies]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 100
DST = os.path.join(REPO, ".scale", "docs100")

_WRAP = (
    "SELECT CAST(sum(length(clean_text)) AS BIGINT) AS total_len,"
    " CAST(sum(n_dropped) AS BIGINT) AS total_dropped,"
    " CAST(count(*) AS BIGINT) AS n FROM ({q})"
)


def synthesize(spark) -> None:
    import pyspark.sql.functions as F

    out = f"{DST}/documents.parquet"
    if os.path.exists(out):
        return
    df = spark.read.parquet(f"{SRC}/documents.parquet")
    span = df.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = None
    for i in range(COPIES):
        c = df.withColumn("doc_id", (F.col("doc_id") + i * span).cast("bigint"))
        if i > 0:
            # salt every token: same token counts and window boundaries,
            # disjoint span-hash space per copy (growth, not densification)
            c = c.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.trim("text"), r"\s+"),
                        lambda t: F.concat(t, F.lit(f"_{i}")),
                    ),
                    " ",
                ),
            )
        copies = c if copies is None else copies.unionByName(c)
    copies.repartition(32).write.mode("overwrite").parquet(out)
    print(f"# synthesized documents x{COPIES}", file=sys.stderr)


def main() -> None:
    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.session import get_spark

    spark = get_spark("span-dedup-scale")
    os.makedirs(DST, exist_ok=True)
    synthesize(spark)

    fn = REGISTRY["doc_span_dedup"].fn
    reduced = lambda: (  # noqa: E731
        fn(spark, DST)
        .selectExpr(
            "CAST(sum(length(clean_text)) AS BIGINT) AS total_len",
            "CAST(sum(n_dropped) AS BIGINT) AS total_dropped",
            "CAST(count(*) AS BIGINT) AS n",
        )
        .collect()
    )
    rows = reduced()  # warm
    t0 = time.perf_counter()
    rows = reduced()
    spark_s = round(time.perf_counter() - t0, 2)
    print(f"# spark: {spark_s}s {rows[0].asDict()}", file=sys.stderr)

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{DST}/documents.parquet/*.parquet'"
    )
    q = _WRAP.format(q=REGISTRY["doc_span_dedup"].oracle)
    duck_rows = con.execute(q).fetchall()  # warm
    t0 = time.perf_counter()
    duck_rows = con.execute(q).fetchall()
    duck_s = round(time.perf_counter() - t0, 2)
    print(f"# duckdb: {duck_s}s {duck_rows}", file=sys.stderr)

    assert tuple(rows[0]) == duck_rows[0], (rows, duck_rows)
    print(
        json.dumps(
            {
                "copies": COPIES,
                "n_docs": duck_rows[0][2],
                "spark_s": spark_s,
                "duckdb_s": duck_s,
                "ratio": round(spark_s / duck_s, 2) if duck_s else None,
                "results_match": True,
            }
        )
    )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import shutil

        shutil.rmtree(DST, ignore_errors=True)
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    if nums:
        COPIES = int(nums[0])
        DST = os.path.join(REPO, ".scale", f"docs{COPIES}")
    main()
