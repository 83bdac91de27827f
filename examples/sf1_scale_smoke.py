"""sf1 scale smoke: run the compute-bound headline queries at 10× the
driver's largest testdata (sf0.1 → sf1) on BOTH engines and print the
ratio trend — the measurement behind BASELINE.md §6's "Spark's fixed job
overhead amortizes as data grows" claim.

sf1 tables are synthesized once by replicating sf0.1 ten times with
id-remapping (keys stay unique and join cardinalities scale linearly,
which is what matters for the scan/join/agg work these queries do; value
distributions repeat, which is fine for wall-clock scaling measurements).
Written to <repo>/.scale/sf1/ (gitignored), ~10× sf0.1 on disk.

    PYTHONPATH=. python examples/sf1_scale_smoke.py [--regen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".scale", "sf1")
COPIES = 10

# id columns to remap per table so replicated rows keep unique keys and FK
# joins scale linearly instead of fanning out copy×copy. Every column is
# shifted by the span of the key DOMAIN it belongs to, and a domain's span
# comes from its owning (PK) table — an FK must move by the same amount as
# the PK it references even when the FK column doesn't cover the full
# domain (max(l_partkey) can be < max(p_partkey)). l_partkey IS remapped:
# without it a 10x corpus re-uses the same 20k parts and the co-purchase
# graph DENSIFIES (10x degree, superlinear triangles) instead of GROWING
# (10 disjoint copies — what real catalog growth looks like), faking a
# quadratic blowup in the graph family.
_DOMAIN_OWNER = {  # domain -> (owning table, PK column)
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
_REMAP: dict[str, dict[str, str]] = {  # table -> {column: domain}
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "region": {},
    "nation": {},
}

# compute-bound at sf0.1 (DuckDB >= ~0.3 s) — the 8 queries worth scaling
QUERIES = [
    "features_within_radius",
    "geo_buffer_clip_pipeline",
    "geo_nearest_distance_pipeline",
    "nearest_feature_distance",
    "embedding_lsh_topk",
    "doc_span_dedup",
    "doc_minhash_signatures",
    "doc_lsh_candidates",
]


def synthesize(spark) -> None:
    import pyspark.sql.functions as F

    domain_span = {
        d: spark.read.parquet(f"{SRC}/{tbl}.parquet").agg(F.max(col)).collect()[0][0] + 1
        for d, (tbl, col) in _DOMAIN_OWNER.items()
    }
    for t, keys in _REMAP.items():
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if not keys:  # tiny dims stay as-is
            df.write.mode("overwrite").parquet(out)
            continue
        copies = None
        for i in range(COPIES):
            c = df
            for k, dom in keys.items():
                c = c.withColumn(k, (F.col(k) + i * domain_span[dom]).cast("bigint"))
            if t == "documents":
                # plant shared footer lines in 20% of docs: the sf0.1 corpus
                # carries no cross-doc repeated lines, so the sf1
                # doc_strip_boilerplate row used to measure a 5-stage no-op
                # (VERDICT r7 item 6). Two footers in 1-in-5 docs make the
                # strip path (boiler set build + broadcast strip join) do
                # real work while staying tiny vs the corpus. The copy
                # marker keeps BODY lines unique across replicas — without
                # it every text line appears verbatim in 10 docs and the
                # "strip" measurement degenerates to stripping 100% of the
                # corpus (measured: n_stripped == every line).
                if i > 0:
                    c = c.withColumn("text", F.concat(F.lit(f"copy{i} "), F.col("text")))
                footer = F.lit(
                    "\n(c) example corp - all rights reserved"
                    "\nunsubscribe: http://example.invalid/u"
                )
                c = c.withColumn(
                    "text",
                    F.when(
                        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), footer)
                    ).otherwise(F.col("text")),
                )
            if t == "events":
                # a 10x event corpus covers 10x the TIME, not 10x the density:
                # shift each copy past the 30-day source span so window joins
                # and rollups scale linearly like real growth would, instead
                # of quadratically from artificial per-hour pileup
                c = c.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 31} DAYS"))
            copies = c if copies is None else copies.unionByName(c)
        copies.write.mode("overwrite").parquet(out)
        print(f"# synthesized {t} x{COPIES}", file=sys.stderr)


def main(reps: int = 3) -> None:
    """Interleaved warm medians (BASELINE §5 protocol, VERDICT r6 item 6):
    one warm-up per engine per query, then ``reps`` alternating
    Spark-sweep/DuckDB-sweep rounds; per-query time is the MEDIAN across
    rounds, so one background-load spike perturbs at most one round of
    both engines equally instead of silently biasing a single-shot
    ratio."""
    from statistics import median

    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.session import get_spark

    spark = get_spark("sf1-scale-smoke")
    os.makedirs(DST, exist_ok=True)
    synthesize(spark)

    import duckdb

    con = duckdb.connect()
    for t in _REMAP:
        # Spark writes each table as a directory of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{DST}/{t}.parquet/*.parquet'")

    for name in QUERIES:  # warm both engines (JIT, page cache, codegen)
        len(REGISTRY[name].fn(spark, DST).collect())
        con.execute(REGISTRY[name].oracle).fetchall()

    spark_runs: dict[str, list[float]] = {n: [] for n in QUERIES}
    duck_runs: dict[str, list[float]] = {n: [] for n in QUERIES}
    for rep in range(reps):
        for name in QUERIES:
            t0 = time.perf_counter()
            len(REGISTRY[name].fn(spark, DST).collect())
            spark_runs[name].append(time.perf_counter() - t0)
        for name in QUERIES:
            t0 = time.perf_counter()
            con.execute(REGISTRY[name].oracle).fetchall()
            duck_runs[name].append(time.perf_counter() - t0)
        print(f"# rep {rep + 1}/{reps} done", file=sys.stderr)

    spark_t = {n: round(median(v), 2) for n, v in spark_runs.items()}
    duck_t = {n: round(median(v), 2) for n, v in duck_runs.items()}
    ratios = {
        n: round(spark_t[n] / max(duck_t[n], 0.001), 2) for n in QUERIES
    }
    print(
        json.dumps(
            {
                "sf": 1,
                "reps": reps,
                "loadavg_1m": round(os.getloadavg()[0], 1),
                "spark_total": round(sum(spark_t.values()), 2),
                "duckdb_total": round(sum(duck_t.values()), 2),
                "spark": spark_t,
                "duckdb": duck_t,
                "ratio": ratios,
                "spark_spread": {
                    n: round(max(v) - min(v), 2) for n, v in spark_runs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import shutil

        shutil.rmtree(DST, ignore_errors=True)
    reps = 3
    for a in list(sys.argv[1:]):
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if names:
        QUERIES[:] = names
    main(reps)
