"""Measure the salted-join skew story on ACTUALLY skewed data (VERDICT r4
item 4): the driver testdata is uniform, so `salted_join`'s reason to
exist — one melting reducer under a hot key — has no measurement there.

Synthesizes a fact table where ONE key owns `hot_frac` of all rows (the
viral-user / sentinel-FK shape), joins it to a mid-sized dim that is too
big to broadcast, and interleaves three strategies:

* plain shuffle join, AQE skew split DISABLED  — the straggler baseline
* plain shuffle join, AQE skew split enabled   — Spark's runtime answer
* salted_join (deterministic xxhash64 row salt) with AQE split disabled
  — the declarative answer, for when AQE can't see the skew (cached
  stages, non-sort-merge plans) or isn't available

Reports wall-clock medians and the max/median task-time ratio of the join
stage (the straggler signature) as one JSON line per strategy. Results
feed BASELINE.md's skew section.

Run: python examples/skew_bench.py [rows] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import pyspark.sql.functions as F

from duckpipe_spark.operators.skew import salted_join
from duckpipe_spark.session import get_spark


def build_tables(spark, n_rows: int, n_keys: int, hot_frac: float):
    """Deterministic skewed fact + wide dim. The hot key is 0."""
    hot_n = int(n_rows * hot_frac)
    fact = spark.range(n_rows).select(
        F.when(F.col("id") < hot_n, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    # ~150-byte payload x n_keys rows: big enough that broadcasting is the
    # wrong move (the scenario salting exists for)
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-"), F.lpad(F.col("id").cast("string"), 140, "x")).alias(
            "attr"
        ),
    )
    return fact.localCheckpoint(), dim.localCheckpoint()


def run(strategy: str, fact, dim, spark) -> float:
    if strategy == "salted":
        joined = salted_join(fact, dim, "k", salts=32)
    else:
        joined = fact.join(dim, "k")
    t0 = time.time()
    joined.groupBy("k").agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("c")
    ).agg(F.sum("sv"), F.sum("c")).collect()
    return time.time() - t0


def main(n_rows: int = 8_000_000, reps: int = 5) -> None:
    spark = get_spark("skew-bench")
    # force the shuffle-join scenario: dim must not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    n_keys, hot_frac = 200_000, 0.30
    fact, dim = build_tables(spark, n_rows, n_keys, hot_frac)

    strategies = [
        ("plain_skewsplit_off", {"spark.sql.adaptive.skewJoin.enabled": "false"}),
        ("plain_skewsplit_on", {"spark.sql.adaptive.skewJoin.enabled": "true"}),
        ("salted_skewsplit_off", {"spark.sql.adaptive.skewJoin.enabled": "false"}),
    ]
    times: dict[str, list[float]] = {name: [] for name, _ in strategies}
    # warm each once, then interleave (BASELINE.md §5 protocol)
    for name, conf in strategies:
        for k, v in conf.items():
            spark.conf.set(k, v)
        run("salted" if name.startswith("salted") else "plain", fact, dim, spark)
    for _ in range(reps):
        for name, conf in strategies:
            for k, v in conf.items():
                spark.conf.set(k, v)
            times[name].append(
                run("salted" if name.startswith("salted") else "plain", fact, dim, spark)
            )
    out = {
        "rows": n_rows,
        "n_keys": n_keys,
        "hot_frac": hot_frac,
        "reps": reps,
        "medians": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "all": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 5,
    )
