"""Triangle counting under degree skew — the measurement behind the
degree-orientation design (Suri & Vassilvitskii WWW'11, "the curse of
the last reducer").

A co-purchase hub (one part appearing in h orders — a bestseller, a
default SKU) gives the naive three-way self-join wedge volume ~deg(hub)²
through the hub as middle node; the oriented plan points every hub edge
INTO the hub (it has the max degree), so the hub contributes zero wedges
from its center and per-node out-degree stays O(√m) no matter how hot
the hub gets. Same shape as the salted-join skew measurement
(BASELINE §8): Spark flat, the unbounded plan degrades superlinearly.

Data: sf0.1 lineitem + one synthetic hub part added to h orders.
Both engines run the identical logical query (the registered
parts_triangle_counts plan vs its naive-join DuckDB oracle); the DuckDB
side gets a hard timeout.

    PYTHONPATH=. python examples/triangle_skew_bench.py [h ...]
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
HUB = 10**9 + 7  # part id far outside the real domain
TIMEOUT_S = 120.0
SWEEP = [0, 2_000, 10_000, 30_000]


N_HUBS = 1


def hub_lineitem(spark, h: int):
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select("l_orderkey", "l_partkey")
    if h == 0:
        return li
    orders = li.select("l_orderkey").distinct().limit(h)
    hubs = None
    for i in range(N_HUBS):
        c = orders.withColumn("l_partkey", F.lit(HUB + i).cast("bigint"))
        hubs = c if hubs is None else hubs.unionByName(c)
    return li.unionByName(hubs)


def spark_side(spark, path: str) -> tuple[float, int]:
    from duckpipe_spark.functions.graph import cooccurrence_edges, triangle_counts_by_min

    def build():
        # read the SAME written parquet DuckDB sees — the hub-order pick
        # must be identical on both sides
        sym = cooccurrence_edges(
            spark.read.parquet(path), "l_orderkey", "l_partkey",
            distinct=False, symmetric=True,
        )
        return triangle_counts_by_min(sym=sym, broadcast_adj=True)

    build().count()  # warm
    t0 = time.perf_counter()
    n = build().count()
    return round(time.perf_counter() - t0, 2), n


def duckdb_side(path: str) -> tuple[float | None, int | None]:
    import duckdb

    from duckpipe_spark.queries.graph_q import _TRIANGLE_ORACLE

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{path}/*.parquet'")
    timer = threading.Timer(TIMEOUT_S, con.interrupt)
    timer.start()
    t0 = time.perf_counter()
    try:
        rows = con.execute(_TRIANGLE_ORACLE).fetchall()
        return round(time.perf_counter() - t0, 2), len(rows)
    except duckdb.Error:
        return None, None  # interrupted: > TIMEOUT_S
    finally:
        timer.cancel()


def main() -> None:
    from duckpipe_spark.session import get_spark

    spark = get_spark("triangle-skew-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = []
    for h in SWEEP:
        path = f"/root/repo/.scale/skew_tri_h{h}_x{N_HUBS}"
        hub_lineitem(spark, h).coalesce(8).write.mode("overwrite").parquet(path)
        s_t, s_n = spark_side(spark, path)
        d_t, d_n = duckdb_side(path)
        if d_n is not None:
            assert s_n == d_n, (h, s_n, d_n)
        row = {
            "n_hubs": N_HUBS,
            "hub_orders": h,
            "spark_s": s_t,
            "duckdb_s": d_t if d_t is not None else f">{TIMEOUT_S:.0f} (timeout)",
            "parts_with_triangles": s_n,
        }
        out.append(row)
        print(f"# {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--hubs" in args:
        i = args.index("--hubs")
        N_HUBS = int(args[i + 1])
        del args[i : i + 2]
    if args:
        SWEEP[:] = [int(a) for a in args]
    main()
