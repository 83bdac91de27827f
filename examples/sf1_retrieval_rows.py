"""Paired sf1 rows for the r14 retrieval rungs (BASELINE §26.5).

Measures each query's Spark wall (full collect) against its DuckDB oracle
on the .scale/sf1 corpus, ABBA-alternated, minimum of 3 reps after one
warm pass per engine (the warm pass also builds the BM25 index artifact
so the artifact query times the SERVE path, not the build). Paired
same-session minimums cancel symmetric ambient drift; run on a quiet box
(check `uptime` and for leftover SparkSubmit JVMs first).

Usage: PYTHONPATH=/root/repo python examples/sf1_retrieval_rows.py
(regenerate .scale/sf1 first with examples/sf1_scale_smoke.py if absent).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckpipe_spark.queries import REGISTRY  # noqa: E402
from duckpipe_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import run_oracle  # noqa: E402

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
)
NAMES = [
    "doc_hybrid_rrf_topk",
    "doc_hybrid_rrf_artifact_topk",
    "embedding_matryoshka_topk",
    "embedding_matryoshka_recall",
    # leg attribution for the inline hybrid's cost split
    "doc_bm25_topk",
    "embedding_cosine_topk",
]


def main() -> None:
    spark = get_spark("sf1-retrieval-rows")
    out = {}
    for name in NAMES:
        fn, sql = REGISTRY[name].fn, REGISTRY[name].oracle
        fn(spark, SF1).collect()
        run_oracle(sql, SF1)
        s_times: list[float] = []
        d_times: list[float] = []
        for rep in range(3):
            for eng in "sd" if rep % 2 == 0 else "ds":
                t0 = time.perf_counter()
                if eng == "s":
                    fn(spark, SF1).collect()
                    s_times.append(time.perf_counter() - t0)
                else:
                    run_oracle(sql, SF1)
                    d_times.append(time.perf_counter() - t0)
        s, d = min(s_times), min(d_times)
        out[name] = {"spark_s": round(s, 2), "duckdb_s": round(d, 2), "ratio": round(s / d, 2)}
        print(name, out[name], flush=True)
    print(out)


if __name__ == "__main__":
    main()
