"""sf1 incremental-cost measurement for the media near-dup stage
(VERDICT r12 item 2's done-condition): time, at sf1 (the replicated
corpus from examples/sf1_scale_smoke.py), the three pipeline variants

  base      doc_curation_pipeline            (no media stage)
  inline    doc_curation_medianear           (media stage + 3-modality decode)
  artifact  doc_curation_medianear_artifact  (media stage from persisted codes)

so BASELINE can state the MEASURED incremental wall of the production
shape (artifact − base = one survivor semi-join + band/verify/closure on
the code table) instead of asserting it. Protocol: §5 interleaved warm
medians, Spark and the DuckDB oracle alternating per rep; the artifact
build (the one-time corpus-wide decode pass) happens during warm-up and
is reported separately — it is precisely the cost the artifact shape
amortizes away.

    PYTHONPATH=. python examples/sf1_medianear_artifact.py [--reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, ".scale", "sf1")

QUERIES = [
    "doc_curation_pipeline",
    "doc_curation_medianear",
    "doc_curation_medianear_artifact",
]


def main(reps: int = 3) -> None:
    from statistics import median

    import duckdb

    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.queries.corpus_q import _media_codes_artifact
    from duckpipe_spark.session import get_spark

    if not os.path.exists(os.path.join(DST, "documents.parquet")):
        raise SystemExit(
            "no sf1 corpus — run examples/sf1_scale_smoke.py first"
        )
    spark = get_spark("sf1-medianear-artifact")

    # one-time decode pass: build (or reuse) the persisted code artifact,
    # timed separately — this is the cost the artifact shape amortizes
    t0 = time.perf_counter()
    _media_codes_artifact(spark, DST)
    build_s = time.perf_counter() - t0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{DST}/documents.parquet/*.parquet'"
    )

    for name in QUERIES:  # warm both engines
        len(REGISTRY[name].fn(spark, DST).collect())
        con.execute(REGISTRY[name].oracle).fetchall()

    spark_runs: dict[str, list[float]] = {n: [] for n in QUERIES}
    duck_runs: dict[str, list[float]] = {n: [] for n in QUERIES}
    for rep in range(reps):
        spark_first = rep % 2 == 0  # ABBA, same as bench.py r13
        passes = (
            (spark_runs, lambda n: len(REGISTRY[n].fn(spark, DST).collect())),
            (duck_runs, lambda n: con.execute(REGISTRY[n].oracle).fetchall()),
        )
        for runs, fn in passes if spark_first else passes[::-1]:
            for name in QUERIES:
                t0 = time.perf_counter()
                fn(name)
                runs[name].append(time.perf_counter() - t0)
        print(f"# rep {rep + 1}/{reps} done", file=sys.stderr)

    spark_t = {n: round(median(v), 2) for n, v in spark_runs.items()}
    duck_t = {n: round(median(v), 2) for n, v in duck_runs.items()}
    print(
        json.dumps(
            {
                "sf": 1,
                "reps": reps,
                "loadavg_1m": round(os.getloadavg()[0], 1),
                "artifact_build_s": round(build_s, 2),
                "artifact_reused": build_s < 5.0,
                "spark": spark_t,
                "duckdb": duck_t,
                "ratio": {
                    n: round(spark_t[n] / max(duck_t[n], 0.001), 2)
                    for n in QUERIES
                },
                "incremental_media_stage_s": {
                    "inline_minus_base": round(
                        spark_t["doc_curation_medianear"]
                        - spark_t["doc_curation_pipeline"],
                        2,
                    ),
                    "artifact_minus_base": round(
                        spark_t["doc_curation_medianear_artifact"]
                        - spark_t["doc_curation_pipeline"],
                        2,
                    ),
                },
                "spark_spread": {
                    n: round(max(v) - min(v), 2) for n, v in spark_runs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    main(reps=reps)
