"""Time one or more registered queries exactly like bench.py does.

Usage: python examples/time_query.py <query> [query ...] [--reps N]

Fresh session, JVM warmup, then per query: one warm rep (discarded) and
N timed reps of build-fn + collect (the bench's timed action). Prints
per-rep seconds plus min/median — the paired A/B measurement tool for
optimization work (run alternately on the before/after code states).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    reps = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--reps"):
            if "=" in a:
                reps = int(a.split("=", 1)[1])
            else:
                reps = int(argv[i + 1])
                i += 1  # consume the value so it is never read as a query name
        else:
            args.append(a)
        i += 1
    t0 = time.time()
    while os.getloadavg()[0] >= 0.95 and time.time() - t0 < 300:
        time.sleep(5)  # quiet-wait so the measurement is not self-contaminated
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.session import get_spark

    spark = get_spark("time-query")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    for name in args:
        samples = []
        for rep in range(reps + 1):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            n = df.count() if name in ("custkey_status_skeleton",) else len(df.collect())
            dt = time.perf_counter() - t0
            if rep > 0:  # rep 0 warms caches/artifacts like bench's warm pass
                samples.append(dt)
            print(f"# {name} rep{rep}: {dt:.3f}s rows={n}", file=sys.stderr)
        print(
            f"{name}: min={min(samples):.3f} median={median(samples):.3f} "
            f"samples={[round(s, 3) for s in samples]}"
        )


if __name__ == "__main__":
    main()
