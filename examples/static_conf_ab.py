"""Time queries under a STATIC Spark conf (one that cannot flip at runtime,
e.g. spark.io.compression.codec) — one fresh JVM per invocation.

Usage:
    python examples/static_conf_ab.py <conf_key> <conf_value|-> <query> [query ...] [--reps N]

Pass `-` as the value for the baseline leg (conf untouched). Protocol
(guide §1): fresh session, JVM warmup, per query one discarded warm rep
then N timed reps of build+collect (the bench's timed action). Run the
legs alternately (A B A B) from the shell for pairing.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    key, value = sys.argv[1], sys.argv[2]
    argv = sys.argv[3:]
    names: list[str] = []
    reps = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reps":  # ADVICE r14: exact match, loud errors
            if i + 1 >= len(argv):
                sys.exit("--reps needs a value")
            reps = int(argv[i + 1])
            i += 1
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a!r}")
        else:
            names.append(a)
        i += 1
    t0 = time.time()
    while os.getloadavg()[0] >= 0.95 and time.time() - t0 < 300:
        time.sleep(5)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.session import get_spark

    extra = {} if value == "-" else {key: value}
    spark = get_spark("static-conf-ab", extra_conf=extra)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tag = f"{key}={value}" if extra else "baseline"

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries {unknown!r}; see duckpipe_spark.queries.REGISTRY")
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).collect()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        print(
            f"{tag} {name}: " + " ".join(f"{t:.3f}" for t in ts)
            + f"  min={min(ts):.3f} med={median(ts):.3f}"
        )


if __name__ == "__main__":
    main()
