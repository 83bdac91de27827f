"""A/B a runtime SQL conf's effect on query wall time, separating
CONSTRUCTION (Python query-builder + Catalyst analysis + any eager bounded
actions inside the builder) from EXECUTION (the terminal collect).

Usage:
    PYTHONPATH=/root/repo python examples/planning_ab.py \
        spark.sql.constraintPropagation.enabled false \
        doc_curation_medianear_artifact doc_curation_pipeline [reps]

Protocol (guide §1): one JVM, per-config clearCache + warm pass, then
``reps`` timed passes per config in ABBA config order so slow box drift
loads both configs evenly. Reports per-phase medians and mins.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckpipe_spark.queries import REGISTRY  # noqa: E402
from duckpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    key, off_value = sys.argv[1], sys.argv[2]
    names = [a for a in sys.argv[3:] if a in REGISTRY]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("planning-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base_value = spark.conf.get(key)
    print(f"# {key}: baseline={base_value} vs {off_value}", file=sys.stderr)

    # samples[config][name] = list of (t_construct, t_execute)
    samples: dict[str, dict[str, list[tuple[float, float]]]] = {
        "base": {n: [] for n in names},
        "flip": {n: [] for n in names},
    }

    def one_pass(cfg: str, record: bool) -> None:
        spark.conf.set(key, base_value if cfg == "base" else off_value)
        for name in names:
            spark.sparkContext.setJobDescription(f"{cfg}:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            if record:
                samples[cfg][name].append((t1 - t0, t2 - t1))
        spark.sparkContext.setJobDescription(None)

    # per-config warm (cache population under that config's plans)
    for cfg in ("base", "flip"):
        spark.catalog.clearCache()
        one_pass(cfg, record=False)
        one_pass(cfg, record=True)
    # ABBA tail: flip, base, flip, base ... (warm caches for both configs
    # coexist; plans differ between configs so cache entries are disjoint)
    order = []
    for _ in range(reps - 1):
        order += ["flip", "base"]
    for cfg in order:
        one_pass(cfg, record=True)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    for name in names:
        row = {}
        for cfg in ("base", "flip"):
            cons = [c for c, _ in samples[cfg][name]]
            exe = [e for _, e in samples[cfg][name]]
            tot = [c + e for c, e in samples[cfg][name]]
            row[cfg] = (med(cons), med(exe), med(tot), min(tot))
        b, f = row["base"], row["flip"]
        print(
            f"{name}: base cons/exec/total(min) = "
            f"{b[0]:.3f}/{b[1]:.3f}/{b[2]:.3f}({b[3]:.3f})  "
            f"flip = {f[0]:.3f}/{f[1]:.3f}/{f[2]:.3f}({f[3]:.3f})"
        )


if __name__ == "__main__":
    main()
