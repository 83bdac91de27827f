"""Capture .explain("formatted") for every bench query into plans/$SPARK_GRAFT_PLANS_DIR (default r15)/.

Usage: python examples/capture_plans.py [suffix] [name ...]

Writes plans/r14/<query>_<suffix>.txt (suffix defaults to "before").
With explicit names, captures only those; otherwise the full bench set.
The explain is analysis-only for the returned DataFrame; queries that do
eager model work (training collects, closure) run that work as usual.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from duckpipe_spark.queries import REGISTRY  # noqa: E402
from duckpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("duckpipe-spark-plan-capture")
    if not names:
        names = [n for n in HEADLINE if n in REGISTRY]
        names += [n for n in REGISTRY if n not in names and REGISTRY[n].bench]
    for name in names:
        t0 = time.perf_counter()
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as exc:  # pragma: no cover - capture tool
            txt = f"ERROR building {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# {name}: {time.perf_counter() - t0:.1f}s -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
