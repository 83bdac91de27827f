"""Local mirror of the driver's correctness gate: run each registered Spark
query and its DuckDB oracle side-by-side, compare row count, column names and
an order-insensitive value hash (columns sorted by name, rows sorted by their
full stringified tuple, floats normalized).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from duckpipe_spark.sources.tables import TABLE_NAMES


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # NB: do NOT int-ify integral floats — the driver's hash stringifies
        # dtype-faithfully, so an int64 column on one side vs a float64 column
        # on the other (e.g. DuckDB HUGEINT sums → float64 in pandas) must
        # FAIL here too, not be normalized away.
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = ["|".join(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        # driver testdata ships flat files; the local .scale/sf1 corpus is
        # Spark-written table DIRECTORIES (part-*.parquet + _SUCCESS), which
        # DuckDB reads via a glob
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con.execute(sql).df()


def compare(name: str, spark, sf_dir: str) -> dict:
    from duckpipe_spark.queries import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    out = {"name": name, "spark_rows": len(sdf)}
    if q.oracle is None:
        out["status"] = "rows_only"
        out["ok"] = len(sdf) >= 0
        return out
    odf = run_oracle(q.oracle, sf_dir)
    out["oracle_rows"] = len(odf)
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    out["schema_ok"] = scols == ocols
    if not out["schema_ok"]:
        out["spark_cols"], out["oracle_cols"] = scols, ocols
        out["ok"] = False
        return out
    srows, orows = canonicalize(sdf), canonicalize(odf)
    out["rows_ok"] = len(srows) == len(orows)
    out["hash_ok"] = srows == orows
    if not out["hash_ok"]:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        out["first_diffs"] = diff
        only_s = set(srows) - set(orows)
        only_o = set(orows) - set(srows)
        out["only_spark"] = sorted(only_s)[:3]
        out["only_oracle"] = sorted(only_o)[:3]
    out["ok"] = out["rows_ok"] and out["hash_ok"]
    return out


def main(sf_dir: str = "/root/testdata/sf0.01", names: list[str] | None = None):
    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.session import get_spark

    spark = get_spark("oracle-harness")
    results = []
    for name in names or list(REGISTRY):
        try:
            r = compare(name, spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "ok": False, "error": f"{type(e).__name__}: {e}"}
        status = "PASS" if r.get("ok") else "FAIL"
        print(f"[{status}] {name}: { {k: v for k, v in r.items() if k != 'name'} }")
        results.append(r)
    n_ok = sum(1 for r in results if r.get("ok"))
    print(f"\n{n_ok}/{len(results)} queries match the oracle")
    return results


if __name__ == "__main__":
    import os
    import sys

    main(
        sf_dir=os.environ.get("SPARK_GRAFT_HARNESS_SF_DIR", "/root/testdata/sf0.01"),
        names=sys.argv[1:] or None,
    )
