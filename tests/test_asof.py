"""asof_join operator vs pandas.merge_asof (independent oracle).

pandas semantics matched: backward = latest right key <= left key; forward =
earliest right key >= left key; nearest = closer of the two, backward wins
ties; tolerance nulls out matches farther than the bound. Right keys are made
unique per (by, on) before both implementations, since merge_asof's choice
among duplicate right keys is positional, not semantic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from duckpipe_spark.operators.asof import asof_join


def _fixture(seed: int = 7):
    rng = np.random.default_rng(seed)
    n_left, n_right = 400, 150
    left = pd.DataFrame(
        {
            "g": rng.integers(0, 5, n_left),
            "t": rng.integers(0, 1000, n_left).astype("int64"),
            "lval": rng.normal(size=n_left).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "g": rng.integers(0, 5, n_right),
            "t": rng.integers(0, 1000, n_right).astype("int64"),
            "rval": rng.normal(size=n_right).round(3),
        }
    )
    # unique right key per group: duplicate-key choice is positional in pandas
    right = right.drop_duplicates(subset=["g", "t"]).reset_index(drop=True)
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    out = pd.merge_asof(
        left.sort_values(["t"], kind="stable").reset_index(drop=True),
        right.sort_values(["t"], kind="stable").reset_index(drop=True),
        on="t",
        by="g",
        direction=direction,
        tolerance=tolerance,
    )
    return out


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.copy()
    df["rval"] = df["rval"].round(6)
    rows = [
        (int(r.g), int(r.t), float(r.lval), None if pd.isna(r.rval) else float(r.rval))
        for r in df.itertuples()
    ]
    return sorted(rows, key=lambda x: (x[0], x[1], x[2], x[3] is None, x[3] or 0.0))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_pandas(spark, direction):
    left, right = _fixture()
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="t", by="g",
        direction=direction,
    ).toPandas()
    want = _pandas_asof(left, right, direction)
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_tolerance(spark, direction):
    left, right = _fixture(seed=11)
    import pyspark.sql.functions as F

    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="t", by="g",
        direction=direction, tolerance=F.lit(25.0),
    ).toPandas()
    want = _pandas_asof(left, right, direction, tolerance=25)
    assert _canon(got) == _canon(want)


def test_asof_name_collision_suffix(spark):
    left, right = _fixture()
    right = right.rename(columns={"rval": "lval"})
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="t", by="g"
    )
    assert "lval_right" in out.columns and "lval" in out.columns


def test_asof_duplicate_left_rows(spark):
    # nearest joins its two passes on a stamped rowid: identical left rows
    # must each survive with the same match, not cross-multiply
    left = pd.DataFrame({"g": [1, 1, 1], "t": [10, 10, 10], "lval": [1.0, 1.0, 1.0]})
    right = pd.DataFrame({"g": [1, 1], "t": [5, 20], "rval": [0.5, 2.0]})
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="t", by="g",
        direction="nearest",
    ).toPandas()
    assert len(out) == 3
    assert set(out["rval"]) == {0.5}  # dist 5 backward beats dist 10 forward
