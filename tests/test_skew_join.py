"""salted_join: result-set equality with the plain join (the operator's
contract), hot-key spread across salt sub-keys, and left semantics."""

import pyspark.sql.functions as F
import pytest

from duckpipe_spark.operators.skew import salted_join, _SALT


@pytest.fixture
def skewed(spark):
    # one hot key (90% of facts) + a long tail, dim misses key 999
    facts = spark.createDataFrame(
        [(1, float(i)) for i in range(900)]
        + [(k, float(k)) for k in range(2, 60)]
        + [(999, 0.0)],
        "k bigint, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 60)], "k bigint, label string"
    )
    return facts, dim


def _rows(df):
    return sorted((r.k, r.v, r.label) for r in df.collect())


def test_inner_equals_plain_join_under_forced_shuffle(spark, skewed):
    facts, dim = skewed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = _rows(salted_join(facts, dim, "k", salts=8))
        exp = _rows(facts.join(dim, "k", "inner"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == exp and len(got) == 958


def test_left_keeps_unmatched_facts(spark, skewed):
    facts, dim = skewed
    got = salted_join(facts, dim, "k", salts=4, how="left")
    missing = got.where(F.col("label").isNull()).collect()
    assert [r.k for r in missing] == [999]
    assert got.count() == facts.count()


def test_hot_key_spreads_across_salts(spark, skewed):
    facts, _ = skewed
    f = facts.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(8))
    )
    n_salts = f.where(F.col("k") == 1).select(_SALT).distinct().count()
    assert n_salts == 8, "hot key must fan out to every sub-key"


def test_rejects_right_and_bad_salts(spark, skewed):
    facts, dim = skewed
    with pytest.raises(ValueError):
        salted_join(facts, dim, "k", how="right")
    with pytest.raises(ValueError):
        salted_join(facts, dim, "k", salts=0)
