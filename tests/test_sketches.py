"""Deterministic HLL: estimate accuracy vs truth, exact shard
mergeability, and partition invariance."""

import pyspark.sql.functions as F

from duckpipe_spark.functions.sketches import hll_distinct, hll_estimate, hll_registers


def _ids(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.lit("g").alias("grp"), (F.col("id") * 7 + 3).alias("x")
    )


def test_estimate_within_hll_error_bound(spark):
    """m=256 registers → ~6.5% standard error; assert within 3 sigma for a
    spread of cardinalities (deterministic, so these are fixed numbers —
    the assert guards the formula, not luck)."""
    for n in (100, 1_000, 20_000):
        est = (
            hll_distinct(_ids(spark, n), "x", ["grp"]).collect()[0].hll_distinct
        )
        assert abs(est - n) / n < 0.20, (n, est)


def test_registers_merge_exactly(spark):
    """MAX-merging two shards' registers must equal the whole-input sketch
    bit-for-bit — the property that lets 100 TB shards combine without a
    re-scan."""
    whole = hll_registers(_ids(spark, 5_000), "x", ["grp"])
    a = hll_registers(_ids(spark, 3_000), "x", ["grp"])
    b = hll_registers(_ids(spark, 2_000, offset=3_000), "x", ["grp"])
    merged = (
        a.unionByName(b)
        .groupBy("grp", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    w = {(r.bucket): r.reg for r in whole.collect()}
    m = {(r.bucket): r.reg for r in merged.collect()}
    assert w == m
    e1 = hll_estimate(whole, ["grp"]).collect()[0].hll_distinct
    e2 = hll_estimate(merged, ["grp"]).collect()[0].hll_distinct
    assert e1 == e2


def test_partition_invariant(spark):
    df = _ids(spark, 4_000)
    a = hll_distinct(df, "x", ["grp"]).collect()[0].hll_distinct
    b = hll_distinct(df.repartition(17), "x", ["grp"]).collect()[0].hll_distinct
    assert a == b


def test_cm_upper_bound_and_exactness_without_collisions(spark):
    """CM estimates are >= truth always, and == truth when w >> keys
    (no collisions possible to force, so assert the bound plus closeness
    on a small key set)."""
    from duckpipe_spark.functions.sketches import cm_estimate, cm_sketch

    df = spark.range(0, 1000).select((F.col("id") % 10).alias("k"))
    sk = cm_sketch(df, "k")
    keys = df.select("k").distinct()
    got = {r.k: r.cm_count for r in cm_estimate(sk, keys, "k").collect()}
    assert all(v >= 100 for v in got.values())
    assert set(got) == set(range(10))
    # 10 keys in 4x1024 cells: collisions essentially impossible
    assert all(v == 100 for v in got.values())


def test_cm_sketch_merges_by_sum(spark):
    from duckpipe_spark.functions.sketches import cm_estimate, cm_sketch

    a = spark.range(0, 500).select((F.col("id") % 7).alias("k"))
    b = spark.range(500, 1200).select((F.col("id") % 7).alias("k"))
    whole = cm_sketch(a.unionAll(b), "k")
    merged = (
        cm_sketch(a, "k").unionByName(cm_sketch(b, "k"))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    keys = a.select("k").distinct()
    e1 = sorted((r.k, r.cm_count) for r in cm_estimate(whole, keys, "k").collect())
    e2 = sorted((r.k, r.cm_count) for r in cm_estimate(merged, keys, "k").collect())
    assert e1 == e2


def test_bloom_no_false_negatives_and_merge(spark):
    from duckpipe_spark.functions.sketches import bloom_build, bloom_probe

    members = spark.range(0, 300).select((F.col("id") * 13 + 5).alias("k"))
    others = spark.range(0, 500).select((F.col("id") * 13 + 6).alias("k"))
    filt = bloom_build(members, "k")
    got = bloom_probe(filt, members.unionAll(others), "k")
    # ALL members flagged (one-sided error: never a false negative)
    assert got.join(members, "k", "left_semi").where(F.col("maybe_member") == 0).count() == 0
    # filters built from shards OR-merge into the whole-input filter
    a = bloom_build(members.where(F.col("k") < 2000), "k")
    b = bloom_build(members.where(F.col("k") >= 2000), "k")
    merged = a.unionByName(b).groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
    w = {r.word: r.bits for r in filt.collect()}
    m = {r.word: r.bits for r in merged.collect()}
    assert w == m


def test_bloom_never_sets_the_sign_bit(spark):
    """Bit 63 is unportable (DuckDB checked-overflows on 1<<63); every
    stored word must stay non-negative."""
    from duckpipe_spark.functions.sketches import bloom_build

    members = spark.range(0, 5000).select(F.col("id").alias("k"))
    assert bloom_build(members, "k").where(F.col("bits") < 0).count() == 0


def test_bloom_probe_rows_are_one_to_one_with_input(spark):
    """Duplicate probe rows pass through (no silent collapse), and columns
    that are not groupable (maps) ride along untouched."""
    from duckpipe_spark.functions.sketches import bloom_build, bloom_probe

    members = spark.range(0, 100).select((F.col("id") * 3).alias("k"))
    filt = bloom_build(members, "k")
    probes = spark.createDataFrame(
        [(3, "a"), (3, "b"), (3, "b"), (4, "c")], "k bigint, tag string"
    ).withColumn("m", F.create_map(F.lit("x"), F.col("tag")))
    got = bloom_probe(filt, probes, "k")
    assert got.count() == 4  # 1:1, duplicates intact
    rows = sorted((r.k, r.tag, r.maybe_member) for r in got.collect())
    assert [r[2] for r in rows if r[0] == 3] == [1, 1, 1]
    assert got.columns == ["k", "tag", "m", "maybe_member"]


def test_sampled_quantiles_exact_on_small_groups_and_merge(spark):
    """Groups smaller than k are sampled whole (exact quantiles), and two
    shards' samples re-rank into the whole-input sketch."""
    import pyspark.sql.functions as F  # noqa: F811

    from duckpipe_spark.functions.sketches import sampled_quantiles

    df = spark.range(0, 300).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("rid"), (F.col("id") * 7).alias("v")
    )
    got = {r.g: r for r in sampled_quantiles(df, "v", "rid", ["g"], k=512).collect()}
    # whole-group sample: quantiles are exact lower-index order stats
    import numpy as np

    for g in range(3):
        vals = sorted(i * 7 for i in range(300) if i % 3 == g)
        assert got[g].n_sampled == 100
        for q in (25, 50, 75, 90, 99):
            assert getattr(got[g], f"q{q}") == vals[(q * 99) // 100], (g, q)
    # merge property: shard samples (k rows each) -> re-rank -> same sketch
    k = 16
    whole = sampled_quantiles(df, "v", "rid", ["g"], k=k).collect()
    a = df.where(F.col("rid") < 150)
    b = df.where(F.col("rid") >= 150)
    from duckpipe_spark.functions.sketches import _qsk_priority_sql
    from pyspark.sql import Window

    def shard_sample(d):
        w = Window.partitionBy("g").orderBy("__p", "rid")
        return (
            d.withColumn("__p", F.expr(_qsk_priority_sql("rid")))
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= k)
            .select("g", "rid", "v")
        )

    merged_input = shard_sample(a).unionByName(shard_sample(b))
    merged = sampled_quantiles(merged_input, "v", "rid", ["g"], k=k).collect()
    assert sorted(map(tuple, whole)) == sorted(map(tuple, merged))


def test_sampled_quantiles_deterministic_across_partitionings(spark):
    import pyspark.sql.functions as F  # noqa: F811

    from duckpipe_spark.functions.sketches import sampled_quantiles

    df = spark.range(0, 5000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("rid"),
        F.expr("CAST(xxhash64(id) % 100000 AS BIGINT)").alias("v"),
    )
    r1 = sorted(map(tuple, sampled_quantiles(df, "v", "rid", ["g"], k=64).collect()))
    r2 = sorted(map(tuple, sampled_quantiles(df.repartition(17), "v", "rid", ["g"], k=64).collect()))
    assert r1 == r2
