"""Semantic properties of the sampling / splitting / packing family
(functions/sampling.py) beyond the oracle hash-match: determinism,
subset-stability, exact stratum sizes, pack-budget geometry."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from duckpipe_spark.functions.sampling import (
    pack_sequences,
    stratified_sample,
    with_hash_split,
)
from duckpipe_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_split_is_deterministic_and_exhaustive(docs):
    a = with_hash_split(docs).select("doc_id", "split").toPandas().set_index("doc_id")
    b = with_hash_split(docs).select("doc_id", "split").toPandas().set_index("doc_id")
    assert a.sort_index().equals(b.sort_index())
    assert set(a["split"].unique()) <= {"train", "val", "test"}
    # rough proportions: 80/10/10 within generous tolerance on 500 docs
    frac = a["split"].value_counts(normalize=True)
    assert 0.65 <= frac.get("train", 0) <= 0.92
    assert frac.get("val", 0) <= 0.22 and frac.get("test", 0) <= 0.22


def test_split_membership_is_stable_under_subset(docs, spark):
    """Hash-based membership must not depend on what other rows are present
    (the property a random() split lacks)."""
    full = with_hash_split(docs).select("doc_id", "split").toPandas().set_index("doc_id")
    subset = with_hash_split(docs.where(F.col("doc_id") % 3 == 0))
    sub = subset.select("doc_id", "split").toPandas().set_index("doc_id")
    joined = sub.join(full, how="left", rsuffix="_full")
    assert (joined["split"] == joined["split_full"]).all()


def test_stratified_sample_exact_k_and_subset_of_input(docs):
    out = stratified_sample(docs, "lang", 20).toPandas()
    sizes = out.groupby("lang").size()
    n_per_lang = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, n in n_per_lang.items():
        assert sizes.get(lang, 0) == min(20, n)
    assert out["sample_rank"].max() <= 20


def test_pack_sequences_budget_geometry(docs):
    """pack_id must be the block index of the document's first token:
    non-decreasing in doc order, starting at 0, and consecutive documents
    in one stream advance pack_id by exactly floor-progression."""
    toks = docs.select(
        "doc_id", "lang", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    out = (
        pack_sequences(toks, "n_tokens", budget=512, partition_col="lang")
        .toPandas()
        .sort_values(["lang", "doc_id"])
    )
    for _, g in out.groupby("lang"):
        prefix = g["n_tokens"].cumsum().shift(fill_value=0)
        assert (g["pack_id"] == prefix // 512).all()
        assert g["pack_id"].iloc[0] == 0
        assert (g["pack_id"].diff().dropna() >= 0).all()


def test_mixture_resample_exact_targets_and_determinism(docs):
    """Kept counts must equal floor(w_l · S) with S = min(c_l / w_l) — the
    binding stratum nearly whole, everything else downsampled to the exact
    target mixture — and reruns must keep the identical set."""
    from duckpipe_spark.functions.sampling import mixture_resample

    weights = {"en": 5, "de": 2, "es": 2, "fr": 1, "zh": 2}
    counts = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    scale = min(counts[s] / w for s, w in weights.items())
    out = mixture_resample(docs, weights).select("doc_id", "lang").toPandas()
    sizes = out.groupby("lang").size()
    for s, w in weights.items():
        assert sizes.get(s, 0) == int(w * scale // 1), s
    again = mixture_resample(docs, weights).select("doc_id", "lang").toPandas()
    assert set(out["doc_id"]) == set(again["doc_id"])


def test_temperature_resample_budget_monotone(spark):
    """A larger budget keeps a superset: shares floor(B*s/S) are monotone in
    B and membership is a rank prefix per stratum."""
    from duckpipe_spark.functions.sampling import temperature_resample
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    small = {r.doc_id for r in temperature_resample(docs, 100).select("doc_id").collect()}
    large = {r.doc_id for r in temperature_resample(docs, 300).select("doc_id").collect()}
    assert small <= large
    assert len(small) < len(large)


def test_mixture_resample_weight_scale_invariant(spark):
    """Multiplying every weight by a constant leaves the kept set unchanged
    (the scale S = min c/w absorbs it)."""
    from duckpipe_spark.functions.sampling import mixture_resample
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    w1 = {"en": 6, "de": 2, "es": 1, "fr": 1}
    w2 = {k: v * 7 for k, v in w1.items()}
    a = {r.doc_id for r in mixture_resample(docs, w1).select("doc_id").collect()}
    b = {r.doc_id for r in mixture_resample(docs, w2).select("doc_id").collect()}
    assert a == b


def test_priority_sample_exact_k_weighted_and_plan(spark):
    """Exactly k rows; long docs overrepresented vs their population share;
    plan is TakeOrderedAndProject (distributed partial top-k), not a global
    Sort."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sampling import priority_sample

    df = spark.range(1, 2001).select(
        F.col("id").alias("doc_id"),
        # 10% of rows carry 50x the weight of the rest
        F.when(F.col("id") % 10 == 0, F.lit(5000)).otherwise(F.lit(100)).alias("w"),
    )
    got = priority_sample(df, "w", "doc_id", 200)
    rows = got.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r.doc_id % 10 == 0)
    # heavy rows are 10% of the population but ~50x weighted: they must
    # dominate the sample (deterministic, so this is a fixed number)
    assert heavy > 120, heavy
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # determinism across partitionings
    again = priority_sample(df.repartition(17), "w", "doc_id", 200).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)


def test_priority_sample_reserved_column_guard(spark):
    """'priority' is a reserved output name — same contract as range_join's
    _BIN and salted_join's _SALT: collide -> ValueError, and the column is
    retained in the output."""
    import pytest as _pytest

    from duckpipe_spark.functions.sampling import priority_sample

    df = spark.range(10).selectExpr("id AS doc_id", "CAST(id + 1 AS DOUBLE) AS w")
    with _pytest.raises(ValueError, match="priority"):
        priority_sample(df.withColumn("priority", F.lit(0.0)), "w", "doc_id", 3)
    assert "priority" in priority_sample(df, "w", "doc_id", 3).columns


def test_shard_and_order_reserved_column_guard(spark):
    """ADVICE r6: shard_and_order writes 'shard'/'pos' (+ temp '__h') —
    same clash contract as priority_sample: collide -> ValueError instead
    of silently overwriting the caller's column."""
    import pytest as _pytest

    from duckpipe_spark.functions.sampling import shard_and_order

    df = spark.range(10).selectExpr("id AS doc_id")
    for col in ("shard", "pos", "__h"):
        with _pytest.raises(ValueError, match=col):
            shard_and_order(df.withColumn(col, F.lit(0)), "doc_id", 4)
    out = shard_and_order(df, "doc_id", 4)
    assert {"shard", "pos"} <= set(out.columns) and "__h" not in out.columns


def test_length_bucketed_packing_reserved_column_guard(spark):
    """ADVICE r8: length_bucketed_packing writes 'length_bucket'/'pack_id' —
    same clash contract as epoch_order/shard_and_order: collide ->
    ValueError instead of silently overwriting the caller's column."""
    import pytest as _pytest

    from duckpipe_spark.functions.sampling import length_bucketed_packing

    df = spark.range(10).selectExpr("id AS doc_id", "CAST(id + 3 AS BIGINT) AS n")
    for col in ("length_bucket", "pack_id"):
        with _pytest.raises(ValueError, match=col):
            length_bucketed_packing(df.withColumn(col, F.lit(0)), "n", 16)
    out = length_bucketed_packing(df, "n", 16)
    assert {"length_bucket", "pack_id"} <= set(out.columns)


class TestBM25:
    def test_bm25_matches_hand_computation(self, spark):
        from duckpipe_spark.functions.text import bm25_topk

        docs = spark.createDataFrame(
            [
                (1, "apple banana apple"),
                (2, "banana cherry"),
                (3, "apple apple apple apple"),
                (4, "durian elderberry fig"),
            ],
            "doc_id bigint, text string",
        )
        got = {
            (r.query_id, r.doc_id): (r.rank, r.score)
            for r in bm25_topk(docs, [(0, ["apple"])], k=10).collect()
        }
        # N=4, df(apple)=2, idf=(4-2+0.5)/(2+0.5)=1.0, avgdl=12/4=3
        def score(tf, dl):
            return round(1.0 * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0)), 6)

        assert got == {
            (0, 3): (1, score(4, 4)),  # tf=4 outranks tf=2
            (0, 1): (2, score(2, 3)),
        }

    def test_bm25_tie_breaks_on_doc_id(self, spark):
        from duckpipe_spark.functions.text import bm25_topk

        docs = spark.createDataFrame(
            [(7, "x y"), (3, "x y"), (5, "z")], "doc_id bigint, text string"
        )
        rows = bm25_topk(docs, [(0, ["x"])], k=10).collect()
        assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] == [3, 7]

    def test_bm25_multi_term_sums_ordered(self, spark):
        from duckpipe_spark.functions.text import bm25_topk

        docs = spark.createDataFrame(
            [(1, "apple banana"), (2, "apple"), (3, "banana banana")],
            "doc_id bigint, text string",
        )
        rows = {r.doc_id: r.score for r in bm25_topk(docs, [(0, ["apple", "banana"])], k=10).collect()}
        # doc 1 matches both terms: its score strictly exceeds single-term docs
        assert rows[1] > rows[2] and rows[1] > rows[3]
        assert set(rows) == {1, 2, 3}


def test_epoch_orders_differ_across_epochs(spark):
    """Different epochs produce genuinely different permutations; each is
    a total order per shard."""
    from duckpipe_spark.functions.sampling import epoch_order
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    o1 = {r.doc_id: (r.shard, r.pos) for r in epoch_order(docs, 1, 4).collect()}
    o2 = {r.doc_id: (r.shard, r.pos) for r in epoch_order(docs, 2, 4).collect()}
    assert set(o1) == set(o2)
    assert sum(1 for d in o1 if o1[d] != o2[d]) > len(o1) // 2
    by_shard = {}
    for d, (s, p) in o1.items():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s


def test_length_bucketed_packing_fill(spark):
    """Packs respect the budget in doc-count terms: within a bucket, a
    pack's token sum stays below budget + the largest member (the
    concat-and-chunk invariant), and buckets group similar lengths."""
    from duckpipe_spark.functions.sampling import length_bucketed_packing
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    import pyspark.sql.functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens")
    )
    out = length_bucketed_packing(toks, "n_tokens", 512).collect()
    for r in out:
        assert 2 ** (r.length_bucket - 1) <= r.n_tokens < 2 ** r.length_bucket
    packs = {}
    for r in out:
        packs.setdefault((r.length_bucket, r.pack_id), []).append(r.n_tokens)
    for (_, _), sizes in packs.items():
        assert sum(sizes) < 512 + max(sizes)
