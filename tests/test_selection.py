"""Semantics tests for the data-selection operators (functions/selection.py):
hand-checkable fixtures pin WHAT each score means, independent of the
oracle-equivalence gate (which pins only that both engines agree)."""

import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


# --- CCNet-shape bigram LM ---------------------------------------------------


def test_lm_in_domain_doc_outscores_out_of_domain(spark):
    from duckpipe_spark.functions.selection import lm_quality_score

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the mat", "en"),
        (3, "the cat sat on the mat", "xx"),  # scored only: pure train bigrams
        (4, "zq wv xj kq pf bn", "xx"),  # scored only: zero train bigrams
    ]
    out = {r.id: r for r in lm_quality_score(_docs(spark, rows), F.col("lang") == "en").collect()}
    assert out[3].lm_score > out[4].lm_score
    # identical text => identical score regardless of train membership
    assert out[1].lm_score == out[3].lm_score
    assert out[1].n_bigrams == 5


def test_lm_hand_computed_probability(spark):
    from duckpipe_spark.functions.selection import lm_quality_score

    # train: one doc "a b a b"; bigrams: (a,b)x2, (b,a)x1; prefix counts
    # a->2, b->1; V = 2. score doc "a b": p(b|a) = (2+1)/(2+2) = 0.75
    rows = [(1, "a b a b", "en"), (2, "a b", "xx")]
    out = {r.id: r for r in lm_quality_score(_docs(spark, rows), F.col("lang") == "en").collect()}
    assert out[2].lm_score == pytest.approx(0.75)
    # unseen bigram in doc "b b": p(b|b) = (0+1)/(1+2) = 1/3
    rows.append((3, "b b", "xx"))
    out = {r.id: r for r in lm_quality_score(_docs(spark, rows), F.col("lang") == "en").collect()}
    assert out[3].lm_score == pytest.approx(round(1 / 3, 6))


def test_lm_short_docs_are_absent(spark):
    from duckpipe_spark.functions.selection import lm_quality_score

    rows = [(1, "a b c", "en"), (2, "single", "en")]
    ids = {r.id for r in lm_quality_score(_docs(spark, rows), F.col("lang") == "en").collect()}
    assert ids == {1}


# --- DSIR importance ---------------------------------------------------------


def test_dsir_target_like_doc_scores_higher(spark):
    from duckpipe_spark.functions.selection import dsir_scores

    # target vocabulary {aa bb}, raw-only vocabulary {zz yy}: a doc made of
    # target-frequent tokens must outweigh a doc of raw-only tokens
    rows = [
        (1, "aa bb aa bb aa bb", "en"),
        (2, "aa bb aa bb", "en"),
        (3, "aa bb aa bb", "xx"),  # target-like, not in target
        (4, "zz yy zz yy", "xx"),  # raw-only
    ]
    out = {r.id: r for r in dsir_scores(_docs(spark, rows), F.col("lang") == "en").collect()}
    assert out[3].dsir_score > out[4].dsir_score
    assert out[3].n_tokens == 4
    # identical hashed-feature vectors => identical score
    assert out[2].dsir_score == out[3].dsir_score


def test_dsir_score_sign_matches_direction(spark):
    from duckpipe_spark.functions.selection import dsir_scores

    # the surrogate keeps log(p/q)'s zero set: a token distribution
    # identical to the corpus-wide one scores ~0; raw-only tokens (absent
    # from target) get negative weight
    rows = [(1, "aa", "en"), (2, "zz", "xx")]
    out = {r.id: r for r in dsir_scores(_docs(spark, rows), F.col("lang") == "en").collect()}
    assert out[1].dsir_score > 0 > out[2].dsir_score


# --- keep-best duplicate resolution -----------------------------------------


def test_keep_best_prefers_quality_not_min_id(spark):
    from duckpipe_spark.functions.selection import dedup_keep_best

    # two near-identical docs; the LOWER id is the LOWER quality one (its
    # punctuation tail fails the punct-ratio check), so keep-best must pick
    # the HIGHER id — the opposite of min-id survivorship. Texts share
    # enough 3-shingles to LSH-pair.
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base + " ....!!!!....!!!!....", "en"),  # high punct ratio -> fewer points
        (2, base, "en"),
    ]
    out = {r.doc_id: r for r in dedup_keep_best(_docs(spark, rows)).collect()}
    assert out[1].component == out[2].component == 1
    assert out[2].is_kept and not out[1].is_kept
    assert out[2].qp > out[1].qp


def test_keep_best_singletons_all_kept(spark):
    from duckpipe_spark.functions.selection import dedup_keep_best

    rows = [
        (1, "completely unique first document text here", "en"),
        (2, "another entirely different second document body", "en"),
    ]
    out = dedup_keep_best(_docs(spark, rows)).collect()
    assert all(r.is_kept for r in out)
    assert {r.component for r in out} == {1, 2}


# --- prototypicality pruning -------------------------------------------------


def test_prototype_prune_drops_nearest_quarter(spark):
    from duckpipe_spark.functions.selection import prototype_prune

    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    out = prototype_prune(load_table(spark, SF_SMOKE, "embeddings"), k=4, iters=1).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    assert len(by_cell) >= 2
    for cell, rows in by_cell.items():
        n = len(rows)
        dropped = sorted(r.cell_rank for r in rows if not r.is_kept)
        # exactly floor(n/4) pruned, and they are the SMALLEST ranks
        # (most prototypical = closest to centroid)
        assert dropped == list(range(1, n // 4 + 1)), (cell, n, dropped)
        ranked = sorted(rows, key=lambda r: r.cell_rank)
        dists = [r.dist for r in ranked]
        assert dists == sorted(dists)


def test_lm_map_model_scoring_bit_identical_to_join_path(spark):
    """lm_score_with_model (pure-projection scoring against the 1-row map
    model) equals lm_quality_score (broadcast-join scoring) bit-for-bit:
    the projection's left-to-right array fold IS the position-ordered sum
    the join path materializes via sort-by-pos."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import (
        lm_quality_score,
        lm_score_with_model,
        lm_train,
    )
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import canonicalize

    docs = load_table(spark, SF_SMOKE, "documents")
    pred = F.col("lang") == "en"
    a = lm_quality_score(docs, pred)
    b = lm_score_with_model(docs, lm_train(docs, pred))
    assert canonicalize(a.toPandas()) == canonicalize(b.toPandas())


def test_fim_transform_reassembles_to_original(spark):
    """PSM pieces re-concatenate (prefix + middle + suffix) to the exact
    token stream, per document — the lossless-ness FIM training depends
    on — and pass-through docs keep natural order."""
    from duckpipe_spark.functions.text import fim_transform
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = fim_transform(docs, fim_rate_pct=50).collect()
    orig = {r.doc_id: " ".join(r.text.split()) for r in docs.collect()}
    n_applied = 0
    for r in out:
        if r.fim_applied:
            n_applied += 1
            assert r.fim_text.startswith("<PRE> ")
            pre, rest = r.fim_text[len("<PRE> "):].split(" <SUF> ", 1)
            suf, mid = rest.split(" <MID> ", 1)
            reassembled = " ".join(x for x in (pre, mid, suf) if x)
            assert reassembled == orig[r.doc_id], r.doc_id
        else:
            assert r.fim_text == orig[r.doc_id]
    assert 0 < n_applied < len(out)


def test_lm_count_floor_prune_bounds_model(spark):
    """VERDICT r8 item 5 contract: min_count=2 drops singleton bigram types
    from the big map (bounding the broadcast), keeps uni/v full, leaves
    surviving counts identical — and the pruned map model scores
    bit-identically to the pruned join path."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import (
        lm_quality_score,
        lm_score_with_model,
        lm_train,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b", "en"),   # (a,b)x3, (b,a)x2 — survive the floor
            (2, "c d e f", "en"),       # all singleton bigrams — pruned
            (3, "a b c d", "fr"),       # scored only
        ],
        "doc_id bigint, text string, lang string",
    )
    pred = F.col("lang") == "en"
    full = lm_train(docs, pred).collect()[0]
    pruned = lm_train(docs, pred, min_count=2).collect()[0]
    assert len(pruned.big) < len(full.big), "floor must drop singleton types"
    for bk, c in pruned.big.items():
        assert full.big[bk] == c and c >= 2
    assert pruned.uni == full.uni and pruned.v == full.v, "denominator stays full"
    a = {r.id: r for r in lm_quality_score(docs, pred, min_count=2).collect()}
    b = {r.id: r for r in lm_score_with_model(
        docs, lm_train(docs, pred, min_count=2)).collect()}
    assert set(a) == set(b)
    for k in a:
        assert (a[k].n_bigrams, a[k].lm_score) == (b[k].n_bigrams, b[k].lm_score), k
    # pruned score never exceeds unpruned (numerators only shrink)
    u = {r.id: r.lm_score for r in lm_quality_score(docs, pred).collect()}
    for k in a:
        assert a[k].lm_score <= u[k] + 1e-12


def test_dsir_model_scores_unseen_buckets(spark):
    """ADVICE r8 (medium): the trained model must carry FULL 0..B-1 bucket
    support — a served document whose tokens hash to buckets the train
    batch never populated previously got element_at -> NULL, which poisoned
    the whole fold and made dsir_score NULL. Train on a tiny corpus, score
    a document made of train-unseen tokens: every score must be non-NULL
    and the unseen-bucket ratio must be the add-one smoothed value at
    r = t = 0, i.e. ((big_r + B) - (big_t + B)) / (big_t + B)."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import dsir_score_with_model, dsir_train

    train = spark.createDataFrame(
        [(1, "alpha beta alpha", "en"), (2, "gamma beta", "fr")],
        "doc_id bigint, text string, lang string",
    )
    model = dsir_train(train, F.col("lang") == "en", n_buckets=8)
    row = model.collect()[0]
    assert len(row.lr) == 8, "model must have full bucket support"
    # big_r = 5 train tokens, big_t = 3 target tokens, B = 8
    expected_unseen = ((5 + 8) - (3 + 8)) / (3 + 8)
    serve = spark.createDataFrame(
        [(10, "zzzqx wvvvk zzzqx")], "doc_id bigint, text string"
    )
    out = dsir_score_with_model(serve, model).collect()
    assert len(out) == 1 and out[0].dsir_score is not None
    # if ALL serve tokens land in train-unseen buckets, the mean equals the
    # unseen ratio exactly; tokens may collide into seen buckets, so only
    # assert non-NULL plus the model map containing the smoothed value
    assert any(abs(v - expected_unseen) <= 1e-9 for v in row.lr.values())


def test_dsir_model_scoring_agrees_with_batch(spark):
    """dsir_score_with_model (projection over the 1-row B-bucket map)
    agrees with dsir_scores to the 6-dp contract on the fixture corpus
    (the fold orders differ only in c·x vs repeated-addition ulps)."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import (
        dsir_score_with_model,
        dsir_scores,
        dsir_train,
    )
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    pred = F.col("lang") == "en"
    a = {r.id: r for r in dsir_scores(docs, pred).collect()}
    b = {r.id: r for r in dsir_score_with_model(docs, dsir_train(docs, pred)).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k].n_tokens == b[k].n_tokens
        assert abs(a[k].dsir_score - b[k].dsir_score) <= 1e-6, k


def test_unimax_water_filling_hand_case(spark):
    """Hand-computed water-filling: avail = {a: 10, b: 100, c: 1000},
    E=2 -> caps {20, 200, 2000}, budget 600. Sorted asc: a capped
    (20*3 <= 600-0), b capped (200*2 <= 600-20), c uncapped ->
    level = (600-220)/1 = 380. Epochs: a=2.0, b=2.0, c=0.38."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import unimax_allocation

    rows = []
    did = 0
    for lang, toks in (("a", 10), ("b", 100), ("c", 1000)):
        rows.append((did, " ".join(["w"] * toks), lang))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r.lang: r for r in unimax_allocation(docs, budget=600, max_epochs=2).collect()}
    assert out["a"].cap_tokens == 20 and out["a"].alloc_tokens == 20.0
    assert out["b"].cap_tokens == 200 and out["b"].alloc_tokens == 200.0
    assert out["c"].alloc_tokens == 380.0
    assert out["a"].epochs == 2.0 and out["b"].epochs == 2.0
    assert abs(out["c"].epochs - 0.38) < 1e-9
    # budget exceeding total cap: everyone capped at E x avail
    out2 = {r.lang: r for r in unimax_allocation(docs, budget=10**9, max_epochs=2).collect()}
    assert all(out2[lang].alloc_tokens == out2[lang].cap_tokens for lang in out2)


def test_score_auc_hand_cases(spark):
    """Perfect separation -> 1.0; anti-separation -> 0.0; all-tied -> 0.5;
    a mixed tie gets half credit (exact Mann-Whitney)."""
    from duckpipe_spark.functions.selection import score_auc

    def auc(rows):
        df = spark.createDataFrame(rows, "id bigint, score double, y boolean")
        return score_auc(df, label_col="y", score_col="score").collect()[0]

    r = auc([(1, 1.0, True), (2, 2.0, True), (3, 0.5, False), (4, 0.1, False)])
    assert r.auc == 1.0 and r.n_pos == 2 and r.n_neg == 2
    assert auc([(1, 0.1, True), (2, 0.2, True), (3, 5.0, False), (4, 9.0, False)]).auc == 0.0
    assert auc([(1, 3.0, True), (2, 3.0, True), (3, 3.0, False), (4, 3.0, False)]).auc == 0.5
    # pos at 2.0, neg at {1.0, 2.0}: beats one outright, ties the other -> 0.75
    assert auc([(1, 2.0, True), (2, 1.0, False), (3, 2.0, False)]).auc == 0.75


def test_score_auc_ignores_null_scores(spark):
    """ADVICE r9 item 2: NULL scores carry no ranking information and the
    engines disagree on where they'd sort (Spark windows put NULLs first
    ascending, DuckDB's ORDER BY puts them last) — score_auc must drop
    them, i.e. equal the AUC of the non-NULL subset, with n_pos/n_neg
    counting only scored rows."""
    from duckpipe_spark.functions.selection import score_auc

    rows = [
        (1, 1.0, True),
        (2, 2.0, True),
        (3, 0.5, False),
        (4, 0.1, False),
        (5, None, True),   # unscored — must not count anywhere
        (6, None, False),
    ]
    df = spark.createDataFrame(rows, "id bigint, score double, y boolean")
    r = score_auc(df, label_col="y", score_col="score").collect()[0]
    clean = score_auc(
        df.where("score IS NOT NULL"), label_col="y", score_col="score"
    ).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (clean.n_pos, clean.n_neg, clean.auc) == (2, 2, 1.0)


def test_curation_lm_gate_min_count_contract(spark):
    """VERDICT r9 item 3: curation_pipeline must FORWARD lm_min_count to
    the gate's LM. Corpus built so one doc scores above the gate floor
    only under the UNPRUNED model (its bigrams are singletons — pruning
    sends them to the unseen-bigram backoff): with lm_min_count=1 it
    survives, with lm_min_count=2 it drops. Also the boundedness contract:
    the pruned broadcast map's size <= train_bigram_tokens / min_count."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.corpus import curation_pipeline
    from duckpipe_spark.functions.selection import lm_quality_score, lm_train

    # 12+ tokens (gate floor 10), quality-point-clean texts
    common = "the cat sat on the mat and the dog sat on the mat"
    rare = "zq xv qk jw ba ce dg fh ik lm no pr"  # 11 singleton bigram types
    docs = spark.createDataFrame(
        [(1, common, "en"), (2, common, "en"), (3, rare, "en")],
        "doc_id bigint, text string, lang string",
    )
    pred = F.col("lang") == "en"
    s_full = {r.id: r.lm_score for r in lm_quality_score(docs, pred).collect()}
    s_pruned = {
        r.id: r.lm_score for r in lm_quality_score(docs, pred, min_count=2).collect()
    }
    # pick a floor between doc 3's pruned and unpruned scores
    assert s_pruned[3] < s_full[3], (s_pruned, s_full)
    floor = (s_pruned[3] + s_full[3]) / 2
    kept_1 = {
        r.doc_id
        for r in curation_pipeline(
            docs, lm_min_score=floor, lm_min_count=1, persist_stages=False
        ).collect()
    }
    kept_2 = {
        r.doc_id
        for r in curation_pipeline(
            docs, lm_min_score=floor, lm_min_count=2, persist_stages=False
        ).collect()
    }
    assert 3 in kept_1 and 3 not in kept_2, (kept_1, kept_2)
    # boundedness: |pruned big map| <= train bigram tokens / min_count
    pruned = lm_train(docs, pred, min_count=2).collect()[0]
    n_bigram_tokens = sum(
        len(t.split()) - 1 for t in (common, common, rare)
    )
    assert len(pruned.big) <= n_bigram_tokens / 2


def test_lm_auc_finds_its_training_domain(spark):
    """The registered doc_lm_auc semantics: an en-trained LM must rank en
    docs above non-en far better than chance on the fixture corpus
    (measured 0.89 at sf0.001 — the synthetic langs share vocabulary, so
    perfect separation is not expected; chance would be 0.5)."""
    from duckpipe_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    r = REGISTRY["doc_lm_auc"].fn(spark, SF_SMOKE).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert r.auc > 0.8, r.auc


def test_lm_bucket_sample_exactly_k_per_stratum(spark):
    """doc_lm_bucket_sample semantics on the fixture corpus: every
    (lang, bucket) stratum contributes min(k, |stratum|) docs, sample
    ranks are 1..n within each stratum, and the draw is deterministic."""
    from duckpipe_spark.queries import REGISTRY
    from duckpipe_spark.queries.selection_q import _BUCKET_SAMPLE_K
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["doc_lm_bucket_sample"].fn(spark, SF_SMOKE).collect()
    assert rows
    by_stratum: dict = {}
    for r in rows:
        by_stratum.setdefault((r.lang, r.lm_bucket), []).append(r.sample_rank)
    buckets_full = REGISTRY["doc_lm_buckets"].fn(spark, SF_SMOKE).collect()
    sizes: dict = {}
    for r in buckets_full:
        sizes[(r.lang, r.lm_bucket)] = sizes.get((r.lang, r.lm_bucket), 0) + 1
    for key, ranks in by_stratum.items():
        want = min(_BUCKET_SAMPLE_K, sizes[key])
        assert sorted(ranks) == list(range(1, want + 1)), (key, ranks)
    assert set(by_stratum) == set(sizes)  # every stratum represented
    again = REGISTRY["doc_lm_bucket_sample"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_lm_and_dsir_arrow_kernels_bit_identical_to_hof(spark):
    """Optimization r15: the mapInPandas hash kernels (memoized word fold,
    batch pre-aggregation) and the all-JVM expression twins produce
    identical rows — including NULL text, empty text, and the
    leading-tab row whose '' token (hash 0) the space-only trim keeps."""
    from duckpipe_spark.functions.selection import dsir_scores, lm_quality_score

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "le chat est la", "fr"),
        (3, None, "en"),
        (4, "", "en"),
        (5, "\tcat dog", "en"),     # leading tab -> leading '' token
        (6, "cat dog\t", "fr"),     # trailing tab -> trailing '' token
        (7, "solo", "en"),          # 1 token: no bigram
        (8, "THE CAT the cat", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    pred = F.col("lang") == "en"
    a = sorted(map(tuple, lm_quality_score(docs, pred, impl="arrow").collect()))
    h = sorted(map(tuple, lm_quality_score(docs, pred, impl="hof").collect()))
    assert a == h and len(a) > 0
    da = sorted(map(tuple, dsir_scores(docs, pred, impl="arrow").collect()))
    dh = sorted(map(tuple, dsir_scores(docs, pred, impl="hof").collect()))
    assert da == dh and len(da) > 0
