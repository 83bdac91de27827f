"""End-to-end corpus curation pipeline: planted junk/dup/near-dup documents
are dropped, clean documents survive, counts reconcile per stage."""

import numpy as np
import pytest

from duckpipe_spark.functions.corpus import curate_corpus


@pytest.fixture(scope="module")
def corpus_docs(spark):
    rng = np.random.default_rng(23)
    vocab = ["the", "of", "and", "to", "in"] + [f"word{i}" for i in range(80)]
    rows = []
    # 30 clean english-ish docs
    for i in range(30):
        rows.append((i, " ".join(rng.choice(vocab, size=80))))
    # exact duplicate of doc 3 (whitespace noise, same fingerprint)
    rows.append((200, "  " + rows[3][1].replace(" ", "   ") + "  "))
    # near-duplicate of doc 7: 4 of 80 words changed
    w = rows[7][1].split()
    for j in (3, 20, 40, 60):
        w[j] = f"sub{j}"
    rows.append((201, " ".join(w)))
    # junk: too short
    rows.append((202, "tiny doc"))
    # junk: sentence-punctuation soup — punct_ratio component fails
    rows.append((203, "!!! ??? ,,, ;;; ::: !!! ??? ,,, ;;; ::: !!! ??? ,,, ;;; :::"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_curation_drops_planted_and_keeps_clean(spark, corpus_docs):
    # quality components are thirds: 0.7 requires all three (token count in
    # range, word length in range, low sentence-punct ratio)
    report = curate_corpus(corpus_docs, min_tokens=10, min_quality=0.7, jaccard_threshold=0.5)
    kept = {r["doc_id"] for r in report.corpus.select("doc_id").collect()}

    assert 202 not in kept  # too short
    assert 203 not in kept  # quality gate
    assert 200 not in kept and 3 in kept  # exact dup loses to canonical id
    assert 201 not in kept and 7 in kept  # near dup loses to smaller id
    # every other clean doc survives
    assert {i for i in range(30)} <= kept
    # stage counts reconcile
    assert report.n_input == 34
    assert report.n_after_quality == 32  # junk gone
    assert report.n_after_exact == 31  # exact dup gone
    assert report.n_after_neardup == 30  # near dup gone


def test_curation_lazy_mode_builds_without_action(spark, corpus_docs):
    report = curate_corpus(corpus_docs, collect_counts=False)
    assert report.n_input == -1
    assert len(report.corpus.columns) == 2


def _lehmer_bucket(doc_id: int) -> int:
    m = 2147483647
    x = ((doc_id % m) + m) % m + 1
    return ((x * 48271) % m) * 16807 % m % 100


def test_decontamination_flags_planted_overlap(spark):
    """A train doc that copies a 5-gram run from a benchmark doc must be
    flagged with the exact shared-ngram count; independent docs stay at 0."""
    from duckpipe_spark.functions.corpus import decontamination_stats

    bench_ids = [i for i in range(1000) if _lehmer_bucket(i) >= 90][:2]
    train_ids = [i for i in range(1000) if _lehmer_bucket(i) < 90][:3]
    leak = "alpha beta gamma delta epsilon zeta"  # 6 tokens → two 5-grams
    rows = [
        (bench_ids[0], f"one two three {leak} four five six"),
        (bench_ids[1], "seven eight nine ten eleven twelve thirteen"),
        # contaminated: contains the leaked 6-token run
        (train_ids[0], f"aaa bbb {leak} ccc ddd"),
        # clean train docs
        (train_ids[1], "kkk lll mmm nnn ooo ppp qqq rrr"),
        (train_ids[2], "sss ttt uuu vvv www xxx yyy zzz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in decontamination_stats(docs, k=5).collect()}
    assert set(got) == set(train_ids)
    assert got[train_ids[0]]["n_shared"] == 2  # both leaked 5-grams
    assert got[train_ids[1]]["n_shared"] == 0
    assert got[train_ids[2]]["n_shared"] == 0
    assert got[train_ids[0]]["contamination"] > 0


def test_boilerplate_planted_ngram(spark):
    """A 3-gram planted in ≥3 docs is boilerplate; docs built from unique
    vocabulary report zero boilerplate fraction."""
    from duckpipe_spark.functions.corpus import boilerplate_stats

    footer = "all rights reserved"
    rows = [(i, f"u{i}a u{i}b u{i}c u{i}d {footer}") for i in range(4)]
    rows.append((100, "clean one only here nothing shared at all"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in boilerplate_stats(docs, k=3, min_docs=3).collect()}
    for i in range(4):
        assert got[i]["n_boiler"] == 1 and got[i]["boiler_frac"] > 0
    assert got[100]["n_boiler"] == 0 and got[100]["boiler_frac"] == 0.0


def test_repetition_flags_degenerate_doc(spark):
    """An all-one-token doc maxes both signals; an all-distinct doc zeros
    the bigram signal and has top fraction 1/n."""
    from duckpipe_spark.functions.text import repetition_stats

    rows = [
        (1, " ".join(["spam"] * 20)),
        (2, " ".join(f"w{i}" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["dup_bigram_frac"] == pytest.approx(1 - 1 / 19)
    assert got[1]["top_token"] == "spam" and got[1]["top_token_frac"] == 1.0
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[2]["top_token"] == "w0" and got[2]["top_token_frac"] == pytest.approx(1 / 20)


def test_pii_scrub_planted_spans(spark):
    """Planted emails / phone groups / long digit runs are redacted and
    counted per class; clean text passes through byte-identical."""
    from duckpipe_spark.functions.text import scrub_pii

    rows = [
        (1, "contact me at jane.doe+x@example.org or bob@site.io thanks"),
        (2, "call +1 555 0100 1234 today"),
        (3, "ssn-ish 123456789 and card 4111111111111111 end"),
        (4, "perfectly clean text with n0 secrets at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert got[1]["n_email"] == 2 and "<PII>" in got[1]["text_scrubbed"]
    assert "example.org" not in got[1]["text_scrubbed"]
    assert got[2]["n_phone"] == 1 and "555" not in got[2]["text_scrubbed"]
    assert got[3]["n_id_number"] == 2
    assert "123456789" not in got[3]["text_scrubbed"]
    assert got[4]["n_email"] == got[4]["n_phone"] == got[4]["n_id_number"] == 0
    assert got[4]["text_scrubbed"] == rows[3][1]


def test_vocab_encode_roundtrip(spark):
    """Vocabulary ids are frequency-ranked with deterministic ties; encoding
    maps every position, OOV tokens get id 0, and decoding through the vocab
    reconstructs every in-vocabulary token."""
    from duckpipe_spark.functions.text import build_vocab, encode_docs

    rows = [
        (1, "b b b a a c rare1"),
        (2, "a b c c rare2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    vocab = build_vocab(docs, max_size=3)
    v = {r["token"]: (r["token_id"], r["n_occurrences"]) for r in vocab.collect()}
    # counts: b=4, a=3, c=3 → ids 1, 2, 3 (tie a<c broken lexicographically)
    assert v == {"b": (1, 4), "a": (2, 3), "c": (3, 3)}
    enc = encode_docs(docs, vocab).collect()
    assert len(enc) == 12  # every token position encoded
    ids_doc1 = [r["token_id"] for r in sorted(enc, key=lambda r: (r["doc_id"], r["pos"])) if r["doc_id"] == 1]
    assert ids_doc1 == [1, 1, 1, 2, 2, 3, 0]  # rare1 → OOV 0


def test_span_dedup_reconstruction_properties(spark):
    """(1) conservation: kept spans across the corpus == distinct span
    hashes; (2) reconstruction: a doc with nothing dropped rebuilds exactly
    its normalized text; (3) a full duplicate of an earlier doc loses ALL
    its spans (only the sub-window tail survives)."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.corpus import remove_duplicate_spans
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    w = 10
    out = remove_duplicate_spans(docs, window=w)

    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    ).withColumn("nwin", F.floor(F.size("t") / w).cast("int"))
    spans = toks.select(
        F.explode(
            F.when(F.col("nwin") > 0, F.sequence(F.lit(0), F.col("nwin") - 1))
            .otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        "t",
    ).select(F.concat_ws(" ", F.slice("t", F.col("i") * w + 1, w)).alias("span"))
    n_distinct = spans.select("span").distinct().count()
    agg = out.agg(
        F.sum("n_spans").alias("total"), F.sum("n_dropped").alias("dropped")
    ).collect()[0]
    assert agg.total - agg.dropped == n_distinct

    # append a verbatim duplicate of doc 0 with a higher id
    d0 = docs.where(F.col("doc_id") == 0)
    dup = d0.withColumn("doc_id", F.lit(10_000_000))
    out2 = remove_duplicate_spans(docs.unionByName(dup), window=w)
    r0 = out2.where(F.col("doc_id") == 0).collect()[0]
    rdup = out2.where(F.col("doc_id") == 10_000_000).collect()[0]
    norm0 = d0.select(F.concat_ws(" ", F.split(F.trim("text"), r"\s+")).alias("x")).collect()[0].x
    # original doc 0 keeps everything it kept before; the duplicate drops
    # every full window and keeps only the tail
    assert rdup.n_dropped == rdup.n_spans
    assert rdup.clean_text == " ".join(norm0.split(" ")[rdup.n_spans * w:])
    assert r0.n_spans == rdup.n_spans


def test_curate_counts_run_as_one_action(spark, corpus_docs, monkeypatch):
    """VERDICT r6 item 4: the audit funnel is ONE Spark action (a union of
    stage markers + single groupBy + collect), not four .count() jobs
    re-executing shared lineage. Pinned structurally: DataFrame.count must
    never fire, and exactly one collect-like action runs."""
    # Spark 4: instances are the classic subclass, which overrides the
    # parent's methods - patch the class that actually resolves.
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"collect": 0}
    real_collect = DataFrame.collect

    def no_count(self):
        raise AssertionError("curate_corpus must not use .count() actions")

    def counting_collect(self):
        calls["collect"] += 1
        return real_collect(self)

    monkeypatch.setattr(DataFrame, "count", no_count)
    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    report = curate_corpus(
        corpus_docs, min_tokens=10, min_quality=0.7, jaccard_threshold=0.5
    )
    assert report.n_input == 34 and report.n_after_neardup == 30
    assert calls["collect"] == 1, f"expected one funnel action, saw {calls}"


class TestMaskContaminatedSpans:
    def test_planted_contamination_masks_the_containing_span(self, spark):
        import pyspark.sql.functions as F

        from duckpipe_spark.functions.corpus import mask_contaminated_spans
        from duckpipe_spark.functions.sampling import lehmer_hash_col

        # find a benchmark-bucket id and two train-bucket ids under the
        # same deterministic split the operator uses
        ids = spark.range(1, 200).select(
            "id", (lehmer_hash_col(F.col("id")) % 100).alias("b")
        ).collect()
        bench_id = next(r.id for r in ids if r.b >= 90)
        train_ids = [r.id for r in ids if r.b < 90][:2]

        secret = "alpha bravo charlie delta echo"  # the leaked 5-gram
        filler = " ".join(f"w{i}" for i in range(10))          # span 0
        contaminated = filler + " " + secret + " " + " ".join(f"x{i}" for i in range(5))
        docs = spark.createDataFrame(
            [
                (bench_id, f"benchmark question: {secret} indeed"),
                (train_ids[0], contaminated),   # secret starts at pos 10 → span 1
                (train_ids[1], filler),         # clean control
            ],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.asDict() for r in mask_contaminated_spans(docs).collect()}
        assert bench_id not in got  # bench docs are not emitted
        bad = got[train_ids[0]]
        # 20 tokens = spans 0,1; the secret's k-grams start in span 1
        assert bad["n_spans"] == 2 and bad["n_masked"] == 1
        assert bad["clean_text"] == filler  # span 1 dropped, span 0 kept
        ok = got[train_ids[1]]
        assert ok["n_masked"] == 0 and ok["clean_text"] == filler

    def test_boundary_crossing_kgram_masks_both_spans(self, spark):
        import pyspark.sql.functions as F

        from duckpipe_spark.functions.corpus import mask_contaminated_spans
        from duckpipe_spark.functions.sampling import lehmer_hash_col

        ids = spark.range(1, 200).select(
            "id", (lehmer_hash_col(F.col("id")) % 100).alias("b")
        ).collect()
        bench_id = next(r.id for r in ids if r.b >= 90)
        train_id = next(r.id for r in ids if r.b < 90)
        secret = "alpha bravo charlie delta echo"
        # secret occupies pos 8..12: starts in span 0, ends in span 1 —
        # BOTH spans must drop (start-only masking would leak
        # "charlie delta echo" into the surviving span 1)
        pre = " ".join(f"w{i}" for i in range(8))
        post = " ".join(f"x{i}" for i in range(17))  # total 30 tokens, 3 spans
        docs = spark.createDataFrame(
            [(bench_id, f"benchmark: {secret} indeed"), (train_id, f"{pre} {secret} {post}")],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.asDict() for r in mask_contaminated_spans(docs).collect()}
        bad = got[train_id]
        assert bad["n_spans"] == 3 and bad["n_masked"] == 2
        # only span 2 (pure x-filler) survives
        assert bad["clean_text"] == " ".join(f"x{i}" for i in range(7, 17))

    def test_all_masked_doc_yields_empty_text(self, spark):
        import pyspark.sql.functions as F

        from duckpipe_spark.functions.corpus import mask_contaminated_spans
        from duckpipe_spark.functions.sampling import lehmer_hash_col

        ids = spark.range(1, 200).select(
            "id", (lehmer_hash_col(F.col("id")) % 100).alias("b")
        ).collect()
        bench_id = next(r.id for r in ids if r.b >= 90)
        train_id = next(r.id for r in ids if r.b < 90)
        secret = "alpha bravo charlie delta echo"
        docs = spark.createDataFrame(
            [(bench_id, secret), (train_id, secret)],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.asDict() for r in mask_contaminated_spans(docs).collect()}
        bad = got[train_id]
        # 5 tokens → no full span, tail is span 0 and it is contaminated
        assert bad["n_spans"] == 1 and bad["n_masked"] == 1
        assert bad["clean_text"] == ""


class TestStripBoilerplateLines:
    def test_planted_boilerplate_stripped_everywhere(self, spark):
        from duckpipe_spark.functions.corpus import strip_boilerplate_lines

        footer = "(c) example corp - all rights reserved"
        docs = spark.createDataFrame(
            [
                (1, f"real content one\n{footer}\nmore text"),
                (2, f"other article\n  {footer}  "),     # trim-normalized match
                (3, f"third doc\n{footer}\n"),
                (4, "unique doc\nwith its own footer"),
                (5, "\n\n"),                             # only empty lines
            ],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.asDict() for r in strip_boilerplate_lines(docs, min_docs=3).collect()}
        assert got[1] == {
            "doc_id": 1, "n_lines": 3, "n_stripped": 1,
            "clean_text": "real content one\nmore text",
        }
        assert got[2]["n_stripped"] == 1 and got[2]["clean_text"] == "other article"
        assert got[3]["n_stripped"] == 1 and got[3]["clean_text"] == "third doc"
        assert got[4]["n_stripped"] == 0 and got[4]["clean_text"] == "unique doc\nwith its own footer"
        assert got[5] == {"doc_id": 5, "n_lines": 0, "n_stripped": 0, "clean_text": ""}

    def test_duplicate_lines_within_one_doc_count_once_for_df(self, spark):
        from duckpipe_spark.functions.corpus import strip_boilerplate_lines

        # the same line 3x inside ONE doc is df=1, not boilerplate
        docs = spark.createDataFrame(
            [(1, "x\nx\nx"), (2, "y")], "doc_id bigint, text string"
        )
        got = {r.doc_id: r.asDict() for r in strip_boilerplate_lines(docs, min_docs=2).collect()}
        assert got[1]["n_stripped"] == 0 and got[1]["clean_text"] == "x\nx\nx"

    def test_fully_boilerplate_doc_becomes_empty(self, spark):
        from duckpipe_spark.functions.corpus import strip_boilerplate_lines

        docs = spark.createDataFrame(
            [(1, "same"), (2, "same"), (3, "same\nown")], "doc_id bigint, text string"
        )
        got = {r.doc_id: r.asDict() for r in strip_boilerplate_lines(docs, min_docs=3).collect()}
        assert got[1]["clean_text"] == "" and got[1]["n_stripped"] == 1
        assert got[3]["clean_text"] == "own"


def test_keep_best_election_shifts_exact_dup_survivor(spark):
    """election='keep_best' picks the higher-QUALITY copy of an exact
    duplicate, not the min id. Two copies share normalized text (same
    fingerprint); the LOWER id is punctuation-dense (punct/len > 0.1 —
    loses that quality point) while the HIGHER id pads the same content
    with extra whitespace, diluting punct/len under the threshold. min_id
    keeps doc 1; keep_best must keep doc 2 — and every downstream stage
    sees the shifted survivor."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.corpus import curation_pipeline
    from duckpipe_spark.functions.text import quality_points_col

    words = " ".join(f"w{i}," for i in range(30))  # one comma per word
    dup_lo = words                         # punct ratio ~1/4 > 0.1
    dup_hi = words.replace(" ", " " * 12)  # same tokens, diluted ratio
    # ids 2/3/4 all hash into the decontamination TRAIN split
    # (lehmer(id) %% 100 < 90) so the bench-split drop cannot mask the
    # election difference (id 1 lands in the bench split)
    docs = spark.createDataFrame(
        [(2, dup_lo, "en"), (3, dup_hi, "en"),
         (4, "a totally different clean document body with plenty of words here", "en")],
        "doc_id bigint, text string, lang string",
    )
    qp = {r.doc_id: r.q for r in docs.select(
        "doc_id", quality_points_col(F.col("text")).alias("q")).collect()}
    assert qp[3] > qp[2], qp  # the planted quality asymmetry holds
    kw = dict(min_tokens=5, min_points=2, span_window=10, decontam_k=5,
              bench_bucket_min=90, max_contamination=1.0,
              mix_weights={"en": 1}, n_shards=1, persist_stages=False)
    min_ids = {r.doc_id for r in curation_pipeline(docs, **kw).collect()}
    best_ids = {r.doc_id for r in curation_pipeline(docs, election="keep_best", **kw).collect()}
    assert 2 in min_ids and 3 not in min_ids
    assert 3 in best_ids and 2 not in best_ids
    assert 4 in min_ids and 4 in best_ids
    import pytest as _pytest

    with _pytest.raises(ValueError, match="election"):
        curation_pipeline(docs, election="bogus", **kw).collect()


def test_winnow_decontam_flags_planted_verbatim_run(spark):
    """winnow_decontaminate: doc id 1 lands in the Lehmer bench split
    (bucket 94 >= 90); train doc 2 (bucket 44) shares a verbatim
    w+k-1 = 6-token run with it and MUST be flagged (the winnowing
    guarantee), train doc 3 (bucket 41) shares nothing and must not be.
    Bench docs are absent from the output."""
    from duckpipe_spark.functions.corpus import winnow_decontaminate

    leak = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"bench text starts {leak} and keeps going onward"),  # bench
            (2, f"train doc leading words {leak} trailing words here"),
            (3, "entirely clean training document with unique words only"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in winnow_decontaminate(docs, k=3, w=4).collect()}
    assert set(out) == {2, 3}
    assert out[2].contaminated == 1 and out[2].n_shared >= 1
    assert out[3].contaminated == 0 and out[3].n_shared == 0
    assert out[2].n_fp >= out[2].n_shared
