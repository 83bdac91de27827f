"""Data-selection operators: model-based quality scoring and importance
weighting for training-corpus curation (SURVEY.md §2.14 extension — the
reference has no selection surface; these are the "which documents do we
actually train on" ops that sit between hygiene and sampling in a 100 TB
pipeline).

Three published recipes, re-expressed Spark-first:

- ``lm_quality_score`` — CCNet-style (Wenzek et al., 2019) n-gram
  language-model scoring: train a bigram LM on an in-domain reference
  subset, score every document by how expected its text is under that LM.
- ``dsir_scores`` — DSIR-style (Xie et al., 2023) hashed-n-gram importance
  weights: how much more target-like than corpus-like each document's
  hashed unigram distribution is.
- ``dedup_keep_best`` — the curation DECISION on top of near-dup clusters:
  instead of keeping the min-id doc per duplicate cluster, keep the
  highest-quality member (the choice real pipelines make).

Shared determinism constraints (same as functions/sampling.py and the BM25
scorer in functions/text.py): every float is derived from exact integer
aggregates through ONE mirrored expression tree, per-document sums are
ORDERED left folds (by token position / bucket id), and no float ``ln()``
appears anywhere — both LM and DSIR scores are kept rational (probability
domain / first-order log-ratio surrogate) so Spark and DuckDB compute
identical doubles without trusting libm ulps. Results round to 6 dp before
comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from duckpipe_spark.functions.dedup import POLY_BASE, POLY_MOD, WORD_BASE, char_poly_hash

# hashed-feature bucket count for DSIR (mirrored into oracle SQL)
DSIR_BUCKETS = 512

# Java ASCII \s — the exact class tokens_col/_lower_tokens split on
_WS_CLASS = r"[ \t\n\x0b\f\r]+"


def _lower_token_list(text: str):
    """Python twin of ``_lower_tokens`` for the Arrow kernels: lower,
    trim SPACES ONLY (Spark trim), split on Java ASCII \\s keeping the
    leading/trailing empties the JVM split(limit=-1) keeps — the ''
    token hashes to 0 and is COUNTED by the hof twins, so the kernels
    must not filter it."""
    import re

    return re.split(_WS_CLASS, text.lower().strip(" "))


def _make_whash():
    """Per-task memoized 31-base char-fold (the exact ``char_poly_hash``
    integers): the corpus vocabulary is far smaller than its token count,
    so the interpreted-per-element JVM fold cost collapses to one dict
    lookup per occurrence (the shingle-kernel precedent, guide §4.2)."""
    cache: dict[str, int] = {}

    def whash(w: str) -> int:
        h = cache.get(w)
        if h is None:
            h = 0
            for ch in w:
                h = (h * POLY_BASE + ord(ch)) % POLY_MOD
            cache[w] = h
        return h

    return whash


def _lower_tokens(text_col: str) -> Column:
    """Lower-cased whitespace tokens (the BM25 convention: trim first so
    both engines agree on leading/trailing empties)."""
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def _bigram_cols(text_col: str) -> tuple[Column, Column]:
    """(bk_array, pk_array): position-ordered bigram / prefix hash arrays
    of the lower-cased tokens. Built from SLICES of the once-computed
    word-hash array (each slice re-evaluates the transform O(n) once —
    never the element_at-per-reference O(n²) trap shingle_hash_array's
    HOF path documents)."""
    t = _lower_tokens(text_col)
    wh = F.transform(t, lambda w: char_poly_hash(w))
    n = F.size(t)
    left = F.slice(wh, 1, n - 1)
    right = F.slice(wh, 2, n - 1)
    bks = F.zip_with(left, right, lambda a, b: (a * WORD_BASE + b) % POLY_MOD)
    return bks, left


def lm_train(
    docs: DataFrame,
    train_pred: Column,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Train the add-one bigram LM of ``lm_quality_score`` → ONE model row
    (big: map<bigram_hash, count>, uni: map<prefix_hash, count>, v:
    vocabulary size). The maps carry exactly the bytes a broadcast join of
    the count tables would ship; packaging them as one row makes scoring a
    stateless stream-static cross join — the shape an inference service
    (or a Structured Streaming score-on-arrival pipeline) wants.

    SIZE BOUND (VERDICT r8 item 5): the ``big`` map is bigram-TYPE-count
    bounded, which on a diverse web-scale train slice grows roughly
    linearly with train tokens (most bigram types are singletons — Zipf).
    ``min_count`` is the CCNet-style count-floor prune: bigram types seen
    fewer than ``min_count`` times are dropped from ``big`` (scoring then
    smooths them to (0+1)/(c_uni+V), exactly as if unseen). With
    ``min_count >= 2`` the map size is bounded by train_bigram_tokens /
    min_count — and in practice collapses by the singleton mass (~the
    majority of types). ``uni`` and ``v`` stay UNPRUNED: the denominator
    keeps full counts, so surviving probabilities are identical to the
    unpruned model's (the prune only flattens rare-bigram numerators,
    never re-normalizes survivors). min_count=1 (default) is the exact
    unpruned model.

    The pruned model stays a DataFrame — callers joining it against a
    stream should ``.persist()`` it (and unpersist after) so the train
    lineage doesn't re-execute per micro-batch. A train subset with no
    bigrams at all yields V = 0 and NULL scores (0/0) — the same
    degenerate contract as the join path; train on a non-empty in-domain
    slice."""
    # ONE pass over the train slice (VERDICT r13 item 3): each document
    # row emits its bigram keys (kind 'b'), its prefix keys (kind 'u')
    # AND its word hashes (kind 'w') as one concatenated entry array, so
    # a single explode + a single grouped count feeds ALL THREE model
    # components — the maps assemble from the vocabulary-bounded result
    # in one final aggregation, and V is simply the number of grouped
    # rows with kind 'w' (each distinct word hash is one group). The
    # earlier shape computed V via a SECOND tokenize+explode over the
    # train slice (the pair stream alone cannot see a document's last
    # token, nor single-token documents — exactly the rows the 'w'
    # entries add).
    t = _lower_tokens(text_col)
    wh = F.transform(t, lambda w: char_poly_hash(w))
    n = F.size(t)
    left = F.slice(wh, 1, n - 1)
    right = F.slice(wh, 2, n - 1)
    bks = F.zip_with(left, right, lambda a, b: (a * WORD_BASE + b) % POLY_MOD)
    entries = F.concat(
        F.transform(bks, lambda x: F.struct(F.lit("b").alias("kind"), x.alias("key"))),
        F.transform(left, lambda x: F.struct(F.lit("u").alias("kind"), x.alias("key"))),
        F.transform(wh, lambda x: F.struct(F.lit("w").alias("kind"), x.alias("key"))),
    )
    kk = (
        docs.where(train_pred)
        .select(F.explode(entries).alias("e"))
        .select("e.kind", "e.key")
    )
    counts = kk.groupBy("kind", "key").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    if min_count > 1:  # the floor prunes BIGRAM types only (see above)
        counts = counts.where((F.col("kind") != "b") | (F.col("c") >= min_count))
    # collect_list skips the NULLs the non-matching kinds produce
    return (
        counts.groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.when(F.col("kind") == "b", F.struct("key", "c")))
            ).alias("big"),
            F.map_from_entries(
                F.collect_list(F.when(F.col("kind") == "u", F.struct("key", "c")))
            ).alias("uni"),
            F.coalesce(
                F.sum(F.when(F.col("kind") == "w", 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("v"),
        )
    )


def lm_score_with_model(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a pre-trained ``lm_train`` model → (id,
    n_bigrams, lm_score), bit-identical to ``lm_quality_score`` (pytest
    pins it): the projection's left-to-right array fold IS the
    position-ordered sum the batch path materializes via sort-by-pos.

    This is a PURE PROJECTION over a stateless 1-row cross join — no
    explode, no per-doc re-aggregation — so it runs unchanged on a
    Structured Streaming DataFrame in append mode (train on batch, score
    the stream: the train/serve split every production scorer has)."""
    bks, pks = _bigram_cols(text_col)
    p_of = lambda bk, pk: (  # noqa: E731 - local expression builder
        (F.coalesce(F.element_at("big", bk), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.element_at("uni", pk), F.lit(0)) + F.col("v"))
    )
    total = F.aggregate(
        F.zip_with(F.col("_bks"), F.col("_pks"), p_of),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nb = F.size("_bks").cast("bigint")
    return (
        docs.select(F.col(id_col).alias("id"), bks.alias("_bks"), pks.alias("_pks"))
        .where(F.size("_bks") >= 1)
        .crossJoin(F.broadcast(model))
        .select("id", nb.alias("n_bigrams"), F.round(total / nb, 6).alias("lm_score"))
    )


def lm_quality_score(
    docs: DataFrame,
    train_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
    impl: str = "arrow",
) -> DataFrame:
    """CCNet-shape bigram-LM quality score → (id, n_bigrams, lm_score).

    Train an add-one-smoothed bigram language model on the reference subset
    ``docs.where(train_pred)`` (CCNet trains KenLM on Wikipedia; here the
    reference subset is a predicate over the same table), then score every
    document with ≥2 tokens by its mean per-bigram probability

        p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

    where c(w1 w2) / c(w1 ·) are train bigram / bigram-prefix counts and V
    is the train token vocabulary size. The score is the per-document MEAN
    of these probabilities — monotone "more in-domain = higher", like
    CCNet's negative perplexity, but rational end-to-end: each p is one
    IEEE division of exact integers, and the per-doc sum is an ordered
    fold over token position, so both engines produce identical doubles
    (the same no-ln() argument as the non-log Robertson idf in
    ``bm25_topk``). A log-domain perplexity is a driver-side map away if a
    calibrated scale is needed; the *ranking* a filter consumes needs only
    a deterministic monotone score.

    Words are reduced to their 31-base char-fold hashes (``char_poly_hash``)
    and bigrams to ``(h1·WORD_BASE + h2) mod 1e9+7`` — the corpus never
    shuffles strings, only bigints, and hash collisions merge counts
    identically in both engines (the same hashed-LM quantization KenLM-style
    deployments accept).

    Scale shape (r14, measured at sf0.1): ONE pass over the train slice
    builds a single vocabulary-bounded (kind, key, count) table — the
    same concatenated b/u/w kind stream as ``lm_train`` — which is
    materialized once with a ``localCheckpoint`` (bounded by the SAME
    vocabulary-size argument that lets the count tables broadcast at
    all, so the checkpoint adds no new memory wall) and then sliced into
    the bigram/prefix/vocab broadcast inputs without re-executing the
    explode (Spark did not reuse the three branch exchanges: 4 runtime
    parquet scans before, 2 after — the full corpus scoring scan plus
    this one train-slice scan). Scoring stays the EXPLODED broadcast-join
    pipeline: corpus explode → two broadcast joins → one groupBy(id)
    with the position-ordered fold. The 1-row-model serve path
    (``lm_score_with_model``) computes bit-identical scores (pytest pins
    it) but evaluates its per-document array fold outside whole-stage
    codegen, which measures ~3x slower per corpus pass at sf0.1 — the
    exploded pipeline is the batch shape, the model row the
    streaming/serve shape.
    """
    # train side: one explode pass over the train slice → (kind, key, c),
    # materialized once, sliced three ways (values identical to the
    # separate big/uni/vstats aggregations by construction).
    #
    # impl="arrow" (optimization r15, guide §4.2 — the shingle-kernel
    # precedent): both the train entry stream and the corpus bigram
    # stream are per-token 31-base char folds that the JVM evaluates as
    # an interpreted higher-order expression per occurrence — the
    # measured cost of this query. The kernels compute the exact same
    # integers with a per-task memoized word hash (once per DISTINCT
    # word) and, train-side, pre-aggregate per batch so the exchange
    # shrinks. Floats never enter the kernels; the probability math and
    # the position-ordered fold stay in the JVM unchanged, so scores are
    # bit-identical (pinned by tests + the oracle).
    id_type = docs.schema[id_col].dataType.simpleString()
    use_arrow = (
        impl == "arrow"
        and not docs.isStreaming
        and id_type in ("bigint", "int", "smallint", "tinyint")
    )
    if use_arrow:
        def _train_map(pdf_iter):
            import pandas as pd

            whash = _make_whash()
            for pdf in pdf_iter:
                agg: dict[tuple[str, int], int] = {}
                for text in pdf.iloc[:, 0]:
                    if not isinstance(text, str):
                        continue
                    ws = [whash(w) for w in _lower_token_list(text)]
                    for i in range(len(ws) - 1):
                        bk = (ws[i] * WORD_BASE + ws[i + 1]) % POLY_MOD
                        agg[("b", bk)] = agg.get(("b", bk), 0) + 1
                        agg[("u", ws[i])] = agg.get(("u", ws[i]), 0) + 1
                    for h in ws:
                        agg[("w", h)] = agg.get(("w", h), 0) + 1
                if agg:
                    ks = list(agg)
                    yield pd.DataFrame(
                        {
                            "kind": [k[0] for k in ks],
                            "key": [k[1] for k in ks],
                            "c": [agg[k] for k in ks],
                        }
                    )

        counts = (
            docs.where(train_pred)
            .select(text_col)
            .mapInPandas(_train_map, "kind string, key bigint, c bigint")
            .groupBy("kind", "key")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
    else:
        t = _lower_tokens(text_col)
        wh = F.transform(t, lambda w: char_poly_hash(w))
        nw = F.size(t)
        tleft = F.slice(wh, 1, nw - 1)
        tright = F.slice(wh, 2, nw - 1)
        tbks = F.zip_with(tleft, tright, lambda a, b: (a * WORD_BASE + b) % POLY_MOD)
        entries = F.concat(
            F.transform(tbks, lambda x: F.struct(F.lit("b").alias("kind"), x.alias("key"))),
            F.transform(tleft, lambda x: F.struct(F.lit("u").alias("kind"), x.alias("key"))),
            F.transform(wh, lambda x: F.struct(F.lit("w").alias("kind"), x.alias("key"))),
        )
        counts = (
            docs.where(train_pred)
            .select(F.explode(entries).alias("e"))
            .groupBy(F.col("e.kind").alias("kind"), F.col("e.key").alias("key"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    if min_count > 1:  # CCNet-style count-floor prune — see lm_train
        counts = counts.where((F.col("kind") != "b") | (F.col("c") >= min_count))
    counts = counts.localCheckpoint()
    big = counts.where(F.col("kind") == "b").select(
        F.col("key").alias("bk"), F.col("c").alias("c_bi")
    )
    uni = counts.where(F.col("kind") == "u").select(
        F.col("key").alias("pk"), F.col("c").alias("c_uni")
    )
    vstats = (
        counts.where(F.col("kind") == "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )

    # corpus side: bigram slots with position — kernel twin when
    # use_arrow (one memoized fold per distinct word instead of THREE
    # interpreted folds per bigram row), hof expression otherwise
    if use_arrow:
        def _pairs_map(pdf_iter):
            import pandas as pd

            whash = _make_whash()
            for pdf in pdf_iter:
                ids, poss, bks_, pks_ = [], [], [], []
                for doc_id, text in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                    if not isinstance(text, str):
                        continue
                    ws = [whash(w) for w in _lower_token_list(text)]
                    for i in range(len(ws) - 1):
                        ids.append(doc_id)
                        poss.append(i)
                        bks_.append((ws[i] * WORD_BASE + ws[i + 1]) % POLY_MOD)
                        pks_.append(ws[i])
                if ids:
                    yield pd.DataFrame(
                        {"id": ids, "pos": poss, "bk": bks_, "pk": pks_}
                    )

        pairs = docs.select(F.col(id_col).alias("id"), text_col).mapInPandas(
            _pairs_map, f"id {id_type}, pos int, bk bigint, pk bigint"
        )
    else:
        toks = docs.select(
            F.col(id_col).alias("id"), _lower_tokens(text_col).alias("t")
        )
        n = F.size("t")
        pairs = (
            toks.where(n >= 2)
            .select(
                "id",
                F.posexplode(
                    F.arrays_zip(
                        F.slice("t", 1, n - 1).alias("a"),
                        F.slice(F.col("t"), 2, n - 1).alias("b"),
                    )
                ).alias("pos", "s"),
            )
            .select(
                "id",
                "pos",
                ((char_poly_hash(F.col("s.a")) * WORD_BASE + char_poly_hash(F.col("s.b")))
                 % POLY_MOD).alias("bk"),
                char_poly_hash(F.col("s.a")).alias("pk"),
            )
        )
    p = (F.coalesce(F.col("c_bi"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("c_uni"), F.lit(0)) + F.col("v")
    )
    scored = (
        pairs.join(F.broadcast(big), "bk", "left")
        .join(F.broadcast(uni), "pk", "left")
        .crossJoin(F.broadcast(vstats))
        .select("id", "pos", p.alias("p"))
    )
    # ordered fold by position (the dot-product pattern): both engines sum
    # the same doubles in the same order
    total = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "p"))), lambda s: s["p"]
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nb = F.count(F.lit(1)).cast("bigint")
    return (
        scored.groupBy("id")
        .agg(nb.alias("n_bigrams"), F.round(total / nb, 6).alias("lm_score"))
        .select("id", "n_bigrams", "lm_score")
    )


def dsir_scores(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "hof",
) -> DataFrame:
    """DSIR-shape hashed-n-gram importance score → (id, n_tokens,
    dsir_score).

    DSIR (Xie et al., 2023) weights each document by how much more likely
    its hashed n-gram features are under a TARGET distribution (the data
    you want more of) than under the RAW corpus distribution, then
    importance-resamples. Features here are unigram char-fold hashes
    bucketed mod ``n_buckets``; both distributions are add-one smoothed
    over the bucket space:

        p_b = (t_b + 1) / (T + B)      target
        q_b = (r_b + 1) / (R + B)      raw corpus

    The published weight is exp(Σ_b c_b·log(p_b/q_b)). To stay exactly
    rational (no ln(), see module docstring) the score is the first-order
    surrogate of the per-token mean log-ratio:

        score(doc) = Σ_b (c_b / n) · (p_b − q_b) / q_b

    i.e. log(p/q) replaced by its tangent (p−q)/q at p=q — identical sign,
    identical zero set, and monotone in each bucket ratio, so threshold /
    top-k selection decisions agree with the log-domain weight wherever
    per-bucket ratios are moderate (the hashed-bucket regime: B ≪ vocab
    smooths every ratio toward 1). Each term is one IEEE division of exact
    integer products (all < 2^53 at any tested SF; at true 100 TB scale the
    count products exceed 2^53 and the two totals T, R should be computed
    on a sampled rate — noted, not silently assumed).

    Scale shape: the two distribution tables are B rows (broadcast); the
    corpus side is explode → (id, bucket) map-combinable count → broadcast
    join → one groupBy on id with an ordered fold over bucket id. The
    global T/R totals ride 1-row crossJoins, never a collect.
    """
    # ONE corpus-side aggregation: (id, bucket) counts with the per-doc
    # target flag riding along. BOTH distributions collapse into a single
    # B-row table (raw = sum, target = conditional sum over the same
    # groups) and the global totals derive from that table's B rows —
    # the corpus explode feeds exactly TWO consumers (the distribution
    # rollup and the per-doc scorer), not four. Values identical to
    # direct counts (sums of disjoint groups).
    #
    # impl="arrow" kernel (optimization r15, guide §4.2): the per-token
    # char fold runs once per DISTINCT word via the per-task memo and the
    # (id, is_target, b) counts pre-aggregate per batch — the same
    # integers, strictly fewer exchanged rows. target_pred evaluates in
    # the JVM BEFORE the kernel (it is an arbitrary Column). DEFAULT IS
    # "hof": unlike lm_quality_score (3 folds per bigram + a train pass,
    # arrow min 2.85 → 2.37 s), dsir folds each token ONCE and the r15
    # paired A/B read hof 1.49 / arrow 1.48 / arrow+spread 1.67 min —
    # a measured wash, twin kept equality-pinned for the record.
    id_type = docs.schema[id_col].dataType.simpleString()
    if (
        impl == "arrow"
        and not docs.isStreaming
        and id_type in ("bigint", "int", "smallint", "tinyint")
    ):
        def _bucket_map(pdf_iter):
            import pandas as pd

            whash = _make_whash()
            bmemo: dict[str, int] = {}
            for pdf in pdf_iter:
                agg: dict[tuple, int] = {}
                for doc_id, is_t, text in zip(
                    pdf.iloc[:, 0], pdf.iloc[:, 1], pdf.iloc[:, 2]
                ):
                    if not isinstance(text, str):
                        continue
                    if is_t is not None:
                        is_t = bool(is_t)
                    for w in _lower_token_list(text):
                        b = bmemo.get(w)
                        if b is None:
                            b = whash(w) % n_buckets
                            bmemo[w] = b
                        key = (doc_id, is_t, b)
                        agg[key] = agg.get(key, 0) + 1
                if agg:
                    ks = list(agg)
                    yield pd.DataFrame(
                        {
                            "id": [k[0] for k in ks],
                            "is_target": [k[1] for k in ks],
                            "b": [k[2] for k in ks],
                            "c": [agg[k] for k in ks],
                        }
                    )

        doc_counts = (
            docs.select(
                F.col(id_col).alias("id"),
                target_pred.alias("is_target"),
                F.col(text_col),
            )
            .mapInPandas(
                _bucket_map, f"id {id_type}, is_target boolean, b bigint, c bigint"
            )
            .groupBy("id", "is_target", "b")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
    else:
        tok = docs.select(
            F.col(id_col).alias("id"),
            target_pred.alias("is_target"),
            F.explode(_lower_tokens(text_col)).alias("w"),
        ).select("id", "is_target", (char_poly_hash(F.col("w")) % n_buckets).alias("b"))
        doc_counts = (
            tok.groupBy("id", "is_target", "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    raw_tgt = doc_counts.groupBy("b").agg(
        F.sum("c").cast("bigint").alias("r"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("t"),
    )
    # VERDICT r13 item 3: the model collapses to ONE ROW in a single
    # aggregation chain (doc_counts → B-row rollup → 1-row collect with
    # the totals folded into the SAME agg), instead of the former
    # raw_tgt ⨯ broadcast(totals) table whose two broadcast builds each
    # re-executed the corpus explode at runtime. doc_counts now has
    # exactly two consumers — the model chain and the probe — sharing
    # one shuffle exchange (AQE reuses it), so the corpus is tokenized
    # once. Per-bucket ratios are the identical integer expression,
    # evaluated in a projection over the collected B-row array.
    model_src = raw_tgt.groupBy().agg(
        F.collect_list(F.struct("b", "r", "t")).alias("ent"),
        F.sum("r").cast("bigint").alias("big_r"),
        F.sum("t").cast("bigint").alias("big_t"),
    )
    ratio_of = lambda e: (  # noqa: E731 - local expression builder
        (
            (e["t"] + 1) * (F.col("big_r") + n_buckets)
            - (e["r"] + 1) * (F.col("big_t") + n_buckets)
        ).cast("double")
        / ((e["r"] + 1) * (F.col("big_t") + n_buckets)).cast("double")
    )
    model = model_src.select(
        F.map_from_entries(
            F.transform(
                "ent",
                lambda e: F.struct(e["b"].alias("key"), ratio_of(e).alias("value")),
            )
        ).alias("lr")
    )
    total = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("b", "contrib"))), lambda s: s["contrib"]
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_tok = F.sum("c").cast("bigint")
    # every bucket a document can hit appears in the model (doc tokens ⊆
    # corpus tokens), so element_at never NULLs the contribution
    return (
        doc_counts.crossJoin(F.broadcast(model))
        .select(
            "id",
            "b",
            "c",
            (F.col("c").cast("double") * F.element_at("lr", F.col("b"))).alias(
                "contrib"
            ),
        )
        .groupBy("id")
        .agg(n_tok.alias("n_tokens"), F.round(total / n_tok, 6).alias("dsir_score"))
        .select("id", "n_tokens", "dsir_score")
    )


def dsir_train(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """Train the DSIR bucket model → ONE row (lr: map<bucket, ratio>, nb:
    bucket count). Unlike the LM model this is GENUINELY tiny — exactly B
    entries regardless of corpus size — so the 1-row map is the natural
    serving artifact; persist it when joining against a stream (same
    contract as ``lm_train``).

    The map carries FULL bucket support 0..B-1, not just the buckets the
    train corpus happened to populate: a served document can hash tokens
    into buckets the train batch never saw (the whole point of the
    train/serve split), and a missing map entry would make ``element_at``
    NULL and poison the serve-side fold. Unseen buckets carry the add-one
    smoothed ratio at r = t = 0 — exactly what ``dsir_scores`` would
    compute had the bucket appeared zero times."""
    tok = docs.select(
        target_pred.alias("is_target"),
        F.explode(_lower_tokens(text_col)).alias("w"),
    ).select("is_target", (char_poly_hash(F.col("w")) % n_buckets).alias("b"))
    raw_tgt = tok.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("r"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("bigint").alias("t"),
    )
    # full 0..B-1 support: left-join observed counts onto the bucket series
    allb = docs.sparkSession.range(n_buckets).select(
        F.col("id").cast("bigint").alias("b")
    )
    full = allb.join(raw_tgt, "b", "left").select(
        "b",
        F.coalesce("r", F.lit(0)).cast("bigint").alias("r"),
        F.coalesce("t", F.lit(0)).cast("bigint").alias("t"),
    )
    # one-row collapse in a SINGLE aggregation (totals folded into the
    # same agg as the bucket collect — the former full ⨯ broadcast(totals)
    # re-executed the explode subtree for each broadcast build); the
    # per-bucket ratio is the identical integer expression, evaluated in
    # the final projection over the collected B-row array
    row = full.groupBy().agg(
        F.collect_list(F.struct("b", "r", "t")).alias("ent"),
        F.sum("r").cast("bigint").alias("big_r"),
        F.sum("t").cast("bigint").alias("big_t"),
    )
    ratio_of = lambda e: (  # noqa: E731 - local expression builder
        (
            (e["t"] + 1) * (F.col("big_r") + n_buckets)
            - (e["r"] + 1) * (F.col("big_t") + n_buckets)
        ).cast("double")
        / ((e["r"] + 1) * (F.col("big_t") + n_buckets)).cast("double")
    )
    return row.select(
        F.map_from_entries(
            F.transform(
                "ent",
                lambda e: F.struct(e["b"].alias("key"), ratio_of(e).alias("value")),
            )
        ).alias("lr"),
        F.lit(n_buckets).cast("int").alias("nb"),
    )


def dsir_score_with_model(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a pre-trained ``dsir_train`` model → (id,
    n_tokens, dsir_score): a PURE PROJECTION over a stateless 1-row cross
    join, append-safe on a readStream (train on batch, score arrivals).

    Float-order contract: the per-doc sum folds lr contributions in
    BUCKET-SORTED order over the doc's bucket sequence (array_sort before
    the fold), which reproduces ``dsir_scores``' sorted-by-bucket
    aggregation EXCEPT that equal-bucket contributions here add one
    token at a time where the batch path multiplies the count once —
    a c·x vs x+x+…+x float difference at the last ulp. Both paths round
    to 6 dp; the streaming twin test pins stream ≡ THIS op on batch
    (its own impl either side), and equality-to-6dp vs the batch scorer
    holds everywhere the documents table has been checked."""
    buckets = F.array_sort(
        F.transform(
            _lower_tokens(text_col), lambda w: char_poly_hash(w) % F.col("nb")
        )
    )
    total = F.aggregate(
        F.transform(F.col("_bs"), lambda b: F.element_at("lr", b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = F.size("_bs").cast("bigint")
    return (
        docs.crossJoin(F.broadcast(model))
        .select(F.col(id_col).alias("id"), buckets.alias("_bs"), "lr")
        .where(F.size("_bs") >= 1)
        .select("id", n.alias("n_tokens"), F.round(total / n, 6).alias("dsir_score"))
    )


def dedup_keep_best(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup cluster resolution that keeps the BEST member → (doc_id,
    component, qp, n_toks, is_kept).

    ``connected_components`` closes LSH candidate pairs into duplicate
    clusters; real curation then keeps one representative per cluster —
    not the arbitrary min-id, but the highest-quality member (Gopher-style
    quality points, then token count, then min id as the final tiebreak).
    Documents in no cluster are their own singleton component (and kept).

    Scale shape: the closure is the O(log n) iterative piece (see
    ``connected_components``); everything after it is one LEFT broadcast
    join of the (small, duplicates-only) component map onto the corpus
    projection plus a per-component row_number window — the window key is
    the component id, whose cardinality is the number of duplicate
    clusters, with singleton components never exceeding one row."""
    from duckpipe_spark.functions.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from duckpipe_spark.functions.text import quality_points_col, tokens_col

    comp = connected_components(
        lsh_candidate_pairs(minhash_signatures(docs, id_col=id_col, text_col=text_col))
    )
    scored = docs.select(
        F.col(id_col).cast("bigint").alias("id"),
        quality_points_col(F.col(text_col)).cast("bigint").alias("qp"),
        F.size(tokens_col(F.col(text_col))).cast("bigint").alias("n_toks"),
    )
    joined = scored.join(F.broadcast(comp), "id", "left").select(
        "id", F.coalesce(F.col("component"), F.col("id")).alias("component"), "qp", "n_toks"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("qp").desc(), F.col("n_toks").desc(), F.col("id").asc()
    )
    return joined.select(
        F.col("id").alias(id_col),
        "component",
        "qp",
        "n_toks",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


def prototype_prune(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 10_000,
    prune_frac: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SSL-prototypes-style pruning (Sorscher et al., 2022) → (vec_id,
    cell, dist, cell_rank, is_kept).

    Cluster the embedding space with the deterministic integer k-means
    (``kmeans_cells``), recompute each cell's final centroid from the
    final assignment, and rank members by integer squared-L2 distance to
    their centroid. The MOST prototypical ``prune_frac`` of every cell
    (smallest distance — the easy, redundant examples) is marked
    ``is_kept = false``; rank ties break on id. All quantities are integer
    (quantized vectors, integer distances) so the ranking is bit-exact
    across engines — the same determinism contract as ``kmeans_cells``.

    Scale shape: centroid recompute is one posexplode + (cell, pos)
    aggregate (k·dim keys); distances are a broadcast join of k centroid
    arrays onto the assignment; the rank window partitions by cell. The
    vectors shuffle once (the kmeans assignment's own min-struct agg), and
    never again — the window input carries only (id, cell, dist)."""
    from duckpipe_spark.functions.similarity import kmeans_cells

    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    base = embeddings.select(F.col(id_col).alias("id"), qv.alias("v"))
    cells = kmeans_cells(
        embeddings, k=k, iters=iters, scale=scale, id_col=id_col, vec_col=vec_col
    )
    assigned = cells.join(base, "id")
    cents = (
        assigned.select("cell", F.posexplode("v").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(
            F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("cv_i")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv_i"))).alias("ps"))
        .select("cell", F.transform("ps", lambda s: s["cv_i"]).alias("cv"))
    )
    dist = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("cell").orderBy(F.col("dist").asc(), F.col("id").asc())
    wn = Window.partitionBy("cell")
    ranked = (
        assigned.join(F.broadcast(cents), "cell")
        .select("id", "cell", dist.alias("dist"))
        .withColumn("cell_rank", F.row_number().over(w).cast("bigint"))
        .withColumn("n_cell", F.count(F.lit(1)).over(wn))
    )
    return ranked.select(
        F.col("id").alias(id_col),
        "cell",
        "dist",
        "cell_rank",
        (F.col("cell_rank") > F.floor(F.lit(prune_frac) * F.col("n_cell"))).alias(
            "is_kept"
        ),
    )


def unimax_allocation(
    docs: DataFrame,
    budget: int,
    max_epochs: int = 4,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax-style (Chung et al., 2023) per-language token budgets →
    (lang, avail_tokens, cap_tokens, alloc_tokens, epochs).

    Multilingual pretraining wants language balance without repeating a
    low-resource language into memorization: allocate a total token
    ``budget`` as UNIFORMLY as possible across languages, subject to each
    language's cap of ``max_epochs`` x its available tokens. That is
    exact water-filling, and it has a closed form over the per-language
    totals: sort languages by cap ascending; language j (1-based, n langs,
    exclusive running cap prefix P_j) is CAPPED iff

        cap_j * (n - j + 1) <= budget - P_j

    (it cannot absorb an equal share of what remains, so it takes its
    whole cap; the capped set is a prefix of the sort by monotonicity).
    Every uncapped language gets the common water level
    (budget - sum of capped caps) / (n - #capped). The capped test is
    pure integer arithmetic and the level is ONE terminal division of
    exact integers, so both engines produce identical doubles (rounded
    6 dp). If budget >= total cap, every language is capped and the
    allocation is just the caps.

    Scale shape: one map-combinable groupBy over the corpus to the
    per-language totals; everything after runs on a LANGUAGE-cardinality
    table (unpartitioned windows over tens of rows — deliberate and
    bounded, same class as doc_quality_calibration's report window)."""
    n_tok = F.size(_lower_tokens(text_col)).cast("bigint")
    avail = (
        docs.groupBy(F.col(strata_col).alias("lang"))
        .agg(F.sum(n_tok).cast("bigint").alias("avail"))
        .select("lang", "avail", (F.col("avail") * max_epochs).alias("cap"))
    )
    w = Window.orderBy(F.col("cap").asc(), F.col("lang").asc())
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    ranked = avail.select(
        "lang", "avail", "cap",
        F.row_number().over(w).alias("j"),
        F.coalesce(F.sum("cap").over(wp), F.lit(0)).cast("bigint").alias("prefix"),
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    capped = (F.col("cap") * (F.col("n") - F.col("j") + 1)) <= (budget - F.col("prefix"))
    flagged = ranked.crossJoin(F.broadcast(tot)).select(
        "lang", "avail", "cap", "n", capped.alias("is_capped")
    )
    caps = flagged.agg(
        F.sum(F.when(F.col("is_capped"), F.col("cap")).otherwise(0))
        .cast("bigint").alias("capped_sum"),
        F.sum(F.when(F.col("is_capped"), 1).otherwise(0)).cast("bigint").alias("k"),
    )
    level = (F.lit(float(budget)) - F.col("capped_sum").cast("double")) / (
        F.col("n") - F.col("k")
    ).cast("double")
    alloc = F.when(F.col("is_capped"), F.col("cap").cast("double")).otherwise(level)
    return (
        flagged.crossJoin(F.broadcast(caps))
        .select(
            "lang",
            F.col("avail").alias("avail_tokens"),
            F.col("cap").alias("cap_tokens"),
            F.round(alloc, 6).alias("alloc_tokens"),
            F.round(alloc / F.col("avail").cast("double"), 6).alias("epochs"),
        )
    )


def score_auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Exact tie-corrected AUC (Mann-Whitney U) of ``score_col`` as a
    ranker for the binary ``label_col`` → ONE row (n_pos, n_neg, auc).

    The eval a filter owner runs before trusting a cheap score as a gate:
    AUC = P(random positive outranks random negative), ties at half
    credit. Computed from average ranks without any float rank math:
    group by score value; a group with m rows (mp positive) and c rows
    below it contributes mp·(2c + m + 1) to TWICE the positive rank sum;

        AUC = (sum contrib − n_pos·(n_pos + 1)) / (2·n_pos·n_neg)

    — every term an exact integer, one terminal division (rounded 6 dp),
    so the result is engine-portable even with heavy ties. Grouping keys
    are the score doubles themselves; both engines must produce
    identical score bits, which every score op in this module guarantees.

    Scale shape: one groupBy on score (bounded by distinct score values),
    one ordered window over that grouped table, one global sum. The
    unpartitioned window is over score-DISTINCT rows, not the corpus.

    NULL scores are dropped up front (ADVICE r9 item 2): a NULL score
    carries no ranking information, and the engines disagree on where it
    would rank (Spark windows sort NULLS FIRST ascending, DuckDB's ORDER
    BY puts them LAST) — filtering is the only placement both agree on."""
    scored = scored.where(F.col(score_col).isNotNull())
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0))
        .cast("bigint").alias("mp"),
    )
    w = Window.orderBy(F.col("s").asc()).rowsBetween(Window.unboundedPreceding, -1)
    c = F.coalesce(F.sum("m").over(w), F.lit(0)).cast("bigint")
    contrib = g.select(
        "m", "mp", (F.col("mp") * (2 * c + F.col("m") + 1)).alias("contrib")
    )
    agg = contrib.agg(
        F.sum("contrib").cast("bigint").alias("rs2"),
        F.sum("mp").cast("bigint").alias("n_pos"),
        F.sum(F.col("m") - F.col("mp")).cast("bigint").alias("n_neg"),
    )
    auc = (F.col("rs2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double") / (
        (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
    )
    return agg.select("n_pos", "n_neg", F.round(auc, 6).alias("auc"))
