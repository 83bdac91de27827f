"""End-to-end corpus curation: the composition layer that turns the §2.14
operator family (text quality, exact dedup, MinHash-LSH near-dup) into a
training-data pipeline over a `documents`-shaped table.

Stages (each one a lazy DataFrame transformation — a single action runs the
whole pipeline through Catalyst):

1. text stats + quality score + language guess (codegen column expressions)
2. quality gate (min tokens, max token length, quality threshold, language)
3. exact dedup: keep the smallest doc_id per normalized fingerprint
4. near-dup removal: MinHash-LSH candidates → exact Jaccard verify →
   connected via "keep the smallest id of each candidate pair" (one LSH
   generation, one verify join — at 100 TB the candidate set is the only
   quadratic-ish object and it's bounded by band collisions, never N²)

Returns the curated corpus plus per-stage drop counts for audit.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from duckpipe_spark.functions.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from duckpipe_spark.functions.text import (
    quality_score_col,
    with_language_guess,
    with_token_stats,
)


def decontamination_stats(
    docs: DataFrame,
    k: int = 5,
    bench_bucket_min: int = 90,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per *training* document, how many of its
    distinct word-``k``-gram hashes also occur in any *benchmark* document.

    The benchmark/train membership is the deterministic Lehmer hash split
    (``sampling.with_hash_split`` semantics): bucket = hash(id) mod 100,
    benchmark = bucket ≥ ``bench_bucket_min`` — the same stable assignment
    the split operator produces, so decontamination composes with it without
    materializing a membership table.

    Scale shape: one shingle-hash projection over the scan (no shuffle), the
    benchmark n-gram set is ``distinct`` over the benchmark slice only (by
    construction a small fraction of the corpus — the side you'd broadcast at
    100 TB, hinted here), and the hit count is an equi-join on the hash plus
    a map-side-combinable count. Never compares documents pairwise.

    Returns every train doc with ≥ k tokens:
    (doc_id, n_ngrams, n_shared, contamination).
    """
    from duckpipe_spark.functions.dedup import shingle_hashes
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    # split BEFORE the shingle kernel (r7, same fix as
    # mask_contaminated_spans): the bucket is a function of the id alone,
    # so the Arrow kernel runs once over the small bench slice and once
    # over the train slice instead of three full-corpus passes (the bench
    # set, the sizes agg, and the hits join each replayed it), and the
    # split predicate pushes into the scan. The size and membership
    # counts then fold into ONE aggregate off a left join against the
    # broadcast set — one kernel pass and one shuffle on the train side.
    bucket = lehmer_hash_col(F.col(id_col)) % 100
    bench_hv = (
        shingle_hashes(docs.where(bucket >= bench_bucket_min), text_col, id_col, k)
        .select("hv")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = shingle_hashes(docs.where(bucket < bench_bucket_min), text_col, id_col, k)
    out = (
        train.join(F.broadcast(bench_hv), "hv", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_shared"),
        )
    )
    n_shared = F.col("n_shared").cast("bigint")
    return out.select(
        F.col("id").alias(id_col),
        F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
        n_shared.alias("n_shared"),
        (n_shared.cast("double") / F.col("n_ngrams")).alias("contamination"),
    )


def winnow_decontaminate(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    bench_bucket_min: int = 90,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verbatim-run decontamination over the WINNOWED index → one row per
    TRAIN doc with ≥1 fingerprint: (``id_col``, n_fp, n_shared,
    contaminated).

    The cheap first pass a 100 TB crawl runs before ``decontamination_
    stats``' full n-gram comparison: winnowing's guarantee means any train
    doc sharing a verbatim run of ≥ w + k − 1 tokens with any benchmark
    doc IS flagged (no false negatives for runs that long), while the
    probe index is only ~2/(w+1) of the full n-gram set. n_shared counts
    the train doc's distinct fingerprints that occur anywhere in the
    benchmark slice; ``contaminated`` = n_shared > 0.

    Membership is the same deterministic Lehmer bucket split every
    decontamination op uses (benchmark = hash(id) mod 100 ≥
    ``bench_bucket_min``), so this composes with ``with_hash_split``
    without a membership table.

    Scale shape (same discipline as ``decontamination_stats``, whose r7
    fix this mirrors): the Lehmer bucket is a function of the id alone,
    so docs are split into bench/train slices BEFORE the winnow kernel —
    each slice pays exactly one kernel pass over its own rows instead of
    every branch replaying a full-corpus kernel; the benchmark
    fingerprint set is distinct-projected over the benchmark slice only
    and BROADCAST (hint pinned in test_plans); size and membership fold
    into ONE aggregate off a single left join — never pairwise."""
    from duckpipe_spark.functions.dedup import winnow_fingerprints
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    bucket = lehmer_hash_col(F.col(id_col)) % 100
    bench = (
        winnow_fingerprints(
            docs.where(bucket >= bench_bucket_min), text_col, id_col, k, w
        )
        .select(F.col("fp").alias("bench_fp"))
        .distinct()
    )
    train = (
        winnow_fingerprints(
            docs.where(bucket < bench_bucket_min), text_col, id_col, k, w
        )
        .select("id", "fp")
        .distinct()
    )
    joined = train.join(
        F.broadcast(bench), train["fp"] == bench["bench_fp"], "left"
    )
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp"),
        F.sum(F.when(F.col("bench_fp").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_shared"),
    ).select(
        F.col("id").alias(id_col),
        "n_fp",
        "n_shared",
        (F.col("n_shared") > 0).cast("int").alias("contaminated"),
    )


def boilerplate_stats(
    docs: DataFrame,
    k: int = 3,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate detection: a word-``k``-gram is boilerplate
    when it occurs in ≥ ``min_docs`` distinct documents (headers, footers,
    license blurbs — the lines C4/RefinedWeb-style pipelines strip). Reports
    per document what fraction of its distinct k-grams are boilerplate.

    Scale shape: the n-gram document frequency is one map-side-combinable
    count over the exploded (already per-doc-distinct) hash rows — the same
    shuffle the TF-IDF ``df`` relation pays — and the per-doc hit count
    re-joins on the hash key. The boilerplate *set* (df ≥ min_docs) is tiny
    relative to the corpus (heavy-hitter tail), the natural broadcast side.

    Returns every doc with ≥ k tokens:
    (doc_id, n_ngrams, n_boiler, boiler_frac).
    """
    from duckpipe_spark.functions.dedup import shingle_hashes

    hv = shingle_hashes(docs, text_col, id_col, k)
    boiler = (
        hv.groupBy("hv")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("hv")
        .withColumn("_hit", F.lit(1))
    )
    # one kernel pass + one shuffle for both counts (r7): the df relation
    # needs its own pass, but the per-doc size and hit counts fold into a
    # single aggregate off a left join against the broadcast set (was:
    # separate sizes + hits passes — three kernel replays total, now two)
    out = (
        hv.join(F.broadcast(boiler), "hv", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_boiler"),
        )
    )
    n_boiler = F.col("n_boiler").cast("bigint")
    return out.select(
        F.col("id").alias(id_col),
        F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
        n_boiler.alias("n_boiler"),
        (n_boiler.cast("double") / F.col("n_ngrams")).alias("boiler_frac"),
    )


@dataclass
class CurationReport:
    corpus: DataFrame
    n_input: int
    n_after_quality: int
    n_after_exact: int
    n_after_neardup: int

    def summary(self) -> str:
        return (
            f"input={self.n_input}  quality_pass={self.n_after_quality}  "
            f"exact_unique={self.n_after_exact}  final={self.n_after_neardup}"
        )


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    min_quality: float = 0.3,
    languages: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_counts: bool = True,
) -> CurationReport:
    """Run the full curation pipeline; with ``collect_counts=False`` nothing
    is executed (pure lazy composition) and the counts are -1."""
    docs = docs.select(id_col, text_col)

    # 1-2: stats + quality gate (stats/lang return (id, metrics) — join back)
    stats = with_token_stats(docs, text_col, id_col).select(id_col, "n_tokens")
    lang = with_language_guess(docs, text_col, id_col)
    scored = (
        docs.withColumn("quality", quality_score_col(F.col(text_col)))
        .join(stats, id_col)
        .join(lang, id_col)
    )
    gated = scored.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    if languages is not None:
        gated = gated.where(F.col("lang_guess").isin(*languages))
    gated = gated.select(id_col, text_col).cache()

    # 3: exact dedup — keep the canonical (min) id of each fingerprint group
    canon = exact_dedup_groups(gated, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    exact_unique = gated.join(canon, id_col, "left_semi").cache()

    # 4: near-dup removal — LSH candidates, exact-Jaccard verify, drop the
    # larger id of every confirmed pair (deterministic survivor rule)
    sigs = minhash_signatures(exact_unique, text_col, id_col)
    cands = lsh_candidate_pairs(sigs)
    verified = (
        ngram_jaccard_pairs(exact_unique, text_col, id_col, threshold=jaccard_threshold)
        .join(cands, ["id_a", "id_b"], "left_semi")
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    final = exact_unique.join(losers, id_col, "left_anti")

    if collect_counts:
        # ONE Spark action for the whole audit funnel (VERDICT r6 item 4):
        # four separate .count() jobs each re-executed the shared lineage
        # up to the caches; the union-of-stage-markers groupBy computes all
        # four in a single job (gated/exact_unique read from cache, the
        # marker rows are 1 column wide, and the 4-group aggregate is
        # map-side combined down to ~4 rows per task).
        def marker(df: DataFrame, stage: str) -> DataFrame:
            return df.select(F.lit(stage).alias("_stage"))

        funnel = {
            r["_stage"]: r["n"]
            for r in (
                marker(docs, "input")
                .unionAll(marker(gated, "quality"))
                .unionAll(marker(exact_unique, "exact"))
                .unionAll(marker(final, "final"))
                .groupBy("_stage")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        }
        report = CurationReport(
            corpus=final,
            n_input=funnel.get("input", 0),
            n_after_quality=funnel.get("quality", 0),
            n_after_exact=funnel.get("exact", 0),
            n_after_neardup=funnel.get("final", 0),
        )
    else:
        report = CurationReport(final, -1, -1, -1, -1)
    return report


def remove_duplicate_spans(
    docs: DataFrame,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicate-span removal (the substring-dedup step of Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better",
    adapted to word windows): split each document into non-overlapping
    ``window``-word spans, hash each span, keep only the globally-first
    occurrence of every distinct span (min (doc_id, position)), and
    reconstruct the cleaned text from the surviving spans plus the
    sub-window tail. → (doc_id, n_spans, n_dropped, clean_text).

    Scale shape: spans are a pure projection of the scan (posexplode — no
    per-row Python), and NO text travels through a wide shuffle. The
    first-occurrence election window shuffles only (span-hash, id, i) —
    ~28 bytes/row, not the span string — and what flows out of it is the
    per-doc DROPPED-position list (duplicates are the sparse minority of a
    corpus, so this aggregate is small). Cleaned text is rebuilt from the
    original token arrays at the final join, which AQE converts to a
    broadcast of the dropped-position side in the common case — the
    document bodies then never leave their scan partitions at all."""
    w = int(window)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col).alias("id"), toks.alias("_t")).withColumn(
        "_nwin", F.floor(F.size("_t") / w).cast("int")
    )
    span_idx = F.when(
        F.col("_nwin") > 0, F.sequence(F.lit(0), F.col("_nwin") - 1)
    ).otherwise(F.array().cast("array<int>"))
    wins = base.select(
        "id",
        F.explode(span_idx).alias("i"),
        F.col("_t"),
    ).select(
        "id",
        "i",
        F.md5(F.concat_ws(" ", F.slice("_t", F.col("i") * w + 1, w))).alias("h"),
    )
    # first-occurrence election on hashes only: every occurrence EXCEPT the
    # (id, i)-least per span hash is dropped. Same two-level
    # min-doc-then-min-position rule as the SQL oracle.
    #
    # Two-phase election (VERDICT r4 item 6), not a row_number window: the
    # min(struct(id, i)) aggregate gets map-side partial combine — on a
    # duplicate-heavy corpus the winner shuffle shrinks toward one row per
    # DISTINCT span — and neither phase sorts anything, where the window
    # form sorted every shuffle partition by (h, id, i). The wins⋈firsts
    # join needs the same h-partitioning the groupBy produced, so Catalyst
    # reuses that exchange: still one full shuffle of the 28-byte rows.
    firsts = wins.groupBy("h").agg(F.min(F.struct("id", "i")).alias("f"))
    # SHUFFLE_HASH, not the default sort-merge: SMJ pays two full sorts of
    # the span stream by its 32-char md5 key (measured the dominant cost —
    # 4.6 s of a 6.7 s query at 500k docs; 2.5 s with SHJ, BASELINE §10).
    # Hash join is also the skew-safe shape here: the build side is ONE row
    # per distinct span hash (min-struct winners), so a hot boilerplate
    # span costs nothing on the build side and streams on the probe side —
    # unlike a window/collect_list election, which would buffer every
    # occurrence of the hot span in one reducer group. Both sides reuse
    # the same hashpartitioning(h) exchange the election aggregate wrote.
    dropped = (
        wins.join(firsts.hint("SHUFFLE_HASH"), "h")
        .where((F.col("id") != F.col("f.id")) | (F.col("i") != F.col("f.i")))
        .groupBy("id")
        .agg(F.collect_list("i").alias("_dropped"))
    )
    keep_idx = F.filter(
        span_idx, lambda i: ~F.array_contains("_dropped", i)
    )
    body = F.nullif(
        F.array_join(
            F.transform(keep_idx, lambda i: F.concat_ws(" ", F.slice("_t", i * w + 1, w))),
            " ",
        ),
        F.lit(""),
    )
    tail_len = F.size("_t") - F.col("_nwin") * w
    tail = F.when(
        tail_len > 0, F.concat_ws(" ", F.slice("_t", F.col("_nwin") * w + 1, tail_len))
    )
    # reconstruction short-circuit: duplicates are the sparse minority of a
    # corpus, so most docs have no dropped span — their clean text is just
    # the whitespace-normalized token join (identical to the span-by-span
    # rebuild: every span joined by ' ' plus the tail IS concat_ws(_t)).
    # The per-span slice/transform rebuild then only runs on the docs the
    # anti-joined dropped list actually names (measured 6.7→5.0 s on a
    # 500k-doc corpus, BASELINE §10).
    clean = F.when(
        F.col("_dropped").isNull(), F.array_join("_t", " ")
    ).otherwise(F.concat_ws(" ", body, tail))
    return (
        base.join(dropped, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("_nwin").cast("bigint").alias("n_spans"),
            F.size(F.coalesce(F.col("_dropped"), F.array().cast("array<int>")))
            .cast("bigint")
            .alias("n_dropped"),
            clean.alias("clean_text"),
        )
    )


def curation_pipeline(
    docs: DataFrame,
    min_tokens: int = 10,
    min_points: int = 2,
    span_window: int = 10,
    decontam_k: int = 5,
    bench_bucket_min: int = 90,
    max_contamination: float = 0.05,
    mix_weights: dict[str, int] | None = None,
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    persist_stages: bool = True,
    embeddings: DataFrame | None = None,
    semdedup_threshold: float = 0.3,
    semdedup_planes: int | None = None,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    stage_handles: list | None = None,
    lm_min_score: float | None = None,
    lm_train_pred: Column | None = None,
    lm_min_count: int = 1,
    election: str = "min_id",
    media_codes: DataFrame | None = None,
    media_max_distance: int = 3,
    media_max_band_df: int = 50,
    media_id_col: str = "blob_id",
    media_modality_col: str = "modality",
) -> DataFrame:
    """The END-TO-END curation pipeline a training-data run executes, as one
    lazy composition (VERDICT r6 item 3 — the integration shape that catches
    cross-operator contract drift no single-operator query can):

      quality gate → [optional CCNet LM gate: train a bigram LM on the
      gated in-domain slice, drop low-score docs — ``lm_min_score``] →
      exact dedup → [optional SemDeDup: drop embedding near-duplicates
      among the exact-dedup survivors] → [optional media near-dup: drop
      docs whose attached image/audio/video fingerprints cluster —
      ``media_codes``] → duplicate-span removal →
      benchmark decontamination (train split, contamination cap) →
      mixture resample to target language weights → deterministic
      shard/order prep.

    Pass ``media_codes`` (``(blob_id, modality, h0, h1)`` — the
    perceptual-triad code layout, blob_id keyed by the same ids as
    ``id_col``) to enable the media near-dup stage (VERDICT r11 item 5):
    codes restrict to the current survivor set, pairs form per modality
    (an image code must never band-join an audio code), clusters close
    transitively, and only each cluster's min-id member continues. Docs
    without a code row pass through unjudged — the same
    embedding-table-lags-the-crawl contract as SemDeDup.

    Pass ``embeddings`` (vec_id keyed by the same ids as ``id_col``) to
    enable the SemDeDup stage (VERDICT r7 item 7): near-duplicate clusters
    are the LSH-bucketed cosine>=``semdedup_threshold`` closure over the
    SURVIVOR subset (``functions.similarity.semantic_dedup``), and only
    each cluster's min-id representative continues down the chain. Docs
    without an embedding row pass through unjudged — at corpus scale the
    embedding table typically trails the crawl, and silently dropping
    unembedded docs would couple curation output to embedding-job lag.

    Every stage is one of the already-verified operators, chained on its
    real contract: span dedup consumes the exact-dedup survivor set (the
    global first-occurrence election must see the same corpus on both
    engines), decontamination runs on the CLEANED text, the mixture is
    drawn from decontaminated survivors, and the shard assignment is a
    pure function of the surviving ids. Output:
    (doc_id, lang, clean_fp, shard, pos) where clean_fp = md5(clean_text)
    pins the span-reconstruction bit-exactly through the whole chain.

    Scale shape: no new shuffle beyond what the member operators pay —
    the gate is a scan-side filter, exact dedup shuffles 16-byte
    fingerprints, span dedup shuffles 28-byte hash rows, decontamination
    broadcasts the benchmark n-gram set, the mixture broadcasts a
    per-language target row, and the shard window partitions by shard
    count (the dataloader's own parallelism dial).

    ``persist_stages`` (default on) persists the two stage boundaries that
    multiple downstream consumers re-read — the exact-dedup survivor set
    (span dedup reads it twice, the lang join once) and the cleaned text
    (the decontamination broadcast job, the train-side shingles, and the
    kept join each replay it). Without persistence every consumer
    re-executes the whole upstream subtree (measured 8.4 → 3.3 s warm at
    sf0.1 — persistence halves the composition; the original 109 s
    pathology was the JVM HOF shingle fold, fixed at the source by
    ``shingle_hash_array(impl="arrow")``). At 100 TB a deploy makes the
    same call with inter-stage writes to storage; MEMORY_AND_DISK
    persistence is the in-session equivalent.

    The persisted boundaries live until the caller releases them: pass
    ``stage_handles`` (a list; persisted DataFrames are appended) and
    ``.unpersist()`` each after the terminal action, or
    ``spark.catalog.clearCache()`` between runs — otherwise every
    invocation over new inputs leaves its cache entries alive for the
    session (ADVICE r7)."""
    from pyspark import StorageLevel

    from duckpipe_spark.functions.sampling import mixture_resample, shard_and_order
    from duckpipe_spark.functions.text import quality_points_col, tokens_col

    if mix_weights is None:
        mix_weights = {"en": 3, "de": 1, "es": 1, "fr": 1, "zh": 1}

    # Optimization r14 note: ROUND-ROBIN repartitioning the persisted
    # boundaries to the session parallelism was measured ~2x worse (min
    # 5.23 s vs 3.25 s) and a first-boundary-only variant ~7x worse —
    # root cause: keyless round-robin is NONDETERMINISTIC, so the cached
    # plan no longer `sameResult`-matches the next invocation's plan and
    # CacheManager recomputes the whole upstream per run. The working
    # form is `spread_key` below: a DETERMINISTIC hash repartition on the
    # id column (plans stay equal across invocations → cache hits
    # survive), applied ONLY to the first boundary when the planned
    # layout is narrower than the session parallelism (one-row-group
    # scans plan ONE task; its consumers each re-ran their shingle/hash
    # kernels single-core — profiled as three concurrent ~1.4 s
    # single-task exchange-map jobs per rep). No-op on wide inputs, so at
    # 100 TB this costs nothing (guide §2.5).
    # the narrow-layout probe runs on the RAW INPUT SCAN, not the
    # boundary plan: under AQE, `.rdd` on a plan containing exchanges
    # eagerly executes those query stages at build time (measured: the
    # probe alone re-ran the gate+dedup subtree per invocation). A scan
    # has no query stages, so this probe is free, and the boundary's
    # layout follows the scan's (document bodies never shuffle).
    _n_par = docs.sparkSession.sparkContext.defaultParallelism
    try:
        _narrow_input = docs.rdd.getNumPartitions() < _n_par
    except Exception:  # pragma: no cover - exotic plans; spreading optional
        _narrow_input = False

    def _persist(df: DataFrame, spread_key: str | None = None) -> DataFrame:
        if not persist_stages:
            return df
        if spread_key is not None and _narrow_input:
            df = df.repartition(_n_par, F.col(spread_key))
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        if stage_handles is not None:
            stage_handles.append(df)
        return df

    # 1. quality gate: token floor + integer quality points (exact compare)
    gated = docs.where(
        (F.size(tokens_col(F.col(text_col))) >= min_tokens)
        & (quality_points_col(F.col(text_col)) >= min_points)
    ).select(id_col, text_col, lang_col)

    # 1.5 (optional) CCNet LM gate: train the add-one bigram LM on the
    # GATED corpus's in-domain slice (garbage is filtered before it can
    # pollute the LM) and keep docs whose 6-dp-rounded score clears the
    # floor — the rounded compare is what makes the keep set
    # engine-portable. The LM tables broadcast (vocabulary-bounded); the
    # gate adds one scan-shaped scoring pass, no new corpus shuffle class.
    # ``lm_train_pred`` picks the in-domain slice (default lang == 'en').
    # CONTRACT: a train slice with no bigrams yields NULL scores and the
    # gate drops EVERYTHING (NULL >= floor is never true) — deliberate:
    # an un-trained quality gate passing documents would be the silent
    # failure; callers on non-English corpora must set lm_train_pred.
    # ``lm_min_count`` (VERDICT r9 item 3) forwards the CCNet count-floor
    # prune to the gate's LM: at web scale the unpruned bigram-type map
    # grows with train-slice diversity (Zipf singleton mass), while with
    # min_count >= 2 the broadcast is bounded by train_tokens / min_count.
    # Surviving bigram probabilities are identical (the prune drops TYPES,
    # never re-normalizes), so min_count only moves scores of docs that
    # contain pruned-away bigrams (they fall back to the unseen-bigram
    # backoff — exactly CCNet's behavior).
    if lm_min_score is not None:
        from duckpipe_spark.functions.selection import lm_quality_score

        if lm_train_pred is None:
            lm_train_pred = F.col(lang_col) == "en"
        scores = lm_quality_score(
            gated, lm_train_pred, id_col=id_col, text_col=text_col,
            min_count=lm_min_count,
        )
        keep = scores.where(F.col("lm_score") >= lm_min_score).select(
            F.col("id").alias(id_col)
        )
        gated = gated.join(keep, id_col, "left_semi")

    # 2. exact dedup: one survivor per normalized fingerprint. election
    # picks WHICH one: "min_id" (the default first-occurrence convention)
    # or "keep_best" (highest quality points, then token count, then min
    # id — dedup_keep_best's decision applied inside the pipeline, so the
    # survivor that feeds every downstream stage is the best copy, not
    # the earliest). The keep-best window partitions by the 16-byte
    # fingerprint — same shuffle class as the min-id groupBy.
    if election == "keep_best":
        from pyspark.sql import Window

        from duckpipe_spark.functions.dedup import fingerprint_col

        scored = gated.select(
            F.col(id_col),
            fingerprint_col(F.col(text_col)).alias("_fp"),
            quality_points_col(F.col(text_col)).cast("bigint").alias("_qp"),
            F.size(tokens_col(F.col(text_col))).cast("bigint").alias("_nt"),
        )
        ew = Window.partitionBy("_fp").orderBy(
            F.col("_qp").desc(), F.col("_nt").desc(), F.col(id_col).asc()
        )
        canon = (
            scored.withColumn("_rn", F.row_number().over(ew))
            .where(F.col("_rn") == 1)
            .select(id_col)
        )
    elif election == "min_id":
        canon = exact_dedup_groups(gated, text_col, id_col).select(
            F.col("canonical_id").alias(id_col)
        )
    else:
        raise ValueError(f"unknown election {election!r}: use 'min_id' or 'keep_best'")
    # NOT spread: a paired sweep measured spreading this first boundary a
    # net loss for the base pipeline (min 3.8 → 5.3 s at sf0.1 — the
    # conditioning exchange plus 32-task scheduling across its many
    # short consumer stages outweigh the parallelism win); only the
    # media-stage boundary below has consumers heavy enough to pay for it
    uniq = _persist(gated.join(canon, id_col, "left_semi"))

    # 2.5 (optional) SemDeDup: LSH-bucketed cosine closure over the
    # exact-dedup survivors' embeddings; non-representatives drop. The
    # pair search + min-label closure run on the (small) embedding side
    # only — document bodies stay put; the drop set comes back as one
    # anti-join on id.
    if embeddings is not None:
        from duckpipe_spark.functions.similarity import semantic_dedup

        # the embedding join casts the doc id to bigint; a non-integral id
        # type would cast to all-NULL and the stage would silently no-op —
        # refuse loudly instead (same contract as positional_shingle_hashes)
        id_type = uniq.schema[id_col].dataType.simpleString()
        if id_type not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"SemDeDup stage needs an integral {id_col!r} to join "
                f"embeddings on {vec_id_col!r}; got {id_type}"
            )
        surv = uniq.select(F.col(id_col).cast("bigint").alias(vec_id_col))
        emb = embeddings.join(surv, vec_id_col, "left_semi")
        sd = semantic_dedup(
            emb,
            threshold=semdedup_threshold,
            id_col=vec_id_col,
            vec_col=vec_col,
            n_planes=semdedup_planes,
        )
        drop = sd.where(F.col("kept") == 0).select(
            F.col(vec_id_col).alias("__semdrop_id")
        )
        uniq = _persist(
            uniq.join(
                drop,
                F.col(id_col).cast("bigint") == F.col("__semdrop_id"),
                "left_anti",
            )
        )

    # 2.7 (optional) media near-dup: modality-partitioned fingerprint
    # pair graph over the survivors' codes, transitive min-id closure,
    # non-representatives drop. Mirrors the SemDeDup stage's shape: the
    # pair search + closure run on the (small) code side only; the drop
    # set comes back as one anti-join on id.
    if media_codes is not None:
        from duckpipe_spark.functions.multimodal import media_neardup_drops

        id_type = uniq.schema[id_col].dataType.simpleString()
        if id_type not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(
                f"media near-dup stage needs an integral {id_col!r} to join "
                f"codes on {media_id_col!r}; got {id_type}"
            )
        msurv = uniq.select(F.col(id_col).cast("bigint").alias(media_id_col))
        mcodes = media_codes.join(msurv, media_id_col, "left_semi")
        mdrop = media_neardup_drops(
            mcodes,
            max_distance=media_max_distance,
            max_band_df=media_max_band_df,
            id_col=media_id_col,
            modality_col=media_modality_col,
        )
        # spread by id (deterministic — see _persist note): this
        # boundary's three consumers (two span-dedup reads + the lang
        # join) each re-ran their shingle/hash kernels as ~1.4 s
        # single-task stages per rep when the cache kept the scan's ONE
        # partition (profiled on doc_curation_medianear_artifact)
        uniq = _persist(
            uniq.join(
                mdrop,
                F.col(id_col).cast("bigint") == F.col("drop_id"),
                "left_anti",
            ),
            spread_key=id_col,
        )

    # 3. duplicate-span removal over the survivor set → cleaned text
    cleaned = _persist(
        remove_duplicate_spans(
            uniq, window=span_window, id_col=id_col, text_col=text_col
        ).select(id_col, "clean_text")
    )

    # 4. decontamination on the CLEANED text: keep train-split docs whose
    # benchmark n-gram overlap stays under the cap (bench-split docs and
    # sub-k-token cleaned docs drop out with it, both deterministically)
    decon = decontamination_stats(
        cleaned,
        k=decontam_k,
        bench_bucket_min=bench_bucket_min,
        id_col=id_col,
        text_col="clean_text",
    )
    keep = decon.where(F.col("contamination") <= max_contamination).select(id_col)
    kept = cleaned.join(keep, id_col, "left_semi").join(
        uniq.select(id_col, lang_col), id_col
    )

    # 5-6. mixture resample to target language weights, then shard/order
    sampled = mixture_resample(
        kept, mix_weights, strata_col=lang_col, id_col=id_col
    ).select(id_col, lang_col, "clean_text")
    return shard_and_order(sampled, id_col, n_shards).select(
        id_col,
        lang_col,
        F.md5("clean_text").alias("clean_fp"),
        "shard",
        "pos",
    )


def source_rollup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-source curation dashboard in ONE shuffle: document count, exact
    duplicate rate (distinct normalized fingerprints vs docs), token volume,
    and mean quality — the report a data-mixture owner reads before
    weighting sources. All aggregates are exact integers summed
    order-independently; the two ratios are single final divisions, so the
    result is bit-identical across engines and partitionings."""
    from duckpipe_spark.functions.text import fingerprint_col, quality_points_col, tokens_col

    d = docs.select(
        F.col("source"),
        fingerprint_col(F.col(text_col)).alias("fp"),
        F.size(tokens_col(F.col(text_col))).cast("bigint").alias("n_tokens"),
        quality_points_col(F.col(text_col)).alias("qp"),
    )
    n_docs = F.count(F.lit(1))
    n_unique = F.countDistinct("fp")
    return d.groupBy("source").agg(
        n_docs.alias("n_docs"),
        n_unique.alias("n_unique"),
        ((n_docs - n_unique).cast("double") / n_docs).alias("dup_rate"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("qp").cast("double") / (n_docs * 3)).alias("avg_quality"),
    )


def mask_contaminated_spans(
    docs: DataFrame,
    k: int = 5,
    window: int = 10,
    bench_bucket_min: int = 90,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination as an ACTION, not just a report (the
    GPT-3-appendix recipe: remove a window around every benchmark n-gram
    collision): for each TRAIN document (same deterministic Lehmer split
    as ``decontamination_stats``), any non-overlapping ``window``-word
    span containing ANY PART of a k-gram that also occurs in a benchmark
    document is dropped (a k-gram can touch at most two consecutive spans
    since k <= window; both the start-span and the end-span are masked, so
    no token of a colliding k-gram survives a span boundary), and the
    cleaned text is rebuilt from the surviving spans — the sub-window tail
    is span index ``nwin`` and obeys the same rule. → (doc_id, n_spans,
    n_masked, clean_text) for every train doc (n_spans counts full spans +
    a nonempty tail; n_masked counts distinct dropped spans).

    Scale shape mirrors ``remove_duplicate_spans`` + the stats operator:
    positional k-gram hashes are an Arrow projection of the scan, the
    benchmark set is distinct-over-the-small-slice and BROADCAST, the
    per-doc masked-span lists are a sparse aggregate (collisions are the
    minority), and document bodies never leave their scan partitions —
    unmasked docs short-circuit to a whitespace-normalized token join."""
    from duckpipe_spark.functions.dedup import positional_shingle_hashes
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    if k > window:
        # the both-ends guarantee ("no token of a colliding k-gram
        # survives") holds only while a k-gram touches <= 2 consecutive
        # spans; k > window would silently leak every interior span
        raise ValueError(
            f"mask_contaminated_spans needs k <= window (got k={k}, window={window})"
        )
    w = int(window)
    # split BEFORE the shingle kernel: the bucket is a function of the id
    # alone, so filtering docs first (a) pushes the predicate into the
    # scan and (b) runs the Arrow kernel once over each slice instead of
    # twice over the whole corpus (the bench-set job and the hits job
    # each consumed a full-corpus kernel; measured 3.6→0.8 s warm at sf1,
    # 2.56×→0.57× of DuckDB)
    bucket = lehmer_hash_col(F.col(id_col)) % 100
    bench_docs = docs.where(bucket >= bench_bucket_min)
    train_docs = docs.where(bucket < bench_bucket_min)
    bench = (
        positional_shingle_hashes(bench_docs, text_col, id_col, k)
        .select("hv")
        .distinct()
    )
    # mask the span holding the k-gram's START and the one holding its END
    # (ADVICE r7: start-only left up to k-1 leaked tokens in the next span)
    hits = (
        positional_shingle_hashes(train_docs, text_col, id_col, k)
        .join(F.broadcast(bench), "hv")
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.col("pos") / w).cast("int"),
                        F.floor((F.col("pos") + k - 1) / w).cast("int"),
                    )
                )
            ).alias("si"),
        )
        .distinct()
    )
    masked = hits.groupBy("id").agg(F.collect_set("si").alias("_masked"))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        train_docs
        .select(F.col(id_col).alias("id"), toks.alias("_t"))
        .withColumn("_nwin", F.floor(F.size("_t") / w).cast("int"))
    )
    joined = base.join(masked, "id", "left")
    span_idx = F.when(
        F.col("_nwin") > 0, F.sequence(F.lit(0), F.col("_nwin") - 1)
    ).otherwise(F.array().cast("array<int>"))
    keep_idx = F.filter(span_idx, lambda i: ~F.array_contains("_masked", i))
    body = F.nullif(
        F.array_join(
            F.transform(keep_idx, lambda i: F.concat_ws(" ", F.slice("_t", i * w + 1, w))),
            " ",
        ),
        F.lit(""),
    )
    tail_len = F.size("_t") - F.col("_nwin") * w
    tail = F.when(
        (tail_len > 0) & ~F.array_contains(F.coalesce("_masked", F.array().cast("array<int>")), F.col("_nwin")),
        F.concat_ws(" ", F.slice("_t", F.col("_nwin") * w + 1, tail_len)),
    )
    clean = F.when(
        F.col("_masked").isNull(), F.array_join("_t", " ")
    ).otherwise(F.concat_ws(" ", body, tail))
    n_spans = F.col("_nwin") + F.when(tail_len > 0, F.lit(1)).otherwise(F.lit(0))
    n_masked = F.coalesce(F.size("_masked"), F.lit(0))
    return joined.select(
        F.col("id").alias(id_col),
        n_spans.cast("bigint").alias("n_spans"),
        n_masked.cast("bigint").alias("n_masked"),
        clean.alias("clean_text"),
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate removal as an ACTION (the C4/RefinedWeb line rule):
    any line whose trimmed text occurs in ≥ ``min_docs`` DISTINCT
    documents (headers, footers, cookie banners, license blurbs) is
    stripped from every document, and the text is rebuilt from the
    surviving lines. Empty/whitespace-only lines are dropped from the
    rebuild (normalization, matching the line-split rule of
    ``gopher_quality_flags``). → (doc_id, n_lines, n_stripped,
    clean_text) for every document.

    Scale shape: lines are a projection + explode of the scan; the
    document-frequency aggregate shuffles (line-hash, id)-distinct rows
    — not line text — and the boilerplate SET (df ≥ min_docs) is the
    heavy-hitter tail, tiny relative to the corpus and BROADCAST for the
    strip join back. Docs with no boilerplate lines short-circuit to the
    normalized line join; line content itself never takes a wide
    shuffle."""
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    base = docs.select(F.col(id_col).alias("id"), lines_arr.alias("_l"))
    exploded = base.select("id", F.explode(F.array_distinct("_l")).alias("line")).select(
        "id", F.md5("line").alias("lh")
    )
    boiler = (
        exploded.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("lh")
    )
    # per-doc boilerplate line-hash list (sparse: only docs that contain
    # at least one boilerplate line appear)
    doc_boiler = (
        exploded.join(F.broadcast(boiler), "lh")
        .groupBy("id")
        .agg(F.collect_set("lh").alias("_bl"))
    )
    joined = base.join(doc_boiler, "id", "left")
    kept = F.filter(F.col("_l"), lambda x: ~F.array_contains("_bl", F.md5(x)))
    n_lines = F.size("_l")
    clean = F.when(
        F.col("_bl").isNull(), F.array_join("_l", "\n")
    ).otherwise(F.array_join(kept, "\n"))
    n_stripped = F.when(F.col("_bl").isNull(), F.lit(0)).otherwise(
        n_lines - F.size(kept)
    )
    return joined.select(
        F.col("id").alias(id_col),
        n_lines.cast("bigint").alias("n_lines"),
        n_stripped.cast("bigint").alias("n_stripped"),
        clean.alias("clean_text"),
    )
