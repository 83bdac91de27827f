"""Data-selection queries (LM quality, DSIR importance, keep-best dedup,
prototype pruning) with exact DuckDB oracles.

The Spark side calls ``duckpipe_spark.functions.selection``; the oracle SQL
is generated from the same constants (POLY hash, bucket count, k-means
unroll) so both engines compute identical integers and doubles — see the
determinism notes in the functions module and relational.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.dedup import POLY_BASE, POLY_MOD, WORD_BASE
from duckpipe_spark.functions.sampling import lehmer_hash_sql
from duckpipe_spark.functions.selection import DSIR_BUCKETS
from duckpipe_spark.queries.base import register
from duckpipe_spark.queries.dedup_q import _CC_ORACLE
from duckpipe_spark.queries.similarity_q import _KM_ITERS, _KM_K, _KM_SCALE, _kmeans_oracle
from duckpipe_spark.sources.tables import load_table

# char-fold word hash as a SQL lambda body (the twin of char_poly_hash)
_WH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({w}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD})"
)

# --- CCNet-shape bigram-LM quality scoring ---------------------------------

_LM_TRAIN_PRED = "lang = 'en'"

# __BIG_HAVING__ is the count-floor prune hook: '' for the exact unpruned
# model, 'HAVING count(*) >= N' for the CCNet-style min_count=N prune
# (mirrors functions/selection.py's min_count — numerator-only, uni/v stay
# full, so surviving probabilities are identical either side)
_LM_CTES_TMPL = f"""toks AS (
  SELECT doc_id AS id, {_LM_TRAIN_PRED} AS is_train,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
wtoks AS (
  SELECT id, is_train, list_transform(t, w -> {_WH.format(w="w")}) AS wh, len(t) AS n
  FROM toks
),
pairs AS (
  SELECT id, is_train, i AS pos,
         (wh[i] * {WORD_BASE} + wh[i + 1]) % {POLY_MOD} AS bk,
         wh[i] AS pk
  FROM (SELECT id, is_train, wh, unnest(range(1, n)) AS i FROM wtoks WHERE n >= 2)
),
big AS (
  SELECT bk, CAST(count(*) AS BIGINT) AS c_bi FROM pairs WHERE is_train GROUP BY bk
  __BIG_HAVING__
),
uni AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS c_uni FROM pairs WHERE is_train GROUP BY pk
),
vstats AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT unnest(wh) AS w FROM wtoks WHERE is_train)
),
scored AS (
  SELECT p.id, p.pos,
         CAST(coalesce(b.c_bi, 0) + 1 AS DOUBLE) / (coalesce(u.c_uni, 0) + vs.v) AS pr
  FROM pairs p
  LEFT JOIN big b ON p.bk = b.bk
  LEFT JOIN uni u ON p.pk = u.pk
  CROSS JOIN vstats vs
),
lm AS (
  SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(pr ORDER BY pos)),
                       (a, x) -> a + x) / count(*), 6) AS lm_score
  FROM scored GROUP BY id
)"""


def _lm_ctes(min_count: int = 1) -> str:
    having = f"HAVING count(*) >= {min_count}" if min_count > 1 else ""
    return _LM_CTES_TMPL.replace("__BIG_HAVING__", having)


_LM_CTES = _lm_ctes()

_LM_ORACLE = f"""
WITH {_LM_CTES}
SELECT doc_id, n_bigrams, lm_score FROM lm
"""


@register(
    "doc_lm_quality",
    _LM_ORACLE,
    "CCNet-style bigram-LM quality score (train on lang='en', score all docs)",
    bench=True,  # two corpus passes + broadcast LM: a perf-tracked family head
)
def doc_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference surface: none (beyond-reference data-selection operator;
    CCNet = Wenzek et al. 2019). Docs with <2 tokens carry no bigram and
    are absent from the result — mirrored by the oracle's n >= 2 guard.

    The scan is spread (`spread_small_scan`, optimization r14 / guide
    §2.5): the train and score passes are per-token hash folds evaluated
    BEFORE any exchange, so on a one-row-group input both ran on a single
    core (measured: best rep 2.69 → 2.06 s at sf0.1; no-op on split
    inputs)."""
    from duckpipe_spark.functions.selection import lm_quality_score
    from duckpipe_spark.sources.tables import spread_small_scan

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    out = lm_quality_score(docs, F.col("lang") == "en")
    return out.select(F.col("id").alias("doc_id"), "n_bigrams", "lm_score")


# --- train/serve split: score through the persisted model --------------------


@register(
    "doc_lm_serve_scores",
    _LM_ORACLE,
    "LM serve path: score every doc through the 1-row trained model (train/serve split)",
)
def doc_lm_serve_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r8 item 8: the SERVE path as a registered oracle query. The
    model is trained once (``lm_train`` → one map row) and every document
    is scored through ``lm_score_with_model`` — the pure-projection
    stream-static shape that runs unchanged on a readStream (the
    streaming≡batch pytest pins exactly that; this query gives the same
    path hash-exact oracle evidence). Scores are bit-identical to
    ``lm_quality_score`` (pinned), so the oracle IS the batch LM oracle.

    The model row is collected once and re-literalized — the persisted-
    artifact semantics a serving pipeline has (train once, load the model
    from the artifact store). Leaving it lazy re-executes each of the
    three train aggregates inside the scoring plan (no persist hook in a
    registered query): measured 10.2 s vs 4.0 s at sf1. The collect is
    vocabulary-bounded (the same boundedness argument as lm_train's
    docstring; min_count prunes it further on diverse corpora)."""
    from duckpipe_spark.functions.selection import lm_score_with_model, lm_train

    docs = load_table(spark, sf_dir, "documents")
    row = lm_train(docs, F.col("lang") == "en").collect()[0]
    model = spark.createDataFrame(
        [(dict(row.big), dict(row.uni), row.v)],
        "big map<bigint,bigint>, uni map<bigint,bigint>, v bigint",
    )
    out = lm_score_with_model(docs, model)
    return out.select(F.col("id").alias("doc_id"), "n_bigrams", "lm_score")


# --- count-floor-pruned LM (the bounded-broadcast serving model) -------------

_LM_MIN_COUNT = 2

_LM_PRUNED_ORACLE = f"""
WITH {_lm_ctes(_LM_MIN_COUNT)}
SELECT doc_id, n_bigrams, lm_score FROM lm
"""


@register(
    "doc_lm_quality_pruned",
    _LM_PRUNED_ORACLE,
    "bigram-LM quality under the count-floor-pruned model (min_count=2, bounded broadcast)",
)
def doc_lm_quality_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r8 item 5: the PRODUCTION shape of the LM gate. The unpruned
    bigram map grows with train-corpus diversity (singleton bigram types
    dominate under Zipf — multi-GB at a web-scale train slice);
    min_count=2 drops singletons from the numerator map, bounding the
    broadcast, while uni/V stay full so surviving probabilities are
    IDENTICAL to the unpruned model's (pruned bigrams score as unseen).
    Oracle in lockstep via the same HAVING floor."""
    from duckpipe_spark.functions.selection import lm_quality_score

    docs = load_table(spark, sf_dir, "documents")
    out = lm_quality_score(docs, F.col("lang") == "en", min_count=_LM_MIN_COUNT)
    return out.select(F.col("id").alias("doc_id"), "n_bigrams", "lm_score")


# --- CCNet head/middle/tail LM buckets ---------------------------------------

_LM_BUCKETS_ORACLE = f"""
WITH {_LM_CTES}
SELECT lm.doc_id, d.lang, lm.lm_score,
       CAST(ntile(3) OVER (PARTITION BY d.lang
                           ORDER BY lm.lm_score DESC, lm.doc_id ASC) AS BIGINT)
         AS lm_bucket
FROM lm JOIN documents d ON lm.doc_id = d.doc_id
"""


@register(
    "doc_lm_buckets",
    _LM_BUCKETS_ORACLE,
    "CCNet head/middle/tail buckets: per-language ntile(3) over the LM score",
)
def doc_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation DECISION CCNet makes with its perplexity scores:
    per-language thirds (head = most in-domain). ntile is exact integer
    math over a total order ((score desc, doc_id) — no float-boundary
    percentile), so the bucket assignment is engine-portable. One extra
    shuffle on lang; the window sort parallelizes across languages."""
    from pyspark.sql import Window

    from duckpipe_spark.functions.selection import lm_quality_score

    docs = load_table(spark, sf_dir, "documents")
    scores = lm_quality_score(docs, F.col("lang") == "en")
    w = Window.partitionBy("lang").orderBy(
        F.col("lm_score").desc(), F.col("id").asc()
    )
    return (
        scores.join(docs.select(F.col("doc_id").alias("id"), "lang"), "id")
        .withColumn("lm_bucket", F.ntile(3).over(w).cast("bigint"))
        .select(F.col("id").alias("doc_id"), "lang", "lm_score", "lm_bucket")
    )


# --- CCNet-style final draw: stratified sample per (lang, LM bucket) --------

_BUCKET_SAMPLE_K = 20

_LM_BUCKET_SAMPLE_ORACLE = f"""
WITH {_LM_CTES},
lmb AS (
  SELECT lm.doc_id, d.lang,
         CAST(ntile(3) OVER (PARTITION BY d.lang
                             ORDER BY lm.lm_score DESC, lm.doc_id ASC) AS BIGINT)
           AS lm_bucket
  FROM lm JOIN documents d ON lm.doc_id = d.doc_id
),
ranked AS (
  SELECT doc_id, lang, lm_bucket,
         row_number() OVER (
           PARTITION BY coalesce(lang, chr(0)) || '|' || CAST(lm_bucket AS VARCHAR)
           ORDER BY ({lehmer_hash_sql('doc_id')}) ASC, doc_id ASC
         ) AS sample_rank
  FROM lmb
)
SELECT doc_id, lang, lm_bucket, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= {_BUCKET_SAMPLE_K}
"""


@register(
    "doc_lm_bucket_sample",
    _LM_BUCKET_SAMPLE_ORACLE,
    "CCNet-style final draw: exactly-k deterministic sample per (lang, LM bucket)",
)
def doc_lm_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus CCNet actually ships: head/middle/tail LM buckets per
    language (``doc_lm_buckets``' exact-ntile decision), then an
    exactly-k-per-stratum deterministic draw (``stratified_sample``'s
    Lehmer ranking) over the (lang, bucket) strata — so every language
    contributes a quality-balanced slice instead of the head-only cut a
    global score floor would take. Pure composition of two verified
    operators; the stratum key is the bijective ``lang|bucket`` concat
    (langs carry no '|'). Shuffle shape: the bucket window's lang
    exchange + the sample window's stratum exchange — both key-bounded."""
    from duckpipe_spark.functions.sampling import stratified_sample

    buckets = doc_lm_buckets(spark, sf_dir).select("doc_id", "lang", "lm_bucket")
    strata = buckets.withColumn(
        "stratum",
        F.concat_ws(
            "|",
            F.coalesce("lang", F.lit("\x00")),
            F.col("lm_bucket").cast("string"),
        ),
    )
    out = stratified_sample(strata, "stratum", _BUCKET_SAMPLE_K)
    return out.select("doc_id", "lang", "lm_bucket", "sample_rank")


# --- DSIR-shape hashed-unigram importance scores ----------------------------

_DSIR_TARGET_PRED = "lang = 'en'"
_B = DSIR_BUCKETS

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id AS id, {_DSIR_TARGET_PRED} AS is_target,
         {_WH.format(w="w")} % {_B} AS b
  FROM (SELECT doc_id, lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents)
),
doc_counts AS (
  SELECT id, b, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY id, b
),
raw AS (SELECT b, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY b),
tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS t FROM tok WHERE is_target GROUP BY b),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS big_r,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS big_t
  FROM tok
),
buckets AS (
  SELECT raw.b,
         CAST((coalesce(tgt.t, 0) + 1) * (tt.big_r + {_B})
              - (raw.r + 1) * (tt.big_t + {_B}) AS DOUBLE)
         / CAST((raw.r + 1) * (tt.big_t + {_B}) AS DOUBLE) AS lr
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN totals tt
)
SELECT id AS doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       round(
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY b)),
                     (a, x) -> a + x) / sum(c), 6) AS dsir_score
FROM (
  SELECT d.id, d.b, d.c, CAST(d.c AS DOUBLE) * bu.lr AS contrib
  FROM doc_counts d JOIN buckets bu ON d.b = bu.b
) GROUP BY id
"""


@register(
    "doc_dsir_scores",
    _DSIR_ORACLE,
    "DSIR-style hashed-unigram importance score (target = lang='en')",
    bench=True,  # r8 data-selection family ratio-tracked round-over-round
)
def doc_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference surface: none (beyond-reference; DSIR = Xie et al. 2023,
    log-free first-order surrogate — see functions/selection.py).

    NOT spread: a paired r14 sweep measured the scan-spread exchange a
    small LOSS here (min 1.29 → 1.40 s at sf0.1) — the unigram hash fold
    is light enough that scan-stage fusion wins (guide §1.2)."""
    from duckpipe_spark.functions.selection import dsir_scores

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_scores(docs, F.col("lang") == "en")
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "dsir_score")


# --- DSIR serve path: score through the full-support bucket model ------------

_DSIR_SERVE_ORACLE = f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id AS id, {_DSIR_TARGET_PRED} AS is_target,
         {_WH.format(w="w")} % {_B} AS b
  FROM (SELECT doc_id, lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents)
),
raw AS (SELECT b, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY b),
tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS t FROM tok WHERE is_target GROUP BY b),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS big_r,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS big_t
  FROM tok
),
allb AS (SELECT unnest(range(0, {_B})) AS b),
buckets AS MATERIALIZED (
  SELECT allb.b,
         CAST((coalesce(tgt.t, 0) + 1) * (tt.big_r + {_B})
              - (coalesce(raw.r, 0) + 1) * (tt.big_t + {_B}) AS DOUBLE)
         / CAST((coalesce(raw.r, 0) + 1) * (tt.big_t + {_B}) AS DOUBLE) AS lr
  FROM allb LEFT JOIN raw ON allb.b = raw.b
            LEFT JOIN tgt ON allb.b = tgt.b
            CROSS JOIN totals tt
)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lr ORDER BY b)),
                     (a, x) -> a + x) / count(*), 6) AS dsir_score
FROM (SELECT t.id, t.b, bu.lr FROM tok t JOIN buckets bu ON t.b = bu.b)
GROUP BY id
"""


@register(
    "doc_dsir_serve_scores",
    _DSIR_SERVE_ORACLE,
    "DSIR serve path: per-token fold through the full-support B-bucket model",
)
def doc_dsir_serve_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR train/serve split as a registered oracle query — and the
    oracle evidence for the ADVICE r8 full-bucket-support fix: the trained
    model carries lr for ALL 0..B-1 buckets (unseen buckets get the
    smoothed r = t = 0 ratio), and the serve scorer folds lr one TOKEN at
    a time in bucket-sorted order (the oracle mirrors that exact fold —
    it differs from doc_dsir_scores' count-weighted fold only in c·x vs
    repeated-addition ulps, which the shared 6-dp rounding absorbs; ties
    in the sort carry identical lr values, so tie order cannot change the
    float sequence)."""
    from duckpipe_spark.functions.selection import dsir_score_with_model, dsir_train

    docs = load_table(spark, sf_dir, "documents")
    model = dsir_train(docs, F.col("lang") == "en")
    out = dsir_score_with_model(docs, model)
    return out.select(F.col("id").alias("doc_id"), "n_tokens", "dsir_score")


# --- keep-best near-dup cluster resolution ----------------------------------

_KEEP_BEST_ORACLE = f"""
WITH comp AS (
  {_CC_ORACLE}
),
dq AS (
  SELECT doc_id AS id,
         (
           (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
           + (CASE WHEN (CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                         / len(string_split_regex(trim(text), '\\s+'))) BETWEEN 2.0 AND 12.0
                   THEN 1 ELSE 0 END)
           + (CASE WHEN (CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                         / length(text)) <= 0.1
                   THEN 1 ELSE 0 END)
         )::BIGINT AS qp,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks
  FROM documents
),
j AS (
  SELECT dq.id, coalesce(comp.component, dq.id) AS component, dq.qp, dq.n_toks
  FROM dq LEFT JOIN comp ON dq.id = comp.id
)
SELECT id AS doc_id, component, qp, n_toks,
       row_number() OVER (PARTITION BY component
                          ORDER BY qp DESC, n_toks DESC, id ASC) = 1 AS is_kept
FROM j
"""


@register(
    "doc_dedup_keep_best",
    _KEEP_BEST_ORACLE,
    "near-dup cluster resolution keeping the highest-quality member per cluster",
)
def doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the LSH-pair connected-components closure (doc_dup_components'
    recursive-CTE oracle, spliced as a CTE) with the Gopher-style quality
    points: the curation decision of WHICH duplicate survives."""
    from duckpipe_spark.functions.selection import dedup_keep_best

    return dedup_keep_best(load_table(spark, sf_dir, "documents"))


# --- SSL-prototypes pruning over the trained k-means ------------------------

_PROTO_PRUNE_FRAC = 0.25

_PROTO_ORACLE = f"""
WITH km AS (
  {_kmeans_oracle(_KM_K, _KM_ITERS, _KM_SCALE)}
),
qv2 AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)) AS v
  FROM embeddings
),
a AS (SELECT km.id, km.cell, qv2.v FROM km JOIN qv2 ON km.id = qv2.id),
cents AS (
  SELECT cell, list(c ORDER BY pos) AS cv FROM (
    SELECT cell, pos, CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS c FROM (
      SELECT cell, pos, v[pos] AS val FROM (
        SELECT cell, v, unnest(range(1, len(v) + 1)) AS pos FROM a
      )
    ) GROUP BY cell, pos
  ) GROUP BY cell
),
d AS (
  SELECT a.id, a.cell,
         CAST(list_sum(list_transform(range(1, len(a.v) + 1),
              i -> (a.v[i] - c.cv[i]) * (a.v[i] - c.cv[i]))) AS BIGINT) AS dist
  FROM a JOIN cents c ON a.cell = c.cell
),
r AS (
  SELECT id, cell, dist,
         CAST(row_number() OVER (PARTITION BY cell ORDER BY dist, id) AS BIGINT) AS cell_rank,
         CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
  FROM d
)
SELECT id AS vec_id, cell, dist, cell_rank,
       cell_rank > CAST(floor({_PROTO_PRUNE_FRAC} * n_cell) AS BIGINT) AS is_kept
FROM r
"""


@register(
    "embedding_prototype_prune",
    _PROTO_ORACLE,
    "SSL-prototypes pruning: drop the most-prototypical quarter of every k-means cell",
)
def embedding_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extends the unrolled integer-Lloyd oracle (embedding_kmeans_cells)
    with a final-assignment centroid recompute + per-cell distance rank —
    Sorscher et al. 2022's easy-example pruning as one lazy plan."""
    from duckpipe_spark.functions.selection import prototype_prune

    return prototype_prune(
        load_table(spark, sf_dir, "embeddings"),
        k=_KM_K,
        iters=_KM_ITERS,
        scale=_KM_SCALE,
        prune_frac=_PROTO_PRUNE_FRAC,
    )


# --- calibration: cheap LM score vs independent surface-quality points -------

_CALIB_ORACLE = f"""
WITH {_LM_CTES},
qp AS (
  SELECT doc_id,
         CAST(
           (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
           + (CASE WHEN (CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                         / len(string_split_regex(trim(text), '\\s+'))) BETWEEN 2.0 AND 12.0
                   THEN 1 ELSE 0 END)
           + (CASE WHEN (CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                         / length(text)) <= 0.1
                   THEN 1 ELSE 0 END)
         AS BIGINT) AS qp
  FROM documents
),
deciled AS (
  SELECT lm.doc_id, lm.lm_score, qp.qp,
         CAST(ntile(10) OVER (ORDER BY lm.lm_score DESC, lm.doc_id ASC) AS BIGINT) AS lm_decile
  FROM lm JOIN qp ON lm.doc_id = qp.doc_id
)
SELECT lm_decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(qp) AS BIGINT) AS total_qp,
       CAST(sum(qp) AS DOUBLE) / (count(*) * 3) AS mean_quality
FROM deciled GROUP BY lm_decile
"""


@register(
    "doc_quality_calibration",
    _CALIB_ORACLE,
    "calibration: LM-score deciles vs the independent surface-quality points",
)
def doc_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validation a filter owner runs before trusting a cheap score:
    bucket the corpus into LM-score deciles and report the mean of the
    INDEPENDENT surface-quality points per decile — a monotone-ish curve
    says the two signals agree; a flat one says the LM gate is noise.
    Exact integer window (ntile) + integer sums; one division per row.

    Scale shape: the global decile ntile is an UNPARTITIONED window — the
    entire scored corpus serializes through one partition for the rank.
    That is deliberate and accepted for this REPORT query only (global
    deciles need a total order; the input is one (id, score, qp) row per
    doc, so the single partition holds ~24 bytes/doc — bounded by the
    scored-doc count, not the corpus bytes). If this query ever joins the
    bench set or a hot path, replace the window with a two-pass boundary
    computation: aggregate approx/exact decile boundaries first, then
    assign buckets with a broadcast range join — no global sort."""
    from pyspark.sql import Window

    from duckpipe_spark.functions.selection import lm_quality_score
    from duckpipe_spark.functions.text import quality_points_col

    docs = load_table(spark, sf_dir, "documents")
    scores = lm_quality_score(docs, F.col("lang") == "en")
    qp = docs.select(
        F.col("doc_id").alias("id"), quality_points_col(F.col("text")).alias("qp")
    )
    w = Window.orderBy(F.col("lm_score").desc(), F.col("id").asc())
    n = F.count(F.lit(1))
    return (
        scores.join(qp, "id")
        .withColumn("lm_decile", F.ntile(10).over(w).cast("bigint"))
        .groupBy("lm_decile")
        .agg(
            n.cast("bigint").alias("n_docs"),
            F.sum("qp").cast("bigint").alias("total_qp"),
            (F.sum("qp").cast("double") / (n * 3)).alias("mean_quality"),
        )
    )


# --- UniMax per-language token budgets (water-filling under an epoch cap) -----

_UNIMAX_BUDGET = 500_000
_UNIMAX_EPOCHS = 4

_UNIMAX_ORACLE = f"""
WITH avail AS (
  SELECT lang,
         CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS avail
  FROM documents GROUP BY lang
),
ranked AS (
  SELECT lang, avail, avail * {_UNIMAX_EPOCHS} AS cap,
         row_number() OVER (ORDER BY avail * {_UNIMAX_EPOCHS} ASC, lang ASC) AS j,
         coalesce(sum(avail * {_UNIMAX_EPOCHS}) OVER (
           ORDER BY avail * {_UNIMAX_EPOCHS} ASC, lang ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
         count(*) OVER () AS n
  FROM avail
),
flagged AS (
  SELECT *, (cap * (n - j + 1) <= {_UNIMAX_BUDGET} - prefix) AS is_capped FROM ranked
),
caps AS (
  SELECT CAST(sum(CASE WHEN is_capped THEN cap ELSE 0 END) AS BIGINT) AS capped_sum,
         CAST(sum(CASE WHEN is_capped THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM flagged
)
SELECT lang, avail AS avail_tokens, CAST(cap AS BIGINT) AS cap_tokens,
       round(CASE WHEN is_capped THEN CAST(cap AS DOUBLE)
             ELSE (CAST({_UNIMAX_BUDGET} AS DOUBLE) - CAST(capped_sum AS DOUBLE))
                  / CAST(n - k AS DOUBLE) END, 6) AS alloc_tokens,
       round((CASE WHEN is_capped THEN CAST(cap AS DOUBLE)
             ELSE (CAST({_UNIMAX_BUDGET} AS DOUBLE) - CAST(capped_sum AS DOUBLE))
                  / CAST(n - k AS DOUBLE) END) / CAST(avail AS DOUBLE), 6) AS epochs
FROM flagged CROSS JOIN caps
"""


@register(
    "lang_unimax_budgets",
    _UNIMAX_ORACLE,
    "UniMax water-filling: per-language token budgets under a max-epochs cap",
)
def lang_unimax_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multilingual budget DECISION (UniMax, Chung et al. 2023):
    spread the token budget as uniformly as languages allow, capping each
    at max_epochs x its available tokens. Closed-form water-filling over
    the per-language totals — integer capped test, one terminal division
    (see functions/selection.py)."""
    from duckpipe_spark.functions.selection import unimax_allocation

    return unimax_allocation(
        load_table(spark, sf_dir, "documents"),
        budget=_UNIMAX_BUDGET,
        max_epochs=_UNIMAX_EPOCHS,
    )


# --- exact AUC of the LM score against the language pseudo-label --------------

_AUC_ORACLE = f"""
WITH {_LM_CTES},
lab AS (
  SELECT lm.doc_id, lm.lm_score AS s, (d.lang = 'en') AS y
  FROM lm JOIN documents d ON lm.doc_id = d.doc_id
),
g AS (
  SELECT s, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS mp
  FROM lab GROUP BY s
),
contrib AS (
  SELECT m, mp,
         mp * (2 * coalesce(sum(m) OVER (ORDER BY s ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + m + 1) AS contrib
  FROM g
),
agg AS (
  SELECT CAST(sum(contrib) AS BIGINT) AS rs2,
         CAST(sum(mp) AS BIGINT) AS n_pos,
         CAST(sum(m - mp) AS BIGINT) AS n_neg
  FROM contrib
)
SELECT n_pos, n_neg,
       round(CAST(rs2 - n_pos * (n_pos + 1) AS DOUBLE)
             / CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc
FROM agg
"""


@register(
    "doc_lm_auc",
    _AUC_ORACLE,
    "exact tie-corrected AUC: does the en-trained LM score rank en docs first?",
)
def doc_lm_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality eval for the cheap LM gate: exact Mann-Whitney AUC
    of the lm_score against the (lang = 'en') pseudo-label — the LM is
    trained ON the en slice, so an AUC near 0.5 would mean the gate
    cannot even find its own training domain. Integer rank sums with
    half-credit ties, one terminal division (see score_auc)."""
    from duckpipe_spark.functions.selection import lm_quality_score, score_auc

    docs = load_table(spark, sf_dir, "documents")
    scores = lm_quality_score(docs, F.col("lang") == "en")
    lab = scores.join(
        docs.select(F.col("doc_id").alias("id"), (F.col("lang") == "en").alias("y")),
        "id",
    )
    return score_auc(lab, label_col="y", score_col="lm_score")
