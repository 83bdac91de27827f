"""Corpus-hygiene queries (decontamination, boilerplate, repetition,
mixture resampling) with exact DuckDB oracles.

These are the curation operators a training-data pipeline runs between raw
ingestion and packing: strip benchmark-contaminated and boilerplate-heavy
documents, flag degenerate repetition, and rebalance the language mixture —
all deterministic so the kept set is reproducible across engines and runs.
Oracle SQL is generated from the same hash constants as the Spark side (see
dedup_q.py for the word-hash shingle pipeline this mirrors).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.dedup import POLY_BASE, POLY_MOD, WORD_BASE
from duckpipe_spark.functions.sampling import lehmer_hash_sql
from duckpipe_spark.functions.text import PUNCT_CLASS
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table


def _word_hash_shingles_sql(k: int) -> str:
    """Word-hash shingle CTE chain for arbitrary k (generalizes dedup_q's
    k=3 pipeline): fold each word's chars once, combine k word hashes with a
    second rolling fold. Ends with ``hv(id, hv)`` of per-doc-distinct hashes."""
    combine = "w[i]"
    for j in range(1, k):
        combine = f"({combine} * {WORD_BASE} + w[i+{j}]) % {POLY_MOD}"
    return f"""toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
wh AS (
  SELECT id, list_transform(t, x -> list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(x, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, y) -> (acc * {POLY_BASE} + y) % {POLY_MOD}
  )) AS w, len(t) AS n
  FROM toks WHERE len(t) >= {k}
),
idx AS (
  SELECT id, w, unnest(range(1, n - {k - 2})) AS i FROM wh
),
hv AS (
  SELECT DISTINCT id, {combine} AS hv FROM idx
)"""


# ---------------------------------------------------------------------------
# benchmark decontamination — n-gram overlap between the train and benchmark
# sides of the deterministic hash split
# ---------------------------------------------------------------------------

_DECON_K = 5
_BENCH_BUCKET_MIN = 90

_DECON_ORACLE = f"""
WITH {_word_hash_shingles_sql(_DECON_K)},
split AS (
  SELECT id, hv, ({lehmer_hash_sql('id')}) % 100 AS b FROM hv
),
bench AS (SELECT DISTINCT hv FROM split WHERE b >= {_BENCH_BUCKET_MIN}),
train AS (SELECT id, hv FROM split WHERE b < {_BENCH_BUCKET_MIN}),
sizes AS (SELECT id, count(*) AS n_ngrams FROM train GROUP BY id),
hits AS (
  SELECT t.id, count(*) AS n_shared FROM train t JOIN bench USING (hv) GROUP BY t.id
)
SELECT s.id AS doc_id, s.n_ngrams,
       COALESCE(h.n_shared, 0) AS n_shared,
       CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / s.n_ngrams AS contamination
FROM sizes s LEFT JOIN hits h USING (id)
"""


@register(
    "doc_decontamination",
    _DECON_ORACLE,
    "per-train-doc count of word-5-gram hashes shared with the benchmark split",
)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.corpus import decontamination_stats

    return decontamination_stats(
        load_table(spark, sf_dir, "documents"), k=_DECON_K, bench_bucket_min=_BENCH_BUCKET_MIN
    )


# ---------------------------------------------------------------------------
# cross-document boilerplate n-grams
# ---------------------------------------------------------------------------

_BOILER_K = 3
_BOILER_MIN_DOCS = 3

_BOILER_ORACLE = f"""
WITH {_word_hash_shingles_sql(_BOILER_K)},
boiler AS (
  SELECT hv FROM (SELECT hv, count(*) AS df FROM hv GROUP BY hv) WHERE df >= {_BOILER_MIN_DOCS}
),
sizes AS (SELECT id, count(*) AS n_ngrams FROM hv GROUP BY id),
hits AS (
  SELECT v.id, count(*) AS n_boiler FROM hv v JOIN boiler USING (hv) GROUP BY v.id
)
SELECT s.id AS doc_id, s.n_ngrams,
       COALESCE(h.n_boiler, 0) AS n_boiler,
       CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / s.n_ngrams AS boiler_frac
FROM sizes s LEFT JOIN hits h USING (id)
"""


@register(
    "doc_boilerplate",
    _BOILER_ORACLE,
    "fraction of each doc's 3-grams occurring in ≥3 distinct docs (boilerplate)",
)
def doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.corpus import boilerplate_stats

    return boilerplate_stats(
        load_table(spark, sf_dir, "documents"), k=_BOILER_K, min_docs=_BOILER_MIN_DOCS
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
b AS (
  SELECT doc_id, t, len(t) AS n,
         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
  FROM toks WHERE len(t) >= 2
),
stats AS (
  SELECT doc_id, n AS n_tokens, n - 1 AS n_bigrams,
         1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / (n - 1) AS dup_bigram_frac
  FROM b
),
tf AS (
  SELECT doc_id, unnest(t) AS term FROM b
),
tfc AS (
  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
),
top AS (
  SELECT doc_id, term AS top_token, tf FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS rk
    FROM tfc
  ) WHERE rk = 1
)
SELECT s.doc_id, s.n_tokens, s.n_bigrams, s.dup_bigram_frac,
       t.top_token, CAST(t.tf AS DOUBLE) / s.n_tokens AS top_token_frac
FROM stats s JOIN top t USING (doc_id)
"""


@register(
    "doc_repetition_stats",
    _REPETITION_ORACLE,
    "Gopher-style repetition: duplicate-bigram fraction + top-token mass",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.text import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# deterministic mixture resampling to target language weights
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = {"en": 5, "de": 2, "es": 2, "fr": 1, "zh": 2}

_MIX_VALUES = ", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))

_MIX_ORACLE = f"""
WITH w(lang, wt) AS (VALUES {_MIX_VALUES}),
counts AS (
  SELECT lang, wt, count(*) AS c FROM documents JOIN w USING (lang) GROUP BY lang, wt
),
scale AS (SELECT min(CAST(c AS DOUBLE) / wt) AS s FROM counts),
targets AS (
  SELECT lang, CAST(floor(wt * s) AS BIGINT) AS target_n FROM counts CROSS JOIN scale
),
ranked AS (
  SELECT d.doc_id, d.lang, t.target_n,
         row_number() OVER (
           PARTITION BY d.lang ORDER BY ({lehmer_hash_sql('d.doc_id')}) ASC, d.doc_id ASC
         ) AS sample_rank
  FROM documents d JOIN targets t USING (lang)
)
SELECT doc_id, lang, sample_rank FROM ranked WHERE sample_rank <= target_n
"""


@register(
    "doc_mixture_resample",
    _MIX_ORACLE,
    "largest exact-mixture downsample to target language weights (Lehmer order)",
)
def doc_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.sampling import mixture_resample

    docs = load_table(spark, sf_dir, "documents")
    return mixture_resample(docs, _MIX_WEIGHTS).select("doc_id", "lang", "sample_rank")


# ---------------------------------------------------------------------------
# duplicate-span removal (Lee et al. 2021 substring dedup, word-window form)
# ---------------------------------------------------------------------------

_SPAN_W = 10

_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
base AS (
  SELECT id, t, len(t) AS n, CAST(floor(len(t) / {_SPAN_W}) AS INT) AS nwin FROM toks
),
wins AS (
  SELECT id, unnest(range(0, nwin)) AS i, t FROM base
),
hashed AS (
  SELECT id, i,
         array_to_string(list_slice(t, i * {_SPAN_W} + 1, i * {_SPAN_W} + {_SPAN_W}), ' ') AS span,
         md5(array_to_string(list_slice(t, i * {_SPAN_W} + 1, i * {_SPAN_W} + {_SPAN_W}), ' ')) AS h
  FROM wins
),
firstdoc AS (SELECT h, min(id) AS fid FROM hashed GROUP BY h),
firstwin AS (
  SELECT w.h, f.fid, min(w.i) AS fi
  FROM hashed w JOIN firstdoc f ON w.h = f.h AND w.id = f.fid
  GROUP BY w.h, f.fid
),
kept AS (
  SELECT w.id, w.i, w.span
  FROM hashed w JOIN firstwin f ON w.h = f.h AND w.id = f.fid AND w.i = f.fi
),
body AS (
  SELECT id, string_agg(span, ' ' ORDER BY i) AS body, count(*) AS n_kept
  FROM kept GROUP BY id
),
tails AS (
  SELECT id, nwin,
         CASE WHEN n > nwin * {_SPAN_W}
              THEN array_to_string(list_slice(t, nwin * {_SPAN_W} + 1, n), ' ')
         END AS tail
  FROM base
)
SELECT t.id AS doc_id,
       CAST(t.nwin AS BIGINT) AS n_spans,
       CAST(t.nwin - COALESCE(b.n_kept, 0) AS BIGINT) AS n_dropped,
       concat_ws(' ', b.body, t.tail) AS clean_text
FROM tails t LEFT JOIN body b USING (id)
"""


@register(
    "doc_span_dedup",
    _SPAN_ORACLE,
    "duplicate-span removal: keep globally-first 10-word spans, rebuild text",
)
def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.corpus import remove_duplicate_spans

    return remove_duplicate_spans(load_table(spark, sf_dir, "documents"), window=_SPAN_W)


# ---------------------------------------------------------------------------
# END-TO-END curation pipeline: quality gate → exact dedup → span dedup →
# decontamination → mixture resample → shard/order (VERDICT r6 item 3 — the
# integration query; one multi-CTE oracle mirrors every stage)
# ---------------------------------------------------------------------------

_PIPE_MIN_TOKENS = 10
_PIPE_MIN_POINTS = 2
_PIPE_SPAN_W = 10
_PIPE_DECON_K = 5
_PIPE_BENCH_MIN = 90
_PIPE_MAX_CONTAM = 0.05
_PIPE_WEIGHTS = {"en": 3, "de": 1, "es": 1, "fr": 1, "zh": 1}
_PIPE_SHARDS = 4

_PIPE_MIX_VALUES = ", ".join(f"('{s}', {w})" for s, w in sorted(_PIPE_WEIGHTS.items()))
_PIPE_H = lehmer_hash_sql("doc_id")


def _pipe_decon_combine(k: int) -> str:
    combine = "w[i]"
    for j in range(1, k):
        combine = f"({combine} * {WORD_BASE} + w[i+{j}]) % {POLY_MOD}"
    return combine


def _lm_gate_ctes(min_score: float, min_count: int = 1) -> str:
    """CCNet LM-gate stage as CTEs over ``gated`` (the quality-passed
    corpus): train the add-one bigram LM on gated's lang='en' slice,
    score every gated doc, keep score >= min_score. Mirrors
    selection_q's _LM_CTES with the corpus source swapped (the pipeline
    trains on the GATED set — garbage filtered before it can pollute the
    LM). Comparison happens on the 6-dp-rounded score, so the keep set
    is engine-portable."""
    from duckpipe_spark.queries.selection_q import _WH

    wh = _WH.format(w="w")
    return f""",
lmtoks AS MATERIALIZED (
  SELECT doc_id AS id, lang = 'en' AS is_train,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM gated
),
lmw AS MATERIALIZED (
  SELECT id, is_train, list_transform(t, w -> {wh}) AS wh, len(t) AS n FROM lmtoks
),
lmpairs AS MATERIALIZED (
  SELECT id, is_train, i AS pos,
         (wh[i] * {WORD_BASE} + wh[i + 1]) % {POLY_MOD} AS bk,
         wh[i] AS pk
  FROM (SELECT id, is_train, wh, unnest(range(1, n)) AS i FROM lmw WHERE n >= 2)
),
lmbig AS (
  SELECT bk, CAST(count(*) AS BIGINT) AS c_bi FROM lmpairs WHERE is_train GROUP BY bk
  {f"HAVING count(*) >= {min_count}" if min_count > 1 else ""}
),
lmuni AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS c_uni FROM lmpairs WHERE is_train GROUP BY pk
),
lmv AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT unnest(wh) AS w FROM lmw WHERE is_train)
),
lmscored AS (
  SELECT p.id, p.pos,
         CAST(coalesce(b.c_bi, 0) + 1 AS DOUBLE) / (coalesce(u.c_uni, 0) + vs.v) AS pr
  FROM lmpairs p
  LEFT JOIN lmbig b ON p.bk = b.bk
  LEFT JOIN lmuni u ON p.pk = u.pk
  CROSS JOIN lmv vs
),
lmsc AS MATERIALIZED (
  SELECT id,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(pr ORDER BY pos)),
                           (a, x) -> a + x) / count(*), 6) AS lm_score
  FROM lmscored GROUP BY id
),
lgated AS (
  SELECT g.doc_id, g.text, g.lang
  FROM gated g JOIN lmsc ON g.doc_id = lmsc.id
  WHERE lmsc.lm_score >= {min_score!r}
)"""


def _pipeline_oracle(
    lm_min_score: float | None = None,
    election: str = "min_id",
    lm_min_count: int = 1,
) -> str:
    lm_block = (
        "" if lm_min_score is None else _lm_gate_ctes(lm_min_score, lm_min_count)
    )
    src = "gated" if lm_min_score is None else "lgated"
    gated_kw = "gated AS (" if lm_min_score is None else "gated AS MATERIALIZED ("
    if election == "keep_best":
        # dedup_keep_best's decision at the exact-dup stage: recompute the
        # quality points + token count from the survivor candidates' text
        # (exactly what the Spark branch does) and take the window top-1
        canon = f"""canon AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
      PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
      ORDER BY
        ((CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
         + (CASE WHEN (CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                       / len(string_split_regex(trim(text), '\\s+'))) BETWEEN 2.0 AND 12.0
                 THEN 1 ELSE 0 END)
         + (CASE WHEN (CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)
                       / length(text)) <= 0.1
                 THEN 1 ELSE 0 END)) DESC,
        len(string_split_regex(trim(text), '\\s+')) DESC,
        doc_id ASC) AS rn
    FROM {src}
  ) WHERE rn = 1
)"""
    else:
        canon = f"""canon AS (
  SELECT min(doc_id) AS doc_id
  FROM {src}
  GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
)"""
    return f"""
WITH q AS (
  SELECT doc_id, text, lang,
         len(string_split_regex(trim(text), '\\s+')) AS n,
         CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
           / len(string_split_regex(trim(text), '\\s+')) AS avg_len,
         CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE)
           / length(text) AS punct_ratio
  FROM documents
),
{gated_kw}
  SELECT doc_id, text, lang FROM q
  WHERE n >= {_PIPE_MIN_TOKENS}
    AND ((CASE WHEN n BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
       + (CASE WHEN avg_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END)
       + (CASE WHEN punct_ratio <= 0.1 THEN 1 ELSE 0 END)) >= {_PIPE_MIN_POINTS}
){lm_block},
{canon},
uniq AS MATERIALIZED (SELECT g.doc_id, g.text, g.lang FROM {src} g JOIN canon USING (doc_id)),{_PIPELINE_REST}"""


_PIPELINE_REST = f"""
stoks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS t FROM uniq
),
sbase AS (
  SELECT id, t, len(t) AS n, CAST(floor(len(t) / {_PIPE_SPAN_W}) AS INT) AS nwin
  FROM stoks
),
swins AS (SELECT id, unnest(range(0, nwin)) AS i, t FROM sbase),
shashed AS (
  SELECT id, i,
         array_to_string(list_slice(t, i * {_PIPE_SPAN_W} + 1,
                                    i * {_PIPE_SPAN_W} + {_PIPE_SPAN_W}), ' ') AS span,
         md5(array_to_string(list_slice(t, i * {_PIPE_SPAN_W} + 1,
                                        i * {_PIPE_SPAN_W} + {_PIPE_SPAN_W}), ' ')) AS h
  FROM swins
),
sfirstdoc AS (SELECT h, min(id) AS fid FROM shashed GROUP BY h),
sfirstwin AS (
  SELECT s.h, f.fid, min(s.i) AS fi
  FROM shashed s JOIN sfirstdoc f ON s.h = f.h AND s.id = f.fid
  GROUP BY s.h, f.fid
),
skept AS (
  SELECT s.id, s.i, s.span
  FROM shashed s JOIN sfirstwin f ON s.h = f.h AND s.id = f.fid AND s.i = f.fi
),
sbody AS (
  SELECT id, string_agg(span, ' ' ORDER BY i) AS body FROM skept GROUP BY id
),
stails AS (
  SELECT id, nwin,
         CASE WHEN n > nwin * {_PIPE_SPAN_W}
              THEN array_to_string(list_slice(t, nwin * {_PIPE_SPAN_W} + 1, n), ' ')
         END AS tail
  FROM sbase
),
cleaned AS (
  SELECT t.id AS doc_id, concat_ws(' ', b.body, t.tail) AS clean_text
  FROM stails t LEFT JOIN sbody b USING (id)
),
dtoks AS (
  SELECT doc_id AS id, string_split_regex(trim(clean_text), '\\s+') AS t FROM cleaned
),
dwh AS (
  SELECT id, list_transform(t, x -> list_reduce(
    list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(x, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, y) -> (acc * {POLY_BASE} + y) % {POLY_MOD}
  )) AS w, len(t) AS n
  FROM dtoks WHERE len(t) >= {_PIPE_DECON_K}
),
didx AS (SELECT id, w, unnest(range(1, n - {_PIPE_DECON_K - 2})) AS i FROM dwh),
dhv AS (SELECT DISTINCT id, {_pipe_decon_combine(_PIPE_DECON_K)} AS hv FROM didx),
dsplit AS (SELECT id, hv, ({lehmer_hash_sql('id')}) % 100 AS b FROM dhv),
dbench AS (SELECT DISTINCT hv FROM dsplit WHERE b >= {_PIPE_BENCH_MIN}),
dtrain AS (SELECT id, hv FROM dsplit WHERE b < {_PIPE_BENCH_MIN}),
dsizes AS (SELECT id, count(*) AS n_ngrams FROM dtrain GROUP BY id),
dhits AS (
  SELECT t.id, count(*) AS n_shared FROM dtrain t JOIN dbench USING (hv) GROUP BY t.id
),
dkeep AS (
  SELECT s.id FROM dsizes s LEFT JOIN dhits h USING (id)
  WHERE CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / s.n_ngrams <= {_PIPE_MAX_CONTAM}
),
kept AS (
  SELECT c.doc_id, u.lang, c.clean_text
  FROM cleaned c JOIN dkeep k ON c.doc_id = k.id JOIN uniq u USING (doc_id)
),
mw(lang, wt) AS (VALUES {_PIPE_MIX_VALUES}),
mcounts AS (
  SELECT lang, wt, count(*) AS c FROM kept JOIN mw USING (lang) GROUP BY lang, wt
),
mscale AS (SELECT min(CAST(c AS DOUBLE) / wt) AS s FROM mcounts),
mtargets AS (
  SELECT lang, CAST(floor(wt * s) AS BIGINT) AS target_n FROM mcounts CROSS JOIN mscale
),
mranked AS (
  SELECT k.doc_id, k.lang, k.clean_text, t.target_n,
         row_number() OVER (
           PARTITION BY k.lang ORDER BY ({lehmer_hash_sql('k.doc_id')}) ASC, k.doc_id ASC
         ) AS rk
  FROM kept k JOIN mtargets t USING (lang)
),
sampled AS (SELECT doc_id, lang, clean_text FROM mranked WHERE rk <= target_n)
SELECT doc_id, lang, md5(clean_text) AS clean_fp,
       CAST(({_PIPE_H}) % {_PIPE_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
              PARTITION BY ({_PIPE_H}) % {_PIPE_SHARDS}
              ORDER BY ({_PIPE_H}), doc_id
            ) - 1 AS BIGINT) AS pos
FROM sampled
"""


@register(
    "doc_curation_pipeline",
    _pipeline_oracle(),
    "end-to-end curation: gate → exact dedup → span dedup → decontam → mixture → shards",
    bench=True,  # the integration shape a real training-data run executes
)
def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The integration query: every curation stage chained on its real
    contract (`functions.corpus.curation_pipeline`), verified against ONE
    multi-CTE oracle. clean_fp = md5(clean_text) pins the span-dedup
    reconstruction bit-exactly through the full chain; shard/pos pin the
    dataloader prep on the surviving set."""
    from duckpipe_spark.functions.corpus import curation_pipeline

    return curation_pipeline(
        load_table(spark, sf_dir, "documents"),
        min_tokens=_PIPE_MIN_TOKENS,
        min_points=_PIPE_MIN_POINTS,
        span_window=_PIPE_SPAN_W,
        decontam_k=_PIPE_DECON_K,
        bench_bucket_min=_PIPE_BENCH_MIN,
        max_contamination=_PIPE_MAX_CONTAM,
        mix_weights=_PIPE_WEIGHTS,
        n_shards=_PIPE_SHARDS,
    )


# ---------------------------------------------------------------------------
# curation pipeline + CCNet LM gate: the same chain with the bigram-LM
# quality stage enabled between the surface gate and exact dedup. The
# oracle is _pipeline_oracle(lm_min_score) — the LM CTEs train on the
# gated corpus inside the same multi-CTE SQL.
# ---------------------------------------------------------------------------

_PIPE_LM_MIN = 0.0335  # ~median of the gated set's scores at sf0.1


@register(
    "doc_curation_lmgate",
    _pipeline_oracle(_PIPE_LM_MIN),
    "curation pipeline with the CCNet bigram-LM gate stage enabled",
)
def doc_curation_lmgate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_curation_pipeline with ``lm_min_score`` set: the LM trains on
    the gated in-domain slice and low-score docs drop BEFORE dedup — so
    every downstream election (canonical ids, span first-occurrence,
    mixture ranks) runs on a different survivor set than the base
    pipeline, which is exactly the cross-stage contract this query pins."""
    from duckpipe_spark.functions.corpus import curation_pipeline

    return curation_pipeline(
        load_table(spark, sf_dir, "documents"),
        min_tokens=_PIPE_MIN_TOKENS,
        min_points=_PIPE_MIN_POINTS,
        span_window=_PIPE_SPAN_W,
        decontam_k=_PIPE_DECON_K,
        bench_bucket_min=_PIPE_BENCH_MIN,
        max_contamination=_PIPE_MAX_CONTAM,
        mix_weights=_PIPE_WEIGHTS,
        n_shards=_PIPE_SHARDS,
        lm_min_score=_PIPE_LM_MIN,
    )


_PIPE_LM_MIN_COUNT = 2


@register(
    "doc_curation_lmgate_pruned",
    _pipeline_oracle(_PIPE_LM_MIN, lm_min_count=_PIPE_LM_MIN_COUNT),
    "curation pipeline with the count-floor-PRUNED bigram-LM gate (bounded broadcast)",
)
def doc_curation_lmgate_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r9 item 3: the composition that needs the bounded broadcast
    most at 100 TB — ``doc_curation_lmgate`` with ``lm_min_count=2``
    forwarded through ``curation_pipeline`` to the gate's LM, so the
    broadcast bigram map is bounded by train_tokens/min_count instead of
    growing with train-slice diversity (Zipf singleton mass). Docs whose
    score depended on now-pruned singleton bigrams fall to the
    unseen-bigram backoff and may cross the gate floor — so the survivor
    set (and every downstream election) can differ from the unpruned
    pipeline's, which is exactly the cross-stage contract this query pins
    against the HAVING-floored oracle."""
    from duckpipe_spark.functions.corpus import curation_pipeline

    return curation_pipeline(
        load_table(spark, sf_dir, "documents"),
        min_tokens=_PIPE_MIN_TOKENS,
        min_points=_PIPE_MIN_POINTS,
        span_window=_PIPE_SPAN_W,
        decontam_k=_PIPE_DECON_K,
        bench_bucket_min=_PIPE_BENCH_MIN,
        max_contamination=_PIPE_MAX_CONTAM,
        mix_weights=_PIPE_WEIGHTS,
        n_shards=_PIPE_SHARDS,
        lm_min_score=_PIPE_LM_MIN,
        lm_min_count=_PIPE_LM_MIN_COUNT,
    )


# ---------------------------------------------------------------------------
# curation pipeline + SemDeDup stage (VERDICT r7 item 7): a real curation
# run also drops embedding near-duplicates — same chain, with the
# LSH-bucketed cosine closure over the exact-dedup survivors' embeddings
# spliced in between exact dedup and span removal. The oracle is the same
# multi-CTE SQL with the recursive-closure CTEs inserted (string surgery on
# _pipeline_oracle(), pinned by the asserts below so a reword of the base
# oracle can't silently produce a half-spliced one).
# ---------------------------------------------------------------------------

_SEM_THRESH = 0.3  # the neardup family's pinned threshold (similarity_q)


def _semdedup_pipeline_oracle() -> str:
    from duckpipe_spark.queries.similarity_q import _BUCKET_SQL, _cos_sql

    sem_ctes = f""",
sdb AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, {_BUCKET_SQL} AS bucket
  FROM embeddings e JOIN uniq u ON e.vec_id = u.doc_id
),
sdpairs AS MATERIALIZED (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM sdb a JOIN sdb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {_SEM_THRESH}
),
sdedges AS MATERIALIZED (SELECT u, v FROM sdpairs UNION SELECT v AS u, u AS v FROM sdpairs),
sdreach(u, v) AS (
  SELECT u, v FROM sdedges
  UNION
  SELECT r.u, e.v FROM sdreach r JOIN sdedges e ON r.v = e.u
),
sdcomp AS (SELECT u AS id, least(u, min(v)) AS component FROM sdreach GROUP BY u),
sduniq AS (
  SELECT u.doc_id, u.text, u.lang FROM uniq u
  LEFT JOIN sdcomp c ON u.doc_id = c.id
  WHERE c.component IS NULL OR c.component = u.doc_id
)"""
    base = _pipeline_oracle()
    # base already materializes uniq (r13: the UN-hinted base-pipeline
    # oracle re-ran the gate+dedup subtree per reference at sf1 — 36.6 s
    # vs 7 s for this hinted splice — same inlining pathology)
    uniq_mat = "uniq AS MATERIALIZED (SELECT g.doc_id, g.text, g.lang FROM gated g JOIN canon USING (doc_id))"
    assert base.count(uniq_mat) == 1
    assert base.count("AS t FROM uniq") == 1  # stoks source
    assert base.count("WITH q AS") == 1
    # MATERIALIZED is load-bearing: uniq is referenced 3x here (sdb, sduniq,
    # the lang join) and DuckDB inlines multiply-referenced CTEs — the
    # un-materialized splice re-evaluated the whole gate+dedup subtree per
    # reference (measured 215 s vs ~2 s at sf0.01)
    return (
        base.replace("WITH q AS", "WITH RECURSIVE q AS", 1)
        .replace(uniq_mat, uniq_mat + sem_ctes, 1)
        .replace("AS t FROM uniq", "AS t FROM sduniq", 1)
    )


@register(
    "doc_curation_semdedup",
    _semdedup_pipeline_oracle(),
    "curation pipeline with SemDeDup: embedding near-dup clusters keep min-id rep",
)
def doc_curation_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`doc_curation_pipeline` with the optional SemDeDup stage enabled:
    exact-dedup survivors whose embeddings sit in the same LSH bucket and
    clear cosine>=0.3 form clusters (transitive closure); only each
    cluster's min-id representative continues to span dedup and beyond."""
    from duckpipe_spark.functions.corpus import curation_pipeline
    from duckpipe_spark.functions.similarity import N_PLANES

    return curation_pipeline(
        load_table(spark, sf_dir, "documents"),
        min_tokens=_PIPE_MIN_TOKENS,
        min_points=_PIPE_MIN_POINTS,
        span_window=_PIPE_SPAN_W,
        decontam_k=_PIPE_DECON_K,
        bench_bucket_min=_PIPE_BENCH_MIN,
        max_contamination=_PIPE_MAX_CONTAM,
        mix_weights=_PIPE_WEIGHTS,
        n_shards=_PIPE_SHARDS,
        embeddings=load_table(spark, sf_dir, "embeddings"),
        semdedup_threshold=_SEM_THRESH,
        semdedup_planes=N_PLANES,  # static oracle encodes the 8-plane matrix
    )


# ---------------------------------------------------------------------------
# curation pipeline + media near-dup stage (VERDICT r11 item 5): a real
# curation run also drops docs whose attached image/audio/video blobs are
# perceptual near-duplicates — same chain, with the modality-partitioned
# fingerprint pair graph + min-id closure spliced in after exact dedup
# (mirroring the SemDeDup splice). Codes on the Spark side come from the
# REAL decode kernels over per-doc blobs (modality = (doc_id // 2) % 3,
# reusing the three standalone fixtures verbatim — multimodal_q.
# media_fixture_codes); the oracle recomputes the codes analytically per
# modality (quadrant/reversal perturbations are invisible to the integer
# reductions, so one formula covers both parities), bands per (modality,
# band index, band value), verifies by xor+popcount, and closes the pair
# graph with the same recursive min-id CTE shape the SemDeDup oracle uses.
# ---------------------------------------------------------------------------


def _medianear_pipeline_oracle() -> str:
    mn_ctes = """,
mnig AS (
  SELECT u.doc_id, R, C,
         1 + ((((u.doc_id // 2) * 1000003 + R * 9 + C + 1) % 1000000007)
              * (((u.doc_id // 2) * 1000003 + R * 9 + C + 1) % 1000000007)
              % 1000000007 * 2654435761 % 1000000007) % 254 AS v
  FROM uniq u,
       (SELECT unnest(range(0, 8)) AS R),
       (SELECT unnest(range(0, 9)) AS C)
  WHERE (u.doc_id // 2) % 3 = 0
),
mnibits AS (
  SELECT a.doc_id, a.R AS r, a.C AS c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM mnig a JOIN mnig b ON a.doc_id = b.doc_id AND a.R = b.R AND b.C = a.C + 1
  WHERE a.C < 8
),
mnicodes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN r < 4
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - r * 8 - c AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN r >= 4
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - (r - 4) * 8 - c AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM mnibits GROUP BY doc_id
),
mnas AS (
  SELECT u.doc_id, i,
         (((u.doc_id // 2) * 1000003 + i + 1) % 1000000007) AS seed
  FROM uniq u, (SELECT unnest(range(0, 1040)) AS i)
  WHERE (u.doc_id // 2) % 3 = 1
),
mnav AS (
  SELECT doc_id, i,
         (seed * seed % 1000000007 * 2654435761 % 1000000007) % 2048 - 1024 AS v
  FROM mnas
),
mnae AS (
  SELECT doc_id, i // 16 AS f, sum(v * v) AS energy
  FROM mnav GROUP BY doc_id, i // 16
),
mnabits AS (
  SELECT a.doc_id, a.f,
         CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
  FROM mnae a JOIN mnae b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < 64
),
mnacodes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN f < 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN f >= 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(63 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM mnabits GROUP BY doc_id
),
mnvs AS (
  SELECT u.doc_id, j,
         (((u.doc_id // 2) * 1000003 + j + 1) % 1000000007) AS seed
  FROM uniq u, (SELECT unnest(range(0, 65)) AS j)
  WHERE (u.doc_id // 2) % 3 = 2
),
mnvg AS (
  SELECT doc_id, j,
         1 + (seed * seed % 1000000007 * 2654435761 % 1000000007) % 254 AS g
  FROM mnvs
),
mnvbits AS (
  SELECT a.doc_id, a.j AS f,
         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
  FROM mnvg a JOIN mnvg b ON a.doc_id = b.doc_id AND b.j = a.j + 1
  WHERE a.j < 64
),
mnvcodes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN f < 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN f >= 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(63 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM mnvbits GROUP BY doc_id
),
mncodes AS MATERIALIZED (
  SELECT 0 AS m, doc_id, h0, h1 FROM mnicodes
  UNION ALL SELECT 1 AS m, doc_id, h0, h1 FROM mnacodes
  UNION ALL SELECT 2 AS m, doc_id, h0, h1 FROM mnvcodes
),
mnbands AS MATERIALIZED (
  SELECT m, doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM mncodes
),
mnhot AS (
  SELECT m, bi, bv FROM mnbands GROUP BY m, bi, bv HAVING count(*) > 50
),
mnrare AS MATERIALIZED (
  SELECT b.m, b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM mnbands b ANTI JOIN mnhot h ON b.m = h.m AND b.bi = h.bi AND b.bv = h.bv
),
mnpairs AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM mnrare a JOIN mnrare b
    ON a.m = b.m AND a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1)) <= 3
),
mnedges AS MATERIALIZED (SELECT u, v FROM mnpairs UNION SELECT v AS u, u AS v FROM mnpairs),
mnreach(u, v) AS (
  SELECT u, v FROM mnedges
  UNION
  SELECT r.u, e.v FROM mnreach r JOIN mnedges e ON r.v = e.u
),
mncomp AS (SELECT u AS id, least(u, min(v)) AS component FROM mnreach GROUP BY u),
mduniq AS (
  SELECT u.doc_id, u.text, u.lang FROM uniq u
  LEFT JOIN mncomp c ON u.doc_id = c.id
  WHERE c.component IS NULL OR c.component = u.doc_id
)"""
    base = _pipeline_oracle()
    # base already materializes uniq (r13: the UN-hinted base-pipeline
    # oracle re-ran the gate+dedup subtree per reference at sf1 — 36.6 s
    # vs 7 s for this hinted splice — same inlining pathology)
    uniq_mat = "uniq AS MATERIALIZED (SELECT g.doc_id, g.text, g.lang FROM gated g JOIN canon USING (doc_id))"
    assert base.count(uniq_mat) == 1
    assert base.count("AS t FROM uniq") == 1  # stoks source
    assert base.count("WITH q AS") == 1
    # MATERIALIZED on uniq is load-bearing here too: the three code CTEs,
    # mduniq and the lang join all re-reference it (see the SemDeDup
    # splice's measured 215 s inlining pathology)
    return (
        base.replace("WITH q AS", "WITH RECURSIVE q AS", 1)
        .replace(uniq_mat, uniq_mat + mn_ctes, 1)
        .replace("AS t FROM uniq", "AS t FROM mduniq", 1)
    )


@register(
    "doc_curation_medianear",
    _medianear_pipeline_oracle(),
    "curation pipeline with media near-dup: modality-partitioned fingerprint clusters keep min-id rep",
)
def doc_curation_medianear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`doc_curation_pipeline` with the media near-dup stage enabled
    (VERDICT r11 item 5): each doc carries one image/audio/video blob
    (modality = (doc_id // 2) % 3), the perceptual triad's REAL decode
    kernels produce 64-bit codes, pairs band per modality, clusters close
    transitively, and only each cluster's min-id member continues down
    the chain. The planted (2j, 2j+1) near-dup pairs make the stage drop
    every odd-id survivor whose even twin also survived the gate+dedup
    stages — visible in the final shard/pos assignment the oracle pins."""
    from duckpipe_spark.functions.corpus import curation_pipeline
    from duckpipe_spark.queries.multimodal_q import media_fixture_codes

    return curation_pipeline(
        load_table(spark, sf_dir, "documents"),
        min_tokens=_PIPE_MIN_TOKENS,
        min_points=_PIPE_MIN_POINTS,
        span_window=_PIPE_SPAN_W,
        decontam_k=_PIPE_DECON_K,
        bench_bucket_min=_PIPE_BENCH_MIN,
        max_contamination=_PIPE_MAX_CONTAM,
        mix_weights=_PIPE_WEIGHTS,
        n_shards=_PIPE_SHARDS,
        media_codes=media_fixture_codes(spark, sf_dir),
    )


def _media_codes_artifact(spark: SparkSession, sf_dir: str) -> str:
    """Build-once path of the PRECOMPUTED media fingerprint-code parquet
    → `.artifacts/media_codes_{sf}_{mtime}` with columns (blob_id,
    modality, h0, h1): the production artifact a 100 TB curation run
    would persist from its fingerprint pass instead of re-decoding three
    modalities inside every downstream pipeline. Keyed by corpus mtime (a
    regenerated corpus rebuilds the codes rather than serving stale ones)
    — the same contract as text_q's ``_bm25_index_artifact`` and bpe_q's
    ``_tokenizer_artifact``. Completeness check is Spark's own _SUCCESS
    marker, written last by the parquet committer; publication is a
    write-to-temp + atomic rename (ADVICE r13 item 2) so a concurrent
    builder can never observe a half-written or mid-overwrite artifact —
    losers of the rename race discard their temp dir and serve the
    winner's."""
    import os
    import shutil

    from duckpipe_spark.queries.multimodal_q import media_fixture_codes

    corpus = os.path.join(sf_dir, "documents.parquet")
    try:
        mt = os.stat(corpus).st_mtime_ns
    except OSError:
        mt = -1
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".artifacts",
    )
    tag = f"{os.path.basename(os.path.abspath(sf_dir))}_{mt}"
    path = os.path.join(root, f"media_codes_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.tmp.{os.getpid()}"
        media_fixture_codes(spark, sf_dir).write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            # stale partial from a crashed builder — clear it so the
            # rename below can land
            shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
        except OSError:
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                # a concurrent builder published first; ours is identical
                # by construction — discard and serve the winner's
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
    return path


@register(
    "doc_curation_medianear_artifact",
    _medianear_pipeline_oracle(),
    "curation pipeline with media near-dup served from a PRECOMPUTED code artifact (production shape)",
    bench=True,  # VERDICT r12 item 2: the production media shape carries its own perf row
)
def doc_curation_medianear_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r12 item 2 — the media stage's PRODUCTION shape as its own
    first-class row: fingerprint codes are built ONCE and persisted to
    parquet (`_media_codes_artifact`), and the curation chain consumes the
    LOADED artifact — the incremental cost over ``doc_curation_pipeline``
    is one survivor semi-join plus the band/verify/closure pass on the
    code table, NOT the 3-modality decode (which `doc_curation_medianear`
    retains as the fixture-integrity pin). Reusing the decode-inline
    oracle pins the persist→reload round trip as value-preserving on the
    full corpus, the same artifact-serve contract as
    ``doc_bm25_artifact_topk`` / ``doc_bpe_artifact_encode``. At 100 TB
    this is the shape that matters: the decode pass is embarrassingly
    parallel and runs once per blob EVER, while every curation rerun pays
    only the code-table join."""
    from duckpipe_spark.functions.corpus import curation_pipeline

    path = _media_codes_artifact(spark, sf_dir)
    return curation_pipeline(
        load_table(spark, sf_dir, "documents"),
        min_tokens=_PIPE_MIN_TOKENS,
        min_points=_PIPE_MIN_POINTS,
        span_window=_PIPE_SPAN_W,
        decontam_k=_PIPE_DECON_K,
        bench_bucket_min=_PIPE_BENCH_MIN,
        max_contamination=_PIPE_MAX_CONTAM,
        mix_weights=_PIPE_WEIGHTS,
        n_shards=_PIPE_SHARDS,
        media_codes=spark.read.parquet(path),
    )


# ---------------------------------------------------------------------------
# per-source curation rollup
# ---------------------------------------------------------------------------

_SOURCE_ORACLE = """
WITH d AS (
  SELECT
    source,
    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
    len(string_split_regex(trim(text), '\\s+')) AS n_toks,
    (
      (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
      + (CASE WHEN (CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                    / len(string_split_regex(trim(text), '\\s+'))) BETWEEN 2.0 AND 12.0
              THEN 1 ELSE 0 END)
      + (CASE WHEN (CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                    / length(text)) <= 0.1
              THEN 1 ELSE 0 END)
    ) AS qp
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT fp) AS n_unique,
       CAST(count(*) - count(DISTINCT fp) AS DOUBLE) / count(*) AS dup_rate,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(sum(qp) AS DOUBLE) / (count(*) * 3) AS avg_quality
FROM d
GROUP BY source
"""


@register(
    "doc_source_rollup",
    _SOURCE_ORACLE,
    "per-source curation dashboard: dup rate, token volume, mean quality (one shuffle)",
)
def doc_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.corpus import source_rollup

    return source_rollup(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# contamination MASKING — span-level removal of benchmark n-gram collisions
# ---------------------------------------------------------------------------

_MASK_W = 10


def _mask_oracle(k: int, w: int, bucket_min: int) -> str:
    combine = "wl[i]"
    for j in range(1, k):
        combine = f"({combine} * {WORD_BASE} + wl[i+{j}]) % {POLY_MOD}"
    return f"""
WITH toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
wh AS (
  SELECT id, list_transform(t, x -> list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(x, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, y) -> (acc * {POLY_BASE} + y) % {POLY_MOD}
  )) AS wl, len(t) AS n
  FROM toks WHERE len(t) >= {k}
),
ph AS (
  SELECT id, i, {combine} AS hv
  FROM (SELECT id, wl, unnest(range(1, n - {k - 2})) AS i FROM wh)
),
split AS (SELECT id, i, hv, ({lehmer_hash_sql('id')}) % 100 AS b FROM ph),
bench AS (SELECT DISTINCT hv FROM split WHERE b >= {bucket_min}),
hits AS (
  -- both the span holding the k-gram's start AND the one holding its end
  SELECT DISTINCT id, si FROM (
    SELECT s.id,
           unnest([CAST((s.i - 1) // {w} AS INT),
                   CAST((s.i - 1 + {k - 1}) // {w} AS INT)]) AS si
    FROM split s JOIN bench USING (hv) WHERE s.b < {bucket_min}
  )
),
maskedn AS (SELECT id, count(*) AS n_masked FROM hits GROUP BY id),
base AS (
  SELECT id, t, len(t) AS n, CAST(floor(len(t) / {w}) AS INT) AS nwin
  FROM toks WHERE ({lehmer_hash_sql('id')}) % 100 < {bucket_min}
),
wins AS (SELECT id, unnest(range(0, nwin)) AS i, t FROM base),
kept AS (
  SELECT wn.id, wn.i,
         array_to_string(list_slice(wn.t, wn.i * {w} + 1, wn.i * {w} + {w}), ' ') AS span
  FROM wins wn LEFT JOIN hits h ON wn.id = h.id AND wn.i = h.si
  WHERE h.id IS NULL
),
body AS (SELECT id, string_agg(span, ' ' ORDER BY i) AS body FROM kept GROUP BY id),
tails AS (
  SELECT b.id, b.nwin, b.n,
         CASE WHEN b.n > b.nwin * {w}
                   AND NOT EXISTS (SELECT 1 FROM hits h WHERE h.id = b.id AND h.si = b.nwin)
              THEN array_to_string(list_slice(b.t, b.nwin * {w} + 1, b.n), ' ')
         END AS tail
  FROM base b
)
SELECT b.id AS doc_id,
  CAST(b.nwin + CASE WHEN b.n > b.nwin * {w} THEN 1 ELSE 0 END AS BIGINT) AS n_spans,
  CAST(COALESCE(m.n_masked, 0) AS BIGINT) AS n_masked,
  CASE WHEN m.id IS NULL THEN array_to_string(b.t, ' ')
       ELSE concat_ws(' ', bd.body, tl.tail) END AS clean_text
FROM base b
LEFT JOIN maskedn m USING (id)
LEFT JOIN body bd USING (id)
LEFT JOIN tails tl USING (id)
"""


@register(
    "doc_mask_contaminated",
    _mask_oracle(_DECON_K, _MASK_W, _BENCH_BUCKET_MIN),
    "benchmark-contamination span masking (decontamination as an action)",
)
def doc_mask_contaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.corpus import mask_contaminated_spans

    return mask_contaminated_spans(
        load_table(spark, sf_dir, "documents"),
        k=_DECON_K,
        window=_MASK_W,
        bench_bucket_min=_BENCH_BUCKET_MIN,
    )


# ---------------------------------------------------------------------------
# boilerplate line stripping — the ACTION counterpart of doc_boilerplate
# ---------------------------------------------------------------------------

_STRIP_MIN_DOCS = 3

_STRIP_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS l
  FROM documents
),
exploded AS (
  SELECT DISTINCT id, md5(line) AS lh
  FROM (SELECT id, unnest(l) AS line FROM base)
),
boiler AS (
  SELECT lh FROM exploded GROUP BY lh HAVING count(*) >= {_STRIP_MIN_DOCS}
),
doc_boiler AS (
  SELECT e.id, count(*) AS nb FROM exploded e JOIN boiler USING (lh) GROUP BY e.id
),
poslines AS (
  SELECT id, i, l[i] AS line
  FROM (SELECT id, l, unnest(range(1, len(l) + 1)) AS i FROM base)
),
kept AS (
  SELECT p.id, p.i, p.line
  FROM poslines p LEFT JOIN boiler b ON md5(p.line) = b.lh
  WHERE b.lh IS NULL
),
body AS (
  SELECT id, string_agg(line, chr(10) ORDER BY i) AS body, count(*) AS n_kept
  FROM kept GROUP BY id
)
SELECT b.id AS doc_id,
  CAST(len(b.l) AS BIGINT) AS n_lines,
  CAST(CASE WHEN d.id IS NOT NULL THEN len(b.l) - COALESCE(bd.n_kept, 0) ELSE 0 END AS BIGINT) AS n_stripped,
  CASE WHEN d.id IS NOT NULL THEN COALESCE(bd.body, '')
       ELSE array_to_string(b.l, chr(10)) END AS clean_text
FROM base b
LEFT JOIN doc_boiler d USING (id)
LEFT JOIN body bd USING (id)
"""


@register(
    "doc_strip_boilerplate",
    _STRIP_ORACLE,
    "C4-style boilerplate line stripping (the action counterpart of doc_boilerplate)",
)
def doc_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.corpus import strip_boilerplate_lines

    return strip_boilerplate_lines(
        load_table(spark, sf_dir, "documents"), min_docs=_STRIP_MIN_DOCS
    )


# ---------------------------------------------------------------------------
# dataset datasheet: per-(source, lang) corpus report
# ---------------------------------------------------------------------------

_REPORT_ORACLE = f"""
WITH s AS (
  SELECT source, lang,
         len(string_split_regex(trim(text), '\\s+')) AS n_toks,
         (
           (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 1000 THEN 1 ELSE 0 END)
           + (CASE WHEN (CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                         / len(string_split_regex(trim(text), '\\s+'))) BETWEEN 2.0 AND 12.0
                   THEN 1 ELSE 0 END)
           + (CASE WHEN (CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                         / length(text)) <= 0.1
                   THEN 1 ELSE 0 END)
         ) AS qp,
         count(*) OVER (
           PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
         ) AS fpc
  FROM documents
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(sum(qp) AS DOUBLE) / (count(*) * 3) AS avg_quality,
       CAST(sum(CASE WHEN fpc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup_docs,
       CAST(sum(CASE WHEN fpc > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
FROM s GROUP BY source, lang
"""


@register(
    "doc_corpus_report",
    _REPORT_ORACLE,
    "dataset datasheet: per-(source, lang) docs/tokens/quality/exact-dup rollup",
)
def doc_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-slice report a dataset owner publishes (datasheet shape):
    volume, quality, and exact-duplication rate per (source, lang). The
    duplicate count rides a window over the corpus-wide normalized
    fingerprint (one shuffle on the 16-byte fp — bodies stay put), then
    everything rolls up map-side-combinably on the tiny (source, lang)
    key space."""
    from pyspark.sql import Window

    from duckpipe_spark.functions.text import quality_points_col, tokens_col

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))))
    s = docs.select(
        "source",
        "lang",
        F.size(tokens_col(F.col("text"))).cast("bigint").alias("n_toks"),
        quality_points_col(F.col("text")).alias("qp"),
        F.count(F.lit(1)).over(Window.partitionBy(fp)).alias("fpc"),
    )
    n = F.count(F.lit(1))
    return s.groupBy("source", "lang").agg(
        n.cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        (F.sum("qp").cast("double") / (n * 3)).alias("avg_quality"),
        F.sum(F.when(F.col("fpc") > 1, 1).otherwise(0)).cast("bigint").alias("n_exact_dup_docs"),
        (F.sum(F.when(F.col("fpc") > 1, 1).otherwise(0)).cast("double") / n).alias("dup_frac"),
    )


@register(
    "doc_curation_keepbest",
    _pipeline_oracle(election="keep_best"),
    "curation pipeline with keep-BEST exact-dup election (quality decides the survivor)",
)
def doc_curation_keepbest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`doc_curation_pipeline` with ``election='keep_best'``: the
    exact-dup stage keeps the highest-quality copy (quality points, then
    token count, then min id) instead of the min-id first occurrence —
    dedup_keep_best's decision INSIDE the integration chain, so every
    downstream stage (span election, decontamination, mixture, shards)
    sees the shifted survivor set. The cross-stage contract this pins:
    a different exact-dup survivor changes the global span
    first-occurrence election, which changes clean_fp for OTHER docs —
    no single-operator query exercises that coupling."""
    from duckpipe_spark.functions.corpus import curation_pipeline

    return curation_pipeline(
        load_table(spark, sf_dir, "documents"),
        min_tokens=_PIPE_MIN_TOKENS,
        min_points=_PIPE_MIN_POINTS,
        span_window=_PIPE_SPAN_W,
        decontam_k=_PIPE_DECON_K,
        bench_bucket_min=_PIPE_BENCH_MIN,
        max_contamination=_PIPE_MAX_CONTAM,
        mix_weights=_PIPE_WEIGHTS,
        n_shards=_PIPE_SHARDS,
        election="keep_best",
    )
