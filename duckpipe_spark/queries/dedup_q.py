"""Near-duplicate detection queries (MinHash+LSH, SimHash, n-gram Jaccard)
with exact DuckDB oracles generated from the same hash constants."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from duckpipe_spark.functions.dedup import (
    _WINNOW_POS_BITS,
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    N_HASHES,
    POLY_BASE,
    POLY_MOD,
    SIMHASH_BITS,
    WORD_BASE,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from duckpipe_spark.functions.sampling import lehmer_hash_sql
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

# shared SQL snippets ---------------------------------------------------------
#
# WS-class note (ADVICE r10 item 3 / r11 parity): the '\\s+' splits below
# are DuckDB/RE2 \s = [ \t\n\f\r] WITHOUT \x0b, while the Spark twins'
# tokens_col / F.split use Java ASCII \s WITH it. The corpus carries no
# \x0b so the oracles are unaffected; kernels that must be byte-identical
# on arbitrary bytes (the winnow family below) spell the class out on
# both sides instead — see _WINNOW_SEL_CTES and dedup._WS_KERNEL_RE.

_SHINGLES_SQL = """
toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS t FROM documents{filter}
),
idx AS (
  SELECT id, t, unnest(range(1, len(t) - 1)) AS i FROM toks WHERE len(t) >= 3
),
sh AS (
  SELECT DISTINCT id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx
)"""

_HASH_SQL = f"""
h AS (
  SELECT id, list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD}
  ) AS hv
  FROM sh
)"""

# word-hash pipeline (mirrors functions.dedup.shingle_hashes): fold each
# word's chars once, combine k word hashes with a second rolling fold
_WORD_HASH_SHINGLES_SQL = f"""
toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
wh AS (
  SELECT id, list_transform(t, w -> list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD}
  )) AS w, len(t) AS n
  FROM toks WHERE len(t) >= 3
),
idx AS (
  SELECT id, w, unnest(range(1, n - 1)) AS i FROM wh
),
h AS (
  SELECT DISTINCT id,
    ((w[i] * {WORD_BASE} + w[i+1]) % {POLY_MOD} * {WORD_BASE} + w[i+2]) % {POLY_MOD} AS hv
  FROM idx
)"""

_SIG_EXPRS = ", ".join(
    f"min(({MINHASH_A[i]} * hv + {MINHASH_B[i]}) % {POLY_MOD}) AS s{i}" for i in range(N_HASHES)
)

_MINHASH_ORACLE = f"""
WITH {_WORD_HASH_SHINGLES_SQL}
SELECT id, {_SIG_EXPRS} FROM h GROUP BY id
"""


@register("doc_minhash_signatures", _MINHASH_ORACLE, "MinHash signatures (shingle→hash→min) per doc")
def doc_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


_N_BANDS = N_HASHES // BAND_SIZE
_BAND_SELECTS = "\nUNION\n".join(
    "SELECT a.id AS id_a, b.id AS id_b FROM sig a JOIN sig b ON "
    + " AND ".join(f"a.s{b * BAND_SIZE + j} = b.s{b * BAND_SIZE + j}" for j in range(BAND_SIZE))
    + " AND a.id < b.id"
    for b in range(_N_BANDS)
)

_LSH_ORACLE = f"""
WITH {_WORD_HASH_SHINGLES_SQL},
sig AS (SELECT id, {_SIG_EXPRS} FROM h GROUP BY id)
{_BAND_SELECTS}
"""


@register("doc_lsh_candidates", _LSH_ORACLE, "MinHash-LSH banding candidate pairs (equi-join per band)")
def doc_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_signatures(load_table(spark, sf_dir, "documents"))
    return lsh_candidate_pairs(sigs)


# packed bit counters, 3 per BIGINT at 21-bit offsets (mirrors
# functions.dedup.simhash exactly)
_PACK_AGGS = ", ".join(
    "SUM("
    + " + ".join(
        f"((hv >> {3 * s + m}) & 1) * CAST({1 << (21 * m)} AS BIGINT)" for m in range(3)
    )
    + f") AS p{s}"
    for s in range(SIMHASH_BITS // 3)
)
_SIM_SUM = " + ".join(
    f"(CASE WHEN ((p{j // 3} >> {21 * (j % 3)}) & 2097151) * 2 > n_sh "
    f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for j in range(SIMHASH_BITS)
)

_SIMHASH_ORACLE = f"""
WITH {_WORD_HASH_SHINGLES_SQL},
bits AS (SELECT id, count(*) AS n_sh, {_PACK_AGGS} FROM h GROUP BY id)
SELECT id, {_SIM_SUM} AS simhash FROM bits
"""


@register("doc_simhash", _SIMHASH_ORACLE, "SimHash (majority bit vote over shingle hashes)")
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


_JACCARD_LIMIT = 200  # bound the pair blow-up in the oracle comparison
_JACCARD_THRESHOLD = 0.1
# Shingle document-frequency cap (skew guard): shingles in > max_df docs are
# dropped before the self-join on BOTH sides of the comparison. At the test
# corpus size no shingle reaches the cap, so the oracle additionally proves
# the cap machinery leaves sub-threshold dfs untouched; the engaged-cap path
# is pinned by tests/test_dedup_semantics.py::test_jaccard_df_cap_*.
_JACCARD_MAX_DF = 1000

_JACCARD_ORACLE = f"""
WITH {_SHINGLES_SQL.format(filter=f' WHERE doc_id < {_JACCARD_LIMIT}')},
kept AS (
  SELECT id, s FROM sh
  QUALIFY count(*) OVER (PARTITION BY s) <= {_JACCARD_MAX_DF}
),
sizes AS (SELECT id, count(*) AS n FROM kept GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
"""


@register("doc_jaccard_pairs", _JACCARD_ORACLE, "n-gram Jaccard near-dup pairs via inverted shingle index")
def doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < _JACCARD_LIMIT)
    return ngram_jaccard_pairs(docs, threshold=_JACCARD_THRESHOLD, max_df=_JACCARD_MAX_DF)


# ---------------------------------------------------------------------------
# connected components over LSH candidate pairs — duplicate-cluster closure
# ---------------------------------------------------------------------------

_CC_ORACLE = f"""
WITH RECURSIVE {_WORD_HASH_SHINGLES_SQL},
sig AS (SELECT id, {_SIG_EXPRS} FROM h GROUP BY id),
pairs AS ({_BAND_SELECTS}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u
"""


@register(
    "doc_dup_components",
    _CC_ORACLE,
    "connected components over LSH candidate pairs (iterative min-label propagation "
    "vs recursive-CTE transitive closure)",
)
def doc_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster closure: candidate PAIRS chain transitively; the
    component id (min doc_id in the cluster) is the canonical survivor.
    Genuinely iterative — the one operator class where a driver-side loop
    over distributed rounds is the idiomatic Spark formulation."""
    from duckpipe_spark.functions.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    return connected_components(pairs)


@register(
    "doc_dup_components_star",
    _CC_ORACLE,
    "same closure via alternating large-star/small-star (O(log n) rounds)",
)
def doc_dup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical result contract to doc_dup_components — (id, component =
    min reachable doc_id) — computed by the Kiveris large-star/small-star
    rewiring instead of diameter-bounded propagation, against the SAME
    recursive-CTE oracle. Two independent iterative algorithms hash-equal
    to one SQL truth is the strongest cross-check the gate offers for
    graph closure."""
    from duckpipe_spark.functions.dedup import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    return connected_components_star(pairs)


# --- incremental dedup: admit only genuinely-new documents -----------------

_INCR_ORACLE = """
WITH corpus AS (
  SELECT * FROM documents WHERE doc_id % 2 = 0
),
batch AS (
  SELECT * FROM documents WHERE doc_id % 2 = 1
),
cfp AS (
  SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp FROM corpus
),
bfp AS (
  SELECT b.*, md5(lower(trim(regexp_replace(b.text, '\\s+', ' ', 'g')))) AS fp
  FROM batch b
),
fresh AS (
  SELECT * FROM bfp ANTI JOIN cfp USING (fp)
)
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fresh
) WHERE rn = 1
"""


@register(
    "doc_incremental_dedup",
    _INCR_ORACLE,
    "admission filter: new batch anti-joined on corpus fingerprints + first-copy election",
)
def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.dedup import dedup_against_corpus

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    return dedup_against_corpus(batch, corpus)


# Cross-corpus decontamination join: corpus (doc_id % 7 != 3) matched
# against a held-out "benchmark" split (doc_id % 7 = 3) by LSH banding,
# then exact hashed-shingle Jaccard as an INTEGER fraction (n_inter,
# n_union) with an integer threshold — no float jaccard column, so no
# round()-tie divergence surface (see functions.dedup.lsh_join).
_DECONTAM_PCT = 20
_LSH_JOIN_BANDS = "\nUNION\n".join(
    "SELECT a.id AS id_a, b.id AS id_b FROM sa a JOIN sb b ON "
    + " AND ".join(
        f"a.s{b * BAND_SIZE + j} = b.s{b * BAND_SIZE + j}" for j in range(BAND_SIZE)
    )
    for b in range(_N_BANDS)
)
_LSH_JOIN_ORACLE = f"""
WITH {_WORD_HASH_SHINGLES_SQL},
sig AS (SELECT id, {_SIG_EXPRS} FROM h GROUP BY id),
sa AS (SELECT * FROM sig WHERE id % 7 != 3),
sb AS (SELECT * FROM sig WHERE id % 7 = 3),
cand AS ({_LSH_JOIN_BANDS}),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY id),
inter AS (
  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN h a ON a.id = c.id_a
  JOIN h b ON b.id = c.id_b AND b.hv = a.hv
  GROUP BY 1, 2
)
SELECT inter.id_a, inter.id_b, n_inter,
       CAST(za.n + zb.n - n_inter AS BIGINT) AS n_union
FROM inter
JOIN sizes za ON za.id = inter.id_a
JOIN sizes zb ON zb.id = inter.id_b
WHERE 100 * n_inter >= {_DECONTAM_PCT} * (za.n + zb.n - n_inter)
"""


@register(
    "doc_decontam_lsh_join",
    _LSH_JOIN_ORACLE,
    "cross-corpus LSH near-dup join (decontamination), integer-exact Jaccard verify",
)
def doc_decontam_lsh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.dedup import lsh_join

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 3)
    benchmark = docs.where(F.col("doc_id") % 7 == 3)
    # benchmark is 1/7th of the corpus by construction — the documented
    # small-side fast path (scale deploys keep the default for an
    # unbounded right corpus)
    return lsh_join(
        corpus, benchmark, min_jaccard_pct=_DECONTAM_PCT, broadcast_small_side=True
    )


# --- n-gram novelty rate: memorization-risk / template detection ------------

_NOVELTY_ORACLE = f"""
WITH {_WORD_HASH_SHINGLES_SQL},
dfc AS (SELECT hv, CAST(count(*) AS BIGINT) AS df FROM h GROUP BY hv),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_shingles FROM h GROUP BY id),
nov AS (
  SELECT h.id, CAST(count(*) AS BIGINT) AS n_novel
  FROM h JOIN dfc ON h.hv = dfc.hv WHERE dfc.df = 1 GROUP BY h.id
)
SELECT s.id AS doc_id, s.n_shingles,
       CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(coalesce(n.n_novel, 0) AS DOUBLE) / s.n_shingles AS novel_frac
FROM sizes s LEFT JOIN nov n ON s.id = n.id
"""


@register(
    "doc_ngram_novelty",
    _NOVELTY_ORACLE,
    "per-doc novelty rate: share of distinct 3-shingles occurring in no other doc",
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. 2021's memorization-risk signal as a per-document
    metric (low novelty = template/near-dup candidate). Inverted-index
    shape WITHOUT pair explosion — df sums over the shingle hash, never
    self-joins."""
    from duckpipe_spark.functions.dedup import ngram_novelty

    out = ngram_novelty(load_table(spark, sf_dir, "documents"))
    return out.select(
        F.col("id").alias("doc_id"), "n_shingles", "n_novel", "novel_frac"
    )


# --- winnowing fingerprints (r10): Schleimer/Wilkerson/Aiken, SIGMOD 2003 ----

_WINNOW_W = 4
_WINNOW_MAX_DF = 50
_WINNOW_POS_CAP = 1 << _WINNOW_POS_BITS  # single definition of the tie-break key layout

# NOTE the explicit whitespace class (ADVICE r10 item 3): DuckDB/RE2 '\\s'
# is [\\t\\n\\f\\r ] WITHOUT \\x0b, while the engine kernel's _WS_KERNEL_RE
# (= Java ASCII \\s) includes it — spelling the class out keeps the two
# tokenizers byte-identical on \\x0b-bearing documents.
_WINNOW_SEL_CTES = f"""
toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+') AS t FROM documents
),
wh AS (
  SELECT id, list_transform(t, w -> list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD}
  )) AS w, len(t) AS n
  FROM toks WHERE len(t) >= 3
),
sh AS (
  SELECT id, i - 1 AS pos, n - 2 AS n_sh,
    ((w[i] * {WORD_BASE} + w[i+1]) % {POLY_MOD} * {WORD_BASE} + w[i+2]) % {POLY_MOD} AS hv
  FROM (SELECT id, w, n, unnest(range(1, n - 1)) AS i FROM wh)
),
wmin AS (
  SELECT id, pos, n_sh,
         min(hv * {_WINNOW_POS_CAP} + ({_WINNOW_POS_CAP - 1} - pos)) OVER (
           PARTITION BY id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS mc
  FROM sh
),
sel AS (
  SELECT DISTINCT id, mc FROM wmin WHERE pos <= greatest(n_sh - {_WINNOW_W}, 0)
)"""

_WINNOW_ORACLE = f"""
WITH {_WINNOW_SEL_CTES}
SELECT id AS doc_id,
       CAST({_WINNOW_POS_CAP - 1} - (mc % {_WINNOW_POS_CAP}) AS BIGINT) AS pos,
       CAST(mc // {_WINNOW_POS_CAP} AS BIGINT) AS fp
FROM sel
"""


@register(
    "doc_winnow_fingerprints",
    _WINNOW_ORACLE,
    "winnowing fingerprints (SIGMOD'03): per-window min k-gram hash, ~2/(w+1) density",
)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference surface: none (beyond-reference dedup operator; winnowing
    = Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS fingerprinting
    scheme). Guarantees any shared token run of >= w + k - 1 produces a
    shared fingerprint at ~2/(w+1) of the shingle index size. The oracle
    re-derives the selection with a SQL window min over the identical
    combined key hash*2^32 + (2^32-1-pos) (exact int64 rightmost-tie
    rule, the paper's plain winnowing)."""
    from duckpipe_spark.functions.dedup import winnow_fingerprints

    out = winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=3, w=_WINNOW_W
    )
    return out.select(F.col("id").alias("doc_id"), "pos", "fp")


_WINNOW_MATCHES_ORACLE = f"""
WITH {_WINNOW_SEL_CTES},
fps AS (
  SELECT DISTINCT id, mc // {_WINNOW_POS_CAP} AS fp FROM sel
),
hot AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) > {_WINNOW_MAX_DF}
),
rare AS MATERIALIZED (
  SELECT id, fp FROM fps WHERE fp NOT IN (SELECT fp FROM hot)
)
SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM rare a JOIN rare b ON a.fp = b.fp AND a.id < b.id
GROUP BY a.id, b.id
"""


@register(
    "doc_winnow_matches",
    _WINNOW_MATCHES_ORACLE,
    "MOSS-style candidate pairs from shared winnowed fingerprints (df-capped)",
)
def doc_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matching pass over the winnowed index: inverted-index self-join
    on the fingerprint (never all-pairs), with boilerplate fingerprints
    (df > _WINNOW_MAX_DF = 50) dropped by a broadcast anti-join BEFORE the
    pair join — one hot fingerprint would otherwise contribute df^2 pair
    rows (the Jaccard candidates' skew guard, reused)."""
    from duckpipe_spark.functions.dedup import winnow_matches

    return winnow_matches(
        load_table(spark, sf_dir, "documents"), k=3, w=_WINNOW_W, max_df=_WINNOW_MAX_DF
    )


_WDECON_BENCH_MIN = 90

_WINNOW_DECON_ORACLE = f"""
WITH {_WINNOW_SEL_CTES},
fps AS MATERIALIZED (
  SELECT DISTINCT id, mc // {_WINNOW_POS_CAP} AS fp,
         ({lehmer_hash_sql('id')}) % 100 AS b
  FROM sel
),
bench AS (
  SELECT DISTINCT fp FROM fps WHERE b >= {_WDECON_BENCH_MIN}
),
train AS MATERIALIZED (
  SELECT id, fp FROM fps WHERE b < {_WDECON_BENCH_MIN}
),
sizes AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_fp FROM train GROUP BY id
),
hits AS (
  SELECT t.id, CAST(count(*) AS BIGINT) AS n_shared
  FROM train t JOIN bench b ON t.fp = b.fp GROUP BY t.id
)
SELECT s.id AS doc_id, s.n_fp,
       CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(coalesce(h.n_shared, 0) > 0 AS INT) AS contaminated
FROM sizes s LEFT JOIN hits h ON s.id = h.id
"""


@register(
    "doc_winnow_decontam",
    _WINNOW_DECON_ORACLE,
    "verbatim-run decontamination over the winnowed index (no false negatives >= w+k-1)",
)
def doc_winnow_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheap decontamination first pass: winnowing guarantees any
    train doc sharing a verbatim >= w+k-1 token run with the benchmark
    split is flagged, at ~2/(w+1) of the full n-gram index
    doc_decontamination probes. Same Lehmer bucket split as the whole
    decontamination family."""
    from duckpipe_spark.functions.corpus import winnow_decontaminate

    return winnow_decontaminate(
        load_table(spark, sf_dir, "documents"),
        k=3,
        w=_WINNOW_W,
        bench_bucket_min=_WDECON_BENCH_MIN,
    )
