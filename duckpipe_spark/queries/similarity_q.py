"""Embedding similarity-search queries with exact DuckDB oracles.

Dot products on both engines are ordered left folds (float→double), so the
cosines are bit-identical and the (rounded cos, id) ranking is deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.similarity import (
    HYPERPLANES,
    N_PLANES,
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_topk,
)
from duckpipe_spark.functions.sampling import lehmer_hash_sql
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

_QUERY_IDS = [0, 1, 2, 3, 4]
_K = 5

_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT_SQL.format(a=a, b=b)
    na = _DOT_SQL.format(a=a, b=a)
    nb = _DOT_SQL.format(a=b, b=b)
    return f"round({dot} / sqrt({na} * {nb}), 6)"


_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register("embedding_cosine_topk", _TOPK_ORACLE, "brute-force cosine top-k ANN baseline")
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brute_force_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K)


def _plane_sql(i: int) -> str:
    vals = ", ".join(repr(float(v)) for v in HYPERPLANES[i])
    return f"([{vals}]::DOUBLE[])"  # parens so `plane[i]` indexing parses


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {_DOT_SQL.format(a='embedding', b=_plane_sql(i))} > 0.0 "
    f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for i in range(N_PLANES)
)

_LSH_TOPK_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket FROM bucketed
  WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM bucketed e JOIN q ON e.bucket = q.bucket
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register("embedding_lsh_topk", _LSH_TOPK_ORACLE, "LSH-bucketed approximate top-k (scale path)")
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_planes pinned: the static oracle SQL above encodes the 8-plane matrix.
    # Production callers omit n_planes and get planes_for_corpus scaling.
    return lsh_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K, n_planes=N_PLANES)


# --- multi-probe LSH (r10): Hamming-1 neighbor buckets for recall ------------

_PROBE_MASKS_SQL = ", ".join(
    f"CAST({m} AS BIGINT)" for m in [0] + [1 << i for i in range(N_PLANES)]
)

_MPROBE_TOPK_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket FROM bucketed
  WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
),
probes AS (
  SELECT query_id, qvec, xor(bucket, m.mask) AS bucket
  FROM q CROSS JOIN (SELECT unnest([{_PROBE_MASKS_SQL}]) AS mask) m
),
pairs AS (
  SELECT p.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('p.qvec', 'e.embedding')} AS cos
  FROM bucketed e JOIN probes p ON e.bucket = p.bucket
  WHERE e.vec_id <> p.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_lsh_multiprobe_topk",
    _MPROBE_TOPK_ORACLE,
    "multi-probe LSH top-k: query bucket + all Hamming-1 neighbor buckets (Lv'07)",
)
def embedding_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference surface: none (beyond-reference ANN operator; multi-probe
    LSH = Lv et al., VLDB 2007, derandomized to the full Hamming-1 probe
    set). The recall knob that doesn't add planes (splitting buckets) or
    hash tables (duplicating the index): probe the n_planes buckets one
    sign-flip away, where one-hyperplane near-misses — sign-LSH's dominant
    miss mode — land."""
    from duckpipe_spark.functions.similarity import lsh_multiprobe_topk

    return lsh_multiprobe_topk(
        load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K, n_planes=N_PLANES
    )


_NEARDUP_THRESHOLD = 0.3

_NEARDUP_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_cos_sql('a.embedding', 'b.embedding')} AS cos
FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {_NEARDUP_THRESHOLD}
"""


@register("embedding_neardup_pairs", _NEARDUP_ORACLE, "embedding-cosine near-dup pairs via LSH buckets")
def embedding_neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=_NEARDUP_THRESHOLD,
        n_planes=N_PLANES,  # static oracle encodes the 8-plane matrix
    )


_N_CELLS, _N_PROBE = 16, 4

_IVF_ORACLE = f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT {_N_CELLS}
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         {_cos_sql('e.embedding', 'c.cvec')} AS score
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
),
qscore AS (
  SELECT q.query_id, q.qvec, c.cell_id,
         {_cos_sql('q.qvec', 'c.cvec')} AS score
  FROM q CROSS JOIN cents c
),
probes AS (
  SELECT query_id, qvec, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, cell_id) AS rn
    FROM qscore
  ) WHERE rn <= {_N_PROBE}
),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_cos_sql('p.qvec', 'a.embedding')} AS cos
  FROM assign a JOIN probes p ON a.cell_id = p.cell_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register("embedding_ivf_topk", _IVF_ORACLE, "IVF coarse-quantized approximate top-k (probe best cells)")
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import ivf_topk

    return ivf_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K, _N_CELLS, _N_PROBE)


# --- product quantization: codes + asymmetric-distance top-k ---------------

_PQ_M, _PQ_CELLS, _PQ_SCALE, _PQ_SUB = 8, 16, 10_000, 8

_PQ_DIST = (
    "CAST(list_sum(list_transform(range(1, {n} + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
)


def _pq_base_sql() -> str:
    """Shared CTE chain: quantized vectors, per-subspace segments, seed
    codebooks (subvectors of the n_cells smallest ids), code assignment."""
    dist = _PQ_DIST.format(a="s.seg", b="c.cseg", n=_PQ_SUB)
    return f"""qv AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_PQ_SCALE}) AS BIGINT)) AS v
  FROM embeddings
),
subs AS (SELECT unnest(range(0, {_PQ_M})) AS sub),
segs AS (
  SELECT id, sub, list_slice(v, sub * {_PQ_SUB} + 1, sub * {_PQ_SUB} + {_PQ_SUB}) AS seg
  FROM qv CROSS JOIN subs
),
cent0 AS (
  SELECT id, v, row_number() OVER (ORDER BY id) - 1 AS code
  FROM (SELECT id, v FROM qv ORDER BY id LIMIT {_PQ_CELLS})
),
csegs AS (
  SELECT code, sub, list_slice(v, sub * {_PQ_SUB} + 1, sub * {_PQ_SUB} + {_PQ_SUB}) AS cseg
  FROM cent0 CROSS JOIN subs
),
assign AS (
  SELECT id, sub, code FROM (
    SELECT s.id, s.sub, c.code,
           row_number() OVER (PARTITION BY s.id, s.sub ORDER BY {dist}, c.code) AS rn
    FROM segs s JOIN csegs c USING (sub)
  ) WHERE rn = 1
)"""


_PQ_CODES_ORACLE = f"""
WITH {_pq_base_sql()}
SELECT id, sub, code FROM assign
"""


@register(
    "embedding_pq_codes",
    _PQ_CODES_ORACLE,
    "product-quantization code assignment (integer squared-L2, seed codebooks)",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import pq_codes

    return pq_codes(load_table(spark, sf_dir, "embeddings"))


_PQ_ADC_ORACLE = f"""
WITH {_pq_base_sql()},
qsegs AS (
  SELECT id AS query_id, sub, seg AS qseg FROM segs
  WHERE id IN ({', '.join(map(str, _QUERY_IDS))})
),
lut AS (
  SELECT q.query_id, c.sub, c.code,
         {_PQ_DIST.format(a="q.qseg", b="c.cseg", n=_PQ_SUB)} AS d
  FROM qsegs q JOIN csegs c USING (sub)
),
dists AS (
  SELECT l.query_id, a.id AS neighbor_id, CAST(sum(l.d) AS BIGINT) AS adist
  FROM assign a JOIN lut l ON a.sub = l.sub AND a.code = l.code
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adist,
         row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank
  FROM dists WHERE neighbor_id <> query_id
)
SELECT query_id, rank, neighbor_id, adist FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_pq_adc_topk",
    _PQ_ADC_ORACLE,
    "PQ asymmetric-distance top-k (broadcast LUT over codes — the billion-vector scan shape)",
)
def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import pq_adc_topk

    return pq_adc_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K)


# --- deterministic k-means (trained IVF centroids), exact iterative oracle ---

_KM_K = 8
_KM_ITERS = 2
_KM_SCALE = 10_000
_IVF_TRAINED_N_PROBE = 2


# integer squared-L2 between a point alias q and a centroid alias c
_KM_DIST = (
    "CAST(list_sum(list_transform(range(1, len(q.v) + 1), "
    "i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))) AS BIGINT)"
)


def _km_assign(name: str, cents: str) -> str:
    return f"""{name} AS (
  SELECT id, v, cell FROM (
    SELECT q.id, q.v, c.cell,
           row_number() OVER (PARTITION BY q.id ORDER BY {_KM_DIST}, c.cell) AS rn
    FROM qv q CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""


def _km_qv_cte(scale: int, with_bucket: bool = False) -> str:
    h = lehmer_hash_sql("vec_id")
    bucket = f",\n         {_BUCKET_SQL} AS bucket" if with_bucket else ""
    return f"""qv AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v,
         {h} AS h{bucket}
  FROM embeddings
)"""


def _km_lloyd_tail(prev: str, iters: int, final_select: bool = True) -> str:
    """Lloyd assign/update CTE chain from init-centroid CTE ``prev`` to the
    final SELECT (shared by the farthest-point and k-means‖ oracles).
    ``final_select=False`` stops after the ``afinal`` CTE so a consumer
    (the trained-IVF oracle) can keep composing — the trained centroid
    table is ``c{iters}``."""
    sql = ""
    for t in range(1, iters + 1):
        sql += ",\n" + _km_assign(f"a{t}", prev)
        sql += f""",
c{t} AS (
  SELECT cell, list(c ORDER BY pos) AS cv FROM (
    SELECT cell, pos, CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS c FROM (
      SELECT cell, pos, v[pos] AS val FROM (
        SELECT cell, v, unnest(range(1, len(v) + 1)) AS pos FROM a{t}
      )
    ) GROUP BY cell, pos
  ) GROUP BY cell
)"""
        prev = f"c{t}"
    sql += ",\n" + _km_assign("afinal", prev)
    if final_select:
        return sql + "\nSELECT id, cell FROM afinal"
    return sql


def _km_farthest_init_chain(k: int, scale: int) -> str:
    """qv + farthest-point seed CTEs cu0..cu{k-1} (no WITH keyword) —
    shared by the k-means oracle and the trained-IVF oracle."""
    sql = f"""{_km_qv_cte(scale)},
cu0 AS (
  SELECT CAST(0 AS BIGINT) AS cell, v AS cv
  FROM (SELECT v FROM qv ORDER BY h, id LIMIT 1)
)"""
    # farthest-point init: seed t = argmax over the corpus of min distance
    # to seeds <t (ties on hash then id), mirroring the Spark driver loop
    for t in range(1, k):
        sql += f""",
cu{t} AS (
  SELECT * FROM cu{t - 1}
  UNION ALL
  SELECT CAST({t} AS BIGINT) AS cell, v AS cv FROM (
    SELECT q.id, q.v, q.h,
           min({_KM_DIST}) AS d
    FROM qv q CROSS JOIN cu{t - 1} c
    GROUP BY q.id, q.v, q.h
    ORDER BY d DESC, q.h, q.id LIMIT 1
  )
)"""
    return sql


def _kmeans_oracle(k: int, iters: int, scale: int) -> str:
    """Unrolled Lloyd iterations as chained CTEs — the SQL twin of
    ``kmeans_cells``'s driver loop. All-integer math (quantized vectors,
    integer squared-L2, floor(sum/count) centroids) makes every iteration
    bit-exact across engines, so the final assignment hash-matches."""
    return (
        "WITH " + _km_farthest_init_chain(k, scale) + _km_lloyd_tail(f"cu{k - 1}", iters)
    )


def _kmeanspar_oracle(k: int, iters: int, scale: int, passes: int, ell: int) -> str:
    """k-means‖ init (deterministic top-cost oversampling) + the shared
    Lloyd tail — the SQL twin of ``kmeans_cells(init='parallel')``. Each
    pass p materializes the running min-distance table d{p} and takes the
    ``ell`` largest (d DESC, h, id); candidate ids are the Spark side's
    selection order (seed 0, then compact per-pass row numbers). Weights
    count argmin wins (ties to the earlier candidate); the k heaviest
    (w DESC, ci) become init cells 0..k-1."""
    # distance between point alias p2 and candidate batch alias b
    bdist = (
        "CAST(list_sum(list_transform(range(1, len(p2.v) + 1), "
        "i -> (p2.v[i] - b.v[i]) * (p2.v[i] - b.v[i]))) AS BIGINT)"
    )
    sql = f"""WITH {_km_qv_cte(scale, with_bucket=True)},
s0 AS MATERIALIZED (SELECT v AS cv FROM qv ORDER BY h, id LIMIT 1),
d0 AS MATERIALIZED (
  SELECT q.id, q.h, q.v, q.bucket,
         CAST(list_sum(list_transform(range(1, len(q.v) + 1),
              i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))) AS BIGINT) AS d
  FROM qv q CROSS JOIN s0 c
)"""
    for p in range(passes):
        # LSH-stratified pass: one representative per bucket (argmax running
        # min-distance), then the global top-ell of the representatives
        sql += f""",
b{p + 1} AS MATERIALIZED (
  SELECT id, v, row_number() OVER (ORDER BY d DESC, h, id) AS r
  FROM (
    SELECT id, h, v, d,
           row_number() OVER (PARTITION BY bucket ORDER BY d DESC, h, id) AS brn
    FROM d{p}
  ) WHERE brn = 1
  ORDER BY d DESC, h, id LIMIT {ell}
)"""
        if p < passes - 1:
            sql += f""",
d{p + 1} AS MATERIALIZED (
  SELECT p1.id, p1.h, p1.v, p1.bucket, least(p1.d, m.nd) AS d
  FROM d{p} p1 JOIN (
    SELECT p2.id, min({bdist}) AS nd
    FROM d{p} p2 CROSS JOIN b{p + 1} b GROUP BY p2.id
  ) m ON p1.id = m.id
)"""
    # candidate ids: seed 0, then each pass's rows numbered compactly after
    # all earlier candidates (coalesce(max(r)) handles a short batch)
    cand_unions = ["SELECT CAST(0 AS BIGINT) AS ci, cv FROM s0"]
    offset_expr = "0"
    for p in range(passes):
        cand_unions.append(
            f"SELECT CAST({offset_expr} + r AS BIGINT) AS ci, v AS cv FROM b{p + 1}"
        )
        offset_expr += f" + (SELECT coalesce(max(r), 0) FROM b{p + 1})"
    cand_body = "\n  UNION ALL\n  ".join(cand_unions)
    # candidate-to-candidate integer sqdist (c = unchosen, ch = chosen)
    cdist = (
        "CAST(list_sum(list_transform(range(1, len(c.cv) + 1), "
        "i -> (c.cv[i] - ch.cv[i]) * (c.cv[i] - ch.cv[i]))) AS BIGINT)"
    )
    sql += f""",
cands AS MATERIALIZED (
  {cand_body}
),
wts AS MATERIALIZED (
  SELECT ci, CAST(count(*) AS BIGINT) AS w FROM (
    SELECT q.id, c.ci,
           row_number() OVER (PARTITION BY q.id ORDER BY {_KM_DIST}, c.ci) AS rn
    FROM qv q CROSS JOIN cands c
  ) WHERE rn = 1 GROUP BY ci
),
cw AS MATERIALIZED (
  SELECT c.ci, c.cv, CAST(coalesce(w.w, 0) AS BIGINT) AS w
  FROM cands c LEFT JOIN wts w ON c.ci = w.ci
),
ch0 AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS cell, ci, cv
  FROM (SELECT ci, cv FROM cw ORDER BY w DESC, ci LIMIT 1)
)"""
    # weighted farthest-point reduction to k init cells: step t picks the
    # unchosen candidate maximizing CAST(w AS DOUBLE) * CAST(min sqdist to
    # the chosen set AS DOUBLE) — the exact float the Spark driver computes
    for t in range(1, k):
        sql += f""",
ch{t} AS MATERIALIZED (
  SELECT * FROM ch{t - 1}
  UNION ALL
  SELECT CAST({t} AS BIGINT) AS cell, ci, cv FROM (
    SELECT c.ci, c.cv, c.w,
           CAST(c.w AS DOUBLE) * CAST(min({cdist}) AS DOUBLE) AS score
    FROM cw c CROSS JOIN ch{t - 1} ch
    WHERE c.ci NOT IN (SELECT ci FROM ch{t - 1})
    GROUP BY c.ci, c.cv, c.w
    ORDER BY score DESC, c.w DESC, c.ci ASC LIMIT 1
  )
)"""
    sql += f""",
init AS (SELECT cell, cv FROM ch{k - 1})"""
    return sql + _km_lloyd_tail("init", iters)


@register(
    "embedding_kmeans_cells",
    _kmeans_oracle(_KM_K, _KM_ITERS, _KM_SCALE),
    "deterministic integer-quantized Lloyd k-means cell assignment (trained IVF)",
)
def embedding_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import kmeans_cells

    return kmeans_cells(
        load_table(spark, sf_dir, "embeddings"), k=_KM_K, iters=_KM_ITERS, scale=_KM_SCALE
    )


# --- IVF over TRAINED centroids (r10): the production coarse quantizer ------


def _ivf_trained_oracle(k: int, iters: int, scale: int, n_probe: int) -> str:
    """The full trained-index probe as one SQL: the unrolled k-means chain
    (init + Lloyd, shared builders with _kmeans_oracle) exposes the trained
    centroid table c{iters} and the assignment afinal; probe selection uses
    the SAME integer squared-L2 and cell tie-break; the rerank joins the
    float vectors back for the exact rounded cosine."""
    chain = _km_farthest_init_chain(k, scale) + _km_lloyd_tail(
        f"cu{k - 1}", iters, final_select=False
    )
    ids = ", ".join(map(str, _QUERY_IDS))
    return f"""WITH {chain},
pq AS (
  SELECT id AS query_id, v FROM qv WHERE id IN ({ids})
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {_KM_DIST}, c.cell) AS rn
    FROM pq q CROSS JOIN c{iters} c
  ) WHERE rn <= {n_probe}
),
cands AS (
  SELECT p.query_id, a.id AS neighbor_id
  FROM afinal a JOIN probes p ON a.cell = p.cell
  WHERE a.id <> p.query_id
),
ranked AS (
  SELECT c.query_id, c.neighbor_id,
         {_cos_sql('qe.embedding', 'ne.embedding')} AS cos,
         row_number() OVER (PARTITION BY c.query_id
                            ORDER BY {_cos_sql('qe.embedding', 'ne.embedding')} DESC,
                                     c.neighbor_id) AS rank
  FROM cands c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_ivf_trained_topk",
    _ivf_trained_oracle(_KM_K, _KM_ITERS, _KM_SCALE, _IVF_TRAINED_N_PROBE),
    "IVF top-k over k-means-TRAINED centroids (integer probe metric, cosine rerank)",
)
def embedding_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form ``ivf_assign``'s docstring promises: the coarse
    quantizer is the Lloyd-trained centroid table (cells tile the data
    distribution), not smallest-id seeds. Probe metric is the k-means
    integer squared-L2 (bit-exact), rerank is the exact cosine over the
    probed n_probe/n_cells slice of the corpus. The oracle re-derives
    train + assign + probe + rerank from first principles in one SQL."""
    from duckpipe_spark.functions.similarity import ivf_trained_topk

    return ivf_trained_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        _K,
        n_cells=_KM_K,
        iters=_KM_ITERS,
        n_probe=_IVF_TRAINED_N_PROBE,
        scale=_KM_SCALE,
    )


# --- IVF-PQ (IVFADC): trained-cell probe + residual-PQ ADC + exact rerank ---

_IVFPQ_M, _IVFPQ_CELLS, _IVFPQ_SUB = 8, 16, 8
# r13 (VERDICT r12 item 3): rerank defaults to the DERIVED covering width
# — max(8·topk, ceil(1.5·N·n_probe/n_cells)) in integer math — instead of
# the fixed 50 that delivered half the trained-cell recall ceiling.
_IVFPQ_RERANK: int | None = None


def _ivfpq_oracle(
    k: int, iters: int, scale: int, n_probe: int,
    m: int, pq_cells: int, rerank: int | None,
) -> str:
    """SQL twin of ``ivfpq_topk`` (Jégou'11 IVFADC): the shared unrolled
    k-means chain exposes the trained centroid table and assignment;
    residuals, the smallest-id residual codebook, code assignment, the
    per-(query, probed cell) ADC LUT, the ADC shortlist and the exact
    rerank are all re-derived from first principles. The multiply-read
    CTEs (trained cells, assignment, residuals, codebook) are MATERIALIZED
    so DuckDB does not re-run the Lloyd chain once per reference.

    ``rerank=None`` replays ``ivfpq_topk``'s derived covering default —
    ``GREATEST(8·topk, (3·N·n_probe + 2·n_cells − 1) // (2·n_cells))`` —
    as a scalar subquery over the corpus count, the same integer-ceil
    arithmetic, so the literal-free default stays hash-identical across
    engines at every scale."""
    chain = _km_farthest_init_chain(k, scale) + _km_lloyd_tail(
        f"cu{k - 1}", iters, final_select=False
    )
    ids = ", ".join(map(str, _QUERY_IDS))
    if rerank is None:
        rerank_sql = (
            f"(SELECT GREATEST({8 * _K}, "
            f"(3 * count(*) * {n_probe} + {2 * k - 1}) // {2 * k}) FROM qv)"
        )
    else:
        rerank_sql = str(rerank)
    sd = _IVFPQ_SUB
    sqd = (
        "CAST(list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )
    return f"""WITH {chain},
cfin AS MATERIALIZED (SELECT cell, cv FROM c{iters}),
amat AS MATERIALIZED (SELECT id, v, cell FROM afinal),
res AS MATERIALIZED (
  SELECT a.id, a.cell,
         list_transform(range(1, len(a.v) + 1), i -> a.v[i] - c.cv[i]) AS r
  FROM amat a JOIN cfin c ON a.cell = c.cell
),
subs AS (SELECT unnest(range(0, {m})) AS sub),
cb AS MATERIALIZED (
  SELECT code, sub, list_slice(r, sub * {sd} + 1, sub * {sd} + {sd}) AS cseg
  FROM (
    SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS code, r
    FROM (SELECT id, r FROM res ORDER BY id LIMIT {pq_cells})
  ), subs
),
codes AS (
  SELECT id, cell, sub, code FROM (
    SELECT s.id, s.cell, s.sub, c.code,
           row_number() OVER (PARTITION BY s.id, s.sub
                              ORDER BY {sqd.format(a='s.seg', b='c.cseg')}, c.code) AS rn
    FROM (SELECT id, cell, sub, list_slice(r, sub * {sd} + 1, sub * {sd} + {sd}) AS seg
          FROM res, subs) s
    JOIN cb c ON s.sub = c.sub
  ) WHERE rn = 1
),
pquery AS (SELECT id AS query_id, v FROM qv WHERE id IN ({ids})),
probes AS MATERIALIZED (
  SELECT query_id, cell, qr FROM (
    SELECT q.query_id, c.cell,
           list_transform(range(1, len(q.v) + 1), i -> q.v[i] - c.cv[i]) AS qr,
           row_number() OVER (PARTITION BY q.query_id ORDER BY {_KM_DIST}, c.cell) AS rn
    FROM pquery q CROSS JOIN cfin c
  ) WHERE rn <= {n_probe}
),
lut AS MATERIALIZED (
  SELECT s.query_id, s.cell, s.sub, c.code,
         {sqd.format(a='s.qseg', b='c.cseg')} AS d
  FROM (SELECT query_id, cell, sub, list_slice(qr, sub * {sd} + 1, sub * {sd} + {sd}) AS qseg
        FROM probes, subs) s
  JOIN cb c ON s.sub = c.sub
),
adc AS (
  SELECT l.query_id, cd.id AS neighbor_id, CAST(sum(l.d) AS BIGINT) AS adist
  FROM codes cd
  JOIN lut l ON cd.cell = l.cell AND cd.sub = l.sub AND cd.code = l.code
  WHERE cd.id <> l.query_id
  GROUP BY l.query_id, cd.id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {rerank_sql}
),
ranked AS (
  SELECT s.query_id, s.neighbor_id,
         {_cos_sql('qe.embedding', 'ne.embedding')} AS cos,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY {_cos_sql('qe.embedding', 'ne.embedding')} DESC,
                                     s.neighbor_id) AS rank
  FROM short s
  JOIN embeddings qe ON qe.vec_id = s.query_id
  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_ivfpq_topk",
    _ivfpq_oracle(
        _KM_K, _KM_ITERS, _KM_SCALE, _IVF_TRAINED_N_PROBE,
        _IVFPQ_M, _IVFPQ_CELLS, _IVFPQ_RERANK,
    ),
    "IVF-PQ (IVFADC): trained-cell probe, residual-PQ ADC scan, exact top-m rerank",
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r10 item 2 — the production ANN composition the ladder
    lacked: ``ivf_trained_topk``'s trained coarse quantizer + ``pq_adc_
    topk``'s ADC scoring, composed as Jégou'11 IVFADC (PQ on the residual
    to the assigned cell, ADC restricted to probed cells, exact rerank of
    the ADC top-m). Same probe budget as embedding_ivf_trained_topk so
    the recall comparison in examples/ann_evaluation.py is apples-to-
    apples."""
    from duckpipe_spark.functions.similarity import ivfpq_topk

    return ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        _K,
        n_cells=_KM_K,
        iters=_KM_ITERS,
        n_probe=_IVF_TRAINED_N_PROBE,
        m=_IVFPQ_M,
        pq_cells=_IVFPQ_CELLS,
        rerank=_IVFPQ_RERANK,
        scale=_KM_SCALE,
    )


# --- k-means‖ (oversampled) init: O(passes) driver rounds, not O(k) ---------

_KMP_PASSES = 2
_KMP_ELL = 16  # oversample = 2k


@register(
    "embedding_kmeanspar_cells",
    _kmeanspar_oracle(_KM_K, _KM_ITERS, _KM_SCALE, _KMP_PASSES, _KMP_ELL),
    "k-means with deterministic k-means|| oversampled init (2 passes seed any k)",
)
def embedding_kmeanspar_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r8 item 4: farthest-point init costs k−1 sequential driver
    rounds — fine at k=8, the bottleneck at the k ≳ 1024 cells real
    SemDeDup/prototype runs use. k-means‖ (Bahmani et al. 2012,
    derandomized to top-cost selection) seeds with O(init_passes) rounds:
    each pass takes the 2k points with the largest running min-distance,
    updates the running distance through one broadcast-join aggregate,
    then the k heaviest candidates (by argmin wins) become the init
    centroids. Same all-integer contract, unrolled SQL twin."""
    from duckpipe_spark.functions.similarity import kmeans_cells

    return kmeans_cells(
        load_table(spark, sf_dir, "embeddings"),
        k=_KM_K,
        iters=_KM_ITERS,
        scale=_KM_SCALE,
        init="parallel",
        init_passes=_KMP_PASSES,
        oversample=_KMP_ELL,
    )


# --- semantic dedup: keep-one-per-cluster over the near-dup closure --------

_SEMDEDUP_ORACLE = f"""
WITH RECURSIVE bucketed AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {_NEARDUP_THRESHOLD}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u)
SELECT e.vec_id,
       COALESCE(c.component, e.vec_id) AS component,
       CAST(COALESCE(c.component, e.vec_id) = e.vec_id AS INTEGER) AS kept
FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
"""


@register(
    "embedding_semantic_dedup",
    _SEMDEDUP_ORACLE,
    "SemDeDup keep-one-per-cluster over the embedding near-dup closure",
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import semantic_dedup

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=_NEARDUP_THRESHOLD,
        n_planes=N_PLANES,  # static oracle encodes the 8-plane matrix
    )


# --- ANN recall evaluation: LSH top-k vs exact top-k, in one plan ----------

_RECALL_ORACLE = f"""
WITH exactp AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM embeddings e CROSS JOIN (
    SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
    WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) q
  WHERE e.vec_id <> q.query_id
),
exactk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM exactp
  ) WHERE rank <= {_K}
),
bucketed AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
),
lshp AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM bucketed e JOIN (
    SELECT vec_id AS query_id, embedding AS qvec, bucket FROM bucketed
    WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) q ON e.bucket = q.bucket
  WHERE e.vec_id <> q.query_id
),
lshk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM lshp
  ) WHERE rank <= {_K}
)
SELECT e.query_id,
       CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(l.neighbor_id) AS DOUBLE) / {_K}.0 AS recall
FROM exactk e LEFT JOIN lshk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


@register(
    "embedding_lsh_recall",
    _RECALL_ORACLE,
    "ANN evaluation: recall@k of LSH-bucketed top-k vs exact top-k, per query",
)
def embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import lsh_recall

    return lsh_recall(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K, n_planes=N_PLANES)


_MPROBE_RECALL_ORACLE = f"""
WITH exactp AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM embeddings e CROSS JOIN (
    SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
    WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) q
  WHERE e.vec_id <> q.query_id
),
exactk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM exactp
  ) WHERE rank <= {_K}
),
bucketed AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
),
probes AS (
  SELECT query_id, qvec, xor(bucket, m.mask) AS bucket
  FROM (
    SELECT vec_id AS query_id, embedding AS qvec, bucket FROM bucketed
    WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) q CROSS JOIN (SELECT unnest([{_PROBE_MASKS_SQL}]) AS mask) m
),
mpk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                              ORDER BY {_cos_sql('p.qvec', 'e.embedding')} DESC, e.vec_id) AS rank
    FROM bucketed e JOIN probes p ON e.bucket = p.bucket
    WHERE e.vec_id <> p.query_id
  ) WHERE rank <= {_K}
)
SELECT e.query_id,
       CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(l.neighbor_id) AS DOUBLE) / {_K}.0 AS recall
FROM exactk e LEFT JOIN mpk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


@register(
    "embedding_multiprobe_recall",
    _MPROBE_RECALL_ORACLE,
    "ANN evaluation: recall@k of the multi-probe LSH path vs exact top-k, per query",
)
def embedding_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement that justifies probing: per-query recall@k of the
    Hamming-1 probe set. Candidates are a strict superset of the
    single-bucket path's, so every query's recall here >= its
    embedding_lsh_recall value (a globally-top-k item in the candidate set
    can be outranked by at most k-1 candidates — the same monotonicity
    argument as the two-phase rank's superset proof; pytest-pinned)."""
    from duckpipe_spark.functions.similarity import lsh_multiprobe_recall

    return lsh_multiprobe_recall(
        load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K, n_planes=N_PLANES
    )


_IVF_RECALL_ORACLE = f"""
WITH exactp AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM embeddings e CROSS JOIN (
    SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
    WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) q
  WHERE e.vec_id <> q.query_id
),
exactk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM exactp
  ) WHERE rank <= {_K}
),
cents AS (
  SELECT vec_id AS cell_id, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT {_N_CELLS}
),
assign AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC, c.cell_id) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qvec, cell_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos_sql('q.embedding', 'c.cvec')} DESC, c.cell_id) AS rn
    FROM embeddings q CROSS JOIN cents c
    WHERE q.vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) WHERE rn <= {_N_PROBE}
),
ivfk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                              ORDER BY {_cos_sql('p.qvec', 'a.embedding')} DESC, a.vec_id) AS rank
    FROM assign a JOIN probes p ON a.cell_id = p.cell_id
    WHERE a.vec_id <> p.query_id
  ) WHERE rank <= {_K}
)
SELECT e.query_id,
       CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(l.neighbor_id) AS DOUBLE) / {_K}.0 AS recall
FROM exactk e LEFT JOIN ivfk l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""


@register(
    "embedding_ivf_recall",
    _IVF_RECALL_ORACLE,
    "ANN evaluation: recall@k of the IVF probe path vs exact top-k, per query",
)
def embedding_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import ivf_recall

    return ivf_recall(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K, _N_CELLS, _N_PROBE)


# --- cross-table composition: cluster quality profile ----------------------

_CLUSTER_PROFILE_ORACLE = f"""
WITH km AS (
  {_kmeans_oracle(_KM_K, _KM_ITERS, _KM_SCALE)}
),
dq AS (
  SELECT doc_id,
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
SELECT km.cell,
       count(*) AS n_docs,
       CAST(sum(dq.n_toks) AS BIGINT) AS total_tokens,
       CAST(sum(dq.qp) AS DOUBLE) / (count(*) * 3) AS avg_quality
FROM km JOIN dq ON km.id = dq.doc_id
GROUP BY km.cell
"""


@register(
    "embedding_cluster_profile",
    _CLUSTER_PROFILE_ORACLE,
    "cross-table composition: per-kmeans-cell document quality + token volume",
)
def embedding_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the trained k-means cell assignment (embeddings table) with the
    per-document quality signals (documents table) → one quality/volume
    profile row per semantic cluster. This is the query a curation owner
    runs to decide which embedding-space regions to up/down-weight; it
    composes two operator families in one lazy plan (cells: iterative
    integer Lloyd; quality: codegen surface stats) with a broadcast join on
    the small document side."""
    from duckpipe_spark.functions.similarity import kmeans_cells
    from duckpipe_spark.functions.text import quality_points_col, tokens_col

    cells = kmeans_cells(
        load_table(spark, sf_dir, "embeddings"), k=_KM_K, iters=_KM_ITERS, scale=_KM_SCALE
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.size(tokens_col(F.col("text"))).cast("bigint").alias("n_toks"),
        quality_points_col(F.col("text")).alias("qp"),
    )
    return (
        cells.join(F.broadcast(docs), "id")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            (F.sum("qp").cast("double") / (F.count(F.lit(1)) * 3)).alias("avg_quality"),
        )
    )


# int8 scalar quantization: q_sum is an exact BIGINT cross-engine check;
# float metrics are rounded. Both engines evaluate the same double
# expressions in the same fold order (list lambdas are sequential in DuckDB,
# higher-order functions are sequential in Spark), and rounding is
# floor(v + 0.5) on both so ties at .5 agree.
_INT8_ORACLE = """
WITH x AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xs
  FROM embeddings
),
s AS (
  SELECT vec_id, xs,
         greatest(list_max(list_transform(xs, v -> abs(v))), 1e-30) AS sc
  FROM x
),
q AS (
  SELECT vec_id, xs, sc,
         list_transform(xs, v -> CAST(floor(v * 127.0 / sc + 0.5) AS BIGINT)) AS qs
  FROM s
),
e AS (
  SELECT vec_id, xs, sc, qs,
         list_transform(generate_series(1, len(xs)),
                        i -> xs[i] - CAST(qs[i] AS DOUBLE) * sc / 127.0) AS es
  FROM q
)
SELECT vec_id,
       CAST(len(xs) AS INT) AS n_dims,
       CAST(list_sum(qs) AS BIGINT) AS q_sum,
       round(sc, 6) AS scale,
       round(list_sum(list_transform(es, v -> v * v)) / CAST(len(xs) AS DOUBLE), 9) AS mse,
       round(list_max(list_transform(es, v -> abs(v))), 9) AS max_abs_err
FROM e
"""


@register(
    "embedding_int8_quant",
    _INT8_ORACLE,
    "symmetric int8 scalar quantization + reconstruction-error audit",
)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.similarity import scalar_quantize_int8

    return scalar_quantize_int8(load_table(spark, sf_dir, "embeddings"))


# --- binary (sign) quantization + exact Hamming top-k ------------------------

_PACK_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_slice({v}, {lo} + 1, {lo} + 32), "
    "x -> CASE WHEN x > 0.0 THEN 1 ELSE 0 END)), (a, b) -> a * 2 + b)"
)

_HAMMING_ORACLE = f"""
WITH codes AS (
  SELECT vec_id,
         {_PACK_SQL.format(v='embedding', lo=0)} AS h0,
         {_PACK_SQL.format(v='embedding', lo=32)} AS h1
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, h0 AS q0, h1 AS q1 FROM codes
  WHERE vec_id IN ({", ".join(map(str, _QUERY_IDS))})
),
pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(c.h0, q.q0)) + bit_count(xor(c.h1, q.q1)) AS BIGINT) AS hamming
  FROM codes c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, hamming FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_hamming_topk",
    _HAMMING_ORACLE,
    "binary sign-quantized ANN: exact Hamming top-k over 16-byte packed codes",
)
def embedding_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-integer ANN (no float rounding anywhere): sign-pack each
    64-dim vector into two 32-bit halves, rank by xor+popcount. The
    binary-embedding retrieval shape — 16 bytes/vector makes the full
    scan the index."""
    from duckpipe_spark.functions.similarity import hamming_topk

    return hamming_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, _K)


# --- Hamming ANN against an EXTERNAL query batch ------------------------------

# the "fresh batch": every 257th corpus vector, re-keyed into a query-id
# namespace disjoint from vec_ids (x10+1) — the hard-negative-mining shape
# where the queries arrive as their own table, not as corpus ids
_HAMMING_EXT_ORACLE = f"""
WITH codes AS (
  SELECT vec_id,
         {_PACK_SQL.format(v='embedding', lo=0)} AS h0,
         {_PACK_SQL.format(v='embedding', lo=32)} AS h1
  FROM embeddings
),
q AS (
  SELECT vec_id * 10 + 1 AS query_id,
         {_PACK_SQL.format(v='embedding', lo=0)} AS q0,
         {_PACK_SQL.format(v='embedding', lo=32)} AS q1
  FROM embeddings WHERE vec_id % 257 = 3
),
pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(c.h0, q.q0)) + bit_count(xor(c.h1, q.q1)) AS BIGINT) AS hamming
  FROM codes c CROSS JOIN q
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id, hamming FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_hamming_external_topk",
    _HAMMING_EXT_ORACLE,
    "Hamming ANN against an external query table (hard-negative-mining batch shape)",
)
def embedding_hamming_external_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r8 item 7: the query side is its OWN DataFrame with its own
    id namespace (here: every 257th corpus vector re-keyed x10+1),
    sign-packed identically and broadcast across the corpus codes. No
    same-id exclusion — external queries can legitimately match any corpus
    row (a query identical to a corpus vector ranks it first at hamming
    0)."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.similarity import hamming_topk_queries

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 257 == 3).select(
        (F.col("vec_id") * 10 + 1).alias("query_id"), "embedding"
    )
    return hamming_topk_queries(emb, queries, _K)


# --- SQ8 approximate top-k: global-scale int8 scan + exact rerank (r11) -----
#
# The scalar-quantization ladder rung between the audit (embedding_int8_
# quant) and PQ: the candidate scan ranks by the EXACT integer dot of the
# query's round(x*scale) vector against the x127-scaled int8 reconstruction
# (codes (v+gmax)*127 // (2*gmax) with gmax the exact corpus-wide integer
# bound — non-negative operands, so // and truncation agree on every
# engine), then the rerank survivors re-score by exact cosine. Both stages
# deterministic: integer candidate scores, (rounded cos, id) final order.

_SQ8_RERANK = 32
_SQ8_SCALE = 10_000

_IDOT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
    "(acc, x) -> acc + x)"
)

_SQ8_ORACLE = f"""
WITH iv AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_SQ8_SCALE}) AS BIGINT)) AS v
  FROM embeddings
),
g AS (
  SELECT greatest(max(list_max(list_transform(v, x -> abs(x)))), 1) AS gmax FROM iv
),
coded AS (
  SELECT vec_id, embedding,
         list_transform(v, x -> ((x + gmax) * 127 // (2 * gmax)) * 2 * gmax - 127 * gmax) AS r
  FROM iv, g
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec, v AS qv FROM iv
  WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.embedding AS nvec, q.qvec,
         {_IDOT_SQL.format(a='q.qv', b='c.r')} AS adot
  FROM coded c, q WHERE c.vec_id <> q.query_id
),
cand AS (
  SELECT query_id, neighbor_id, nvec, qvec,
         row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, neighbor_id) AS rn
  FROM scored
),
ranked AS (
  SELECT query_id, neighbor_id,
         {_cos_sql('qvec', 'nvec')} AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY {_cos_sql('qvec', 'nvec')} DESC, neighbor_id
         ) AS INT) AS rank
  FROM cand WHERE rn <= {_SQ8_RERANK}
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_sq8_topk",
    _SQ8_ORACLE,
    "SQ8 approximate top-k: global-scale int8 candidate scan + exact cosine rerank",
)
def embedding_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — FAISS ``SQ8,Flat``-refine shape: 4x-compressed candidate scan
    (exact-integer approximate dots over the x127-scaled reconstruction, so
    cross-engine bit-identical), exact cosine rerank of the top-``rerank``;
    two-phase rank at both stages."""
    from duckpipe_spark.functions.similarity import sq8_topk

    return sq8_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        _K,
        rerank=_SQ8_RERANK,
        scale=_SQ8_SCALE,
    )


# --- hybrid sparse+dense retrieval fused by integer RRF (r14) ----------------

# The standard RAG/hard-negative-mining retrieval shape the catalog lacked:
# BM25 keyword ranking (sparse) and embedding cosine ranking (dense) over
# the SAME id space (documents.doc_id == embeddings.vec_id in the corpus),
# combined by Reciprocal Rank Fusion. RRF only consumes RANKS, so the two
# rankers' already-deterministic (rounded score, id) orders make the fused
# BIGINT score — scale DIV (k_rrf + rank) — hash-exact cross-engine with
# no new float surface at all.
_HYBRID_K = 10
_HYBRID_CAND_K = 20
_HYBRID_RRF_K = 60
_HYBRID_SCALE = 1_000_000
# dense-side query vectors: the vec_ids matching the BM25 query ids, so
# every fused query has both a sparse and a dense leg
_HYBRID_QUERY_IDS = [0, 1, 2, 3]


def _cos_topk_oracle_body(qids: list[int], k: int) -> str:
    """The brute-force cosine oracle as a parameterized WITH-subquery body
    (same expression tree as _TOPK_ORACLE, which pins qids/k statically)."""
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id IN ({', '.join(map(str, qids))})
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {int(k)}
"""


def _hybrid_rrf_oracle() -> str:
    from duckpipe_spark.queries.text_q import _bm25_oracle

    return f"""
WITH sparse AS ({_bm25_oracle(_HYBRID_CAND_K)}),
dense AS ({_cos_topk_oracle_body(_HYBRID_QUERY_IDS, _HYBRID_CAND_K)}),
u AS (
  SELECT query_id, doc_id, rank, 's' AS sys FROM sparse
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id, rank, 'd' AS sys FROM dense
),
fused AS (
  SELECT query_id, doc_id,
         CAST(sum({_HYBRID_SCALE} // ({_HYBRID_RRF_K} + rank)) AS BIGINT) AS rrf_score,
         CAST(min(CASE WHEN sys = 's' THEN rank END) AS INT) AS sparse_rank,
         CAST(min(CASE WHEN sys = 'd' THEN rank END) AS INT) AS dense_rank
  FROM u GROUP BY query_id, doc_id
)
SELECT query_id, CAST(rk AS INT) AS rank, doc_id, rrf_score, sparse_rank, dense_rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
  ) AS rk FROM fused
) WHERE rk <= {_HYBRID_K}
"""


@register(
    "doc_hybrid_rrf_topk",
    _hybrid_rrf_oracle(),
    "hybrid retrieval: BM25 + cosine top-k fused by integer Reciprocal Rank Fusion",
)
def doc_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — hybrid retrieval over one id space: the sparse leg is the
    BM25 rank stage (text.bm25_topk, candidate depth 20), the dense leg is
    the exact-cosine rank stage (brute_force_topk, depth 20, self
    excluded), and rrf_fuse combines them with the integer RRF score
    1e6 DIV (60 + rank). Both legs keep their two-phase top-k scale shape;
    the fusion itself touches only n_queries x 40 pre-bounded rows."""
    from duckpipe_spark.functions.text import bm25_topk
    from duckpipe_spark.functions.similarity import rrf_fuse
    from duckpipe_spark.queries.text_q import _BM25_QUERIES

    sparse = bm25_topk(
        load_table(spark, sf_dir, "documents"), _BM25_QUERIES, k=_HYBRID_CAND_K
    )
    dense = brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), _HYBRID_QUERY_IDS, _HYBRID_CAND_K
    )
    return rrf_fuse(
        [
            ("sparse", sparse.select("query_id", "rank", "doc_id")),
            (
                "dense",
                dense.select(
                    "query_id", "rank", F.col("neighbor_id").alias("doc_id")
                ),
            ),
        ],
        k=_HYBRID_K,
        k_rrf=_HYBRID_RRF_K,
        scale=_HYBRID_SCALE,
    )


# --- Matryoshka (prefix-dim) adaptive retrieval (r14) ------------------------

_MRL_PREFIX = 16
_MRL_RERANK = 32

_MRL_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.embedding AS nvec, q.qvec,
         {_cos_sql(f'(q.qvec[1:{_MRL_PREFIX}])', f'(e.embedding[1:{_MRL_PREFIX}])')} AS pcos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
cand AS (
  SELECT query_id, neighbor_id, nvec, qvec,
         row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id) AS rn
  FROM scored
),
ranked AS (
  SELECT query_id, neighbor_id,
         {_cos_sql('qvec', 'nvec')} AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY {_cos_sql('qvec', 'nvec')} DESC, neighbor_id
         ) AS INT) AS rank
  FROM cand WHERE rn <= {_MRL_RERANK}
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {_K}
"""


@register(
    "embedding_matryoshka_topk",
    _MRL_ORACLE,
    "Matryoshka adaptive retrieval: prefix-dim candidate scan + full-dim exact rerank",
)
def embedding_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — the MRL truncatable-embedding serving shape (prefix-16 of 64
    cuts candidate-scan flops/bytes 4x with NO auxiliary index structure);
    two-phase top-k at both stages, ordered-fold + 6 dp determinism."""
    from duckpipe_spark.functions.similarity import matryoshka_topk

    return matryoshka_topk(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        _K,
        prefix_dim=_MRL_PREFIX,
        rerank=_MRL_RERANK,
    )


@register(
    "doc_hybrid_rrf_artifact_topk",
    _hybrid_rrf_oracle(),
    "hybrid retrieval with the sparse leg served from the persisted BM25 index artifact",
)
def doc_hybrid_rrf_artifact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — the PRODUCTION hybrid serve shape: the sparse leg scores
    entirely off the persisted BM25 parquet index (no corpus scan in the
    sparse plan — same serve doctrine as doc_bm25_artifact_topk /
    doc_curation_medianear_artifact), the dense leg scans the embedding
    column it would serve from anyway, and the fusion is the same integer
    RRF. Reusing doc_hybrid_rrf_topk's oracle pins index-served fusion ==
    corpus-derived fusion end-to-end (rank lists, fused scores, and tie
    order all bit-identical through the save->load round trip)."""
    from duckpipe_spark.functions.similarity import rrf_fuse
    from duckpipe_spark.functions.text import bm25_topk_from_index
    from duckpipe_spark.queries.text_q import _BM25_QUERIES, _bm25_index_artifact

    path = _bm25_index_artifact(spark, sf_dir)
    sparse = bm25_topk_from_index(spark, path, _BM25_QUERIES, k=_HYBRID_CAND_K)
    dense = brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), _HYBRID_QUERY_IDS, _HYBRID_CAND_K
    )
    return rrf_fuse(
        [
            ("sparse", sparse.select("query_id", "rank", "doc_id")),
            (
                "dense",
                dense.select(
                    "query_id", "rank", F.col("neighbor_id").alias("doc_id")
                ),
            ),
        ],
        k=_HYBRID_K,
        k_rrf=_HYBRID_RRF_K,
        scale=_HYBRID_SCALE,
    )


_MRL_RECALL_ORACLE = f"""
WITH exactp AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'e.embedding')} AS cos
  FROM embeddings e CROSS JOIN (
    SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
    WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) q
  WHERE e.vec_id <> q.query_id
),
exactk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM exactp
  ) WHERE rank <= {_K}
),
mscored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.embedding AS nvec, q.qvec,
         {_cos_sql(f'(q.qvec[1:{_MRL_PREFIX}])', f'(e.embedding[1:{_MRL_PREFIX}])')} AS pcos
  FROM embeddings e CROSS JOIN (
    SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
    WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})
  ) q
  WHERE e.vec_id <> q.query_id
),
mcand AS (
  SELECT query_id, neighbor_id, nvec, qvec,
         row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id) AS rn
  FROM mscored
),
mk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY {_cos_sql('qvec', 'nvec')} DESC, neighbor_id
           ) AS rank
    FROM mcand WHERE rn <= {_MRL_RERANK}
  ) WHERE rank <= {_K}
)
SELECT e.query_id,
       CAST(count(m.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(m.neighbor_id) AS DOUBLE) / {_K}.0 AS recall
FROM exactk e LEFT JOIN mk m
  ON e.query_id = m.query_id AND e.neighbor_id = m.neighbor_id
GROUP BY e.query_id
"""


@register(
    "embedding_matryoshka_recall",
    _MRL_RECALL_ORACLE,
    "ANN evaluation: recall@k of the Matryoshka prefix-scan path vs exact top-k",
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 — the tuning measurement for the prefix-width knob, in-engine
    like the lsh/multiprobe/ivf recall rows (the evaluation scales exactly
    like the search; the exact side is the only corpus-sized term)."""
    from duckpipe_spark.functions.similarity import matryoshka_recall

    return matryoshka_recall(
        load_table(spark, sf_dir, "embeddings"),
        _QUERY_IDS,
        _K,
        prefix_dim=_MRL_PREFIX,
        rerank=_MRL_RERANK,
    )
