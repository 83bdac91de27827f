"""Embedding similarity search (SURVEY.md §2.14): brute-force cosine top-k
baseline + random-hyperplane LSH bucketing as the scale path.

Determinism: dot products are computed as an ordered left fold over the
vector elements (float→double each step), so Spark and DuckDB produce
bit-identical doubles; ranking ties are broken on the neighbor id.

Scale notes: brute-force is O(Q·N) with the query side broadcast — the right
baseline and exact. The LSH path buckets vectors by the sign pattern of dot
products with fixed hyperplanes: candidate generation becomes a hash
equi-join on the bucket key (shuffle-partitionable), trading recall for a
~2^planes reduction in pair count. Hyperplanes are a fixed deterministic
matrix so bucket assignment is reproducible everywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

N_PLANES = 8  # default — small fixtures and the static oracle SQL pin this
MAX_PLANES = 24
# measured farthest-vs-parallel init crossover (BASELINE §22.3: linear-in-k
# farthest meets flat k-means‖ at k≈24 on the sf0.1 rig) — `init="auto"`
# switches strategy here
KMEANS_INIT_CROSSOVER_K = 24
TARGET_BUCKET_ROWS = 1024  # expected rows per LSH bucket the auto path aims for
_DIM = 64

_PLANES_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _hyperplanes(dim: int = _DIM, n_planes: int = N_PLANES) -> np.ndarray:
    """Deterministic hyperplane matrix. A single seeded generator fills rows
    sequentially, so the first 8 rows of a 16-plane draw equal the 8-plane
    draw: growing n_planes *refines* existing buckets (each bucket splits)
    rather than reshuffling them."""
    key = (n_planes, dim)
    if key not in _PLANES_CACHE:
        rng = np.random.default_rng(20240813)
        _PLANES_CACHE[key] = rng.standard_normal((n_planes, dim)).round(6)
    return _PLANES_CACHE[key]


HYPERPLANES = _hyperplanes()


def planes_for_corpus(n_rows: int, target_bucket_rows: int = TARGET_BUCKET_ROWS) -> int:
    """Plane count such that 2^planes buckets keep expected occupancy around
    ``target_bucket_rows`` — the fix for the fixed-2^8-bucket scale ceiling:
    within-bucket candidate joins are O(sum over buckets of n_b²), so bucket
    count must grow with the corpus for the pair count to stay ~linear.
    Clamped to [N_PLANES, MAX_PLANES] (2^24 buckets ≈ 16M — enough for
    10B rows at ~600 rows/bucket)."""
    if n_rows <= target_bucket_rows:
        return N_PLANES
    return min(MAX_PLANES, max(N_PLANES, math.ceil(math.log2(n_rows / target_bucket_rows))))


def planes_for_recall(
    neighbor_cos: float, target_recall: float = 0.5, multiprobe: bool = False
) -> int:
    """Plane count sized for RECALL instead of bucket occupancy — the other
    half of the sign-LSH sizing story (``planes_for_corpus`` bounds the
    candidate-join COST; this bounds the miss rate). Under the random-
    hyperplane model (Charikar, STOC'02) a pair at angle θ = acos(cos)
    agrees on one sign bit with p = 1 − θ/π, so a single-bucket probe
    finds the neighbor with probability p^planes; the full Hamming-1
    multiprobe set adds the planes·p^(planes−1)·(1−p) one-bit-miss mass.
    Returns the LARGEST plane count whose modeled recall still meets
    ``target_recall`` (more planes = smaller buckets = cheaper candidate
    joins, so largest-feasible is the efficient choice), clamped to
    [1, MAX_PLANES].

    The honest implication, measured on the sf0.1 corpus (BASELINE §24.2):
    at the benchmark's neighbor cos ≈ 0.35, p ≈ 0.614, so even 4 planes
    model only p⁴ ≈ 0.14 single-probe — sign-LSH is a DEDUP-BLOCKING
    tool (neighbor cos ≥ 0.9 ⇒ p ≥ 0.86, where 8 planes still model 0.30
    per band and banding across permutations compounds toward 1); for
    mid-similarity top-k retrieval the IVF/SQ8 rungs are the right
    ladder. This helper makes that boundary computable instead of
    folklore."""
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    p = 1.0 - math.acos(max(-1.0, min(1.0, neighbor_cos))) / math.pi
    if p <= 0.0:
        return 1
    best = 1
    for planes in range(1, MAX_PLANES + 1):
        r = p**planes
        if multiprobe:
            r += planes * p ** (planes - 1) * (1.0 - p)
        if r >= target_recall:
            best = planes
        else:
            break
    return best


def dot_fold(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2_fold(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / F.sqrt(norm2_fold(a) * norm2_fold(b))


def _topk_per_query(scored: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Two-phase per-query top-k over a (query_id, ...) pair stream
    (VERDICT r9 item 2). A single ``Window.partitionBy("query_id")`` over
    the corpus×queries stream sends ~n_corpus rows PER QUERY into exactly
    n_queries reducer tasks — at scale each task sorts the full corpus and
    parallelism collapses to |queries|. Instead:

    phase 1 — rank within (query_id, INPUT partition): the exchange spreads
    the same row volume over n_partitions × n_queries reducers, each sorting
    only its corpus slice; keep the local top-k. Any globally-top-k row has
    at most k−1 rows above it even within its own partition, so phase-1
    survivors are a superset of the answer for EVERY partitioning of the
    input — values are partition-count invariant.

    phase 2 — the global per-query window now ranks only
    n_partitions × k rows per query (TakeOrdered-sized), with the same total
    order (ties broken on neighbor id) so results are bit-identical to the
    single-window form. ``spark_partition_id`` is read BEFORE any exchange,
    i.e. on the corpus scan side of the broadcast join."""
    w_local = Window.partitionBy("query_id", "_pid").orderBy(*order_cols)
    w_global = Window.partitionBy("query_id").orderBy(*order_cols)
    return (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(w_local))
        .where(F.col("_lrank") <= k)
        .drop("_pid", "_lrank")
        .withColumn("rank", F.row_number().over(w_global).cast("int"))
        .where(F.col("rank") <= k)
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (excluding self), deterministic
    ranking on (rounded cosine desc, neighbor id asc). Rank stage is the
    two-phase per-partition top-k (``_topk_per_query``) so no task ever
    sorts the whole corpus."""
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    pairs = embeddings.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_col(F.col("qvec"), F.col(vec_col)), 6)
    scored = pairs.select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
    ranked = _topk_per_query(
        scored, [F.col("cos").desc(), F.col("neighbor_id").asc()], k
    )
    return ranked.select("query_id", "rank", "neighbor_id", "cos")


def sign_pack_cols(vec: Column, dim: int = 64) -> tuple[Column, Column]:
    """Binary (sign) quantization of a dim<=64 vector into TWO bigints of
    32 sign bits each (MSB-first binary fold — acc·2 + bit — so each half
    stays < 2^32 and no engine has to reason about the int64 sign bit).
    16 bytes per vector: the memory format binary-embedding retrieval
    ships to serving."""
    if dim % 2 or dim > 64:
        raise ValueError(f"sign_pack_cols needs an even dim <= 64, got {dim}")

    def pack(lo: int) -> Column:
        sl = F.slice(vec, lo + 1, dim // 2)
        return F.aggregate(
            sl,
            F.lit(0).cast("bigint"),
            lambda a, x: a * 2 + F.when(x > 0.0, 1).otherwise(0),
        )

    return pack(0), pack(dim // 2)


def hamming_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized ANN: exact Hamming top-k over sign-packed codes →
    (query_id, rank, neighbor_id, hamming). Sign-bit codes approximate
    angular distance (the SimHash bound: E[hamming] ∝ angle), and at 16
    bytes/vector a FULL SCAN is the index — 100 TB of float32 embeddings
    compress to 0.4 TB of codes, xor+popcount per candidate, no bucket
    structure to maintain. Ranking is (hamming asc, neighbor id asc):
    every quantity is an exact integer, so this is the rare ANN whose
    result is bit-portable across engines with no float rounding anywhere.

    Scale shape: codes are a pure projection; the query side broadcasts;
    the per-query rank window sees only corpus×|queries| (hamming, id)
    pairs — TakeOrdered-sized output."""
    h0, h1 = sign_pack_cols(F.col(vec_col), dim)
    codes = embeddings.select(F.col(id_col), h0.alias("h0"), h1.alias("h1"))
    q = codes.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("h0").alias("q0"),
        F.col("h1").alias("q1"),
    )
    return _hamming_rank(codes, q, k, id_col, exclude_same_id=True)


def hamming_topk_queries(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """``hamming_topk`` against an EXTERNAL query table (VERDICT r8 item
    7): hard-negative mining scores a fresh batch of query vectors against
    the corpus — the queries are their own DataFrame (own id namespace),
    sign-packed with the same MSB-first fold as the corpus codes. No
    same-id exclusion here: query ids and corpus ids are different
    namespaces, so an id collision is a coincidence, not a self-match
    (callers mining negatives for an IN-corpus batch want ``hamming_topk``,
    which does exclude self). Same scale shape — the query batch
    broadcasts, the corpus scan is the index."""
    h0, h1 = sign_pack_cols(F.col(vec_col), dim)
    codes = embeddings.select(F.col(id_col), h0.alias("h0"), h1.alias("h1"))
    q0, q1 = sign_pack_cols(F.col(query_vec_col), dim)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), q0.alias("q0"), q1.alias("q1")
    )
    return _hamming_rank(codes, q, k, id_col, exclude_same_id=False)


def _hamming_rank(
    codes: DataFrame, q: DataFrame, k: int, id_col: str, exclude_same_id: bool
) -> DataFrame:
    """Shared core: broadcast the (query_id, q0, q1) batch across the
    packed corpus codes, rank by (xor-popcount hamming asc, neighbor id
    asc), keep top-k per query via the two-phase partial rank
    (``_topk_per_query`` — no task ever sorts the whole corpus)."""
    ham = (
        F.bit_count(F.col("h0").bitwiseXOR(F.col("q0")))
        + F.bit_count(F.col("h1").bitwiseXOR(F.col("q1")))
    ).cast("bigint")
    pairs = codes.crossJoin(F.broadcast(q))
    if exclude_same_id:
        pairs = pairs.where(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col(id_col).alias("neighbor_id"), ham.alias("hamming")
    )
    ranked = _topk_per_query(
        scored, [F.col("hamming").asc(), F.col("neighbor_id").asc()], k
    )
    return ranked.select("query_id", "rank", "neighbor_id", "hamming")


def lsh_bucket_col(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Bucket id = integer of sign bits of <vec, plane_i>.

    The plane literal is sliced to the VECTOR's length before the dot:
    ``zip_with`` pads the shorter array with NULL, so a vector shorter
    than the 64-dim plane used to make every product NULL, every dot
    NULL, every sign bit 0 — ALL vectors silently collapsed into bucket
    0 (an O(n²) candidate-join time bomb, and it starved the k-means‖
    stratifier down to one candidate per pass). Slicing is a no-op at
    the full plane dim, so buckets on 64-dim corpora (everything the
    oracles compare) are bit-identical to before; shorter vectors now
    bucket by their dim-prefix projection.

    ADVICE r9 item 1 hardening — the fix above was one-sided:

    - a vector LONGER than the plane made ``zip_with`` pad the PLANE with
      NULL (same all-in-bucket-0 collapse, other direction) → both sides
      are now sliced to ``least(size(vec), plane_dim)``, so longer vectors
      bucket by their first plane_dim components (the only projection the
      fixed plane matrix defines);
    - a NULL vector made ``F.size`` return −1 and ``F.slice`` throw on the
      negative length → NULL vectors explicitly bucket to 0 (the pre-r9
      behavior), evaluated lazily so the slice branch never runs for them."""
    planes = _hyperplanes(n_planes=n_planes)
    pdim = planes.shape[1]
    vlen = F.least(F.size(vec), F.lit(pdim))
    v = F.slice(vec, 1, vlen)
    out = F.lit(0).cast("bigint")
    for i in range(n_planes):
        plane = F.slice(F.array(*[F.lit(float(x)) for x in planes[i]]), 1, vlen)
        bit = F.when(dot_fold(v, plane) > 0.0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        out = out + bit
    return F.when(vec.isNull(), F.lit(0).cast("bigint")).otherwise(out)


def _resolve_planes(n_planes: int | None, n_rows: int | None) -> int:
    """Strictly lazy plane-count resolution: either pin ``n_planes`` or pass
    the (approximately) known corpus size as ``n_rows`` and let
    ``planes_for_corpus`` size the bucket space. Earlier versions fell back
    to an eager ``embeddings.count()`` — one extra Spark job launched at
    pipeline-CONSTRUCTION time for every call, invisible in the returned
    plan. At 100 TB that is a full table scan before the query even starts,
    so the silent fallback is gone; the row count can be approximate (the
    plane count only moves per doubling of corpus size)."""
    if n_planes is not None:
        return n_planes
    if n_rows is not None:
        return planes_for_corpus(n_rows)
    raise ValueError(
        "pass n_planes or n_rows: auto-sizing LSH planes would require an "
        "eager count of the embedding table at pipeline-construction time "
        "(use planes_for_corpus(n_rows) to size from a known corpus size)"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (hash equi-join), then exact cosine ranking within the bucket.

    Role boundary (BASELINE §24.2, r12): single-band sign-LSH is a
    NEAR-DUP BLOCKING primitive, not a mid-similarity retrieval index —
    a pair at cosine c collides with probability (1 − acos(c)/π)^planes,
    ≈ 2% at c = 0.35 / 8 planes but ≥ 30% at the c ≥ 0.9 dedup regime.
    Size with ``planes_for_recall`` (miss rate) and ``planes_for_corpus``
    (bucket cost); for top-k retrieval over weakly-similar corpora use
    the IVF/SQ8 rungs instead."""
    n_planes = _resolve_planes(n_planes, n_rows)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), n_planes))
    q = bucketed.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    pairs = bucketed.join(F.broadcast(q), "bucket").where(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_col(F.col("qvec"), F.col(vec_col)), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def lsh_multiprobe_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB 2007 — derandomized to the
    full Hamming-1 probe set): candidates come from the query's OWN bucket
    plus the ``n_planes`` buckets reached by flipping each single sign bit.
    A vector whose true angle puts it just on the other side of ONE
    hyperplane — the dominant miss mode for sign-LSH — lands in exactly
    such a neighbor bucket, so probing them recovers most of the recall
    gap without adding planes (which would SPLIT buckets and cut recall)
    or hash tables (which would duplicate the corpus index).

    Scale shape: identical to ``lsh_topk`` with the query side exploded
    ×(n_planes+1) BEFORE the broadcast — the corpus stays bucketed once,
    the probe join is still a bucket equi-join, and the candidate count is
    (n_planes+1)× the bucket occupancy (still corpus-fraction-bounded,
    never all-pairs). Each corpus bucket matches at most ONE probe mask
    per query (mask = corpus_bucket XOR query_bucket is unique), so no
    candidate dedup pass is needed. Rank is the two-phase per-query
    top-k.

    Role boundary (BASELINE §24.2, r12): same as ``lsh_topk`` — the
    Hamming-1 probe set multiplies the collision model by
    1 + planes·(1−p)/p, which rescues one-bit near-misses in the dedup
    regime but cannot lift mid-similarity retrieval (measured 0.10
    recall@10 at neighbor cos 0.35); size with ``planes_for_recall`` and
    use the IVF/SQ8 rungs for retrieval."""
    n_planes = _resolve_planes(n_planes, n_rows)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), n_planes))
    masks = F.array(
        *[F.lit(m).cast("bigint") for m in [0] + [1 << i for i in range(n_planes)]]
    )
    q = (
        bucketed.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket")
        .withColumn("mask", F.explode(masks))
        .select(
            "query_id", "qvec", F.col("bucket").bitwiseXOR(F.col("mask")).alias("bucket")
        )
    )
    pairs = bucketed.join(F.broadcast(q), "bucket").where(F.col(id_col) != F.col("query_id"))
    cos = F.round(cosine_col(F.col("qvec"), F.col(vec_col)), 6)
    scored = pairs.select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
    ranked = _topk_per_query(scored, [F.col("cos").desc(), F.col("neighbor_id").asc()], k)
    return ranked.select("query_id", "rank", "neighbor_id", "cos")


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (pairs must
    share a bucket), exact cosine filter afterwards. Bucket count scales
    with the corpus (``planes_for_corpus`` over ``n_rows``) unless pinned
    by ``n_planes``; one of the two is required (see ``_resolve_planes``)."""
    n_planes = _resolve_planes(n_planes, n_rows)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), n_planes))
    a = bucketed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    cos = F.round(cosine_col(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantization: centroids are the vectors of the ``n_cells``
    smallest ids (deterministic seed centroids — a production build would
    k-means-refine them; the assignment/probe plumbing is identical). Every
    vector is assigned to its max-cosine centroid. Returns (centroids,
    assignment); assignment carries (id, vec, cell_id).

    Scale: centroids are broadcast (tiny), so assignment is a map-side
    cross-score + per-id argmax — no shuffle of the embedding table beyond
    the argmax aggregation, and the argmax window partitions on the
    high-cardinality vector id."""
    cents = (
        embeddings.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cvec"))
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        "cell_id",
        F.round(cosine_col(F.col(vec_col), F.col("cvec")), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("cell_id").asc())
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, vec_col, "cell_id")
    )
    return cents, assign


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score each query against the centroids, probe
    the ``n_probe`` best cells, exact-cosine rerank only vectors assigned to
    those cells. Candidate count scales with n_probe/n_cells of the corpus
    instead of all of it."""
    cents, assign = ivf_assign(embeddings, n_cells, id_col, vec_col)
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    qscore = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qvec",
        "cell_id",
        F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6).alias("score"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cell_id").asc())
    probes = (
        qscore.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "cell_id")
    )
    pairs = assign.join(F.broadcast(probes), "cell_id").where(
        F.col(id_col) != F.col("query_id")
    )
    cos = F.round(cosine_col(F.col("qvec"), F.col(vec_col)), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def ivf_trained_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 8,
    iters: int = 2,
    n_probe: int = 2,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over K-MEANS-TRAINED centroids — the production form of
    ``ivf_topk`` (whose docstring promises exactly this refinement): the
    coarse quantizer is ``kmeans_cells``' Lloyd-converged integer centroid
    table instead of smallest-id seed vectors. Honest expectation
    (BASELINE §24.2, r12): training helps exactly as much as the corpus
    clusters — on a clustered corpus trained cells tile the modes; on a
    near-isotropic one every balanced Voronoi partition is equivalent and
    recall at a fixed probe fraction is a property of the DATA (r11's
    apparent 0.99-vs-0.49 seed advantage was query-ids-coinciding-with-
    seed-centroids benchmark contamination, not quantizer quality). Assignment and probe selection both use the k-means
    metric (integer squared-L2 on round(x·scale) BIGINTs — bit-exact
    across engines, same tie-break cell asc); only the final rerank over
    the probed cells touches float math (the exact rounded cosine).

    Scale shape: centroids are a k-row LITERAL (the training loop already
    collects them — no extra lineage); assignment is one broadcast
    crossJoin + map-combinable min-struct groupBy (min_by carries the
    float vector so no second corpus join re-fetches it); the query batch
    broadcasts; candidates are cell-bounded (n_probe/n_cells of the
    corpus); rank is the two-phase per-query top-k."""
    _, cents = kmeans_cells(
        embeddings, k=n_cells, iters=iters, scale=scale,
        id_col=id_col, vec_col=vec_col, return_centroids=True,
    )
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("fv"), qv.alias("v")
    )
    dist = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = base.crossJoin(F.broadcast(cents))
    # (dist, cell) is unique per (id, centroid) row — cell is distinct —
    # so min-struct and min_by pick the same centroid deterministically
    assign = (
        scored.groupBy("id")
        .agg(
            F.min(F.struct(dist.alias("d"), F.col("cell"))).alias("m"),
            F.min_by("fv", F.struct(dist.alias("d"), F.col("cell"))).alias("fv"),
        )
        .select("id", F.col("m.cell").alias("cell"), "fv")
    )
    q = base.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("fv").alias("qvec"), F.col("v").alias("qv")
    )
    qdist = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(qdist.asc(), F.col("cell").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    cands = assign.join(F.broadcast(probes), "cell").where(
        F.col("id") != F.col("query_id")
    )
    cos = F.round(cosine_col(F.col("qvec"), F.col("fv")), 6)
    scored2 = cands.select("query_id", F.col("id").alias("neighbor_id"), cos.alias("cos"))
    ranked = _topk_per_query(scored2, [F.col("cos").desc(), F.col("neighbor_id").asc()], k)
    return ranked.select("query_id", "rank", "neighbor_id", "cos")


PQ_M = 8  # subspaces (64-dim → 8 segments of 8)
PQ_CELLS = 16  # codebook entries per subspace
PQ_SCALE = 10_000


def _int_sqdist(a, b) -> Column:
    """Integer squared-L2 between two quantized BIGINT arrays (|x| ≲ 0.6,
    scale 1e4 ⇒ per-element diff² < 2^28 · segment length — int64-safe)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def pq_codes(
    embeddings: DataFrame,
    m: int = PQ_M,
    n_cells: int = PQ_CELLS,
    scale: int = PQ_SCALE,
    dim: int = _DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes → (id, sub, code): each vector is split
    into ``m`` contiguous subvectors and each subvector is replaced by the
    index of its nearest codebook entry — the memory layout that makes
    billion-vector ANN feasible (m bytes per vector instead of dim floats).

    Codebooks are the subvectors of the ``n_cells`` smallest ids
    (deterministic seed centroids, same convention as ``ivf_assign``; a
    production build k-means-refines them with ``kmeans_cells``'s loop). All
    distances are integer squared-L2 on round(x·scale) BIGINTs, so code
    assignment is bit-exact across engines; ties break on the smaller code.

    Scale shape: the codebook is m·n_cells tiny rows (broadcast); encoding
    is a map-side join on the subspace index + one partial-agg'd min(struct)
    shuffle keyed on the high-cardinality (id, sub) — no vector ever
    shuffles twice, and the output is m small ints per vector."""
    sub_dim = dim // m
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    base = embeddings.select(F.col(id_col).alias("id"), qv.alias("v"))
    seg_arr = F.array(*[F.slice("v", j * sub_dim + 1, sub_dim) for j in range(m)])
    segs = base.select("id", F.posexplode(seg_arr).alias("sub", "seg"))
    w_code = Window.orderBy("id")
    cents = (
        base.orderBy("id")
        .limit(n_cells)
        .withColumn("code", (F.row_number().over(w_code) - 1).cast("bigint"))
        .select("code", F.posexplode(seg_arr).alias("sub", "cseg"))
    )
    scored = segs.join(F.broadcast(cents), "sub").select(
        "id", "sub", F.struct(_int_sqdist("seg", "cseg").alias("d"), F.col("code")).alias("s")
    )
    return (
        scored.groupBy("id", "sub")
        .agg(F.min("s").alias("m"))
        .select("id", F.col("sub").cast("bigint").alias("sub"), F.col("m.code").alias("code"))
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_M,
    n_cells: int = PQ_CELLS,
    scale: int = PQ_SCALE,
    dim: int = _DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays exact, each
    corpus vector is its m codes, and the distance is the sum over subspaces
    of a precomputed (query, sub, code) → d² lookup table. The scan side
    never touches a float vector — the whole corpus pass reads m small ints
    per row and probes a broadcast LUT of Q·m·n_cells entries, which is the
    property that lets ADC scan billions of vectors cheaply.

    Deterministic: integer LUT distances, ties on the neighbor id."""
    sub_dim = dim // m
    codes = pq_codes(embeddings, m, n_cells, scale, dim, id_col, vec_col)
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    base = embeddings.select(F.col(id_col).alias("id"), qv.alias("v"))
    seg_arr = F.array(*[F.slice("v", j * sub_dim + 1, sub_dim) for j in range(m)])
    w_code = Window.orderBy("id")
    cents = (
        base.orderBy("id")
        .limit(n_cells)
        .withColumn("code", (F.row_number().over(w_code) - 1).cast("bigint"))
        .select("code", F.posexplode(seg_arr).alias("sub", "cseg"))
    )
    qsegs = (
        base.where(F.col("id").isin(query_ids))
        .select(F.col("id").alias("query_id"), F.posexplode(seg_arr).alias("sub", "qseg"))
    )
    lut = qsegs.join(cents, "sub").select(
        "query_id", F.col("sub").cast("bigint").alias("sub"), "code",
        _int_sqdist("qseg", "cseg").alias("d"),
    )
    dists = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "id")
        .agg(F.sum("d").alias("adist"))
        .where(F.col("id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id").asc())
    return (
        dists.select("query_id", F.col("id").alias("neighbor_id"), "adist")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adist")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 8,
    iters: int = 2,
    n_probe: int = 2,
    m: int = PQ_M,
    pq_cells: int = PQ_CELLS,
    rerank: int | None = None,
    scale: int = PQ_SCALE,
    dim: int = _DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. TPAMI 2011) top-k — the composition
    production ANN actually ships at 100 TB (VERDICT r10 item 2): a
    k-means-TRAINED coarse quantizer routes the probe to ``n_probe`` cells,
    PQ codes of the RESIDUAL (vector − its cell centroid) give the
    byte-sized scan representation, ADC scores ONLY the probed cells'
    codes through a per-(query, probed-cell) lookup table, and the exact
    cosine reranks just the ADC top-``rerank`` shortlist.

    ``rerank=None`` (the default) derives the width that COVERS the probed
    candidate budget: ``max(8·k, ceil(1.5·N·n_probe/n_cells))`` with N the
    corpus count, in pure integer math (``ceil(a/b)`` as
    ``(a + b - 1) // b``) so an oracle can replay it exactly. Covering the
    probed cells makes the shortlist the WHOLE candidate set, so the exact
    rerank sees everything trained-IVF sees — recall equals the
    trained-cell ceiling by construction (VERDICT r12 item 3: the old
    fixed 50 delivered 0.23 vs the 0.44 ceiling; BASELINE §24.2 measured
    covering rerank at the SAME wall, because Lloyd training dominates).
    The 1.5 margin absorbs balanced-partition occupancy skew (measured
    max/mean ≈ 1.17). At 100 TB the derived default deliberately degrades
    IVFADC to trained-IVF-with-ADC-preorder — never WORSE recall than the
    coarse quantizer allows; pass an explicit ``rerank`` to buy back the
    PQ scan economy once a recall target is known.

    Determinism contract (the same all-integer discipline as
    ``kmeans_cells``/``pq_codes``): vectors quantize to round(x·scale)
    BIGINTs, residuals are exact int64 differences, the codebook is the
    residuals of the ``pq_cells`` smallest ids (deterministic seeds, the
    family convention), every distance is integer squared-L2 with ties on
    the smaller code/cell/id. Residual magnitudes are bounded by the
    vector range so all sums stay far inside int64.

    Scale shape: the trained centroid table and the residual codebook are
    both collected bounded model tables (k-row / pq_cells-row literals —
    registered queries cannot cache, and re-literalizing kills the lineage
    re-execution a multi-consumer DataFrame would pay); cell assignment is
    one broadcast crossJoin + map-combinable min-struct aggregate; the ADC
    join keys on (cell, sub, code) against a BROADCAST LUT of
    |Q|·n_probe·m·pq_cells rows, so only codes in probed cells are ever
    scored (never a full-corpus ADC scan — the LUT inner join IS the probe
    filter); the ADC shortlist is the two-phase ``_topk_per_query``; the
    exact rerank touches |Q|·rerank float vectors via a broadcast join
    back to the corpus."""
    spark = embeddings.sparkSession
    sub_dim = dim // m
    if rerank is None:
        # covering width: 1.5× the expected probed population (integer
        # ceil), floored at 8·k; count() is parquet-metadata cheap next
        # to the Lloyd chain below
        n_vec = embeddings.count()
        rerank = max(
            8 * k, (3 * n_vec * n_probe + 2 * n_cells - 1) // (2 * n_cells)
        )
    _, cents = kmeans_cells(
        embeddings, k=n_cells, iters=iters, scale=scale,
        id_col=id_col, vec_col=vec_col, return_centroids=True,
    )
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    base = embeddings.select(F.col(id_col).alias("id"), qv.alias("v"))
    dist = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    assign = (
        base.crossJoin(F.broadcast(cents))
        .groupBy("id")
        .agg(
            F.min(F.struct(dist.alias("d"), F.col("cell"))).alias("mm"),
            F.min_by("v", F.struct(dist.alias("d"), F.col("cell"))).alias("v"),
        )
        .select("id", F.col("mm.cell").alias("cell"), "v")
    )
    res = assign.join(F.broadcast(cents), "cell").select(
        "id", "cell", F.zip_with("v", "cv", lambda a, b: a - b).alias("r")
    )
    # residual codebook: collected bounded model table (pq_cells·m segment
    # rows) — the smallest-id residuals, re-literalized so the encode pass
    # does not re-execute the assignment lineage once per consumer
    cb_rows = [
        (int(code), int(sub), [int(x) for x in row["r"][sub * sub_dim : (sub + 1) * sub_dim]])
        for code, row in enumerate(res.orderBy("id").limit(pq_cells).collect())
        for sub in range(m)
    ]
    cb = spark.createDataFrame(cb_rows, "code bigint, sub int, cseg array<bigint>")
    seg_arr = F.array(*[F.slice("r", j * sub_dim + 1, sub_dim) for j in range(m)])
    codes = (
        res.select("id", "cell", F.posexplode(seg_arr).alias("sub", "seg"))
        .join(F.broadcast(cb), "sub")
        .groupBy("id", "cell", "sub")
        .agg(F.min(F.struct(_int_sqdist("seg", "cseg").alias("d"), F.col("code"))).alias("mm"))
        .select("id", "cell", "sub", F.col("mm.code").alias("code"))
    )
    # query probe: n_probe nearest trained cells by the integer metric
    qbase = base.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    qdist = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(qdist.asc(), F.col("cell").asc())
    probes = (
        qbase.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "cell", F.zip_with("qv", "cv", lambda a, b: a - b).alias("qr"))
    )
    # ADC lookup table: one residual per (query, probed cell), m·pq_cells
    # integer distances each — tiny, broadcast; its INNER join against the
    # code table is simultaneously the probe filter and the ADC lookup
    qseg_arr = F.array(*[F.slice("qr", j * sub_dim + 1, sub_dim) for j in range(m)])
    lut = (
        probes.select("query_id", "cell", F.posexplode(qseg_arr).alias("sub", "qseg"))
        .join(F.broadcast(cb), "sub")
        .select("query_id", "cell", "sub", "code", _int_sqdist("qseg", "cseg").alias("d"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["cell", "sub", "code"])
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum("d").cast("bigint").alias("adist"))
    )
    short = _topk_per_query(
        adc.select("query_id", F.col("id").alias("neighbor_id"), "adist"),
        [F.col("adist").asc(), F.col("neighbor_id").asc()],
        rerank,
    ).select("query_id", "neighbor_id")
    # exact rerank of the shortlist only: broadcast the |Q|·rerank ids
    # against the corpus scan, then rank |Q|·rerank rows per query
    nvec = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    qvec = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qfv")
    )
    cos = F.round(cosine_col(F.col("qfv"), F.col("nv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        nvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def _kmeanspar_init(
    spark,
    base: DataFrame,
    k: int,
    passes: int,
    ell: int,
    seed_vec: list[int],
    _dist,
    _lit_vec,
) -> list[tuple[int, list[int]]]:
    """Deterministic k-means‖ seeding over the cached (id, h, v, bucket)
    base → [(cell, centroid_vec)] with ≤ k rows. See ``kmeans_cells``'s
    docstring for the algorithm; this helper is the driver loop: O(passes)
    bounded collects (≤ ℓ rows each — the same bounded-collect contract as
    the farthest-point path's 1-row argmax), candidate weighting as one
    broadcast-join aggregate, final top-k on the driver's ≤ 1+passes·ℓ
    candidate list.

    Each pass is LSH-STRATIFIED: at most one candidate per sign-hyperplane
    bucket per pass (per-bucket argmax of the running min-distance, then
    the global top-ℓ of those representatives). Plain top-ℓ selection
    against one distance snapshot clumps — all ℓ picks land in whatever
    region is currently farthest, and a 5-cluster corpus can finish the
    passes with whole clusters unseeded. Near-identical vectors share a
    bucket, so stratification caps a tight cluster's take at one candidate
    per pass — batch diversity without per-candidate driver rounds. A
    point already selected has running min-distance 0, so later passes
    never re-select it (nor an exact duplicate of it)."""
    cands: list[list[int]] = [seed_vec]  # selection order IS the candidate id
    mind = base.select(
        "id", "h", "v", "bucket", _dist("v", _lit_vec(seed_vec)).alias("d")
    ).persist()
    prev = None
    bw = Window.partitionBy("bucket").orderBy(F.col("d").desc(), "h", "id")
    for p in range(passes):
        batch = (
            mind.withColumn("brn", F.row_number().over(bw))
            .where(F.col("brn") == 1)
            .orderBy(F.col("d").desc(), "h", "id")
            .limit(ell)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
            prev = None
        new_vecs = [list(r["v"]) for r in batch]
        cands.extend(new_vecs)
        if p < passes - 1 and new_vecs:
            nb = spark.createDataFrame(
                [(i, v) for i, v in enumerate(new_vecs)], "i bigint, cv array<bigint>"
            )
            newd = (
                mind.crossJoin(F.broadcast(nb))
                .select("id", _dist("v", "cv").alias("dd"))
                .groupBy("id")
                .agg(F.min("dd").alias("nd"))
            )
            prev = mind
            mind = (
                mind.join(newd, "id")
                .select("id", "h", "v", "bucket", F.least("d", "nd").alias("d"))
                .persist()
            )
    if prev is not None:
        prev.unpersist()
    mind.unpersist()
    # weight candidates by the points they win (argmin, ties -> earlier
    # candidate); candidates that win nothing have no row -> weight 0
    cdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cands)], "ci bigint, cv array<bigint>"
    )
    wts_rows = (
        base.crossJoin(F.broadcast(cdf))
        .select("id", F.struct(_dist("v", "cv").alias("dist"), F.col("ci")).alias("s"))
        .groupBy("id")
        .agg(F.min("s").alias("m"))
        .groupBy(F.col("m.ci").alias("ci"))
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    wmap = {int(r["ci"]): int(r["w"]) for r in wts_rows}
    # reduce to k by WEIGHTED farthest-point over the candidate list
    # (k-means++ derandomized: next = argmax weight x sqdist-to-chosen).
    # Plain top-k-by-weight can double-pick a heavy cluster while dropping
    # a lighter one; weighting by distance-to-chosen picks every unseeded
    # region first (an already-seeded cluster's duplicate rep has d ~ 0).
    # The score multiplies the two exact integers AS DOUBLES (w then d,
    # one IEEE rounding) because w x d can exceed 2^63 — float(w)*float(d)
    # here mirrors CAST(w AS DOUBLE) * CAST(d AS DOUBLE) in the oracle
    # bit-for-bit. Driver cost: O(k x |cands|) on <= 1+passes*ell rows.
    # numpy incremental form: one O(|cands| x dim) int64 pass per chosen
    # center (exact integer sqdists, well under 2^63 at |x| <= 0.6 x scale),
    # so k=1024 over a few thousand candidates stays sub-second where the
    # pure-Python pairwise greedy would be the new driver bottleneck
    cv = np.asarray(cands, dtype=np.int64)  # (n_cands, dim)
    wv = np.asarray([wmap.get(ci, 0) for ci in range(len(cands))], dtype=np.int64)
    first = min(range(len(cands)), key=lambda ci: (-int(wv[ci]), ci))
    chosen = [first]
    picked = np.zeros(len(cands), dtype=bool)
    picked[first] = True
    diff = cv - cv[first]
    dmin = np.einsum("ij,ij->i", diff, diff)  # running min sqdist to chosen
    while len(chosen) < min(k, len(cands)):
        best_key = None
        best_ci = None
        for ci in range(len(cands)):
            if picked[ci]:
                continue
            score = float(wv[ci]) * float(dmin[ci])
            key = (-score, -int(wv[ci]), ci)
            if best_key is None or key < best_key:
                best_key, best_ci = key, ci
        chosen.append(best_ci)
        picked[best_ci] = True
        diff = cv - cv[best_ci]
        dmin = np.minimum(dmin, np.einsum("ij,ij->i", diff, diff))
    return [(t, cands[c]) for t, c in enumerate(chosen)]


def kmeans_cells(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "farthest",
    init_passes: int = 2,
    oversample: int | None = None,
    return_centroids: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Deterministic distributed Lloyd k-means → (id, cell): the trained
    version of ``ivf_assign``'s seed centroids, and the engine's
    demonstration that *iterative* algorithms can be exact-hash-checked
    across engines.

    Every quantity is integer so no float summation-order ambiguity exists:
    vectors are quantized to round(x·scale) BIGINTs, distances are integer
    squared-L2 (|x|≤0.6, dim 64 ⇒ max dist ≈ 64·(2·0.6·scale)² ≈ 2^43,
    comfortably int64), centroid components are floor(sum/count) with the
    division in IEEE double (exact: sums ≪ 2^53, identical bits on both
    engines). Init is deterministic farthest-point traversal (Gonzalez
    k-center): seed 0 = smallest (Lehmer-hash, id); seed t = the vector
    maximizing its min distance to seeds <t, ties on (hash, id). Unlike
    smallest-k-ids (all seeds land in whatever cluster owns the low id
    range) or hash-uniform sampling (misses a cluster with probability
    ≈ k·(1−1/k)^k), farthest-point provably seeds every well-separated
    cluster once, so Lloyd converges in 1-2 sweeps. Assignment ties break
    on the smaller cell; a cell that loses all members disappears (both
    engines aggregate only surviving cells).

    Scale shape per iteration: centroids broadcast (k·dim ints) → assignment
    is a map-side fold + one partial-agg'd min(struct) shuffle on id;
    centroid update posexplodes the assigned vectors and aggregates
    (cell,pos) — a bounded k·dim-key shuffle. Lineage grows linearly with
    iters; callers running many iterations should localCheckpoint between
    rounds (see functions.dedup.connected_components).

    ``init`` picks the seeding strategy (VERDICT r8 item 4):

    - ``"farthest"`` (default): deterministic farthest-point traversal —
      k−1 SEQUENTIAL driver rounds. Right at small k; at the k ≳ 1024
      cells real SemDeDup/prototype runs use, the per-round job floor
      makes init itself the bottleneck.
    - ``"parallel"``: deterministic k-means‖ (Bahmani et al. 2012,
      derandomized): ``init_passes`` oversampling passes each take up to
      ``oversample`` (default 2k) points with the LARGEST running
      min-distance to the candidate set (ties (hash, id) — the hard
      top-cost analog of cost-proportional sampling), LSH-STRATIFIED to
      at most one candidate per sign-hyperplane bucket per pass (batch
      diversity: a tight cluster cannot absorb the whole pass); the
      running min-distance updates through ONE broadcast-join aggregate
      per pass; candidates are then weighted by how many points they win
      (argmin, ties to the earlier candidate) and reduced to k by a
      driver-side WEIGHTED farthest-point pass over the tiny candidate
      list (k-means++ derandomized: next = argmax weight × sqdist to the
      chosen set, ties (weight, selection order)). Driver rounds:
      O(init_passes), not O(k) — 2 passes seed k=64 as cheaply as k=8.
      A corpus with fewer distinct candidates than k seeds fewer cells
      (same disappearing-cell contract as Lloyd itself).
    - ``"auto"`` (VERDICT r9 item 5): pick by the MEASURED crossover —
      farthest-point init is linear in k (k−1 driver rounds) while
      k-means‖ is flat (BASELINE §22.3: 19.2 s vs 11.4 s at k=64, curves
      cross at k≈24 on the sf0.1 rig), so auto resolves to ``"farthest"``
      for k < KMEANS_INIT_CROSSOVER_K and ``"parallel"`` at or above it.
      The oracle-facing queries run at k=8 (auto ≡ farthest — parity
      unchanged); real SemDeDup/prototype runs at k ≳ 1024 get the flat
      init without opting in.

    ``return_centroids=True`` returns ``(assignment, centroids)`` — the
    centroid table is the k-row LITERAL DataFrame the loop already
    materializes (cell, cv: array<bigint> quantized), free to expose and
    exactly what a trained-index consumer (``ivf_trained_topk``) needs."""
    if init == "auto":
        init = "farthest" if k < KMEANS_INIT_CROSSOVER_K else "parallel"
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    base = (
        embeddings.select(F.col(id_col).alias("id"), qv.alias("v"))
        .withColumn("h", lehmer_hash_col(F.col("id")))
        .cache()
    )

    def _dist(a: str, b: str) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    spark = embeddings.sparkSession

    def _materialize(cents: DataFrame) -> DataFrame:
        # pin the centroid table as a LITERAL k-row DataFrame each round:
        # without this, round t's broadcast re-executes every prior round's
        # crossJoin/top-1 lineage (t-deep plan recursion — measured 45 s at
        # sf0.1 where the data itself is trivial). The collect is bounded
        # by construction: ≤ k rows of dim bigints, the same driver-bounded
        # pattern as learn_bpe_merges' 1-row argmax (values are exact
        # integers, so re-literalizing cannot perturb the hash contract).
        rows = [(r["cell"], list(r["cv"])) for r in cents.collect()]
        return spark.createDataFrame(rows, "cell bigint, cv array<bigint>")

    # farthest-point init with an INCREMENTAL running min-distance: seed t
    # only needs min over seeds <t, and min(d_{t-1}, dist-to-seed_{t-1})
    # computes it from the cached previous round — one literal-centroid
    # projection + one TakeOrdered per round, NO crossJoin and NO per-id
    # groupBy shuffle (the earlier form recomputed distances to ALL t
    # seeds per round: O(k²) distance work and k exchanges). Values are
    # identical (min over the same integer set), so the unrolled oracle
    # is untouched. The running (id, h, v, d) state persists per round
    # and the previous round unpersists — bounded cache churn, the same
    # inter-round materialization call the iterative dedup closure makes.
    def _lit_vec(cv: list[int]) -> Column:
        return F.array(*[F.lit(int(x)).cast("bigint") for x in cv])

    seed_rows = base.orderBy("h", "id").limit(1).select("v").collect()
    if not seed_rows:  # empty corpus: empty assignment, same as before
        empty = spark.createDataFrame([], "id bigint, cell bigint")
        if return_centroids:
            return empty, spark.createDataFrame([], "cell bigint, cv array<bigint>")
        return empty
    if init == "parallel":
        # the parallel init needs the LSH stratification bucket, computed
        # from the FLOAT vector (the same sign-hyperplane bucket the LSH
        # family uses, so the oracle twin reuses the proven _BUCKET_SQL)
        pbase = embeddings.select(
            F.col(id_col).alias("id"),
            qv.alias("v"),
            lehmer_hash_col(F.col(id_col)).alias("h"),
            lsh_bucket_col(F.col(vec_col)).alias("bucket"),
        ).cache()
        cent_rows = _kmeanspar_init(
            spark, pbase, k, init_passes, oversample or 2 * k,
            list(seed_rows[0]["v"]), _dist, _lit_vec,
        )
        pbase.unpersist()
    elif init == "farthest":
        cent_rows = [(0, list(seed_rows[0]["v"]))]
        mind = base.select(
            "id", "h", "v", _dist("v", _lit_vec(cent_rows[0][1])).alias("d")
        ).persist()
        prev = None  # round t-1's state: unpersist only AFTER round t's
        # far.collect() has materialized round t's cache FROM it (releasing
        # earlier would force a from-scratch recompute); peak cache is then
        # 2 × corpus (id, h, v, d) rows, not k ×
        for t in range(1, k):
            far = mind.orderBy(F.col("d").desc(), "h", "id").limit(1).collect()[0]
            if prev is not None:
                prev.unpersist()
                prev = None
            cent_rows.append((t, list(far["v"])))
            if t < k - 1:  # last round's min-dist state has no consumer
                prev = mind
                mind = mind.select(
                    "id", "h", "v",
                    F.least(F.col("d"), _dist("v", _lit_vec(far["v"]))).alias("d"),
                ).persist()
        if prev is not None:
            prev.unpersist()
        mind.unpersist()
    else:
        raise ValueError(f"unknown init {init!r}: use 'farthest', 'parallel' or 'auto'")
    cents = spark.createDataFrame(cent_rows, "cell bigint, cv array<bigint>")

    def _assign(cents: DataFrame) -> DataFrame:
        dist = F.aggregate(
            F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        scored = base.crossJoin(F.broadcast(cents)).select(
            "id", dist.alias("dist"), "cell"
        )
        return scored.groupBy("id").agg(
            F.min(F.struct("dist", "cell")).alias("m")
        ).select("id", F.col("m.cell").alias("cell"))

    def _update(assign: DataFrame) -> DataFrame:
        comp = (
            base.join(assign, "id")
            .select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cell",
                "pos",
                F.floor(F.col("s").cast("double") / F.col("n")).cast("bigint").alias("c"),
            )
        )
        return comp.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )

    for _ in range(iters):
        cents = _materialize(_update(_assign(cents)))
    if return_centroids:
        return _assign(cents), cents
    return _assign(cents)


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: transitively close the
    cosine>=threshold near-dup pairs into clusters and keep the min-id
    representative of each cluster (singletons keep themselves).

    Returns (id, component, kept) for every input vector — the drop set is
    ``kept = 0``. The pair search is LSH-bucketed (no all-pairs shuffle) and
    the closure is the same iterative min-label propagation used for
    document dup clusters, so the whole operator is two bounded shuffles per
    propagation round plus one left join back to the corpus — no step holds
    a cluster in one task's memory, which is what makes it survive a 100 TB
    corpus where a cluster can span executors.
    """
    from duckpipe_spark.functions.dedup import connected_components

    pairs = embedding_neardup_pairs(embeddings, threshold, id_col, vec_col, n_planes, n_rows)
    comps = connected_components(pairs).withColumnRenamed("id", id_col)
    return (
        embeddings.select(F.col(id_col).cast("bigint").alias(id_col))
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("kept", (F.col("component") == F.col(id_col)).cast("int"))
    )


def lsh_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int | None = None,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """In-engine ANN quality evaluation: recall@k of the LSH-bucketed
    top-k against the exact brute-force top-k, per query →
    (query_id, n_hits, recall). This is the measurement loop a production
    ANN deployment runs after every index parameter change; expressing it
    as one DataFrame plan means the evaluation scales exactly like the
    search itself (the exact side is the only corpus-sized term).

    Deterministic: both sides use the same rounded-cosine tie-break, and
    recall is an integer hit count divided once."""
    exact = brute_force_topk(embeddings, query_ids, k, id_col=id_col, vec_col=vec_col)
    approx = lsh_topk(
        embeddings, query_ids, k, n_planes=n_planes, n_rows=n_rows, id_col=id_col, vec_col=vec_col
    )
    return topk_recall(exact, approx, k)


def lsh_multiprobe_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int | None = None,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``lsh_recall`` for the multi-probe path — the measurement that
    justifies probing: per-query recall@k of the Hamming-1 probe set vs
    exact. Candidates are a strict superset of the single-bucket path's,
    so multi-probe recall >= plain LSH recall for every query
    (pytest-pinned); the cost is (n_planes+1)x the candidate count."""
    exact = brute_force_topk(embeddings, query_ids, k, id_col=id_col, vec_col=vec_col)
    approx = lsh_multiprobe_topk(
        embeddings, query_ids, k, n_planes=n_planes, n_rows=n_rows, id_col=id_col, vec_col=vec_col
    )
    return topk_recall(exact, approx, k)


def ivf_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """recall@k of the IVF probe path vs exact — same evaluation loop as
    `lsh_recall` for the coarse-quantized index."""
    exact = brute_force_topk(embeddings, query_ids, k, id_col=id_col, vec_col=vec_col)
    approx = ivf_topk(embeddings, query_ids, k, n_cells, n_probe, id_col=id_col, vec_col=vec_col)
    return topk_recall(exact, approx, k)


def matryoshka_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    prefix_dim: int = 16,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """recall@k of the Matryoshka prefix-scan path vs exact — the same
    evaluation loop as ``lsh_recall``/``ivf_recall`` for the truncatable-
    embedding rung: the number the prefix-width knob is tuned against
    (recall rises toward 1.0 as prefix_dim -> dim or rerank -> corpus,
    both pinned as identities in the pytest)."""
    exact = brute_force_topk(embeddings, query_ids, k, id_col=id_col, vec_col=vec_col)
    approx = matryoshka_topk(
        embeddings, query_ids, k, prefix_dim=prefix_dim, rerank=rerank,
        id_col=id_col, vec_col=vec_col,
    )
    return topk_recall(exact, approx, k)


def topk_recall(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Generic (query_id, neighbor_id)-ranking comparison → per-query
    (query_id, n_hits, recall). Works for any ANN variant that emits the
    brute-force result schema."""
    hits = approx.select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
    return (
        exact.select("query_id", "neighbor_id")
        # both sides are Q·k rows; broadcast the approx side so the static
        # plan never sorts (AQE would fix it at runtime, but pin it)
        .join(F.broadcast(hits), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(float(k))).alias("recall"),
        )
    )


def scalar_quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization with a reconstruction
    audit → (vec_id, n_dims, q_sum, scale, mse, max_abs_err).

    The 4×-compression baseline every embedding store ships before PQ:
    q_i = round(x_i · 127 / max|x|) per vector, reconstruction
    x'_i = q_i · scale / 127. Pure JVM column expressions (transform /
    zip_with / aggregate higher-order functions) — a projection over the
    scan, zero shuffles, so it runs at full scan bandwidth on any corpus
    size. Rounding is floor(v + 0.5) so ties behave identically on every
    engine; ``q_sum`` (exact BIGINT sum of codes) is the strong
    cross-engine check, float metrics are rounded."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(x, lambda v: F.abs(v))), F.lit(1e-30)
    )
    base = embeddings.select(
        F.col(id_col), x.alias("_x"), scale.alias("_s")
    )
    q = F.transform(
        F.col("_x"),
        lambda v: F.floor(v * F.lit(127.0) / F.col("_s") + F.lit(0.5)).cast("bigint"),
    )
    err = F.zip_with(
        F.col("_x"), F.col("_q"),
        lambda a, b: a - b.cast("double") * F.col("_s") / F.lit(127.0),
    )
    n = F.size(F.col("_x"))
    return (
        base.withColumn("_q", q)
        .withColumn("_e", err)
        .select(
            id_col,
            n.cast("int").alias("n_dims"),
            F.aggregate(F.col("_q"), F.lit(0).cast("bigint"), lambda acc, v: acc + v).alias("q_sum"),
            F.round(F.col("_s"), 6).alias("scale"),
            F.round(
                F.aggregate(
                    F.col("_e"), F.lit(0.0), lambda acc, v: acc + v * v
                ) / n.cast("double"),
                9,
            ).alias("mse"),
            F.round(F.array_max(F.transform(F.col("_e"), lambda v: F.abs(v))), 9).alias("max_abs_err"),
        )
    )


def sq8_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    rerank: int = 32,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 approximate top-k (r11): the scalar-quantization ladder rung the
    catalog had only as an audit (`scalar_quantize_int8`) — candidate scan
    over GLOBAL-scale int8 codes + exact cosine rerank, the FAISS
    ``SQ8,Flat``-refine shape that cuts scan memory 4× before PQ's 32×.

    Determinism contract (same discipline as the k-means/IVF/PQ family):
    vectors land in integer space as round(x·scale); the global bound
    gmax = max|v| over the corpus is an exact integer aggregate that joins
    back as a broadcast 1-row table (never a driver collect); codes are
    (v + gmax)·127 // (2·gmax) ∈ [0, 127] — the operands are non-negative,
    so truncating and flooring integer division agree on every engine —
    and the reconstruction r = c·(2·gmax) − 127·gmax stays exact int64
    (the ×127-scaled de-quantization). The candidate score is the exact
    integer dot ⟨query_int, r⟩; ties break on neighbor id; the ``rerank``
    survivors per query re-score by exact cosine. Both stages are
    two-phase per-query top-k, so no task ever sorts the corpus.

    Scale shape: the corpus-side scan is one projection (codes never
    materialize as rows), queries broadcast, and the only wide ops are the
    two bounded rank exchanges — the same plan skeleton as
    ``brute_force_topk`` with the float fold replaced by an int8-domain
    fold at a quarter of the scan bytes on a real column store."""
    iv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("bigint")
    )
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), iv.alias("v"))
    gmax_df = base.select(
        F.greatest(
            F.max(F.array_max(F.transform(F.col("v"), F.abs))), F.lit(1).cast("bigint")
        ).alias("gmax")
    )
    coded = base.crossJoin(F.broadcast(gmax_df)).select(
        "id",
        "vec",
        # ADVICE r11 item 1: stay in the integer domain end-to-end — SQL
        # `div` is truncating bigint division (== floor here: operands are
        # non-negative), exact for ALL magnitudes, where the previous
        # pmod-subtract-then-`/` detoured through DOUBLE and was exact
        # only while 254*gmax <= 2^53
        F.expr("transform(v, x -> (x + gmax) * 127 div (2 * gmax))")
        .cast("array<bigint>")
        .alias("c"),
        F.col("gmax"),
    )
    recon = F.transform(
        F.col("c"), lambda c: c * 2 * F.col("gmax") - 127 * F.col("gmax")
    )
    q = (
        base.where(F.col("id").isin(query_ids))
        .select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"), F.col("v").alias("qv"))
    )
    pairs = (
        coded.withColumn("r", recon)
        .crossJoin(F.broadcast(q))
        .where(F.col("id") != F.col("query_id"))
    )
    adot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("r"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    cand = _topk_per_query(
        pairs.select(
            "query_id", F.col("id").alias("neighbor_id"), adot.alias("adot"),
            "qvec", "vec",
        ),
        [F.col("adot").desc(), F.col("neighbor_id").asc()],
        rerank,
    ).drop("rank")
    cos = F.round(cosine_col(F.col("qvec"), F.col("vec")), 6)
    ranked = _topk_per_query(
        cand.select("query_id", "neighbor_id", cos.alias("cos")),
        [F.col("cos").desc(), F.col("neighbor_id").asc()],
        k,
    )
    return ranked.select("query_id", "rank", "neighbor_id", "cos")


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    k: int = 10,
    k_rrf: int = 60,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09) over
    named ranked candidate lists → (query_id, rank, ``id_col``, rrf_score,
    {name}_rank per input list): the standard hybrid-retrieval combiner —
    fuse a sparse (BM25) and a dense (embedding) ranking without score
    calibration, since only RANKS enter the fused score.

    Determinism: the textbook 1/(k_rrf + rank) is replaced by the integer
    ``scale DIV (k_rrf + rank)`` (floor division of exact ints), so the
    fused score is a BIGINT both engines agree on bit-for-bit — no float
    summation order to reason about. With the default scale=1e6 the
    quantization never reorders: distinct rank sets map to distinct sums
    for any realistic k_rrf/list sizes, and residual ties break on id.

    Scale shape: every input list is already a per-query top-k (bounded:
    n_queries x k_cand rows TOTAL), so the union + groupBy + final
    row_number window all operate on tiny bounded frames — the expensive
    work (corpus scans, two-phase rank stages) lives in the upstream
    operators that produced the lists. The final window is NOT the
    two-phase ``_topk_per_query`` on purpose: its input is pre-bounded by
    construction, so one window over <= sum(k_i) rows per query is the
    cheaper plan at any corpus size.

    Each input frame must carry (query_id, rank, ``id_col``); extra
    columns (scores) are dropped. ``rank`` is 1-based as produced by the
    repo's rank stages."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one (name, DataFrame) ranking")
    names = [n for n, _ in rankings]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate ranking names: {names}")
    contrib = F.expr(f"{int(scale)} DIV ({int(k_rrf)} + _r)").cast("long")
    parts = [
        df.select(
            "query_id",
            F.col(id_col),
            F.col("rank").cast("int").alias("_r"),
            F.lit(name).alias("_sys"),
        )
        for name, df in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.withColumn("_c", contrib)
        .groupBy("query_id", id_col)
        .agg(
            F.sum("_c").alias("rrf_score"),
            *[
                F.min(F.when(F.col("_sys") == name, F.col("_r")))
                .cast("int")
                .alias(f"{name}_rank")
                for name in names
            ],
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("query_id", "rank", id_col, "rrf_score", *[f"{n}_rank" for n in names])
    )


def matryoshka_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    prefix_dim: int = 16,
    rerank: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka adaptive retrieval (Kusupati et al., NeurIPS'22 MRL;
    the OpenAI/Nomic truncatable-embedding serving pattern): candidate
    scan by cosine over the FIRST ``prefix_dim`` components only — an
    MRL-trained embedding packs a usable coarse representation into every
    prefix — then exact full-dimension cosine rerank of the ``rerank``
    survivors. Cuts candidate-scan flops and scan bytes by
    dim/prefix_dim (4x here at 64->16) with no auxiliary structure at
    all: no codebooks (PQ), no planes (LSH), no centroids (IVF) — the
    index IS the embedding column, sliced.

    Determinism contract (house ANN discipline): both stages score by an
    ordered left-fold dot (float->double) rounded to 6 dp with
    (score desc, neighbor id asc) ties, so ranks are bit-identical
    cross-engine; the DuckDB oracle mirrors the prefix stage by list
    slicing ``embedding[1:prefix_dim]`` through the same fold. Zero
    vectors would NaN either engine identically (none in the corpus —
    same exposure as every cosine rung).

    Scale shape: the corpus-side scan is ONE projection (the prefix
    slice never materializes as extra rows), queries broadcast, and both
    rank stages are the two-phase per-query top-k — no task ever sorts
    the corpus. Identical plan skeleton to ``sq8_topk`` with the int8
    fold replaced by a prefix-slice fold."""
    if prefix_dim < 1:
        raise ValueError(f"matryoshka_topk needs prefix_dim >= 1, got {prefix_dim}")
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    q = base.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    pairs = base.crossJoin(F.broadcast(q)).where(F.col("id") != F.col("query_id"))
    pcos = F.round(
        cosine_col(
            F.slice(F.col("qvec"), 1, prefix_dim), F.slice(F.col("vec"), 1, prefix_dim)
        ),
        6,
    )
    cand = _topk_per_query(
        pairs.select(
            "query_id", F.col("id").alias("neighbor_id"), pcos.alias("pcos"),
            "qvec", "vec",
        ),
        [F.col("pcos").desc(), F.col("neighbor_id").asc()],
        rerank,
    ).drop("rank")
    cos = F.round(cosine_col(F.col("qvec"), F.col("vec")), 6)
    ranked = _topk_per_query(
        cand.select("query_id", "neighbor_id", cos.alias("cos")),
        [F.col("cos").desc(), F.col("neighbor_id").asc()],
        k,
    )
    return ranked.select("query_id", "rank", "neighbor_id", "cos")


def brute_force_topk_queries(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """``brute_force_topk`` against an EXTERNAL query table (the
    ``hamming_topk_queries`` pattern): a fresh batch of query vectors in
    its OWN id namespace scores against the corpus — no same-id exclusion,
    since an id collision across namespaces is a coincidence, not a
    self-match. Same determinism (ordered-fold cosine, 6 dp, id ties) and
    the same scale shape: the query batch broadcasts, the corpus scan is
    the index, both rank phases are the two-phase per-query top-k."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    pairs = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(q))
    cos = F.round(cosine_col(F.col("qvec"), F.col("vec")), 6)
    ranked = _topk_per_query(
        pairs.select("query_id", F.col("id").alias("neighbor_id"), cos.alias("cos")),
        [F.col("cos").desc(), F.col("neighbor_id").asc()],
        k,
    )
    return ranked.select("query_id", "rank", "neighbor_id", "cos")
