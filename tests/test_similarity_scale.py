"""Scale tests for the corpus-parameterized embedding LSH.

The round-1 design fixed N_PLANES=8 (256 buckets), so within-bucket candidate
joins grew O(N²/256) — quadratic at corpus scale. planes_for_corpus grows the
bucket count with the corpus; these tests pin that doubling the corpus keeps
the candidate-pair count sub-quadratic, and that growing the plane count
refines (never reshuffles) existing buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from duckpipe_spark.functions.similarity import (
    MAX_PLANES,
    N_PLANES,
    _hyperplanes,
    lsh_bucket_col,
    planes_for_corpus,
)


def test_planes_for_corpus_growth_and_clamps():
    assert planes_for_corpus(100) == N_PLANES  # small corpora keep the default
    assert planes_for_corpus(10**12) == MAX_PLANES  # upper clamp
    last = 0
    for n in [10**4, 10**5, 10**6, 10**7, 10**8, 10**9]:
        p = planes_for_corpus(n)
        assert p >= last  # monotone
        last = p
        if N_PLANES < p < MAX_PLANES:
            # occupancy bound: 2^planes buckets keep n/2^p <= target
            assert n / (1 << p) <= 1024
    assert planes_for_corpus(10**6) > N_PLANES


def test_plane_resolution_is_strictly_lazy(spark):
    """Auto plane sizing must never launch a Spark job at pipeline-
    construction time: with neither n_planes nor n_rows the API refuses
    (there is no eager .count() fallback), and passing a corpus size uses
    planes_for_corpus without touching the data."""
    from duckpipe_spark.functions.similarity import embedding_neardup_pairs, lsh_topk

    emb = _synthetic_embeddings(spark, 8)
    with pytest.raises(ValueError, match="n_planes or n_rows"):
        lsh_topk(emb, query_ids=[0], k=1)
    with pytest.raises(ValueError, match="n_planes or n_rows"):
        embedding_neardup_pairs(emb)
    # n_rows path sizes from the stated corpus, not a scan: a nonexistent
    # huge corpus size is accepted at construction (plan only, no job)
    df = lsh_topk(emb, query_ids=[0], k=1, n_rows=10**9)
    assert "bucket" not in df.columns  # plan constructed fine


def test_hyperplane_prefix_property():
    """Same seed fills rows sequentially: more planes = same first rows, so
    a bigger plane count splits buckets instead of reassigning them."""
    p8, p16 = _hyperplanes(n_planes=8), _hyperplanes(n_planes=16)
    assert np.array_equal(p16[:8], p8)


def _synthetic_embeddings(spark, n: int, dim: int = 64):
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((n, dim)).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})
    return spark.createDataFrame(pdf)


def _candidate_pairs(spark, n: int, target_bucket_rows: int) -> int:
    """Total within-bucket candidate pairs = Σ_b n_b(n_b−1)/2, computed from
    bucket counts alone (no join — this is the quantity the LSH pair join
    would produce)."""
    emb = _synthetic_embeddings(spark, n)
    planes = planes_for_corpus(n, target_bucket_rows=target_bucket_rows)
    counts = (
        emb.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes))
        .groupBy("bucket")
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    return int(counts)


@pytest.mark.parametrize("n", [8192])
def test_doubling_corpus_keeps_pairs_subquadratic(spark, n):
    """With a fixed bucket count, doubling the corpus ~4x-es the pair count.
    planes_for_corpus adds a plane per doubling (past the target), so the
    observed growth factor must stay well under 4 — i.e. the candidate join
    stays ~linear in the corpus."""
    target = 16  # small target so the auto path is past the lower clamp here
    p1 = _candidate_pairs(spark, n, target)
    p2 = _candidate_pairs(spark, 2 * n, target)
    assert p1 > 0
    ratio = p2 / p1
    assert ratio < 3.0, f"pair growth {ratio:.2f}x on 2x corpus — not sub-quadratic"


def test_lsh_bucket_dim_guards(spark):
    """ADVICE r9 item 1: the r9 plane-slice fix was one-sided. Both
    directions must hold now — a vector LONGER than the 64-dim plane
    buckets by its first-64 projection (not NULL-collapsed into bucket 0),
    a NULL embedding buckets to 0 explicitly (instead of throwing on
    F.slice with size(NULL) = −1), shorter vectors keep the r9 behavior,
    and full-dim vectors are bit-unchanged."""
    rng = np.random.default_rng(7)

    def buckets(dim: int, n: int = 64) -> list[int]:
        vecs = rng.standard_normal((n, dim)).astype(np.float64)
        pdf = pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
        )
        df = spark.createDataFrame(pdf)
        return [
            r["b"]
            for r in df.select(
                lsh_bucket_col(F.col("embedding")).alias("b")
            ).collect()
        ]

    for dim in (32, 64, 96, 128):
        bs = buckets(dim)
        assert len(set(bs)) > 1, f"dim={dim} collapsed into one bucket: {set(bs)}"
    # 96-dim buckets equal the first-64-components buckets (prefix projection)
    vecs = rng.standard_normal((32, 96)).astype(np.float64)
    full = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(32, dtype=np.int64), "embedding": list(vecs)})
    )
    pref = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(32, dtype=np.int64), "embedding": list(vecs[:, :64])}
        )
    )
    bf = [r["b"] for r in full.select(lsh_bucket_col(F.col("embedding")).alias("b")).collect()]
    bp = [r["b"] for r in pref.select(lsh_bucket_col(F.col("embedding")).alias("b")).collect()]
    assert bf == bp
    # NULL embedding: bucket 0, no exception
    nulls = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None)], "vec_id bigint, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["b"]
        for r in nulls.select(
            "vec_id", lsh_bucket_col(F.col("embedding")).alias("b")
        ).collect()
    }
    assert got[2] == 0 and got[1] is not None


def test_multiprobe_recall_dominates_single_bucket(spark):
    """Multi-probe LSH (r10): the Hamming-1 probe set's candidates are a
    strict SUPERSET of the single-bucket path's, so per-query recall@k can
    only improve — a globally-top-k item in the candidate set is outranked
    by at most k−1 candidates, so extra candidates never evict it (the
    same superset-monotonicity argument as the two-phase rank). On the
    driver fixture the improvement is real, not vacuous: single-bucket LSH
    recalls 0 of the exact top-5 (the 64-dim vectors are near-orthogonal,
    so true neighbors usually differ in ≥1 sign bit), multi-probe recovers
    hits (measured 2 at sf0.001)."""
    from duckpipe_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    lsh = {
        r.query_id: r.n_hits
        for r in REGISTRY["embedding_lsh_recall"].fn(spark, SF_SMOKE).collect()
    }
    mp = {
        r.query_id: r.n_hits
        for r in REGISTRY["embedding_multiprobe_recall"].fn(spark, SF_SMOKE).collect()
    }
    assert set(mp) == set(lsh)
    for qid in lsh:
        assert mp[qid] >= lsh[qid], (qid, mp[qid], lsh[qid])
    assert sum(mp.values()) > sum(lsh.values()), (mp, lsh)


def test_int8_quantization_error_bound(spark):
    """Symmetric int8 quantization: reconstruction error is bounded by
    scale/254 per element (half a quantization step), q codes stay in
    [-127, 127], and the plan is a shuffle-free projection."""
    from duckpipe_spark.functions.similarity import scalar_quantize_int8
    from duckpipe_spark.plans.audit import audit_plan, no_aqe

    emb = _synthetic_embeddings(spark, 64)
    out = scalar_quantize_int8(emb)
    with no_aqe(spark):
        a = audit_plan(out)
    assert a.exchanges == 0 and a.python_stages == 0  # pure scan projection
    rows = out.collect()
    assert len(rows) == 64
    for r in rows:
        assert abs(r.q_sum) <= 127 * r.n_dims
        assert r.max_abs_err <= r.scale / 254.0 + 1e-9
        assert r.mse <= (r.scale / 254.0) ** 2 + 1e-9


def test_hamming_topk_queries_external_namespace(spark):
    """VERDICT r8 item 7: hamming_topk_queries scores an EXTERNAL query
    table. Hand-pinned: a query identical to a corpus vector ranks it
    first at hamming 0 (no self-exclusion across namespaces), and an
    id-collision with a corpus row must NOT be excluded."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.similarity import hamming_topk, hamming_topk_queries

    vecs = [
        (1, [1.0] * 64),
        (2, [-1.0] * 64),
        (3, [1.0] * 32 + [-1.0] * 32),
    ]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    # query id 2 COLLIDES with corpus vec_id 2 but carries vec 1's pattern
    q = spark.createDataFrame(
        [(2, [1.0] * 64)], "query_id bigint, embedding array<double>"
    )
    out = {r.rank: r for r in hamming_topk_queries(emb, q, k=3).collect()}
    assert out[1].neighbor_id == 1 and out[1].hamming == 0
    # id-2 corpus row is present despite the id collision (64 bits differ)
    assert out[3].neighbor_id == 2 and out[3].hamming == 64
    assert out[2].neighbor_id == 3 and out[2].hamming == 32
    # the in-corpus wrapper still excludes self
    incorp = hamming_topk(emb, [2], k=3).collect()
    assert all(r.neighbor_id != 2 for r in incorp)


def test_planes_for_recall_model():
    """planes_for_recall (r12): recall-targeted sizing under the Charikar
    sign-agreement model — monotone in the right directions, correct at
    the analytically checkable points, and honest about the blocking-vs-
    retrieval boundary (BASELINE §24.2)."""
    import math

    import pytest

    from duckpipe_spark.functions.similarity import MAX_PLANES, planes_for_recall

    # high-cos dedup blocking gets real plane budgets...
    assert planes_for_recall(0.95, 0.5) >= 6
    # ...mid-similarity retrieval gets the honest 1-2 planes (≈ scan half)
    assert planes_for_recall(0.35, 0.5) <= 2
    # multiprobe credit never shrinks the feasible plane count
    assert planes_for_recall(0.9, 0.5, multiprobe=True) >= planes_for_recall(0.9, 0.5)
    # exact check: p = 1 - acos(c)/pi, largest n with p**n >= target
    c, target = 0.9, 0.3
    p = 1 - math.acos(c) / math.pi
    n = planes_for_recall(c, target)
    assert p**n >= target and (n == MAX_PLANES or p ** (n + 1) < target)
    # clamps and validation
    assert planes_for_recall(1.0, 0.999) == MAX_PLANES  # p == 1 never drops below target
    assert planes_for_recall(-1.0, 0.5) == 1  # p == 0: floor clamp
    with pytest.raises(ValueError):
        planes_for_recall(0.9, 0.0)
    with pytest.raises(ValueError):
        planes_for_recall(0.9, 1.0)


# --- rrf_fuse (r14): hybrid-retrieval rank fusion ----------------------------


def test_rrf_fuse_semantics(spark):
    """A doc ranked by BOTH systems must outscore a doc holding the same
    single rank in one system; per-system rank columns surface the
    provenance; ties break on doc id; k truncates the fused list."""
    from duckpipe_spark.functions.similarity import rrf_fuse

    sparse = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12)], "query_id int, rank int, doc_id long"
    )
    dense = spark.createDataFrame(
        [(0, 1, 11), (0, 2, 20), (0, 3, 21)], "query_id int, rank int, doc_id long"
    )
    out = rrf_fuse(
        [("sparse", sparse), ("dense", dense)], k=3, k_rrf=60, scale=1_000_000
    ).orderBy("rank")
    rows = out.collect()
    # doc 11 appears in both lists (sparse 2, dense 1) and outscores every
    # single-list doc; then sparse rank 1 (10) beats dense rank 2 (20)
    assert [r["doc_id"] for r in rows] == [11, 10, 20]
    assert rows[0]["rrf_score"] == 1_000_000 // 62 + 1_000_000 // 61
    assert (rows[0]["sparse_rank"], rows[0]["dense_rank"]) == (2, 1)
    assert rows[1]["rrf_score"] == 1_000_000 // 61
    assert rows[1]["dense_rank"] is None
    full = rrf_fuse(
        [("sparse", sparse), ("dense", dense)], k=10, k_rrf=60, scale=1_000_000
    ).orderBy("rank").collect()
    assert [r["doc_id"] for r in full] == [11, 10, 20, 12, 21]
    # cross-system same-rank symmetry: rank 3 in either system scores the
    # same integer, and the residual tie breaks on doc_id (12 before 21)
    assert full[3]["rrf_score"] == full[4]["rrf_score"] == 1_000_000 // 63


def test_rrf_fuse_guards(spark):
    import pytest as _pytest

    from duckpipe_spark.functions.similarity import rrf_fuse

    df = spark.createDataFrame([(0, 1, 1)], "query_id int, rank int, doc_id long")
    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="duplicate"):
        rrf_fuse([("a", df), ("a", df)])


# --- matryoshka_topk (r14): prefix-dim candidate scan + full rerank ----------


def test_matryoshka_identities(spark):
    """prefix_dim == full dim makes the candidate stage THE exact ranking,
    and a rerank window covering the corpus recovers brute force for ANY
    prefix — the two ends of the MRL accuracy dial."""
    import numpy as np

    from duckpipe_spark.functions.similarity import brute_force_topk, matryoshka_topk

    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [0, 1]
    exact = brute_force_topk(emb, qids, 5).collect()
    full_prefix = matryoshka_topk(emb, qids, 5, prefix_dim=8, rerank=8).collect()
    assert sorted(map(tuple, full_prefix)) == sorted(map(tuple, exact))
    wide_rerank = matryoshka_topk(emb, qids, 5, prefix_dim=2, rerank=40).collect()
    assert sorted(map(tuple, wide_rerank)) == sorted(map(tuple, exact))


def test_matryoshka_guards(spark):
    import pytest as _pytest

    from duckpipe_spark.functions.similarity import matryoshka_topk

    emb = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="prefix_dim"):
        matryoshka_topk(emb, [0], 5, prefix_dim=0)
    with _pytest.raises(ValueError, match="rerank"):
        matryoshka_topk(emb, [0], 5, rerank=3)
