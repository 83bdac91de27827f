"""Semantic tests for the dedup/similarity family on planted duplicates —
the oracle gate proves cross-engine parity; these prove the operators
actually *find* what they claim to find."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from duckpipe_spark.functions.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from duckpipe_spark.functions.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def planted_docs(spark):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    base_docs = [" ".join(rng.choice(vocab, size=60)) for _ in range(20)]
    rows = []
    doc_id = 0
    for text in base_docs:
        rows.append((doc_id, text))
        doc_id += 1
    # exact duplicates of doc 0 (with whitespace noise → same fingerprint)
    rows.append((100, "  " + base_docs[0].replace(" ", "  ") + " "))
    rows.append((101, base_docs[0].upper().lower()))
    # near-duplicate of doc 1: change 3 of 60 words
    words = base_docs[1].split()
    words[5], words[20], words[40] = "zzz1", "zzz2", "zzz3"
    rows.append((102, " ".join(words)))
    # unrelated doc
    rows.append((103, " ".join(rng.choice([f"q{i}" for i in range(50)], size=60))))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_collapses_planted_dups(spark, planted_docs):
    groups = exact_dedup_groups(planted_docs).collect()
    by_canonical = {r["canonical_id"]: r["n_dups"] for r in groups}
    assert by_canonical[0] == 3  # doc 0 + ids 100, 101
    assert sum(r["n_dups"] for r in groups) == planted_docs.count()


def test_minhash_lsh_finds_near_duplicate(spark, planted_docs):
    sigs = minhash_signatures(planted_docs)
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (1, 102) in pairs  # 57/60 shared words → high signature agreement
    assert (1, 103) not in pairs  # disjoint vocab never collides


def test_jaccard_scores_planted_pair(spark, planted_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(planted_docs, threshold=0.2).collect()
    }
    assert (0, 100) in pairs and pairs[(0, 100)] == 1.0  # same token stream
    assert (1, 102) in pairs and 0.5 < pairs[(1, 102)] < 1.0


def test_jaccard_df_cap_keeps_pair_count_linear(spark):
    """Skew guard: one shingle present in EVERY doc would make the inverted-
    index self-join emit O(n²) rows; with the df cap engaged the hot shingle
    is dropped and pair count stays linear (here: zero, since the docs share
    nothing else)."""
    n = 60
    # every doc starts with the same 3-word prefix (one ubiquitous trigram
    # shingle); the remainder is doc-unique vocabulary
    rows = [(i, "the quick fox " + " ".join(f"u{i}_{j}" for j in range(6))) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    capped = ngram_jaccard_pairs(docs, threshold=0.01, max_df=10)
    assert capped.count() == 0
    # uncapped control: the shared shingle alone links every doc pair
    uncapped = ngram_jaccard_pairs(docs, threshold=0.01, max_df=None)
    assert uncapped.count() == n * (n - 1) // 2


def test_jaccard_df_cap_noop_below_threshold(spark, planted_docs):
    """A cap larger than any shingle's df must not change any score."""
    with_cap = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(planted_docs, threshold=0.2, max_df=10_000).collect()
    }
    no_cap = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(planted_docs, threshold=0.2, max_df=None).collect()
    }
    assert with_cap == no_cap


def test_simhash_hamming_close_for_neardup(spark, planted_docs):
    sims = {r["id"]: r["simhash"] for r in simhash(planted_docs).collect()}
    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sims[1], sims[102]) <= 6
    assert hamming(sims[0], sims[100]) == 0  # identical token streams
    # unrelated docs differ in many bits
    assert hamming(sims[1], sims[103]) > 6


@pytest.fixture(scope="module")
def planted_vectors(spark):
    rng = np.random.default_rng(12)
    centers = rng.standard_normal((5, 32))
    rows = []
    vid = 0
    for label, c in enumerate(centers):
        for _ in range(20):
            v = c + 0.1 * rng.standard_normal(32)
            rows.append((vid, [float(x) for x in v], label))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")


def test_brute_force_topk_stays_in_cluster(spark, planted_vectors):
    labels = {r["vec_id"]: r["label"] for r in planted_vectors.select("vec_id", "label").collect()}
    topk = brute_force_topk(planted_vectors, query_ids=[0, 20, 40], k=5).collect()
    for r in topk:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]]


def test_lsh_topk_recall_vs_bruteforce(spark, planted_vectors):
    exact = brute_force_topk(planted_vectors, query_ids=[0, 20, 40, 60, 80], k=5)
    approx = lsh_topk(planted_vectors, query_ids=[0, 20, 40, 60, 80], k=5, n_rows=100)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # tight clusters land in one hyperplane bucket — high recall expected
    assert recall >= 0.8, recall


def test_connected_components_closes_multi_hop_chains(spark):
    """A 5-node path graph (0-1, 1-2, 2-3, 3-4) needs diameter-many
    propagation rounds — proves the fixpoint loop, not just one hop."""
    from duckpipe_spark.functions.dedup import connected_components

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a bigint, id_b bigint",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_arrow_and_hof_impls_bit_identical(spark, planted_docs):
    """The numpy mapInPandas path and the JVM higher-order-function path
    must produce byte-identical MinHash signatures and SimHash values on
    the same documents — they are two implementations of one operator, and
    the DuckDB oracle only covers whichever one the queries use. Also run
    on the real sf0.001 documents table (messier text than the planted
    fixture: punctuation, mixed languages, newlines)."""
    from duckpipe_spark.sources.tables import load_table

    for docs in (planted_docs, load_table(spark, "/root/testdata/sf0.001", "documents")):
        mh_a = sorted(map(tuple, minhash_signatures(docs, impl="arrow").collect()))
        mh_h = sorted(map(tuple, minhash_signatures(docs, impl="hof").collect()))
        assert mh_a == mh_h and len(mh_a) > 0
        sh_a = sorted(map(tuple, simhash(docs, impl="arrow").collect()))
        sh_h = sorted(map(tuple, simhash(docs, impl="hof").collect()))
        assert sh_a == sh_h


def test_nearest_neighbor_grid_equals_brute_force(spark):
    """Grid-pruned NN must equal the brute-force cross join exactly, at cell
    sizes that exercise both paths: tiny g (most points fall back), huge g
    (everything resolves in pass A), and a balanced g."""
    import pyspark.sql.functions as F  # noqa: PLC0415

    from duckpipe_spark.operators.distance import nearest_neighbor_grid

    rng = np.random.default_rng(7)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 10_000, (300, 2)))]
    fts = [(float(x), float(y)) for x, y in rng.uniform(0, 10_000, (40, 2))]
    points = spark.createDataFrame(pts, "id bigint, x double, y double")
    feats = spark.createDataFrame(fts, "fx double, fy double")

    d = F.sqrt(
        (F.col("x") - F.col("fx")) ** 2 + (F.col("y") - F.col("fy")) ** 2
    )
    brute = {
        r["id"]: r["value"]
        for r in points.crossJoin(feats).groupBy("id").agg(F.min(d).alias("value")).collect()
    }
    for g in (100.0, 1500.0, 50_000.0):
        got = {r["id"]: r["value"] for r in nearest_neighbor_grid(points, feats, g).collect()}
        assert got == brute, f"mismatch at cell_size={g}"


def test_kmeans_recovers_planted_clusters(spark, planted_vectors):
    """On 5 well-separated planted clusters, k=5 integer-quantized Lloyd
    must converge to the planted partition (cluster labels are arbitrary;
    the induced partition must match), and assignment must be total and
    deterministic across reruns."""
    from duckpipe_spark.functions.similarity import kmeans_cells

    got = kmeans_cells(planted_vectors, k=5, iters=4).collect()
    assert len(got) == 100 and len({r["id"] for r in got}) == 100
    labels = {r["vec_id"]: r["label"] for r in planted_vectors.select("vec_id", "label").collect()}
    # partition match: each k-means cell maps to exactly one planted label
    cell_to_labels: dict[int, set] = {}
    for r in got:
        cell_to_labels.setdefault(r["cell"], set()).add(labels[r["id"]])
    assert all(len(s) == 1 for s in cell_to_labels.values()), cell_to_labels
    assert len(cell_to_labels) == 5
    again = kmeans_cells(planted_vectors, k=5, iters=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_kmeanspar_init_recovers_planted_clusters(spark, planted_vectors):
    """VERDICT r8 item 4: the k-means‖ init (2 oversampling passes instead
    of k−1 farthest-point rounds) must ALSO recover the planted partition
    on well-separated clusters — the oversampled candidate set covers
    every cluster, and the weight-based reduction keeps one seed in each.
    Same totality + determinism contract as the farthest-point path."""
    from duckpipe_spark.functions.similarity import kmeans_cells

    got = kmeans_cells(
        planted_vectors, k=5, iters=4, init="parallel", init_passes=2
    ).collect()
    assert len(got) == 100 and len({r["id"] for r in got}) == 100
    labels = {r["vec_id"]: r["label"] for r in planted_vectors.select("vec_id", "label").collect()}
    cell_to_labels: dict[int, set] = {}
    for r in got:
        cell_to_labels.setdefault(r["cell"], set()).add(labels[r["id"]])
    assert all(len(s) == 1 for s in cell_to_labels.values()), cell_to_labels
    assert len(cell_to_labels) == 5
    again = kmeans_cells(
        planted_vectors, k=5, iters=4, init="parallel", init_passes=2
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="init"):
        kmeans_cells(planted_vectors, k=5, init="bogus")


def test_kmeans_init_auto_crossover(spark, planted_vectors):
    """VERDICT r9 item 5: ``init="auto"`` resolves by the MEASURED
    farthest-vs-parallel crossover (KMEANS_INIT_CROSSOVER_K = 24,
    BASELINE §22.3): below it auto ≡ farthest (bit-identical result at
    k=8), at/above it auto ≡ parallel (bit-identical at k=64 — k > n
    seeds fewer cells, the same disappearing-cell contract as Lloyd)."""
    from duckpipe_spark.functions.similarity import (
        KMEANS_INIT_CROSSOVER_K,
        kmeans_cells,
    )

    assert KMEANS_INIT_CROSSOVER_K == 24  # the documented §22.3 crossover
    a8 = sorted(
        map(tuple, kmeans_cells(planted_vectors, k=8, iters=2, init="auto").collect())
    )
    f8 = sorted(
        map(tuple, kmeans_cells(planted_vectors, k=8, iters=2, init="farthest").collect())
    )
    assert a8 == f8
    a64 = sorted(
        map(tuple, kmeans_cells(planted_vectors, k=64, iters=1, init="auto").collect())
    )
    p64 = sorted(
        map(tuple, kmeans_cells(planted_vectors, k=64, iters=1, init="parallel").collect())
    )
    assert a64 == p64


def test_pq_codes_total_and_adc_finds_exact_twin(spark, planted_vectors):
    """PQ codes must cover every (vector, subspace) exactly once and be
    deterministic; ADC distance to an exact duplicate is 0, so the twin
    must rank first; a cluster-0 query keeps a top-k majority inside
    cluster 0 (the seed codebook is built from cluster-0 ids, so that
    cluster is faithfully quantized — other clusters collapse onto nearby
    codes and can occasionally intrude, which is the PQ approximation)."""
    from duckpipe_spark.functions.similarity import pq_adc_topk, pq_codes

    # interleave ids across clusters so the seed codebook (16 smallest ids)
    # represents every cluster — a codebook trained on one mode collapses
    # out-of-distribution vectors onto shared codes
    remapped = planted_vectors.select(
        ((F.col("vec_id") % 20) * 5 + F.col("label")).cast("bigint").alias("vec_id"),
        "embedding",
        "label",
    )
    twin = remapped.where(F.col("vec_id") == 0).select(
        F.lit(500).cast("bigint").alias("vec_id"), "embedding", "label"
    )
    vecs = remapped.unionByName(twin)
    codes = pq_codes(vecs, dim=32).collect()
    assert len(codes) == 101 * 8
    assert {(r["id"], r["sub"]) for r in codes} == {(i, s) for i in [*range(100), 500] for s in range(8)}
    again = pq_codes(vecs, dim=32).collect()
    assert sorted(map(tuple, codes)) == sorted(map(tuple, again))

    labels = {r["vec_id"]: r["label"] for r in remapped.select("vec_id", "label").collect()}
    topk = pq_adc_topk(vecs, query_ids=[0], k=5, dim=32).collect()
    by_rank = {r["rank"]: r for r in topk}
    assert by_rank[1]["neighbor_id"] == 500 and by_rank[1]["adist"] == 0
    in_cluster = sum(1 for r in topk if labels.get(r["neighbor_id"], 0) == labels[0])
    assert in_cluster >= 4, topk


class TestStarConnectedComponents:
    """connected_components_star must agree exactly with neighbor-min
    propagation — and converge in O(log n) rounds where propagation needs
    O(diameter)."""

    def _pairs_df(self, spark, pairs):
        return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")

    def test_matches_propagation_on_random_graphs(self, spark):
        import random

        from duckpipe_spark.functions.dedup import (
            connected_components,
            connected_components_star,
        )

        rng = random.Random(23)
        for trial in range(3):
            pairs = [
                (rng.randint(1, 60), rng.randint(1, 60)) for _ in range(70)
            ]
            pairs = [(a, b) for a, b in pairs if a != b]
            df = self._pairs_df(spark, pairs)
            a = sorted(
                (r.id, r.component) for r in connected_components(df).collect()
            )
            b = sorted(
                (r.id, r.component)
                for r in connected_components_star(df).collect()
            )
            assert a == b, f"trial {trial}"

    def test_path_graph_converges_logarithmically(self, spark):
        """A 300-node path has diameter 299; the star algorithm must finish
        within max_iter=12 (propagation would need 300 rounds) and label
        every node with the chain minimum."""
        from duckpipe_spark.functions.dedup import connected_components_star

        df = self._pairs_df(spark, [(i, i + 1) for i in range(1, 300)])
        got = connected_components_star(df, max_iter=12).collect()
        assert len(got) == 300
        assert {r.component for r in got} == {1}

    def test_two_components_and_isolated_star_centers(self, spark):
        from duckpipe_spark.functions.dedup import connected_components_star

        df = self._pairs_df(spark, [(5, 3), (3, 9), (20, 21), (21, 20)])
        got = {r.id: r.component for r in connected_components_star(df).collect()}
        assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_cc_star_non_convergence_still_one_row_per_id(spark):
    """max_iter too small: labels are not final (warned), but the result
    must still be one row per id — a leaf attached to multiple centers in
    the non-fixed-point edge set is collapsed to its min label."""
    import warnings

    from duckpipe_spark.functions.dedup import connected_components_star

    pairs = [(i, i + 1) for i in range(60)]
    e = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components_star(e, max_iter=1).collect()
    assert any("did not converge" in str(x.message) for x in w)
    ids = [r.id for r in out]
    assert len(ids) == len(set(ids)) == 61


def test_lsh_join_finds_planted_cross_corpus_neardup(spark):
    """A benchmark doc with one word changed must match its corpus twin
    (high integer Jaccard); unrelated docs must not appear."""
    from duckpipe_spark.functions.dedup import lsh_join

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different text about spark partitions and shuffles here")],
        "doc_id bigint, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, base.replace("today", "tonight")), (101, "unrelated benchmark prose with no overlap at all whatsoever")],
        "doc_id bigint, text string",
    )
    got = lsh_join(corpus, benchmark, min_jaccard_pct=20).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(1, 100)]
    r = got[0]
    # 14 tokens -> 12 shingles; the changed LAST word breaks exactly one
    # window ("river bank today") on each side: 11 shared, 13 in the union
    assert r.n_inter == 11 and r.n_union == 13


def test_lsh_join_rows_match_self_join_on_identical_corpora(spark):
    """Degenerate check: joining a corpus against itself yields every
    identity pair at jaccard 100%."""
    from duckpipe_spark.functions.dedup import lsh_join
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    got = lsh_join(docs, docs, min_jaccard_pct=100)
    ident = got.where(F.col("id_a") == F.col("id_b"))
    assert ident.count() == docs.where(F.size(F.split(F.trim("text"), r"\s+")) >= 3).count()
    assert ident.where(F.col("n_inter") != F.col("n_union")).count() == 0


def test_ngram_novelty_semantics(spark):
    """A doc sharing every 3-shingle with a twin has novelty 0; a doc with
    entirely unique text has novelty 1."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.dedup import ngram_novelty

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact twin: 0 novel
        (3, "one unique sentence nobody else wrote today"),  # all novel
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.id: r for r in ngram_novelty(docs).collect()}
    assert out[1].novel_frac == 0.0 and out[2].novel_frac == 0.0
    assert out[3].novel_frac == 1.0
    assert out[3].n_novel == out[3].n_shingles


def test_winnow_guarantee_and_tie_break(spark):
    """Winnowing contract (Schleimer'03): (1) any shared token run of
    length >= w + k - 1 yields a shared selected fingerprint; (2) docs
    sharing no k-gram share no fingerprint; (3) ties select the RIGHTMOST
    position per the paper's plain-winnowing rule (a repeated-token doc
    selects every window's last slot); (4) density: selections never
    exceed the window count."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.dedup import winnow_fingerprints, winnow_matches

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # w + k - 1 = 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four five six"),
            (2, f"seven eight nine ten {shared} eleven"),
            (3, "completely different words entirely here now truly"),
            (4, "rep rep rep rep rep rep rep rep"),
        ],
        "doc_id bigint, text string",
    )
    fps = winnow_fingerprints(docs, k=k, w=w)
    by_doc = {
        i: {r.fp for r in rows}
        for i, rows in [
            (i, fps.where(F.col("id") == i).collect()) for i in (1, 2, 3, 4)
        ]
    }
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # repeated-token doc: all shingle hashes equal -> rightmost tie-break
    # selects every window's last slot -> positions are exactly w-1..n_sh-1
    rep = sorted(r.pos for r in fps.where(F.col("id") == 4).collect())
    n_sh = 8 - k + 1  # 6 shingles
    assert rep == list(range(w - 1, n_sh)), rep
    # density bound: per-doc selections <= window count
    for i in (1, 2, 3):
        n_tok = len(docs.where(F.col("doc_id") == i).collect()[0].text.split())
        assert len(by_doc[i]) <= n_tok - k + 1
    # matching pass surfaces exactly the planted pair
    pairs = {(r.id_a, r.id_b) for r in winnow_matches(docs, k=k, w=w).collect()}
    assert (1, 2) in pairs and all(3 not in p and 4 not in p for p in pairs)


def test_ivfpq_equals_ivf_trained_when_rerank_covers_cell(spark, planted_vectors):
    """IVFADC (r11): with the same trained quantizer and probe budget, and
    a rerank width >= the probed cell population, the exact rerank runs
    over the SAME candidate set as trained-IVF — outputs must be
    identical (the ADC shortlist can only lose candidates when rerank is
    narrower than the cell). Also: every neighbor stays in the query's
    planted cluster, and a NARROW rerank still returns k in-cluster rows
    (the ADC ordering itself ranks true neighbors first on separated
    clusters)."""
    from duckpipe_spark.functions.similarity import ivf_trained_topk, ivfpq_topk

    qs = [0, 20, 40, 60, 80]
    labels = {
        r["vec_id"]: r["label"]
        for r in planted_vectors.select("vec_id", "label").collect()
    }
    ref = ivf_trained_topk(
        planted_vectors, query_ids=qs, k=5, n_cells=5, iters=3, n_probe=1
    ).collect()
    got = ivfpq_topk(
        planted_vectors, query_ids=qs, k=5, n_cells=5, iters=3, n_probe=1,
        dim=32, rerank=30,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
    # r13: the DERIVED default (rerank=None → max(8k, ceil(1.5·N·p/c)))
    # covers the probed population by construction, so the default call
    # must ALSO reproduce trained-IVF exactly — the covering guarantee is
    # the shipped behavior now, not an opt-in width
    default = ivfpq_topk(
        planted_vectors, query_ids=qs, k=5, n_cells=5, iters=3, n_probe=1,
        dim=32,
    ).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, ref))
    narrow = ivfpq_topk(
        planted_vectors, query_ids=qs, k=5, n_cells=5, iters=3, n_probe=1,
        dim=32, rerank=8,
    ).collect()
    assert len(narrow) == 25
    for r in narrow:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]], r


def test_ivf_trained_topk_uses_converged_cells(spark, planted_vectors):
    """Trained-IVF (r10): with Lloyd-converged centroids on 5 well-separated
    planted clusters, every returned neighbor lives in the query's planted
    cluster (the probe covers the query's own converged cell first), and
    results are deterministic. Also pins the return_centroids contract:
    the tuple form's assignment ≡ the plain call, and the centroid table
    has one row per surviving cell."""
    from duckpipe_spark.functions.similarity import ivf_trained_topk, kmeans_cells

    labels = {
        r["vec_id"]: r["label"]
        for r in planted_vectors.select("vec_id", "label").collect()
    }
    got = ivf_trained_topk(
        planted_vectors, query_ids=[0, 20, 40, 60, 80], k=5, n_cells=5, iters=3,
        n_probe=1,
    ).collect()
    assert len(got) == 25
    for r in got:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]], r
    again = ivf_trained_topk(
        planted_vectors, query_ids=[0, 20, 40, 60, 80], k=5, n_cells=5, iters=3,
        n_probe=1,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    assign, cents = kmeans_cells(planted_vectors, k=5, iters=3, return_centroids=True)
    plain = kmeans_cells(planted_vectors, k=5, iters=3)
    assert sorted(map(tuple, assign.collect())) == sorted(map(tuple, plain.collect()))
    crows = cents.collect()
    assert len(crows) == 5 and len({r["cell"] for r in crows}) == 5


def test_sq8_equals_brute_when_rerank_covers_corpus(spark, planted_vectors):
    """embedding_sq8_topk (r11): with rerank >= corpus size the exact
    cosine rerank sees every vector, so SQ8 must return exactly the brute
    result regardless of quantization error; a narrow rerank returns a
    subset-consistent ranking (each returned rank prefix is a valid top-k
    of its candidate set)."""
    from duckpipe_spark.functions.similarity import brute_force_topk, sq8_topk

    qids = [0, 1]
    want = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(planted_vectors, qids, k=3).collect()
    }
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in sq8_topk(planted_vectors, qids, k=3, rerank=1000).collect()
    }
    assert got == want, (got, want)
    narrow = sq8_topk(planted_vectors, qids, k=3, rerank=3).collect()
    assert {r.query_id for r in narrow} == set(qids)
    assert all(1 <= r.rank <= 3 for r in narrow)
