"""curation_pipeline extras: the optional SemDeDup stage (embedding
near-dup clusters keep only the min-id representative) and the
stage_handles cache-release contract (ADVICE r7)."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from duckpipe_spark.functions.corpus import curation_pipeline


def _train_ids(spark, n=14):
    """ids in the deterministic train split (lehmer bucket < 90) — bench
    bucket docs never appear in pipeline output, so the fixture plants
    everything on the train side."""
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    rows = spark.range(1, 400).select(
        "id", (lehmer_hash_col(F.col("id")) % 100).alias("b")
    ).collect()
    return [r.id for r in rows if r.b < 90][:n]


@pytest.fixture(scope="module")
def sem_corpus(spark):
    ids = _train_ids(spark)
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)] + ["the", "of", "and"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab, size=40)), "en") for i in ids],
        "doc_id bigint, text string, lang string",
    )
    twin_a, twin_b = ids[0], ids[1]  # semantic twins: identical embeddings
    no_emb = ids[2]  # no embedding row: must pass through unjudged
    shared = [float(x) for x in rng.normal(size=64)]
    emb_rows = []
    for pos, i in enumerate(ids):
        if i == no_emb:
            continue
        if i in (twin_a, twin_b):
            emb_rows.append((i, shared))
        else:
            # orthogonal basis vectors: cos = 0 between any two, so no
            # accidental near-dup pair regardless of LSH bucketing
            v = [0.0] * 64
            v[pos] = 1.0
            emb_rows.append((i, v))
    embs = spark.createDataFrame(emb_rows, "vec_id bigint, embedding array<double>")
    return docs, embs, twin_a, twin_b, no_emb


def test_semdedup_stage_drops_non_representative_twin(spark, sem_corpus):
    docs, embs, twin_a, twin_b, no_emb = sem_corpus
    base = {
        r.doc_id
        for r in curation_pipeline(docs, persist_stages=False).select("doc_id").collect()
    }
    assert {twin_a, twin_b, no_emb} <= base  # sanity: all survive without the stage
    got = {
        r.doc_id
        for r in curation_pipeline(
            docs, embeddings=embs, semdedup_planes=8, persist_stages=False
        )
        .select("doc_id")
        .collect()
    }
    assert got == base - {max(twin_a, twin_b)}  # min-id representative kept
    assert no_emb in got  # unembedded docs pass through


def test_semdedup_respects_exact_dedup_order(spark, sem_corpus):
    """The closure runs over exact-dedup SURVIVORS: an exact duplicate of
    the min-id twin (dropped in stage 2) must not re-enter via SemDeDup."""
    docs, embs, twin_a, twin_b, _ = sem_corpus
    lo = min(twin_a, twin_b)
    dup_id = 100_000  # bucket irrelevant: exact dedup removes it first
    extra = docs.sparkSession.createDataFrame(
        [(dup_id, docs.where(F.col("doc_id") == lo).first().text, "en")],
        "doc_id bigint, text string, lang string",
    )
    got = {
        r.doc_id
        for r in curation_pipeline(
            docs.unionByName(extra), embeddings=embs, semdedup_planes=8,
            persist_stages=False,
        )
        .select("doc_id")
        .collect()
    }
    assert dup_id not in got and lo in got


def test_stage_handles_release_persisted_boundaries(spark, sem_corpus):
    docs, embs, *_ = sem_corpus
    handles: list = []
    out = curation_pipeline(
        docs, embeddings=embs, semdedup_planes=8, stage_handles=handles
    )
    out.count()
    # three persisted boundaries with the SemDeDup stage on: exact-dedup
    # survivors, post-SemDeDup survivors, cleaned text
    assert len(handles) == 3
    assert all(h.storageLevel.useMemory or h.storageLevel.useDisk for h in handles)
    for h in handles:
        h.unpersist(blocking=True)
    assert all(
        not (h.storageLevel.useMemory or h.storageLevel.useDisk) for h in handles
    )
