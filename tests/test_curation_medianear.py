"""curation_pipeline media near-dup stage (VERDICT r11 item 5): planted
cross-modality fixtures — pairs form only WITHIN a modality, clusters
close transitively (including ids that bridge modalities), min-id
representatives survive, and docs without a code row pass through."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from duckpipe_spark.functions.corpus import curation_pipeline
from duckpipe_spark.functions.multimodal import (
    media_neardup_drops,
    phash_neardup_pairs,
)


def _train_ids(spark, n=14):
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    rows = spark.range(1, 400).select(
        "id", (lehmer_hash_col(F.col("id")) % 100).alias("b")
    ).collect()
    return [r.id for r in rows if r.b < 90][:n]


def test_partition_col_blocks_cross_modality_pairs(spark):
    """An image code NUMERICALLY IDENTICAL to an audio code is numerology,
    not similarity: with partition_col set the band join must never cross
    modalities, while the same codes in one modality must pair."""
    rows = [
        (1, 0, 12345, 67890),  # image
        (2, 1, 12345, 67890),  # audio — identical code, different modality
        (3, 0, 12345, 67890),  # image — identical code, same modality as 1
    ]
    codes = spark.createDataFrame(rows, "blob_id bigint, modality int, h0 bigint, h1 bigint")
    got = {
        (r.id_a, r.id_b)
        for r in phash_neardup_pairs(codes, partition_col="modality").collect()
    }
    assert got == {(1, 3)}
    # without the partition column the same table pairs everything — the
    # guard is the partition key, not the data
    unpart = {
        (r.id_a, r.id_b) for r in phash_neardup_pairs(codes).collect()
    }
    assert unpart == {(1, 2), (1, 3), (2, 3)}


def test_media_neardup_drops_transitive_and_bridging(spark):
    """Chain E~F, F~G (E-G never a band pair) is ONE cluster; an id with
    codes in two modalities bridges its image cluster and audio cluster
    into one keep-one group."""
    E, Fid, G = 10, 11, 12
    h = 0x0F0F0F0F
    rows = [
        # video chain: E~F at hamming 1, F~G at hamming 3, E-G at 4
        (E, 2, h, 0),
        (Fid, 2, h ^ 1, 0),
        (G, 2, h ^ 1, 7),  # h1 differs from F by 3 bits, from E by... (0 vs 7)
        # image twins A~B plus bridge H; audio twins C~C2 plus bridge H
        (20, 0, 555, 777),
        (21, 0, 555, 777),
        (30, 1, 999, 111),
        (31, 1, 999, 111),
        (40, 0, 555, 777),  # H's image code — pairs with 20, 21
        (40, 1, 999, 111),  # H's audio code — pairs with 30, 31
        # isolated doc: codes far from everything
        (50, 0, -1, -1),
    ]
    codes = spark.createDataFrame(rows, "blob_id bigint, modality int, h0 bigint, h1 bigint")
    drops = {r.drop_id for r in media_neardup_drops(codes).collect()}
    # video chain keeps min E; image+audio+bridge cluster {20,21,30,31,40}
    # keeps min 20; isolated 50 survives
    assert drops == {Fid, G, 21, 30, 31, 40}


@pytest.fixture(scope="module")
def media_corpus(spark):
    ids = _train_ids(spark)
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(60)] + ["the", "of", "and"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab, size=40)), "en") for i in ids],
        "doc_id bigint, text string, lang string",
    )
    twin_a, twin_b = sorted(ids[:2])  # image near-dups: identical codes
    cross = ids[2]  # audio code numerically equal to the image twins'
    no_code = ids[3]  # no code row: must pass through unjudged
    code_rows = [(twin_a, 0, 4242, 2424), (twin_b, 0, 4242, 2424), (cross, 1, 4242, 2424)]
    for pos, i in enumerate(ids):
        if i in (twin_a, twin_b, cross, no_code):
            continue
        # random 63-bit codes: expected pairwise distance ~32 bits and no
        # shared 16-bit band among 14 docs — no accidental pairs
        code_rows.append(
            (i, pos % 3, int(rng.integers(0, 2**63)), int(rng.integers(0, 2**63)))
        )
    codes = spark.createDataFrame(
        code_rows, "blob_id bigint, modality int, h0 bigint, h1 bigint"
    )
    return docs, codes, twin_a, twin_b, cross, no_code


def test_media_stage_drops_non_representative_twin(spark, media_corpus):
    docs, codes, twin_a, twin_b, cross, no_code = media_corpus
    base = {
        r.doc_id
        for r in curation_pipeline(docs, persist_stages=False).select("doc_id").collect()
    }
    assert {twin_a, twin_b, cross, no_code} <= base
    got = {
        r.doc_id
        for r in curation_pipeline(docs, media_codes=codes, persist_stages=False)
        .select("doc_id")
        .collect()
    }
    assert got == base - {twin_b}  # min-id image twin kept
    assert cross in got  # equal code in another modality never pairs
    assert no_code in got  # unfingerprinted docs pass through


def test_media_stage_from_persisted_codes_artifact(spark, media_corpus, tmp_path):
    """The production shape (BASELINE §24.1a): codes are a PRECOMPUTED
    parquet artifact — persisting the code table and reloading it from a
    fresh read must drive the stage to the identical survivor set as the
    in-memory table."""
    docs, codes, twin_a, twin_b, cross, no_code = media_corpus
    path = str(tmp_path / "media_codes.parquet")
    codes.write.parquet(path)
    reloaded = spark.read.parquet(path)
    inline = {
        r.doc_id
        for r in curation_pipeline(docs, media_codes=codes, persist_stages=False)
        .select("doc_id")
        .collect()
    }
    from_disk = {
        r.doc_id
        for r in curation_pipeline(docs, media_codes=reloaded, persist_stages=False)
        .select("doc_id")
        .collect()
    }
    assert from_disk == inline
    assert twin_b not in from_disk and twin_a in from_disk
