"""Multimodal column plumbing (SURVEY.md §2.14): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

The Spark-side machinery — schema, partitioning, UDF signatures, batch shapes
— is real and tested. Image decode has two REAL paths: PNG blobs decode
through the vendored pure-python codec (`functions.png`) and baseline
JPEGs through `functions.jpeg` (Pillow is used instead when importable).
Audio decode is REAL for RIFF/WAVE PCM (`functions.wav`, integer
8/16/24/32-bit + IEEE float); video container metadata AND Motion-JPEG
frame sampling are REAL for ISO-BMFF MP4 (`functions.mp4` box walker +
sample-table resolution feeding the vendored JPEG decoder). Compressed
audio AND inter-frame video (H.264/HEVC/VP9) route through the ffmpeg
binary when present (`ffmpeg_decode_pcm`, `ffmpeg_decode_frames`);
without it — and for progressive/arithmetic JPEG — ``NotImplementedError``
marks the exact external-codec plug point. Images also accept
``fake_decode=True`` for a deterministic pseudo-decode in plumbing
tests.

Byte-level feature extraction (histogram, entropy, byte stats) is fully real
— those are the kernels a 100 TB curation pipeline runs before any decode
(corruption checks, format sniffing, dedup on content hash).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BLOB_META_SCHEMA = "blob_id bigint, n_bytes bigint, sha1 string, format string"


def with_blob_metadata(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """Typed metadata columns for an opaque binary column (JVM-side where
    possible: length; sha1/format sniff via one mapInPandas pass)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(getattr(row, blob_col))
                fmt = _sniff_format(blob)
                out.append(
                    (getattr(row, id_col), len(blob), hashlib.sha1(blob).hexdigest(), fmt)
                )
            yield pd.DataFrame(out, columns=["blob_id", "n_bytes", "sha1", "format"])

    return df.mapInPandas(gen, BLOB_META_SCHEMA)


def _sniff_format(blob: bytes) -> str:
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def byte_histogram(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """256-bin byte histogram + entropy per blob (numpy bincount per Arrow
    batch) — the real pre-decode corruption/quality kernel."""
    schema = "blob_id bigint, entropy double, histogram array<bigint>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ents, hists = [], [], []
            for row in pdf.itertuples(index=False):
                blob = np.frombuffer(bytes(getattr(row, blob_col)), dtype=np.uint8)
                hist = np.bincount(blob, minlength=256).astype(np.int64)
                p = hist[hist > 0] / max(len(blob), 1)
                ids.append(getattr(row, id_col))
                ents.append(float(-(p * np.log2(p)).sum()) if len(blob) else 0.0)
                hists.append(hist.tolist())
            # dtype=object guards the empty batch: an empty list column
            # defaults to float64, which Arrow refuses to cast to
            # list<int64> (same guard as shingle_hash_array's hvs)
            yield pd.DataFrame(
                {
                    "blob_id": ids,
                    "entropy": ents,
                    "histogram": pd.Series(hists, dtype=object),
                }
            )

    return df.mapInPandas(gen, schema)


DECODED_IMAGE_SCHEMA = "blob_id bigint, width int, height int, channels int, mean_pixel double"


def decode_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "blob_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Image decode → (width, height, channels, mean_pixel).

    Decode priority per blob: Pillow if importable (any format) → the
    vendored pure-python codecs (`functions.png` for 8-bit non-interlaced
    PNGs, `functions.jpeg` for baseline sequential JPEGs — both REAL
    decodes) → ``fake_decode`` (deterministic pseudo-decode from the
    blob's sha1, for plumbing tests) → ``NotImplementedError``. Audio /
    video formats without Pillow are exactly where a production deploy
    plugs in its codec.
    """
    try:  # pragma: no cover - not present in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckpipe_spark.functions.jpeg import decode_jpeg
        from duckpipe_spark.functions.png import decode_png

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(getattr(row, blob_col))
                bid = getattr(row, id_col)
                if have_pil:  # pragma: no cover
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(blob))
                    arr = np.asarray(img)
                    out.append(
                        (bid, img.width, img.height, arr.shape[2] if arr.ndim == 3 else 1,
                         float(arr.mean()))
                    )
                elif _sniff_format(blob) == "png":
                    arr = decode_png(blob)  # real decode, no image library
                    out.append(
                        (bid, arr.shape[1], arr.shape[0], arr.shape[2], float(arr.mean()))
                    )
                elif _sniff_format(blob) == "jpeg":
                    arr = decode_jpeg(blob)  # real decode, no image library
                    out.append(
                        (bid, arr.shape[1], arr.shape[0], arr.shape[2], float(arr.mean()))
                    )
                elif fake_decode:
                    h = hashlib.sha1(blob).digest()
                    width = 64 + h[0]
                    height = 64 + h[1]
                    channels = 1 + (h[2] % 4)
                    mean_pixel = float(int.from_bytes(h[3:5], "big")) / 65535.0 * 255.0
                    out.append((bid, width, height, channels, mean_pixel))
                else:
                    raise NotImplementedError(
                        "decode for this format requires an external codec (PIL/"
                        "ffmpeg) — not available in this environment; PNG and "
                        "baseline JPEG decode natively; pass fake_decode=True "
                        "for plumbing tests"
                    )
            yield pd.DataFrame(
                out, columns=["blob_id", "width", "height", "channels", "mean_pixel"]
            )

    return df.mapInPandas(gen, DECODED_IMAGE_SCHEMA)


def image_dhash(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "blob_id",
    grid: int = 8,
) -> DataFrame:
    """Perceptual difference-hash (dHash) over NATIVELY decoded pixels →
    (blob_id, h0, h1): decode each blob with the vendored PNG/baseline-JPEG
    codecs, integer-downsample to a ``grid`` × ``grid``+1 brightness grid,
    and set bit (r, c) when cell (r, c+1) is brighter than cell (r, c) —
    the 64-bit gradient signature that survives re-encoding, mild noise
    and resizing, which byte-level dedup cannot see past.

    Determinism contract: grayscale is the integer SUM over channels; the
    downsample partitions rows/columns at floor(i·H/grid) boundaries and
    compares block brightness by exact integer cross-multiplication
    (sumA·nB > sumB·nA — no float division anywhere), so the code is
    bit-portable across engines. Codes pack MSB-first into TWO bigints of
    32 bits (rows 0..3 → h0, rows 4..7 → h1), the ``sign_pack_cols``
    convention the Hamming-ANN family already ships (no int64 sign-bit
    reasoning).

    Scale shape: one shuffle-free Arrow projection — m codes-bytes per
    image, the cheapest representation an image-dedup pass at 100 TB can
    scan. Blobs that fail to decode are SKIPPED (near-dup detection is
    best-effort curation, not validation — `decode_images` is the loud
    path)."""
    cols = grid + 1

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckpipe_spark.functions.gif import decode_gif
        from duckpipe_spark.functions.jpeg import decode_jpeg
        from duckpipe_spark.functions.png import decode_png

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                raw = getattr(row, blob_col)
                if raw is None:  # NULL blob — skip, not fatal
                    continue
                blob = bytes(raw)
                bid = getattr(row, id_col)
                try:
                    fmt = _sniff_format(blob)
                    if fmt == "png":
                        arr = decode_png(blob)
                    elif fmt == "jpeg":
                        arr = decode_jpeg(blob)
                    elif fmt == "gif":
                        # first frame carries the perceptual identity (the
                        # same convention as MJPEG's frame-0 anchor); GIF
                        # frames decode to (h, w, 3) via the color table
                        arr = decode_gif(blob)[0]
                    else:
                        continue
                except (ValueError, NotImplementedError):
                    continue
                gray = arr.astype(np.int64).sum(axis=2)
                h, w = gray.shape
                if h < grid or w < cols:
                    continue
                rb = (np.arange(grid) * h) // grid
                cb = (np.arange(cols) * w) // cols
                s = np.add.reduceat(np.add.reduceat(gray, rb, axis=0), cb, axis=1)
                rn = np.diff(np.append(rb, h)).astype(np.int64)
                cn = np.diff(np.append(cb, w)).astype(np.int64)
                cnt = rn[:, None] * cn[None, :]
                # brighter-to-the-right bit, exact integer cross-multiply
                bits = s[:, 1:] * cnt[:, :-1] > s[:, :-1] * cnt[:, 1:]
                half = grid // 2
                weights = 1 << (np.arange(half * grid, dtype=np.int64)[::-1])
                h0 = int((bits[:half].ravel() * weights).sum())
                h1 = int((bits[half:].ravel() * weights).sum())
                out.append((bid, h0, h1))
            yield pd.DataFrame(out, columns=["blob_id", "h0", "h1"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        gen, "blob_id bigint, h0 bigint, h1 bigint"
    )


def phash_neardup_pairs(
    hashes: DataFrame,
    max_distance: int = 3,
    max_band_df: int = 50,
    id_col: str = "blob_id",
    partition_col: str | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Near-duplicate image pairs from perceptual-hash codes →
    (id_a, id_b, hamming): band each 64-bit code into FOUR 16-bit slices;
    by pigeonhole any pair within Hamming distance ≤ 3 (< 4 bands) agrees
    exactly on at least one band, so the candidate set is an equi-join on
    (band index, band value) — never all-pairs — and the exact
    xor+popcount verify keeps pairs ≤ ``max_distance``.

    Bands occurring in more than ``max_band_df`` images (flat-color
    boilerplate — blank thumbnails, solid backgrounds) are dropped via a
    broadcast anti-join BEFORE the pair join, the same skew guard the
    MinHash/winnow candidate passes use: one hot band otherwise
    contributes df² candidate rows. Verification distances are exact
    integers (same xor+popcount kernel as the Hamming-ANN family), so
    results are bit-portable across engines.

    When ``partition_col`` is set it joins as an equi-key, so rows whose
    partition value is NULL can never pair with anything (SQL NULL never
    equals NULL) — callers with possibly-NULL partition values must
    filter or fill them first (`media_neardup_drops` filters).

    ``partition_col`` (r12, the media-curation stage's contract): when the
    code table mixes MODALITIES (image dHash, audio/video fingerprints in
    the same 64-bit layout), a band match across modalities is numerology,
    not similarity — pass the modality column and it joins into every
    band key (hot-band counting AND the candidate equi-join), so pairs
    only ever form within a partition.

    ``distinct=False`` (optimization r14, guide §2.4) skips the final
    cross-pair dedup exchange: a pair within distance ``d`` agrees on
    ``4 - d`` or more bands and is emitted once per agreeing band, so the
    row stream is a small-multiplicity multiset over the same pair SET.
    Consumers that dedup downstream anyway (``media_neardup_drops`` feeds
    `connected_components`, whose union-find/distinct absorbs duplicates)
    save one full exchange per invocation; set-valued consumers (the
    *_neardup oracle queries) keep the default."""
    keys = [partition_col] if partition_col is not None else []
    bands = hashes.select(
        *keys,
        F.col(id_col).alias("id"),
        "h0",
        "h1",
        F.posexplode(
            F.array(
                F.shiftright(F.col("h0"), 16).cast("bigint"),
                F.col("h0") % F.lit(65536).cast("bigint"),
                F.shiftright(F.col("h1"), 16).cast("bigint"),
                F.col("h1") % F.lit(65536).cast("bigint"),
            )
        ).alias("bi", "bv"),
    )
    hot = (
        bands.groupBy(*keys, "bi", "bv")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") > max_band_df)
        .select(*keys, "bi", "bv")
    )
    rare = bands.join(F.broadcast(hot), keys + ["bi", "bv"], "left_anti")
    a = rare.select(
        *keys,
        F.col("id").alias("id_a"), F.col("h0").alias("h0a"), F.col("h1").alias("h1a"),
        "bi", "bv",
    )
    b = rare.select(
        *keys,
        F.col("id").alias("id_b"), F.col("h0").alias("h0b"), F.col("h1").alias("h1b"),
        "bi", "bv",
    )
    ham = (
        F.bit_count(F.col("h0a").bitwiseXOR(F.col("h0b")))
        + F.bit_count(F.col("h1a").bitwiseXOR(F.col("h1b")))
    ).cast("bigint")
    out = (
        a.join(b, keys + ["bi", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_distance)
    )
    return out.distinct() if distinct else out


def media_neardup_drops(
    codes: DataFrame,
    max_distance: int = 3,
    max_band_df: int = 50,
    id_col: str = "blob_id",
    modality_col: str = "modality",
) -> DataFrame:
    """Near-dup DROP set from a mixed-modality fingerprint-code table →
    one column ``drop_id``: the curation-side consumer of the perceptual
    triad (`image_dhash` / `audio_fingerprint` / `video_fingerprint`,
    which all emit the same (id, h0, h1) 64-bit layout). Pairs form
    per-modality (``phash_neardup_pairs(partition_col=modality_col)`` —
    an image code must never band-join an audio code), then the pair
    graph closes transitively (`connected_components`, the same min-id
    closure the SemDeDup stage uses: A~B, B~C ⇒ one cluster even when
    A~C never banded together) and every non-minimum member of each
    cluster is dropped. An id carrying codes in several modalities can
    legitimately bridge clusters — near-dup-of-X-by-image and
    near-dup-of-Y-by-audio is one keep-one group.

    Scale shape: banding cost is the per-modality pair join (hot-band
    guarded), the closure shuffles only the pair graph (tiny versus the
    corpus), and the result is a drop-id list sized by the duplicate
    mass — the anti-join shape the pipeline consumes.

    Rows with a NULL ``modality_col`` are dropped up front: a NULL
    partition key never equi-joins, so such codes could never pair (or be
    dropped) anyway — the explicit filter makes that contract visible
    instead of leaving NULL-modality rows to vanish inside the band
    join."""
    from duckpipe_spark.functions.dedup import connected_components

    pairs = phash_neardup_pairs(
        codes.where(F.col(modality_col).isNotNull()),
        max_distance=max_distance,
        max_band_df=max_band_df,
        id_col=id_col,
        partition_col=modality_col,
        # the closure dedups (union-find / sym.distinct) — the per-band
        # duplicate pair rows are harmless there, so the dedup exchange
        # here would be paid twice (optimization r14, guide §2.4)
        distinct=False,
    )
    comps = connected_components(pairs.select("id_a", "id_b"))
    return comps.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("drop_id")
    )


def audio_fingerprint(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "blob_id",
    n_frames: int = 65,
) -> DataFrame:
    """Perceptual audio fingerprint over NATIVELY decoded PCM →
    (blob_id, h0, h1): decode each RIFF/WAVE blob with the vendored codec,
    partition the sample stream into ``n_frames`` time frames, and set bit
    f when frame f+1 carries more energy than frame f — the 1-D analogue
    of `image_dhash`'s brightness-gradient signature, i.e. the
    energy-delta family of Haitsma & Kalker's audio fingerprint (ICMIR'02)
    restricted to the time axis (no FFT — band deltas become frame deltas,
    which keeps every step exact integer math). The signature survives
    re-encoding, channel remixing that preserves the per-frame
    channel-sum profile (channels are summed BEFORE squaring — e.g. an
    L/R swap; an energy-preserving sign flip is NOT invariant), and
    sample-order changes within a frame — none of which byte-level dedup
    can see past.

    Determinism contract: samples requantize deterministically to the
    16-bit grid via rint(x·32768) — exact recovery for 8/16-bit PCM and
    both G.711 halves, mu-law AND A-law (their expansions land ON the
    16-bit grid — mu-law max ±32124, A-law max ±32256; power-of-two
    scaling is lossless in float64), a deterministic but lossy
    requantization for 24/32-bit and IEEE-float WAV — channels are
    integer-summed, frame energies are int64 sums
    of squares over floor(f·n/n_frames) boundaries, and unequal frame
    lengths compare by exact cross-multiplication (E[f+1]·len[f] >
    E[f]·len[f+1]) — no float anywhere, so codes are bit-portable across
    engines. Bound: E·len ≤ len²·ch²·2³⁰ keeps int64 up to ~45k samples
    per frame stereo (a 3-minute 16 kHz track at 65 frames). Codes pack
    MSB-first into TWO 32-bit bigints (bits 0..31 → h0, 32..63 → h1), the
    same halves convention as `image_dhash`, so `phash_neardup_pairs`
    bands/verifies them unchanged.

    Scale shape: one shuffle-free Arrow projection — the cheapest
    representation an audio-dedup pass at 100 TB can scan. Blobs that
    fail to decode (compressed codecs without ffmpeg, malformed) are
    SKIPPED — near-dup detection is best-effort curation; `decode_audio`
    is the loud path."""
    if n_frames != 65:
        raise ValueError("audio_fingerprint packs exactly 64 delta bits (65 frames)")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckpipe_spark.functions.wav import decode_wav

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                raw = getattr(row, blob_col)
                if raw is None:  # NULL blob (arriving crawl data) — skip,
                    continue  # not fatal (ADVICE r11 item 3)
                blob = bytes(raw)
                bid = getattr(row, id_col)
                try:
                    if _sniff_format(blob) != "wav":
                        continue
                    arr, _rate = decode_wav(blob)
                except (ValueError, NotImplementedError):
                    continue
                n = arr.shape[0]
                if n < n_frames:
                    continue
                iv = np.rint(arr * 32768.0).astype(np.int64).sum(axis=1)
                fb = (np.arange(n_frames) * n) // n_frames
                energy = np.add.reduceat(iv * iv, fb)
                cnt = np.diff(np.append(fb, n)).astype(np.int64)
                # E·len overflows int64 past ~45k samples/frame stereo (a
                # few minutes of audio) — exact arbitrary-precision ints
                # there (64 compares, negligible)
                if int(energy.max(initial=0)) * int(cnt.max(initial=0)) > 2**63 - 1:
                    bits = np.array(
                        [
                            int(energy[f + 1]) * int(cnt[f])
                            > int(energy[f]) * int(cnt[f + 1])
                            for f in range(n_frames - 1)
                        ]
                    )
                else:
                    bits = energy[1:] * cnt[:-1] > energy[:-1] * cnt[1:]
                weights = 1 << np.arange(31, -1, -1, dtype=np.int64)
                h0 = int((bits[:32] * weights).sum())
                h1 = int((bits[32:] * weights).sum())
                out.append((bid, h0, h1))
            yield pd.DataFrame(out, columns=["blob_id", "h0", "h1"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        gen, "blob_id bigint, h0 bigint, h1 bigint"
    )


def video_fingerprint(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "blob_id",
    every: int = 1,
    n_segments: int = 65,
) -> DataFrame:
    """Perceptual video fingerprint over natively decoded frames →
    (blob_id, h0, h1), completing the near-dup triad (`image_dhash`,
    `audio_fingerprint`, this): walk the real ISO-BMFF sample table,
    decode every ``every``-th MJPEG frame through the vendored JPEG codec,
    take each frame's EXACT integer pixel sum, partition the sampled-frame
    sequence into ``n_segments`` time segments (floor boundaries — the
    same resample contract as `audio_fingerprint`'s frames), and set bit
    k when segment k+1 carries more total brightness than segment k. The
    temporal-brightness-gradient signature survives re-encoding, frame
    reordering within a segment, and any per-frame change that preserves
    frame sums — none visible to byte-level dedup.

    Determinism contract: pixel sums are int64 over all pixels × channels;
    unequal segment sizes compare by exact cross-multiplication
    (S[k+1]·N[k] > S[k]·N[k+1], N = segment pixel count) — no float
    anywhere. Codes pack MSB-first into TWO 32-bit bigints, the shared
    halves convention, so `phash_neardup_pairs` bands/verifies them
    unchanged.

    Scale shape: one shuffle-free Arrow projection; sampling k-of-n does
    1/k of the decode work (sample-table extents, no demux of skipped
    frames). Blobs that fail to parse/decode, inter-frame codecs without
    ffmpeg, and videos with fewer than ``n_segments`` sampled frames are
    SKIPPED — best-effort curation; `sample_video_frames` is the loud
    path."""
    if n_segments != 65:
        raise ValueError("video_fingerprint packs exactly 64 delta bits (65 segments)")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckpipe_spark.functions.jpeg import decode_jpeg
        from duckpipe_spark.functions.mp4 import parse_video_sample_table

        import hashlib

        for pdf in batches:
            out = []
            # real videos repeat frame bytes constantly (static scenes,
            # title cards, MJPEG keyframe reuse) — memoize (sum, size) per
            # distinct frame payload within the Arrow batch so repeated
            # frames decode once; keyed by (len, blake2b-16) so the memo
            # never retains frame payloads (a 4K frame is MBs, its key 24 B)
            memo: dict[tuple[int, bytes], tuple[int, int]] = {}
            for row in pdf.itertuples(index=False):
                raw = getattr(row, blob_col)
                if raw is None:  # NULL blob — skip, not fatal
                    continue
                blob = bytes(raw)
                bid = getattr(row, id_col)
                try:
                    st = parse_video_sample_table(blob)
                    if st["codec"] not in ("jpeg", "mjpa", "mjpb"):
                        continue
                    sums, cnts = [], []
                    for idx in range(0, len(st["samples"]), every):
                        off, size = st["samples"][idx]
                        frame = blob[off : off + size]
                        key = (size, hashlib.blake2b(frame, digest_size=16).digest())
                        hit = memo.get(key)
                        if hit is None:
                            arr = decode_jpeg(frame)
                            hit = (int(arr.astype(np.int64).sum()), arr.size)
                            memo[key] = hit
                        sums.append(hit[0])
                        cnts.append(hit[1])
                except (ValueError, NotImplementedError):
                    continue
                m = len(sums)
                if m < n_segments:
                    continue
                s = np.asarray(sums, dtype=np.int64)
                c = np.asarray(cnts, dtype=np.int64)
                fb = (np.arange(n_segments) * m) // n_segments
                seg_s = np.add.reduceat(s, fb)
                seg_n = np.add.reduceat(c, fb)
                # S·N overflows int64 around 4K-video segment sizes — fall
                # back to exact arbitrary-precision ints there (64 compares)
                if int(seg_s.max(initial=0)) * int(seg_n.max(initial=0)) > 2**63 - 1:
                    bits = np.array(
                        [
                            int(seg_s[k + 1]) * int(seg_n[k])
                            > int(seg_s[k]) * int(seg_n[k + 1])
                            for k in range(n_segments - 1)
                        ]
                    )
                else:
                    bits = seg_s[1:] * seg_n[:-1] > seg_s[:-1] * seg_n[1:]
                weights = 1 << np.arange(31, -1, -1, dtype=np.int64)
                h0 = int((bits[:32] * weights).sum())
                h1 = int((bits[32:] * weights).sum())
                out.append((bid, h0, h1))
            yield pd.DataFrame(out, columns=["blob_id", "h0", "h1"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        gen, "blob_id bigint, h0 bigint, h1 bigint"
    )


DECODED_AUDIO_SCHEMA = (
    "blob_id bigint, n_frames bigint, sample_rate int, channels int, "
    "duration_s double, rms double"
)


def ffmpeg_available() -> bool:
    """True when the ffmpeg + ffprobe binaries are on PATH (the
    production plug point for compressed audio/video decode)."""
    import shutil

    return shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None


def ffmpeg_decode_pcm(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode any ffmpeg-supported audio blob → (float64 array of shape
    (n_frames, channels), sample_rate) — the same contract as the
    vendored `functions.wav.decode_wav`, through the external binary a
    production deploy ships. ffprobe reads the stream layout, ffmpeg
    emits f32le PCM on a pipe; no temp files, no shell.

    Raises ``NotImplementedError`` when the binaries are absent (this
    container) so callers keep the documented plug-point contract, and
    ``ValueError`` when ffmpeg rejects the stream."""
    import json as _json
    import subprocess

    if not ffmpeg_available():
        raise NotImplementedError(
            "compressed-audio decode requires the ffmpeg/ffprobe binaries — "
            "not available in this environment"
        )
    try:
        probe = subprocess.run(
            [
                "ffprobe", "-v", "error", "-select_streams", "a:0",
                "-show_entries", "stream=sample_rate,channels",
                "-of", "json", "pipe:0",
            ],
            input=blob, capture_output=True, check=True,
        )
        meta = _json.loads(probe.stdout)["streams"][0]
        rate, ch = int(meta["sample_rate"]), int(meta["channels"])
        raw = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-i", "pipe:0",
                "-f", "f32le", "-acodec", "pcm_f32le", "pipe:1",
            ],
            input=blob, capture_output=True, check=True,
        )
    except (subprocess.CalledProcessError, KeyError, IndexError) as exc:
        raise ValueError(f"ffmpeg could not decode blob: {exc}") from exc
    if rate == 0 or ch == 0:
        raise ValueError("ffprobe reported zero sample rate or channels")
    arr = np.frombuffer(raw.stdout, dtype="<f4").astype(np.float64)
    n = len(arr) - len(arr) % ch
    return arr[:n].reshape(-1, ch), rate


def ffmpeg_decode_frames(
    blob: bytes, every: int = 1
) -> list[tuple[int, int, int, int, float]]:
    """Decode every ``every``-th frame of the first video stream through
    the external ffmpeg binary → list of (frame_idx, width, height,
    channels, mean_pixel) — the exact per-frame contract of
    `sample_video_frames`, so inter-frame codecs (H.264/HEVC/VP9) plug in
    where the vendored MJPEG path leaves off (VERDICT r6 item 2; mirrors
    `ffmpeg_decode_pcm` for audio).

    ffprobe reads the stream geometry, ffmpeg's ``select`` filter keeps
    frames where ``n % every == 0`` (so frame_idx is the ORIGINAL stream
    index, matching the sample-table path) and emits raw rgb24 on a pipe.
    The INPUT goes through a temp file, not stdin: MP4 demuxing needs a
    seekable source when the ``moov`` atom trails the ``mdat`` (the
    layout non-faststart encoders — including `build_mjpeg_mp4` — emit),
    and a pipe would fail those containers with "moov atom not found".
    Frame-accurate sampling of inter-frame streams decodes forward from
    the previous keyframe internally — the library concern the vendored
    path deliberately does not reimplement.

    Raises ``NotImplementedError`` when the binaries are absent (this
    container) and ``ValueError`` when ffmpeg rejects the stream."""
    import json as _json
    import os as _os
    import subprocess
    import tempfile

    if every < 1:
        raise ValueError("every must be >= 1")
    if not ffmpeg_available():
        raise NotImplementedError(
            "inter-frame video decode requires the ffmpeg/ffprobe binaries — "
            "not available in this environment"
        )
    fd, path = tempfile.mkstemp(suffix=".bin")
    try:
        with _os.fdopen(fd, "wb") as fh:
            fh.write(blob)
        try:
            probe = subprocess.run(
                [
                    "ffprobe", "-v", "error", "-select_streams", "v:0",
                    "-show_entries", "stream=width,height",
                    "-of", "json", path,
                ],
                capture_output=True, check=True,
            )
            meta = _json.loads(probe.stdout)["streams"][0]
            width, height = int(meta["width"]), int(meta["height"])

            # vfr output mode: emit exactly the select-ed frames. The flag
            # spelling changed across ffmpeg majors (-fps_mode since 5.1;
            # -vsync before, removed in newer majors) — try modern first,
            # fall back once on an unrecognized-option failure.
            def _decode(vfr_flag: str):
                return subprocess.run(
                    [
                        "ffmpeg", "-v", "error", "-i", path,
                        "-vf", f"select=not(mod(n\\,{every}))",
                        vfr_flag, "vfr",
                        "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
                    ],
                    capture_output=True, check=True,
                )

            try:
                raw = _decode("-fps_mode")
            except subprocess.CalledProcessError as exc:
                if b"fps_mode" not in (exc.stderr or b""):
                    raise
                raw = _decode("-vsync")
        except (subprocess.CalledProcessError, KeyError, IndexError) as exc:
            raise ValueError(f"ffmpeg could not decode blob: {exc}") from exc
    finally:
        _os.unlink(path)
    if width <= 0 or height <= 0:
        raise ValueError("ffprobe reported non-positive frame dimensions")
    frame_bytes = width * height * 3
    if len(raw.stdout) % frame_bytes:
        raise ValueError("ffmpeg emitted a partial rgb24 frame")
    frames = np.frombuffer(raw.stdout, dtype=np.uint8).reshape(-1, frame_bytes)
    return [
        (i * every, width, height, 3, float(frame.mean()))
        for i, frame in enumerate(frames)
    ]


def decode_audio(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "blob_id",
) -> DataFrame:
    """Audio decode → (n_frames, sample_rate, channels, duration_s, rms).

    RIFF/WAVE PCM blobs decode through the vendored pure-python codec
    (`functions.wav` — integer 8/16/24/32-bit and IEEE-float samples);
    compressed codecs (MP3/AAC/...) raise at the documented external-codec
    plug point, same contract as image decode. RMS is computed over all
    samples of all channels in float64."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckpipe_spark.functions.wav import decode_wav

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(getattr(row, blob_col))
                bid = getattr(row, id_col)
                if _sniff_format(blob) != "wav":
                    # compressed formats go through the external-binary
                    # plug point; raises NotImplementedError when the
                    # deploy doesn't ship ffmpeg
                    arr, rate = ffmpeg_decode_pcm(blob)
                else:
                    arr, rate = decode_wav(blob)
                n, ch = arr.shape
                rms = float(np.sqrt((arr**2).mean())) if n else 0.0
                out.append((bid, n, rate, ch, n / rate, rms))
            yield pd.DataFrame(
                out,
                columns=[
                    "blob_id", "n_frames", "sample_rate", "channels",
                    "duration_s", "rms",
                ],
            )

    return df.mapInPandas(gen, DECODED_AUDIO_SCHEMA)


VIDEO_META_SCHEMA = (
    "blob_id bigint, brand string, duration_s double, timescale int, "
    "n_tracks int, video_width int, video_height int"
)


def video_metadata(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "blob_id",
) -> DataFrame:
    """Container-level video metadata via the vendored ISO-BMFF box walker
    (`functions.mp4`) — brand, duration, timescale, track count and the
    first video track's dimensions. This is the REAL pre-decode pass a
    curation pipeline runs on video blobs (corrupt-container rejection,
    duration/resolution filtering); SAMPLE decode stays behind the
    external-codec plug point."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckpipe_spark.functions.mp4 import parse_mp4_metadata

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                m = parse_mp4_metadata(bytes(getattr(row, blob_col)))
                vid = next((t for t in m["tracks"] if t["type"] == "vide"), None)
                out.append(
                    (
                        getattr(row, id_col),
                        m["brand"],
                        m["duration_s"],
                        m["timescale"],
                        m["n_tracks"],
                        vid["width"] if vid else None,
                        vid["height"] if vid else None,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "blob_id", "brand", "duration_s", "timescale",
                    "n_tracks", "video_width", "video_height",
                ],
            )

    return df.mapInPandas(gen, VIDEO_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    blob_col: str = "blob",
    id_col: str = "blob_id",
) -> DataFrame:
    """Video frame sampling STUB: emits (blob_id, frame_idx, frame_offset)
    rows — the explode shape a real ffmpeg-backed sampler produces — with
    offsets spread deterministically across the blob."""
    schema = "blob_id bigint, frame_idx int, frame_offset bigint"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(getattr(row, blob_col))
                bid = getattr(row, id_col)
                n = max(len(blob), 1)
                for i in range(n_frames):
                    out.append((bid, i, (i * n) // n_frames))
            yield pd.DataFrame(out, columns=["blob_id", "frame_idx", "frame_offset"])

    return df.mapInPandas(gen, schema)


def documents_as_blobs(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as blobs so the multimodal
    machinery is exercised against the driver's testdata."""
    return docs.select(
        F.col("doc_id").alias("blob_id"), F.encode(F.col("text"), "UTF-8").alias("blob")
    )


VIDEO_FRAME_SCHEMA = (
    "blob_id bigint, frame_idx int, width int, height int, channels int, "
    "mean_pixel double"
)


def sample_video_frames(
    df: DataFrame,
    every: int = 1,
    blob_col: str = "blob",
    id_col: str = "blob_id",
) -> DataFrame:
    """Video FRAME SAMPLING — decode every ``every``-th sample of the
    first video track → (blob_id, frame_idx, width, height, channels,
    mean_pixel) per sampled frame.

    This makes the r5 "video frame sampling" plug point REAL for
    Motion-JPEG: the vendored ISO-BMFF sample-table walker
    (`functions.mp4.parse_video_sample_table` — stsz/stco/stsc
    resolution per ISO 14496-12 §8.5-8.7) locates each sample's byte
    extent, and each sampled frame decodes through the vendored baseline
    JPEG codec. Inter-frame codecs (H.264/H.265/VP9) route through
    `ffmpeg_decode_frames` when the ffmpeg binaries are on PATH — same
    per-frame contract, frame-accurate sampling handled by the library —
    and raise ``NotImplementedError`` at this exact point otherwise.

    Scale shape: one Arrow-batched ``mapInPandas`` projection — blobs
    never shuffle, output is ceil(n_samples/every) small rows per blob,
    and skipped samples are never even sliced out of the blob (the
    sample table gives exact extents, so sampling k-of-n does 1/k of the
    decode work, the point of the operator)."""
    if every < 1:
        raise ValueError("every must be >= 1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from duckpipe_spark.functions.jpeg import decode_jpeg
        from duckpipe_spark.functions.mp4 import parse_video_sample_table

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(getattr(row, blob_col))
                bid = getattr(row, id_col)
                st = parse_video_sample_table(blob)
                if st["codec"] not in ("jpeg", "mjpa", "mjpb"):
                    # inter-frame codecs route through the external-binary
                    # plug point (same contract as compressed audio); raises
                    # NotImplementedError when the deploy doesn't ship ffmpeg
                    if not ffmpeg_available():
                        raise NotImplementedError(
                            f"frame sampling for codec {st['codec']!r} requires "
                            "an external decoder (ffmpeg) — MJPEG decodes "
                            "natively"
                        )
                    for idx, w, h, ch, mp in ffmpeg_decode_frames(blob, every):
                        out.append((bid, idx, w, h, ch, mp))
                    continue
                for idx in range(0, len(st["samples"]), every):
                    off, size = st["samples"][idx]
                    arr = decode_jpeg(blob[off : off + size])
                    out.append(
                        (bid, idx, arr.shape[1], arr.shape[0], arr.shape[2],
                         float(arr.mean()))
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "blob_id", "frame_idx", "width", "height", "channels",
                    "mean_pixel",
                ],
            )

    return df.mapInPandas(gen, VIDEO_FRAME_SCHEMA)
