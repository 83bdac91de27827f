"""External-codec passthrough tests (VERDICT r5 item 8): the PIL and
ffmpeg paths are exercised the day the dependency appears in a deploy,
and skip cleanly here (neither ships in this container) — same pattern
as the env-gated transformWithState test.

What runs TODAY in this container: the absent-binary contract (the plug
points must raise NotImplementedError, not crash differently)."""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from duckpipe_spark.functions.multimodal import (
    ffmpeg_available,
    ffmpeg_decode_frames,
    ffmpeg_decode_pcm,
)
from duckpipe_spark.functions.png import decode_png, encode_png
from duckpipe_spark.functions.wav import decode_wav, encode_wav_pcm16

_HAVE_PIL = importlib.util.find_spec("PIL") is not None


def test_ffmpeg_plug_point_contract_without_binary():
    if ffmpeg_available():  # pragma: no cover - binary-present environments
        pytest.skip("ffmpeg present; the passthrough tests below cover it")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        ffmpeg_decode_pcm(b"\xff\xfb\x90\x00 not really mp3 ")


def test_ffmpeg_video_plug_point_contract_without_binary(spark):
    """VERDICT r6 item 2: a non-MJPEG video codec routes to the ffmpeg
    passthrough; without the binary the plug point must raise
    NotImplementedError naming ffmpeg — both at the function and through
    the Spark operator."""
    if ffmpeg_available():  # pragma: no cover - binary-present environments
        pytest.skip("ffmpeg present; the passthrough tests below cover it")
    import pandas as pd
    from pyspark.errors.exceptions.captured import PythonException

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import sample_video_frames

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        ffmpeg_decode_frames(b"\x00\x00\x00\x18ftypisom not a real mp4")

    # a structurally-valid MP4 whose codec fourcc is not MJPEG: rewrite the
    # stsd entry of a valid MJPEG fixture to 'avc1' (the flat gray frame
    # cannot contain the literal bytes 'jpeg' in its entropy stream)
    frame = encode_jpeg_gray(np.full((16, 16), 128, dtype=np.uint8))
    assert frame.count(b"jpeg") == 0
    blob = build_mjpeg_mp4([frame] * 3, width=16, height=16).replace(
        b"jpeg", b"avc1"
    )
    df = spark.createDataFrame(pd.DataFrame({"blob_id": [1], "blob": [bytearray(blob)]}))
    with pytest.raises(PythonException, match="ffmpeg"):
        sample_video_frames(df).collect()


@pytest.mark.skipif(not ffmpeg_available(), reason="ffmpeg/ffprobe not on PATH")
def test_ffmpeg_video_passthrough_matches_vendored_mjpeg_path(spark):
    """MJPEG is the interchange: both the vendored sample-table path and
    the ffmpeg select-filter path sample the same MP4; frame indices and
    geometry must agree exactly, mean_pixel within JPEG IDCT tolerance
    (ffmpeg normalizes to rgb24, so a gray source replicates to 3 channels
    with an unchanged mean). Also pins that ffmpeg's select filter reports
    ORIGINAL stream indices under every=2."""
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import sample_video_frames

    rng = np.random.default_rng(13)
    frames = [
        encode_jpeg_gray(rng.integers(0, 256, size=(16, 16), dtype=np.uint8))
        for _ in range(5)
    ]
    blob = build_mjpeg_mp4(frames, width=16, height=16)
    df = spark.createDataFrame(pd.DataFrame({"blob_id": [1], "blob": [bytearray(blob)]}))
    vendored = {
        r.frame_idx: r for r in sample_video_frames(df, every=2).collect()
    }
    external = {t[0]: t for t in ffmpeg_decode_frames(blob, every=2)}
    assert sorted(vendored) == sorted(external) == [0, 2, 4]
    for idx, row in vendored.items():
        fidx, w, h, ch, mp = external[idx]
        assert (w, h) == (row.width, row.height)
        assert (row.channels, ch) == (1, 3)  # vendored gray vs rgb24
        assert mp == pytest.approx(row.mean_pixel, abs=2.0)


@pytest.mark.skipif(not ffmpeg_available(), reason="ffmpeg/ffprobe not on PATH")
def test_ffmpeg_passthrough_matches_vendored_wav_decode():
    """WAV is the interchange: both the vendored codec and ffmpeg decode
    the same PCM16 blob, samples must agree exactly (both scale by 1/32768)."""
    rng = np.random.default_rng(7)
    samples = (rng.integers(-30000, 30000, size=(4000, 2))).astype(np.int16)
    blob = encode_wav_pcm16(samples, sample_rate=16_000)
    ours, rate_a = decode_wav(blob)
    theirs, rate_b = ffmpeg_decode_pcm(blob)
    assert rate_a == rate_b == 16_000
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.skipif(not _HAVE_PIL, reason="Pillow not installed")
def test_pil_passthrough_matches_vendored_png_decode(spark):
    """decode_images prefers Pillow when importable; on a lossless PNG the
    PIL path must reproduce the vendored decoder's pixels and metadata."""
    import pandas as pd

    from duckpipe_spark.functions.multimodal import decode_images

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    blob = encode_png(img)
    np.testing.assert_array_equal(decode_png(blob), img)

    df = spark.createDataFrame(pd.DataFrame({"blob_id": [1], "blob": [bytearray(blob)]}))
    row = decode_images(df).collect()[0]
    assert (row.width, row.height, row.channels) == (16, 24, 3)
    assert row.mean_pixel == pytest.approx(float(img.mean()))


def test_image_phash_neardup_planted_pairs(spark):
    """dHash near-dup (r11): through the REAL PNG encode->decode path, a
    pixel-level-perturbed copy (compensating +1/-1 inside each 2x2 block,
    so every block sum — and therefore the dHash — is unchanged) pairs
    with its original at Hamming 0, while structurally distinct images do
    not pair; undecodable blobs are skipped, not fatal."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import image_dhash, phash_neardup_pairs
    from duckpipe_spark.functions.png import encode_png

    rng = np.random.default_rng(7)

    def perturbed(img):
        out = img.copy()
        out[0::2, 0::2] += 1
        out[1::2, 1::2] -= 1
        return out

    a = rng.integers(1, 255, size=(16, 18)).astype(np.uint8)
    b = rng.integers(1, 255, size=(16, 18)).astype(np.uint8)
    rows = pd.DataFrame(
        {
            "blob_id": [1, 2, 3, 4, 5],
            "blob": [
                bytearray(encode_png(a)),
                bytearray(encode_png(perturbed(a))),
                bytearray(encode_png(b)),
                bytearray(encode_png(perturbed(b))),
                bytearray(b"not an image at all"),
            ],
        }
    )
    df = spark.createDataFrame(rows)
    codes = image_dhash(df)
    assert codes.count() == 4  # the garbage blob is skipped
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup_pairs(codes, max_distance=3).collect()
    }
    assert got == {(1, 2): 0, (3, 4): 0}, got


def test_audio_fingerprint_planted_pairs(spark):
    """Audio fingerprint near-dup (r11): through the REAL WAV encode->decode
    path, a frame-wise sample-reversed copy (byte-level different, per-frame
    energies unchanged) pairs with its original at Hamming 0, while distinct
    waveforms do not pair; undecodable blobs are skipped, not fatal."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import (
        audio_fingerprint,
        phash_neardup_pairs,
    )
    from duckpipe_spark.functions.wav import encode_wav_pcm16

    rng = np.random.default_rng(11)

    def reversed_frames(v):
        return v.reshape(65, -1)[:, ::-1].ravel()

    a = rng.integers(-1024, 1024, size=65 * 16).astype(np.int16)
    b = rng.integers(-1024, 1024, size=65 * 16).astype(np.int16)
    rows = pd.DataFrame(
        {
            "blob_id": [1, 2, 3, 4, 5],
            "blob": [
                bytearray(encode_wav_pcm16(a)),
                bytearray(encode_wav_pcm16(reversed_frames(a))),
                bytearray(encode_wav_pcm16(b)),
                bytearray(encode_wav_pcm16(reversed_frames(b))),
                bytearray(b"not audio"),
            ],
        }
    )
    df = spark.createDataFrame(rows)
    codes = audio_fingerprint(df)
    assert codes.count() == 4  # the garbage blob is skipped
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup_pairs(codes, max_distance=3).collect()
    }
    assert got == {(1, 2): 0, (3, 4): 0}, got


def test_audio_fingerprint_unequal_frames_and_stereo(spark):
    """The kernel's general path: a sample count NOT divisible by 65 uses
    floor boundaries + cross-multiplied energy compares, and stereo
    channels integer-sum before squaring; too-short and non-WAV blobs are
    skipped. The code must be invariant to doubling both channels'
    amplitude-preserving layout (mono vs duplicated-stereo scales every
    frame energy by 4, leaving all compare bits unchanged)."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import audio_fingerprint
    from duckpipe_spark.functions.wav import encode_wav_pcm16

    rng = np.random.default_rng(3)
    mono = rng.integers(-500, 500, size=1003).astype(np.int16)  # 1003 % 65 != 0
    stereo = np.stack([mono, mono], axis=1)
    rows = pd.DataFrame(
        {
            "blob_id": [1, 2, 3],
            "blob": [
                bytearray(encode_wav_pcm16(mono)),
                bytearray(encode_wav_pcm16(stereo)),
                bytearray(encode_wav_pcm16(np.zeros(10, dtype=np.int16))),  # < 65
            ],
        }
    )
    out = {r.blob_id: (r.h0, r.h1) for r in audio_fingerprint(spark.createDataFrame(rows)).collect()}
    assert set(out) == {1, 2}
    assert out[1] == out[2], out


def test_video_fingerprint_planted_pairs(spark):
    """Video fingerprint near-dup (r11): through the REAL JPEG-encode ->
    MP4-mux -> sample-table-walk -> decode path, a per-frame
    quadrant-perturbed copy (byte-level different, frame sums unchanged,
    exact at q95 because every 8x8 DCT block stays constant) pairs with
    its original at Hamming 0, while a distinct brightness walk does not;
    non-video blobs are skipped, not fatal."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import (
        phash_neardup_pairs,
        video_fingerprint,
    )

    rng = np.random.default_rng(5)

    def video(gs, perturb=False):
        frames = []
        for g in gs:
            img = np.full((16, 16), g, np.uint8)
            if perturb:
                img[:8, :8] += 1
                img[:8, 8:] -= 1
                img[8:, :8] -= 1
                img[8:, 8:] += 1
            frames.append(encode_jpeg_gray(img, quality=95))
        return build_mjpeg_mp4(frames, fps=4)

    a = rng.integers(1, 255, size=65)
    b = rng.integers(1, 255, size=65)
    rows = pd.DataFrame(
        {
            "blob_id": [1, 2, 3, 4, 5],
            "blob": [
                bytearray(video(a)),
                bytearray(video(a, perturb=True)),
                bytearray(video(b)),
                bytearray(video(b, perturb=True)),
                bytearray(b"not a video"),
            ],
        }
    )
    codes = video_fingerprint(spark.createDataFrame(rows))
    assert codes.count() == 4  # the garbage blob is skipped
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup_pairs(codes, max_distance=3).collect()
    }
    assert got == {(1, 2): 0, (3, 4): 0}, got


def test_video_fingerprint_segment_resample(spark):
    """The segment-resample contract: a 130-frame video sampled every=2
    yields the same code as the 65-frame video of its even frames, and a
    video with fewer than 65 sampled frames is skipped."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import video_fingerprint

    rng = np.random.default_rng(9)
    gs = rng.integers(1, 255, size=130)

    def mux(values):
        return build_mjpeg_mp4(
            [encode_jpeg_gray(np.full((16, 16), g, np.uint8), quality=95) for g in values],
            fps=4,
        )

    long = spark.createDataFrame(
        pd.DataFrame({"blob_id": [1], "blob": [bytearray(mux(gs))]})
    )
    short = spark.createDataFrame(
        pd.DataFrame({"blob_id": [1], "blob": [bytearray(mux(gs[0::2]))]})
    )
    tiny = spark.createDataFrame(
        pd.DataFrame({"blob_id": [1], "blob": [bytearray(mux(gs[:10]))]})
    )
    a = video_fingerprint(long, every=2).collect()
    b = video_fingerprint(short, every=1).collect()
    assert (a[0].h0, a[0].h1) == (b[0].h0, b[0].h1)
    assert video_fingerprint(tiny).count() == 0


def test_fingerprint_kernels_skip_null_blobs(spark):
    """ADVICE r11 item 3: the phash_probe_static serving path feeds these
    kernels arriving crawl data where NULL blobs are plausible — a None
    blob must be SKIPPED (the documented best-effort semantics), not raise
    TypeError from bytes(None) and kill the whole job."""
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

    rng = np.random.default_rng(11)
    schema = "blob_id bigint, blob binary"

    png = encode_png(rng.integers(1, 255, size=(16, 18)).astype(np.uint8))
    img_df = spark.createDataFrame(
        pd.DataFrame({"blob_id": [1, 2], "blob": [bytearray(png), None]}), schema
    )
    assert image_dhash(img_df).count() == 1

    pcm = (rng.standard_normal((4000, 1)) * 6000).astype(np.int16)
    wav = encode_wav_pcm16(pcm, sample_rate=8000)
    aud_df = spark.createDataFrame(
        pd.DataFrame({"blob_id": [1, 2], "blob": [bytearray(wav), None]}), schema
    )
    assert audio_fingerprint(aud_df).count() == 1

    frames = [
        encode_jpeg_gray(np.full((16, 16), 1 + (j * 37) % 254, np.uint8), quality=95)
        for j in range(65)
    ]
    mp4 = build_mjpeg_mp4(frames, fps=4)
    vid_df = spark.createDataFrame(
        pd.DataFrame({"blob_id": [1, 2], "blob": [bytearray(mp4), None]}), schema
    )
    assert video_fingerprint(vid_df).count() == 1


def test_fingerprint_invariant_across_pcm_and_g711(spark):
    """Cross-codec invariance (r12): the SAME audio content stored as
    16-bit PCM, G.711 mu-law, or G.711 A-law must produce IDENTICAL
    fingerprints — the point of perceptual fingerprinting over byte-level
    dedup. Sample values are pre-projected onto each codec's expansion
    grid, so every container decodes to exactly the same integers."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import audio_fingerprint
    from duckpipe_spark.functions.wav import (
        alaw_decode,
        alaw_encode,
        encode_wav_alaw,
        encode_wav_mulaw,
        encode_wav_pcm16,
        mulaw_decode,
        mulaw_encode,
    )

    rng = np.random.default_rng(17)
    raw = rng.integers(-30000, 30000, 65 * 16).astype(np.int16)
    # grid-project per codec: decode(encode(v)) is idempotent, so the
    # PCM16 container of the projected values decodes bit-identically to
    # the compressed container of the same content
    vm = mulaw_decode(mulaw_encode(raw))
    va = alaw_decode(alaw_encode(raw))
    rows = pd.DataFrame(
        {
            "blob_id": [1, 2, 3, 4],
            "blob": [
                bytearray(encode_wav_pcm16(vm, 8_000)),
                bytearray(encode_wav_mulaw(vm, 8_000)),
                bytearray(encode_wav_pcm16(va, 8_000)),
                bytearray(encode_wav_alaw(va, 8_000)),
            ],
        }
    )
    got = {
        r.blob_id: (r.h0, r.h1)
        for r in audio_fingerprint(
            spark.createDataFrame(rows, "blob_id bigint, blob binary")
        ).collect()
    }
    assert got[1] == got[2]  # PCM == mu-law container, same content
    assert got[3] == got[4]  # PCM == A-law container, same content


def test_fingerprint_invariant_across_adpcm_reencode(spark):
    """Cross-codec invariance for the PREDICTIVE codec (r13): ADPCM is
    lossy WITH state, so (unlike G.711) no input projection makes the
    PCM container of the ORIGINAL samples match — the invariance that
    does hold, and the one production re-encoding produces, is between
    the ADPCM blob and a PCM16 blob of its RECONSTRUCTION (both decode
    to the identical 16-bit-grid integers). For SMOOTH audio — the
    signal class adaptive prediction is built for — a PCM16 blob of the
    original samples must also stay CLOSE in Hamming (perceptual
    robustness through a lossy re-encode); white noise is the honest
    counter-case (the predictor cannot track it) and only carries the
    exact reconstruction invariance, which is asserted on noise too."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import audio_fingerprint
    from duckpipe_spark.functions.wav import (
        adpcm_decode,
        adpcm_encode_mono,
        encode_wav_adpcm,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(29)
    noise = rng.integers(-30000, 30000, 65 * 16).astype(np.int16)
    t = np.arange(65 * 16, dtype=np.float64)
    smooth = np.rint(
        12000.0 * np.sin(t * 0.041) + 6000.0 * np.sin(t * 0.013 + 1.0)
    ).astype(np.int16)
    spb, block = 505, 256

    def reencode(raw):
        return adpcm_decode(
            adpcm_encode_mono(raw, spb), 1, block, spb, total_samples=len(raw)
        ).ravel()

    rows = pd.DataFrame(
        {
            "blob_id": [1, 2, 3, 4, 5],
            "blob": [
                bytearray(encode_wav_adpcm(smooth, 8_000, spb)),
                bytearray(encode_wav_pcm16(reencode(smooth), 8_000)),
                bytearray(encode_wav_pcm16(smooth, 8_000)),
                bytearray(encode_wav_adpcm(noise, 8_000, spb)),
                bytearray(encode_wav_pcm16(reencode(noise), 8_000)),
            ],
        }
    )
    got = {
        r.blob_id: (r.h0, r.h1)
        for r in audio_fingerprint(
            spark.createDataFrame(rows, "blob_id bigint, blob binary")
        ).collect()
    }
    assert got[1] == got[2]  # ADPCM blob == PCM16 of its reconstruction
    assert got[4] == got[5]  # ... and on noise too (exact invariance)
    ham = bin((got[1][0] ^ got[3][0]) | (got[1][1] ^ got[3][1]) << 32).count("1")
    assert ham <= 3  # smooth audio: lossy re-encode stays a near-dup


def test_fingerprint_invariant_across_msadpcm_reencode(spark):
    """MS ADPCM twin of the IMA invariance pin: the MS ADPCM blob and a
    PCM16 blob of its reconstruction fingerprint IDENTICALLY (both
    decode to the same 16-bit-grid integers), on smooth AND noise
    content."""
    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.multimodal import audio_fingerprint
    from duckpipe_spark.functions.wav import (
        encode_wav_msadpcm,
        encode_wav_pcm16,
        msadpcm_decode,
        msadpcm_encode_mono,
    )

    rng = np.random.default_rng(31)
    noise = rng.integers(-30000, 30000, 65 * 16).astype(np.int16)
    t = np.arange(65 * 16, dtype=np.float64)
    smooth = np.rint(
        12000.0 * np.sin(t * 0.041) + 6000.0 * np.sin(t * 0.013 + 1.0)
    ).astype(np.int16)
    spb, block = 500, 7 + (500 - 2) // 2

    def reencode(raw):
        return msadpcm_decode(
            msadpcm_encode_mono(raw, spb), 1, block, spb, total_samples=len(raw)
        ).ravel()

    rows = pd.DataFrame(
        {
            "blob_id": [1, 2, 3, 4],
            "blob": [
                bytearray(encode_wav_msadpcm(smooth, 8_000, spb)),
                bytearray(encode_wav_pcm16(reencode(smooth), 8_000)),
                bytearray(encode_wav_msadpcm(noise, 8_000, spb)),
                bytearray(encode_wav_pcm16(reencode(noise), 8_000)),
            ],
        }
    )
    got = {
        r.blob_id: (r.h0, r.h1)
        for r in audio_fingerprint(
            spark.createDataFrame(rows, "blob_id bigint, blob binary")
        ).collect()
    }
    assert got[1] == got[2]
    assert got[3] == got[4]
