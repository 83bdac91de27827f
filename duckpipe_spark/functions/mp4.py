"""Minimal pure-python MP4/ISO-BMFF *metadata* parser (stdlib ``struct``).

Fourth vendored media parser (after png/jpeg/wav): walks the ISO base
media file format box structure (ISO/IEC 14496-12, the public spec whose
box layout also appears in Apple's QuickTime File Format documentation)
and extracts the container-level metadata a curation pipeline wants
BEFORE any codec runs — brand, duration, timescale, per-track type and
dimensions. Sample DECODE (H.264 etc.) stays behind the external-codec
plug point in `functions/multimodal.py`; this makes the video column's
metadata pass real the same way `with_blob_metadata` is real for bytes.

Box layout: [uint32 size][fourcc type][payload]; size==1 → 64-bit
largesize follows; size==0 → box extends to EOF. Container boxes
(moov/trak/mdia/minf/stbl) nest children directly.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {btype!r} (size {size})")
        yield btype, pos + header, pos + size
        pos += size


def parse_mp4_metadata(data: bytes) -> dict:
    """→ {brand, duration_s, timescale, n_tracks, tracks: [{type, width,
    height}]}. Raises ValueError when the blob is not ISO-BMFF or the
    required moov/mvhd boxes are absent/malformed."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 blob (no ftyp)")
    out: dict = {"brand": data[8:12].decode("latin1"), "duration_s": None,
                 "timescale": None, "n_tracks": 0, "tracks": []}

    def walk(start: int, end: int) -> None:
        for btype, body, bend in _boxes(data, start, end):
            if btype in _CONTAINERS:
                if btype == b"trak":
                    # tkhd precedes mdia/hdlr inside trak: open the track
                    # record here so both fill the same entry
                    out["n_tracks"] += 1
                    out["tracks"].append({"type": None, "width": None, "height": None})
                walk(body, bend)
            elif btype == b"mvhd":
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, body + 12)
                out["timescale"] = ts
                out["duration_s"] = dur / ts if ts else None
            elif btype == b"hdlr":
                handler = data[body + 8 : body + 12].decode("latin1")
                if out["tracks"]:
                    out["tracks"][-1]["type"] = handler
            elif btype == b"tkhd":
                ver = data[body]
                # ver/flags + times + track_id + reserved + duration = 24
                # (v0) / 36 (v1); then reserved/layer/volume/matrix = 52
                off = body + (36 if ver == 1 else 24) + 52
                if off + 8 <= bend:
                    w, h = struct.unpack_from(">II", data, off)
                    # 16.16 fixed point
                    if out["tracks"]:
                        out["tracks"][-1]["width"] = w >> 16
                        out["tracks"][-1]["height"] = h >> 16

    walk(0, len(data))
    if out["timescale"] is None:
        raise ValueError("no mvhd box — not a playable MP4")
    return out


def build_minimal_mp4(
    duration_s: float,
    timescale: int = 1000,
    tracks: tuple[tuple[str, int, int], ...] = (("vide", 640, 480),),
    brand: bytes = b"isom",
) -> bytes:
    """Synthesize a structurally-valid (ftyp + moov/mvhd/trak...) MP4 shell
    with NO media data — the deterministic fixture generator for the oracle
    round trip, same role as `encode_jpeg_gray`/`encode_wav_pcm16`."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    dur = int(round(duration_s * timescale))
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,  # rate/volume/matrix/predefines/next_track_id
    )
    trak_boxes = b""
    for handler, w, h in tracks:
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", 1)  # track id
            + b"\x00" * 4
            + struct.pack(">I", dur)
            + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = box(
            b"hdlr",
            b"\x00\x00\x00\x00" + b"\x00" * 4 + handler.encode("latin1") + b"\x00" * 13,
        )
        mdia = box(b"mdia", hdlr)
        trak_boxes += box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak_boxes)
    return ftyp + moov


# --- sample tables (stbl): the part of ISO 14496-12 a frame sampler needs ---


def parse_video_sample_table(data: bytes) -> dict:
    """Locate the first video track's sample table and resolve every
    sample to its byte extent → {"codec": fourcc str, "samples":
    [(offset, size), ...]}.

    Implements the standard stbl resolution (ISO/IEC 14496-12 §8.5-8.7):
    ``stsz`` gives per-sample sizes, ``stco`` gives chunk offsets,
    ``stsc`` maps samples onto chunks as runs of (first_chunk,
    samples_per_chunk) entries, and a sample's offset is its chunk's
    offset plus the sizes of the samples before it in that chunk. Raises
    ValueError when no video track carries a complete table."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 blob (no ftyp)")
    tracks: list[dict] = []

    def walk(start: int, end: int) -> None:
        for btype, body, bend in _boxes(data, start, end):
            if btype in _CONTAINERS:
                if btype == b"trak":
                    tracks.append({})
                walk(body, bend)
            elif not tracks:
                continue
            elif btype == b"hdlr":
                tracks[-1]["handler"] = data[body + 8 : body + 12]
            elif btype == b"stsd":
                (n,) = struct.unpack_from(">I", data, body + 4)
                if n >= 1:
                    tracks[-1]["codec"] = data[body + 12 : body + 16]
            elif btype == b"stsz":
                fixed, n = struct.unpack_from(">II", data, body + 4)
                if n > len(data):
                    # every sample lives inside this file, so a count
                    # beyond the byte length is garbage — reject before
                    # the fixed-size path materializes an n-entry list
                    raise ValueError(f"stsz sample count {n} exceeds file size")
                if fixed:
                    tracks[-1]["sizes"] = [fixed] * n
                else:
                    tracks[-1]["sizes"] = list(
                        struct.unpack_from(f">{n}I", data, body + 12)
                    )
            elif btype == b"stco":
                (n,) = struct.unpack_from(">I", data, body + 4)
                tracks[-1]["chunks"] = list(struct.unpack_from(f">{n}I", data, body + 8))
            elif btype == b"co64":
                (n,) = struct.unpack_from(">I", data, body + 4)
                tracks[-1]["chunks"] = list(struct.unpack_from(f">{n}Q", data, body + 8))
            elif btype == b"stsc":
                (n,) = struct.unpack_from(">I", data, body + 4)
                tracks[-1]["stsc"] = [
                    struct.unpack_from(">III", data, body + 8 + 12 * i) for i in range(n)
                ]

    walk(0, len(data))
    for t in tracks:
        if t.get("handler") == b"vide" and all(
            k in t for k in ("codec", "sizes", "chunks", "stsc")
        ):
            break
    else:
        raise ValueError("no video track with a complete sample table")

    sizes, chunks, stsc = t["sizes"], t["chunks"], t["stsc"]
    samples: list[tuple[int, int]] = []
    si = 0
    for ei, (first, spc, _sdi) in enumerate(stsc):
        # this stsc entry covers chunks [first, next_first) — the last
        # entry runs to the end of the chunk list. first_chunk is 1-based
        # per ISO 14496-12 §8.7.4; 0 would alias chunks[-1] below.
        if first < 1 or not chunks:
            raise ValueError("invalid stsc first_chunk")
        last = stsc[ei + 1][0] if ei + 1 < len(stsc) else len(chunks) + 1
        for ci in range(first, last):
            if ci > len(chunks) or si >= len(sizes):
                break
            off = chunks[ci - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                samples.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si != len(sizes):
        raise ValueError("stsc/stco do not cover every stsz sample")
    return {"codec": t["codec"].decode("latin1"), "samples": samples}


def build_mjpeg_mp4(
    frames: list[bytes],
    fps: int = 10,
    width: int = 16,
    height: int = 16,
) -> bytes:
    """Synthesize a structurally-valid Motion-JPEG MP4: real ``mdat``
    carrying the JPEG sample bytes and a complete video sample table
    (stsd 'jpeg' + stts/stsc/stsz/stco) — the deterministic fixture
    generator for the frame-sampling oracle, and a genuine (if ancient)
    codec layout: MJPEG is just one baseline JPEG per sample, which is
    exactly what the vendored `functions.jpeg` decoder reads."""
    if not frames:
        raise ValueError("MJPEG needs at least one frame")

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat_payload = b"".join(frames)
    mdat = box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # first sample starts after the mdat header
    n = len(frames)
    dur = n  # stts delta 1 tick per frame at `fps` ticks/second

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", fps, dur)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
    # VisualSampleEntry ('jpeg' — the QuickTime MJPEG fourcc): 6 reserved
    # + data_ref_index, then the 70-byte visual fields
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count per sample
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = box(
        b"stsd",
        b"\x00" * 4
        + struct.pack(">I", 1)
        + box(b"jpeg", entry)[:4]  # size prefix
        + b"jpeg"
        + entry,
    )
    stts = box(b"stts", b"\x00" * 4 + struct.pack(">III", 1, n, 1))
    stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">IIII", 1, 1, n, 1))
    stsz = box(
        b"stsz",
        b"\x00" * 4
        + struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *[len(f) for f in frames]),
    )
    stco = box(b"stco", b"\x00" * 4 + struct.pack(">II", 1, chunk_offset))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    mdhd = box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, fps, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
