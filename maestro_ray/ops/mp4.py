"""Pure-stdlib MP4/ISO-BMFF box parser (struct only) — shallow demux.

Video DECODE genuinely needs codec libraries (absent here), but the
container metadata a pipeline filters/routes on — duration, track
count, handler types, codec fourccs — is pure box-tree byte work:
``[size:4 BE][type:4][payload]`` with nesting, 64-bit largesize, and
version-dependent mvhd/mdhd layouts. This parses that critical subset
and a matching minimal encoder exists for deterministic fixtures.

Out of scope (and honestly so): sample tables, frame extraction,
codec payloads — ``FrameSample`` documents the pyav call site.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box {btype!r}")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + header, pos + size
        pos += size


def _parse_mvhd(data: bytes, s: int, e: int) -> tuple[int, int]:
    version = data[s]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", data[s + 20 : s + 32])
    else:
        timescale, duration = struct.unpack(">II", data[s + 12 : s + 20])
    return timescale, duration


def _parse_mdhd(data: bytes, s: int, e: int) -> tuple[int, int]:
    version = data[s]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", data[s + 20 : s + 32])
    else:
        timescale, duration = struct.unpack(">II", data[s + 12 : s + 20])
    return timescale, duration


def parse_mp4(data: bytes) -> dict:
    """Shallow-demux an MP4: global duration + per-track metadata.

    Returns ``{"brand", "timescale", "duration_sec", "n_tracks",
    "tracks": [{"handler", "codec", "duration_sec"}, ...]}``.
    Raises ``ValueError`` on ANY malformed input — box-structure
    errors AND struct failures from well-framed boxes with short
    payloads (e.g. a 12-byte mvhd), so quarantine handlers need catch
    only one type.
    """
    try:
        return _parse_mp4_impl(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed MP4: {e}") from e


def _parse_mp4_impl(data: bytes) -> dict:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("parse_mp4 expects bytes")
    data = bytes(data)
    brand = None
    timescale = duration = None
    tracks: list[dict] = []
    found_moov = False
    for btype, s, e in _walk(data, 0, len(data)):
        if btype == b"ftyp":
            brand = data[s : s + 4].decode("latin-1")
        elif btype == b"moov":
            found_moov = True
            for t2, s2, e2 in _walk(data, s, e):
                if t2 == b"mvhd":
                    timescale, duration = _parse_mvhd(data, s2, e2)
                elif t2 == b"trak":
                    tracks.append(_parse_trak(data, s2, e2))
    if not found_moov:
        raise ValueError("missing moov box (not a progressive MP4?)")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_sec": (
            round(duration / timescale, 6) if timescale else None
        ),
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


def _parse_trak(data: bytes, s: int, e: int) -> dict:
    handler = codec = None
    tscale = tdur = None
    for btype, s2, e2 in _walk(data, s, e):
        if btype == b"mdia":
            for t3, s3, e3 in _walk(data, s2, e2):
                if t3 == b"mdhd":
                    tscale, tdur = _parse_mdhd(data, s3, e3)
                elif t3 == b"hdlr":
                    handler = data[s3 + 8 : s3 + 12].decode("latin-1")
                elif t3 == b"minf":
                    for t4, s4, e4 in _walk(data, s3, e3):
                        if t4 == b"stbl":
                            for t5, s5, e5 in _walk(data, s4, e4):
                                if t5 == b"stsd" and e5 - s5 >= 16:
                                    # fullbox(4) + entry_count(4) + first
                                    # entry: size(4) + fourcc(4)
                                    codec = data[s5 + 12 : s5 + 16].decode(
                                        "latin-1"
                                    )
    return {
        "handler": handler,
        "codec": codec,
        "duration_sec": (
            round(tdur / tscale, 6) if tscale else None
        ),
    }


# ------------------------------------------------ minimal fixture encoder


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_minimal_mp4(
    duration_sec: float,
    timescale: int = 1000,
    tracks: list[tuple[str, str]] = (("vide", "avc1"), ("soun", "mp4a")),
    brand: str = "isom",
) -> bytes:
    """Build a structurally valid minimal MP4 (ftyp + moov tree with
    mvhd/trak/mdia/mdhd/hdlr/minf/stbl/stsd) — enough for any shallow
    demuxer; carries no media samples."""
    dur = int(round(duration_sec * timescale))
    ftyp = _box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0))
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, dur)
        + b"\x00" * 80,
    )
    traks = b""
    for handler, codec in tracks:
        stsd = _box(
            b"stsd",
            b"\x00\x00\x00\x00" + struct.pack(">I", 1)
            + struct.pack(">I", 16) + codec.encode("latin-1") + b"\x00" * 8,
        )
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        hdlr = _box(
            b"hdlr",
            b"\x00\x00\x00\x00" + b"\x00" * 4 + handler.encode("latin-1")
            + b"\x00" * 12,
        )
        mdhd = _box(
            b"mdhd",
            b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, timescale, dur)
            + b"\x00" * 4,
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _box(b"tkhd", b"\x00\x00\x00\x0f" + b"\x00" * 80)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov
