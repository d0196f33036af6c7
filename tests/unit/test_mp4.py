"""MP4 shallow-demux tests: box walking, version layouts, corruption."""

import struct

import pyarrow as pa
import pytest

from maestro_ray.ops.mp4 import _box, encode_minimal_mp4, parse_mp4


def test_roundtrip_metadata():
    data = encode_minimal_mp4(12.5, timescale=1000)
    meta = parse_mp4(data)
    assert meta["brand"] == "isom"
    assert meta["duration_sec"] == 12.5
    assert meta["n_tracks"] == 2
    handlers = {t["handler"]: t for t in meta["tracks"]}
    assert handlers["vide"]["codec"] == "avc1"
    assert handlers["soun"]["codec"] == "mp4a"
    assert handlers["vide"]["duration_sec"] == 12.5


def test_version1_mvhd_and_largesize_box():
    # hand-build a v1 mvhd (64-bit times) inside a largesize moov
    timescale, dur = 600, 9000  # 15 s
    mvhd_payload = (
        b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 0, 0, timescale, dur)
        + b"\x00" * 80
    )
    mvhd = _box(b"mvhd", mvhd_payload)
    moov_inner = mvhd
    largesize_moov = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(moov_inner))
        + moov_inner
    )
    data = _box(b"ftyp", b"isom\x00\x00\x00\x00") + largesize_moov
    meta = parse_mp4(data)
    assert meta["duration_sec"] == 15.0
    assert meta["timescale"] == 600
    assert meta["n_tracks"] == 0


def test_unknown_boxes_skipped_and_errors():
    data = (
        _box(b"free", b"\x00" * 10)
        + encode_minimal_mp4(2.0, tracks=[("vide", "vp09")])
        + _box(b"mdat", b"\xff" * 32)
    )
    meta = parse_mp4(data)
    assert meta["n_tracks"] == 1 and meta["tracks"][0]["codec"] == "vp09"
    with pytest.raises(ValueError, match="moov"):
        parse_mp4(_box(b"ftyp", b"isom\x00\x00\x00\x00"))
    with pytest.raises(ValueError, match="bad box size"):
        parse_mp4(struct.pack(">I", 5) + b"ftypX")  # size < header
    truncated = encode_minimal_mp4(1.0)[:-7]
    with pytest.raises(ValueError, match="bad box size|truncated"):
        parse_mp4(truncated)


def test_sample_extraction_roundtrip():
    """Frames written through the sample tables come back byte-equal,
    in order, with every_n sampling."""
    from maestro_ray.ops.mp4 import extract_samples

    frames = [bytes([k]) * (10 + 3 * k) for k in range(7)]
    data = encode_minimal_mp4(2.0, frames=frames)
    # metadata path untouched by the added tables
    meta = parse_mp4(data)
    assert meta["duration_sec"] == 2.0 and meta["n_tracks"] == 2
    got = extract_samples(data, every_n=1)
    assert [i for i, _ in got] == list(range(7))
    assert [b for _, b in got] == frames
    every3 = extract_samples(data, every_n=3)
    assert [i for i, _ in every3] == [0, 3, 6]
    assert [b for _, b in every3] == [frames[0], frames[3], frames[6]]
    # metadata-only file (no sample tables): empty, not an error
    assert extract_samples(encode_minimal_mp4(1.0)) == []
    # truncated mdat: a sample past EOF must raise ValueError
    with pytest.raises(ValueError, match="past end|malformed|bad box size"):
        extract_samples(data[:-5], every_n=1)


def test_sample_tables_corrupt_counts_raise_not_oom():
    """A corrupt stsz claiming 2^32-1 fixed-size samples must raise
    ValueError BEFORE any allocation — one bad blob may quarantine but
    never OOM a worker (review r3)."""
    from maestro_ray.ops.mp4 import extract_samples

    good = encode_minimal_mp4(1.0, frames=[b"x" * 16, b"y" * 16])
    pos = good.index(b"stsz") + 4  # payload: ver/flags(4) size(4) count(4)
    corrupt = bytearray(good)
    # fixed sample_size=1, count=0xFFFFFFFF
    corrupt[pos + 4 : pos + 12] = struct.pack(">II", 1, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="stsz"):
        extract_samples(bytes(corrupt))
    # variable-size stsz whose count overruns its own box
    corrupt2 = bytearray(good)
    corrupt2[pos + 4 : pos + 12] = struct.pack(">II", 0, 1_000_000)
    with pytest.raises(ValueError, match="stsz"):
        extract_samples(bytes(corrupt2))
    # the quarantine path in FrameSample survives both
    import pyarrow as _pa

    from maestro_ray.ops.multimodal import FrameSample

    t = _pa.table({
        "vid_id": _pa.array([0, 1], _pa.int64()),
        "video": _pa.array([bytes(corrupt), good], _pa.binary()),
    })
    out = FrameSample(every_n=1, fake=False)(t)
    assert out.column("vid_id").to_pylist() == [1, 1]


def test_frame_sample_stage_real_mp4():
    from maestro_ray.ops.multimodal import FrameSample

    frames_a = [b"A" * 20, b"B" * 30, b"C" * 40]
    blobs = [
        encode_minimal_mp4(1.0, frames=frames_a),
        None,
        b"not an mp4",                 # malformed: quarantined, 0 rows
        encode_minimal_mp4(1.0),       # metadata-only: 0 rows
    ]
    t = pa.table({
        "vid_id": pa.array(range(4), pa.int64()),
        "video": pa.array(blobs, pa.binary()),
    })
    out = FrameSample(every_n=2, fake=False)(t)
    assert out.column("vid_id").to_pylist() == [0, 0]
    assert out.column("frame_idx").to_pylist() == [0, 2]
    assert out.column("frame").to_pylist() == [frames_a[0], frames_a[2]]


def test_short_payload_box_raises_valueerror():
    """A well-framed box whose payload is too short for its version's
    struct layout (e.g. a 12-byte mvhd) must raise ValueError, not leak
    struct.error — the quarantine contract (ADVICE r2)."""
    short_mvhd = _box(b"mvhd", b"\x00" * 12)  # v0 needs >= 20 bytes
    data = _box(b"ftyp", b"isom\x00\x00\x00\x00") + _box(b"moov", short_mvhd)
    with pytest.raises(ValueError, match="malformed MP4"):
        parse_mp4(data)


def test_video_meta_stage():
    from maestro_ray.ops.multimodal import VideoMeta

    blobs = [
        encode_minimal_mp4(3.25),
        None,
        b"RIFFnot an mp4 container at all",
        # quarantine: well-framed but short mvhd must yield nulls,
        # not kill the stage
        _box(b"ftyp", b"isom\x00\x00\x00\x00")
        + _box(b"moov", _box(b"mvhd", b"\x00" * 12)),
    ]
    t = pa.table({
        "vid_id": pa.array(range(4), pa.int64()),
        "video": pa.array(blobs, pa.binary()),
    })
    out = VideoMeta()(t)
    assert out.column("duration_sec").to_pylist() == [3.25, None, None, None]
    assert out.column("n_tracks").to_pylist() == [2, None, None, None]
    assert out.column("video_codec").to_pylist() == ["avc1", None, None, None]
    assert out.column("audio_codec").to_pylist() == ["mp4a", None, None, None]


def test_decode_rawvideo_layout_and_gate():
    """r4: rawvideo RGB24 pixel decode is REAL (layout-sensitive) and
    the codec gate fails loudly for compressed codecs."""
    import numpy as np
    import pytest

    from maestro_ray.ops.mp4 import decode_frame, decode_rawvideo

    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    out = decode_rawvideo(img.tobytes(), width=4, height=3)
    assert np.array_equal(out, img)
    assert out[1, 2, 0] == img[1, 2, 0]  # row-major, interleaved RGB
    with pytest.raises(ValueError, match="exactly"):
        decode_rawvideo(img.tobytes()[:-1], width=4, height=3)
    with pytest.raises(NotImplementedError, match="codec library"):
        decode_frame(b"\x00" * 100, "avc1")
    with pytest.raises(ValueError, match="width and height"):
        decode_frame(img.tobytes(), "raw ")


def test_rawvideo_roundtrip_through_container():
    """Synthesize → demux → decode: pixels survive the full path."""
    import numpy as np

    from maestro_ray.ops.mp4 import (
        decode_frame,
        encode_minimal_mp4,
        extract_samples,
    )

    frames = [
        (np.arange(16 * 8 * 3, dtype=np.uint8) + k).reshape(8, 16, 3)
        for k in range(4)
    ]
    blob = encode_minimal_mp4(
        1.0, tracks=[("vide", "raw ")],
        frames=[f.tobytes() for f in frames])
    got = extract_samples(blob, every_n=1)
    assert [i for i, _ in got] == [0, 1, 2, 3]
    for i, raw in got:
        assert np.array_equal(decode_frame(raw, "raw ", 16, 8), frames[i])
