"""Pure-Python baseline JPEG codec (ops/jpeg.py, r4 — the MJPEG half
of VERDICT #7). The fast matrix IDCT is pinned against a literal
O(N^4) textbook IDCT (independent code path); encode→decode round
trips bound pixel error; 4:2:0, restart markers and the MJPEG MP4
path are exercised end-to-end."""

import numpy as np
import pytest

from maestro_ray.ops.jpeg import _C, decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // max(1, w - 1),
        yy * 255 // max(1, h - 1),
        (xx + yy) * 255 // max(1, h + w - 2),
    ], axis=-1).astype(np.uint8)


def test_idct_matches_textbook_definition():
    """The matrix IDCT (C.T @ F @ C) vs the literal 4-nested-loop
    spec-formula IDCT — different code, same math."""
    rng = np.random.default_rng(1)
    F = rng.normal(0, 50, (8, 8))
    fast = _C.T @ F @ _C

    def alpha(u):
        return 1 / np.sqrt(2) if u == 0 else 1.0

    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (alpha(u) * alpha(v) * F[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            slow[x, y] = s / 4
    assert np.abs(fast - slow).max() < 1e-10


def test_roundtrip_flat_exact():
    flat = np.full((16, 24, 3), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=90)),
                          flat)


@pytest.mark.parametrize("subsample,bound", [("444", 4), ("420", 14)])
def test_roundtrip_gradient_bounded(subsample, bound):
    img = _gradient(37, 29)  # non-multiple-of-MCU dims
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


def test_roundtrip_noise_q100_tight():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(np.ascontiguousarray(img), 100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_restart_markers():
    img = _gradient(32, 48)
    blob = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    out = decode_jpeg(blob)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 5


def test_non_baseline_rejected():
    img = _gradient(8, 8)
    blob = bytearray(encode_jpeg(img, 90))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")


def test_mjpeg_through_mp4_container():
    """Full multimodal path: JPEG frames in an MP4 MJPEG track —
    demux (stsz/stsc/stco) → codec gate → pixels, bounded error."""
    from maestro_ray.ops.mp4 import (
        decode_frame,
        encode_minimal_mp4,
        extract_samples,
    )

    frames = [_gradient(16, 24) for _ in range(3)]
    blob = encode_minimal_mp4(
        1.0, tracks=[("vide", "mjpg")],
        frames=[encode_jpeg(f, 95) for f in frames])
    got = extract_samples(blob, every_n=1)
    assert len(got) == 3
    for i, raw in got:
        img = decode_frame(raw, "mjpg")
        assert img.shape == (16, 24, 3)
        assert np.abs(img.astype(int)
                      - frames[i].astype(int)).max() <= 4


def test_fill_bytes_before_markers_accepted():
    """ITU-T T.81 B.1.1.2: 0xFF fill bytes may precede any marker —
    some camera MJPEG encoders emit them; the decoder must skip them."""
    rgb = np.full((16, 16, 3), 128, np.uint8)
    data = encode_jpeg(rgb, quality=90)
    # inject fill bytes before every marker after SOI (split on FF
    # followed by a real marker code, excluding stuffed FF00 and RSTn)
    out = bytearray(data[:2])
    i = 2
    while i < len(data):
        if (data[i] == 0xFF and i + 1 < len(data)
                and data[i + 1] not in (0x00,)
                and not (0xD0 <= data[i + 1] <= 0xD7)):
            out += b"\xff\xff\xff"  # three fill bytes
        out.append(data[i])
        i += 1
    got = decode_jpeg(bytes(out))
    ref = decode_jpeg(data)
    assert np.array_equal(got, ref)
