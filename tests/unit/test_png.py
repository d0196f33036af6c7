"""Pure-stdlib PNG codec tests: round-trips, every filter type against
a naive per-pixel reference, corruption detection, resize."""

import struct
import zlib

import numpy as np
import pytest

from maestro_ray.ops.png import (
    _MAGIC,
    _chunk,
    decode_png,
    encode_png,
    resize_nearest,
)


@pytest.mark.parametrize("shape", [(7, 5), (4, 9, 3), (3, 3, 4), (1, 1), (2, 1, 3)])
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(hash(shape) % (2**32))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)


def _encode_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filter ftypes[y] — exercises
    decode paths our encoder (filter 0 only) never emits. Filtering is
    the forward transform from the spec, per-pixel."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for y in range(h):
        f = ftypes[y]
        raw.append(f)
        prior = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            cur = int(flat[y][x])
            left = int(flat[y][x - ch]) if x >= ch else 0
            up = int(prior[x])
            ul = int(prior[x - ch]) if x >= ch else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - left
            elif f == 2:
                v = cur - up
            elif f == 3:
                v = cur - ((left + up) >> 1)
            else:  # paeth
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (up if pb <= pc else ul)
                v = cur - pred
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_all_filter_types_decode(ch):
    rng = np.random.default_rng(ch)
    shape = (6, 4) if ch == 1 else (6, 4, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    # rows cycle through every filter type, incl. row 0 with Up/Paeth
    # (prior row = zeros per spec)
    for ftypes in ([0, 1, 2, 3, 4, 1], [4, 3, 2, 1, 0, 4], [2, 2, 2, 2, 2, 2]):
        data = _encode_with_filters(img, ftypes)
        out = decode_png(data)
        assert np.array_equal(out, img), f"filters {ftypes}"


def test_multiple_idat_chunks_and_ancillary_skip():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    full = encode_png(img)
    # split the IDAT payload into two chunks + insert an ancillary chunk
    ihdr_end = len(_MAGIC) + 12 + 13
    (ilen,) = struct.unpack(">I", full[ihdr_end : ihdr_end + 4])
    idat = full[ihdr_end + 8 : ihdr_end + 8 + ilen]
    rebuilt = (
        full[:ihdr_end]
        + _chunk(b"tEXt", b"comment\x00hi")
        + _chunk(b"IDAT", idat[: len(idat) // 2])
        + _chunk(b"IDAT", idat[len(idat) // 2 :])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(rebuilt), img)


def test_corruption_and_unsupported_raise():
    img = np.zeros((2, 2), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    # cut past IEND into IDAT's CRC so the IDAT chunk itself is short
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-14])
    # 16-bit depth header
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    deep = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="depth"):
        decode_png(deep)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    inter = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(inter)
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2), dtype=np.int32))


def test_crc_valid_corrupt_deflate_raises_valueerror():
    """A chunk whose CRC is RIGHT but whose payload is not a valid
    deflate stream must raise ValueError, not leak zlib.error — the
    quarantine contract for stage handlers (ADVICE r2)."""
    img = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png(img)
    # locate IDAT, replace payload with garbage, recompute CRC
    pos = good.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", good[pos : pos + 4])
    garbage = b"\xde\xad\xbe\xef" * (length // 4 + 1)
    garbage = garbage[:length]
    rebuilt = (
        good[:pos] + _chunk(b"IDAT", garbage)
        + good[pos + 12 + length:]
    )
    with pytest.raises(ValueError, match="malformed PNG"):
        decode_png(rebuilt)
    # truncated-but-CRC-valid deflate: half the IDAT bytes, re-CRC'd
    half = good[pos + 8 : pos + 8 + length // 2]
    rebuilt2 = good[:pos] + _chunk(b"IDAT", half) + good[pos + 12 + length:]
    with pytest.raises(ValueError):
        decode_png(rebuilt2)


def test_resize_nearest_known_values():
    img = np.array([[0, 10], [20, 30]], dtype=np.uint8)
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4)
    assert up[0, 0] == 0 and up[0, 3] == 10 and up[3, 0] == 20 and up[3, 3] == 30
    down = resize_nearest(up, 2, 2)
    assert np.array_equal(down, img)
