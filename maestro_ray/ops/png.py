"""Pure-stdlib PNG codec (zlib + numpy) — the REAL image kernel behind
the multimodal stages.

The container has no PIL/pillow, but PNG's critical path needs nothing
beyond ``zlib`` (stdlib) and numpy: chunk framing with CRC-32, IHDR,
one-or-more IDAT, IEND, and the five scanline filters. This implements
the full non-interlaced 8-bit critical subset:

- color types: 0 (grayscale), 2 (RGB), 6 (RGBA)
- bit depth 8, interlace 0
- all five filter types on decode (None/Sub/Up/Average/Paeth);
  encode emits filter 0 (None) rows
- CRC verified on every chunk; truncated/corrupt data raises

Out of scope (raises ``ValueError``): palette images, 1/2/4/16-bit
depths, interlaced (Adam7), ancillary-chunk semantics (they are
skipped, as the spec allows).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a uint8 array — (H, W) gray, (H, W, 3) RGB or (H, W, 4)
    RGBA — as a valid PNG (filter 0 scanlines)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"uint8 required, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w, ch = a.shape
    color_type = _COLOR_TYPE[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the PNG scanline filters. ``raw`` is (h, 1 + w*ch)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].copy()
        prior = out[y - 1] if y else zero_prior
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x - ch]
            # per-channel prefix sum mod 256 — vectorized
            cols = line.reshape(w, ch).astype(np.uint32)
            out[y] = np.cumsum(cols, axis=0).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[y] = line + prior  # uint8 wraps mod 256
        elif ftype == 3:  # Average — sequential in x
            rec = out[y]
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — sequential in x
            rec = out[y]
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                up = int(prior[x])
                ul = int(prior[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to a uint8 array — (H, W) for grayscale, (H, W, C)
    otherwise. CRCs are verified; unsupported features raise.

    Contract: EVERY malformed input raises ``ValueError`` — including
    zlib/struct failures from inside (e.g. a CRC-valid chunk carrying a
    truncated deflate stream), so quarantine handlers need catch only
    one type and a single bad blob can never kill a pipeline stage.
    """
    try:
        return _decode_png_impl(data)
    except (zlib.error, struct.error) as e:
        raise ValueError(f"malformed PNG: {e}") from e


def _decode_png_impl(data: bytes) -> np.ndarray:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_png expects bytes")
    data = bytes(data)
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_MAGIC)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated chunk {tag!r}")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in chunk {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        # ancillary chunks skipped per spec
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type} (0/2/6)")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    expect = h * (1 + w * ch)
    if len(raw) != expect:
        raise ValueError(f"IDAT size {len(raw)} != expected {expect}")
    out = _unfilter(raw.reshape(h, 1 + w * ch), h, w, ch)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, library-free)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(new_h) * h) // max(new_h, 1), h - 1)
    xs = np.minimum((np.arange(new_w) * w) // max(new_w, 1), w - 1)
    return img[ys][:, xs]
