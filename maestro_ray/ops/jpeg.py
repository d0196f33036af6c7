"""Pure-Python baseline JPEG codec (r3 VERDICT #7 — the MJPEG half).

Decoder: baseline sequential DCT (SOF0), arbitrary DHT/DQT tables read
from the stream (canonical Huffman construction — Annex-K standard
tables and custom tables both work), 4:4:4 and 4:2:0 chroma sampling,
restart markers, byte-stuffing. Entropy decode is a per-symbol Python
loop (inherent to Huffman); the DCT/dequant/color math is batched
numpy over all blocks at once. Progressive (SOF2), arithmetic coding,
12-bit precision and exotic sampling factors fail LOUDLY.

Encoder (fixture/round-trip grade): baseline DCT with libjpeg-formula
quality scaling, 4:4:4 or 4:2:0, emitting its OWN canonical Huffman
tables in DHT (all-DC-length-4 / all-AC-length-9 — valid canonical
codes, no reserved all-ones codeword), so the decoder exercises the
same generic table path a real camera MJPEG stream uses.

Used by ops/mp4.decode_frame for MJPEG-fourcc video samples: container
demux → JPEG sample → pixels is end-to-end real without pyav.

Correctness evidence (tests/unit/test_jpeg.py): the fast matrix IDCT
is pinned against a literal O(N^4) textbook IDCT; encode→decode
round-trips bound max pixel error at high quality; flat fields
reconstruct exactly; 4:2:0 and restart-marker paths round-trip.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

#: Annex-K base quantization tables (these ARE needed verbatim — they
#: parameterize quality, they're data not code)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: F = C @ f @ C.T."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K base tables."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ------------------------------------------------------------- huffman


def _canonical_codes(counts: list[int], symbols: list[int]
                     ) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by JPEG's canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecode:
    """(length, code) → symbol lookup from a DHT segment."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        for sym, (code, length) in _canonical_codes(counts,
                                                    symbols).items():
            self.lut[(length, code)] = sym


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with JPEG
    byte-stuffing (0xFF 0x00 → 0xFF) and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST: caller resyncs via .restart()
                raise _RestartPending()
            else:  # EOI or another marker: pad with 1s (spec behavior)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Skip the pending RST marker and realign to a byte."""
        self.acc = 0
        self.n = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartPending(Exception):
    pass


def _decode_symbol(r: _BitReader, table: _HuffDecode) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: Huffman code longer than 16 bits")


def _extend(v: int, size: int) -> int:
    """JPEG signed-amplitude decode."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ------------------------------------------------------------- decoder


def decode_jpeg(data: bytes):
    """Baseline-JPEG bytes → (height, width, 3) uint8 RGB array (or
    (h, w) for grayscale). Raises ValueError on malformed streams and
    NotImplementedError on non-baseline features, loudly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecode] = {}
    huff_ac: dict[int, _HuffDecode] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # ITU-T T.81 B.1.1.2: any number of 0xFF fill bytes may precede
        # a marker code (some camera MJPEG encoders emit them)
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(
                    seg[i + 1:i + 65], np.uint8).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                syms = list(seg[i + 17:i + 17 + total])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecode(
                    counts, syms)
                i += 17 + total
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0) is supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            return _decode_scan(data, pos + seglen, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF0")
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["hdc"], c["hac"] = huff_dc[s["dc"]], huff_ac[s["ac"]]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    sampling = sorted((c["h"], c["v"]) for c in comps)
    if not (all(s == (1, 1) for s in sampling)
            or (len(comps) == 3 and sampling == [(1, 1), (1, 1), (2, 2)])):
        raise NotImplementedError(
            f"sampling factors {sampling}: 4:4:4 / 4:2:0 / grayscale "
            "only")
    h, w = frame["h"], frame["w"]
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    r = _BitReader(data, pos)
    # per component: list of zigzag coefficient blocks in MCU order
    blocks = {c["id"]: [] for c in comps}
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.restart()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in comps:
                for _b in range(c["h"] * c["v"]):
                    coeffs = np.zeros(64, np.int64)
                    while True:
                        try:
                            sym = _decode_symbol(r, c["hdc"])
                            diff = _extend(r.bits(sym), sym)
                            pred[c["id"]] += diff
                            coeffs[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                sym = _decode_symbol(r, c["hac"])
                                if sym == 0x00:  # EOB
                                    break
                                run, size = sym >> 4, sym & 0xF
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    raise ValueError(
                                        "AC run past block end")
                                coeffs[k] = _extend(r.bits(size), size)
                                k += 1
                            break
                        except _RestartPending:
                            r.restart()
                            pred = {cc["id"]: 0 for cc in comps}
                            coeffs[:] = 0
                    blocks[c["id"]].append(coeffs)
    # batched dequant + IDCT + reassembly per component
    planes = {}
    for c in comps:
        bl = np.stack(blocks[c["id"]])  # (nblocks, 64) zigzag order
        # DQT payloads are zigzag too: dequantize in zigzag space,
        # then reorder to natural row-major for the IDCT
        deq = (bl * qt[c["tq"]])[:, UNZIGZAG].reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _C.T, deq.astype(np.float64),
                        _C)
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        # blocks per MCU for this component
        cw, cv = c["h"], c["v"]
        pw, ph = 8 * cw * mcus_x, 8 * cv * mcus_y
        plane = np.empty((ph, pw), np.uint8)
        bi = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(cv):
                    for bx in range(cw):
                        plane[(my * cv + by) * 8:(my * cv + by + 1) * 8,
                              (mx * cw + bx) * 8:(mx * cw + bx + 1) * 8
                              ] = pix[bi]
                        bi += 1
        # upsample to full resolution (sample replication)
        ry, rx = vmax // cv, hmax // cw
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[c["id"]] = plane[:h, :w]
    if len(comps) == 1:
        return planes[comps[0]["id"]]
    y = planes[comps[0]["id"]].astype(np.float64)
    cb = planes[comps[1]["id"]].astype(np.float64) - 128.0
    cr = planes[comps[2]["id"]].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


#: encoder table shapes: DC = 12 symbols at code length 4, AC = all
#: 162 symbols at code length 9 — valid canonical codes (no all-ones)
_DC_SYMS = list(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_COUNTS = [0] * 8 + [162] + [0] * 7
_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMS)


def _encode_block(w: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """One quantized zigzag block → bitstream; returns the new DC."""
    dc = int(coeffs[0])
    diff = dc - pred
    cat = _size_cat(diff)
    code, length = _DC_CODES[cat]
    w.write(code, length)
    if cat:
        bits = diff if diff >= 0 else diff + (1 << cat) - 1
        w.write(bits & ((1 << cat) - 1), cat)
    last = 63
    while last > 0 and coeffs[last] == 0:
        last -= 1
    k = 1
    while k <= last:
        run = 0
        while coeffs[k] == 0:
            run += 1
            k += 1
        while run >= 16:
            code, length = _AC_CODES[0xF0]
            w.write(code, length)
            run -= 16
        v = int(coeffs[k])
        cat = _size_cat(v)
        code, length = _AC_CODES[(run << 4) | cat]
        w.write(code, length)
        bits = v if v >= 0 else v + (1 << cat) - 1
        w.write(bits & ((1 << cat) - 1), cat)
        k += 1
    if last < 63:
        code, length = _AC_CODES[0x00]
        w.write(code, length)
    return dc


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (n, 8, 8) in raster block order; H, W multiples of 8."""
    ph, pw = plane.shape
    return (plane.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(rgb: np.ndarray, quality: int = 90,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JPEG bytes (4:4:4 or 4:2:0),
    emitting canonical custom Huffman tables in DHT. Fixture-grade:
    exists so the decoder (and MJPEG pipelines) can be tested offline;
    not a speed-optimized encoder."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample={subsample!r}: '444' or '420'")
    h, w = rgb.shape[:2]
    ql, qc = _quality_tables(quality)
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    two = subsample == "420"
    mw, mh = (16, 16) if two else (8, 8)
    pw, ph = -(-w // mw) * mw, -(-h // mh) * mh

    def pad(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    if two:  # chroma = 2x2 box average
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    def quantized(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        bl = _blockify(plane) - 128.0
        f = np.einsum("ij,njk,kl->nil", _C, bl, _C.T)
        qz = np.round(f / q.reshape(8, 8)).astype(np.int64)
        return qz.reshape(-1, 64)[:, ZIGZAG]

    qy = quantized(y, ql)
    qcb = quantized(cb, qc)
    qcr = quantized(cr, qc)

    # ---- headers
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(payload) + 2) + payload)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    hv_y = 0x22 if two else 0x11
    seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for tc_th, counts, syms in ((0x00, _DC_COUNTS, _DC_SYMS),
                                (0x10, _AC_COUNTS, _AC_SYMS),
                                (0x01, _DC_COUNTS, _DC_SYMS),
                                (0x11, _AC_COUNTS, _AC_SYMS)):
        seg(0xC4, bytes([tc_th]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    # ---- entropy-coded data, MCU-interleaved
    bw = _BitWriter()
    mcus_x, mcus_y = pw // mw, ph // mh
    yw = pw // 8  # luma blocks per row
    pred = {"y": 0, "cb": 0, "cr": 0}
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out_rst = bw.out
                out_rst.extend(b"\xff" + bytes([0xD0 + (rst & 7)]))
                rst += 1
                pred = {"y": 0, "cb": 0, "cr": 0}
            mcu_count += 1
            if two:
                for by in range(2):
                    for bx in range(2):
                        bi = (my * 2 + by) * yw + (mx * 2 + bx)
                        pred["y"] = _encode_block(bw, qy[bi], pred["y"])
                cw = pw // 2 // 8
                ci = my * cw + mx
                pred["cb"] = _encode_block(bw, qcb[ci], pred["cb"])
                pred["cr"] = _encode_block(bw, qcr[ci], pred["cr"])
            else:
                bi = my * yw + mx
                pred["y"] = _encode_block(bw, qy[bi], pred["y"])
                pred["cb"] = _encode_block(bw, qcb[bi], pred["cb"])
                pred["cr"] = _encode_block(bw, qcr[bi], pred["cr"])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
