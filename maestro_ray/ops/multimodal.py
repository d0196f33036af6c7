"""Multimodal column stages (SURVEY.md training-data ops).

Images / audio / video are opaque ``binary`` columns with typed
metadata columns alongside. Decode / feature-extract / resize /
frame-sample are ACTOR-POOL ``map_batches`` stages: codec/model setup
happens once per actor in ``__init__``; batches stay Arrow (pandas
mangles binary — ray_guide pitfalls).

IMAGE kernels are REAL: ``ops/png.py`` is a pure-stdlib (zlib + numpy)
PNG codec — decode with full filter support, CRC verification,
nearest-neighbor resize, per-channel feature extraction. Construct the
stages with ``fake=False`` (PNG mode). ``fake=True`` keeps the legacy
8-byte-header toy protocol for the plumbing-only tests.

AUDIO is real (``ops/wav.py`` PCM decode). VIDEO demux is real:
``VideoMeta`` shallow-demuxes MP4 boxes, and ``FrameSample(fake=False)``
extracts every-nth video SAMPLE's bytes via the stsz/stsc/stco tables
(ops/mp4.py:extract_samples) — the layer pyav's demuxer implements.
Only pixel DECODE of compressed samples (h264 …) stays gated on a
codec library being absent from this container.

Batch-size guidance: binary payloads dominate block size; callers
should pass small ``batch_size`` (e.g. 64 for ~1 MB images) and let
``target_max_block_size`` govern block splits.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.png import decode_png, encode_png, resize_nearest

IMAGE_META = pa.schema(
    [("width", pa.int32()), ("height", pa.int32()), ("n_bytes", pa.int64())]
)


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image payload: 8-byte header + seeded body."""
    rng = np.random.default_rng((seed, width, height))
    body = rng.integers(0, 256, size=min(width * height, 4096), dtype=np.uint8)
    return struct.pack(">II", width, height) + body.tobytes()


def make_png_image(width: int, height: int, seed: int = 0,
                   channels: int = 3) -> bytes:
    """Deterministic REAL PNG payload (seeded pixels, valid file)."""
    rng = np.random.default_rng((seed, width, height, channels))
    shape = (height, width) if channels == 1 else (height, width, channels)
    return encode_png(rng.integers(0, 256, size=shape, dtype=np.uint8))


class ImageDecode:
    """Decode stage: binary → (width, height, n_bytes) metadata columns.

    ``fake=False`` (PNG mode): real decode via ops/png.py — dimensions
    come from actually decompressing and unfiltering the pixel data, and
    undecodable blobs yield null dims (quarantine-style). ``fake=True``:
    the legacy toy header protocol.
    """

    def __init__(self, img_col: str = "image", fake: bool = True):
        self.img_col = img_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, ns = [], [], []
        for blob in batch.column(self.img_col).to_pylist():
            if self.fake:
                if blob is None or len(blob) < 8:
                    ws.append(None), hs.append(None), ns.append(0)
                    continue
                w, h = struct.unpack(">II", blob[:8])
                ws.append(w), hs.append(h), ns.append(len(blob))
            else:
                if blob is None:
                    ws.append(None), hs.append(None), ns.append(0)
                    continue
                try:
                    img = decode_png(blob)
                except ValueError:
                    ws.append(None), hs.append(None), ns.append(len(blob))
                    continue
                ws.append(img.shape[1]), hs.append(img.shape[0])
                ns.append(len(blob))
        return (
            batch.append_column("width", pa.array(ws, pa.int32()))
            .append_column("height", pa.array(hs, pa.int32()))
            .append_column("n_bytes", pa.array(ns, pa.int64()))
        )


class ImageResize:
    """Resize stage, aspect-preserving to ``max_side``.

    ``fake=False`` (PNG mode): real decode → nearest-neighbor resample →
    re-encode (ops/png.py). ``fake=True``: header-only toy rewrite."""

    def __init__(self, max_side: int = 256, img_col: str = "image", fake: bool = True):
        self.max_side, self.img_col = max_side, img_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch.column(self.img_col).to_pylist():
            if self.fake:
                if blob is None or len(blob) < 8:
                    out.append(blob)
                    continue
                w, h = struct.unpack(">II", blob[:8])
                scale = min(1.0, self.max_side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out.append(struct.pack(">II", nw, nh) + blob[8:])
            else:
                if blob is None:
                    out.append(None)
                    continue
                try:
                    img = decode_png(blob)
                except ValueError:
                    out.append(blob)  # pass through undecodable payloads
                    continue
                h, w = img.shape[:2]
                scale = min(1.0, self.max_side / max(w, h, 1))
                if scale >= 1.0:
                    out.append(blob)
                    continue
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out.append(encode_png(resize_nearest(img, nw, nh)))
        i = batch.schema.get_field_index(self.img_col)
        return batch.set_column(i, self.img_col, pa.array(out, pa.binary()))


class ImageFeatures:
    """Real feature-extraction stage (PNG mode only): per-image mean /
    std luminance from decoded pixels — the shape a CLIP-style embedder
    slots into (decode → normalize → model), with the model swapped for
    deterministic statistics since no ML runtime ships here."""

    def __init__(self, img_col: str = "image"):
        self.img_col = img_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for blob in batch.column(self.img_col).to_pylist():
            if blob is None:
                means.append(None), stds.append(None)
                continue
            try:
                img = decode_png(blob)
            except ValueError:
                means.append(None), stds.append(None)
                continue
            # ITU-R 601 luma for color, identity for gray; alpha ignored
            if img.ndim == 2:
                lum = img.astype(np.float64)
            else:
                rgb = img[:, :, :3].astype(np.float64)
                lum = rgb @ np.array([0.299, 0.587, 0.114])
            means.append(round(float(lum.mean()), 4))
            stds.append(round(float(lum.std()), 4))
        return (
            batch.append_column("lum_mean", pa.array(means, pa.float64()))
            .append_column("lum_std", pa.array(stds, pa.float64()))
        )


def make_wav_clip(n_samples: int, sample_rate: int = 16_000,
                  channels: int = 1, seed: int = 0) -> bytes:
    """Deterministic REAL PCM WAV payload (seeded int16 noise)."""
    from maestro_ray.ops.wav import encode_wav

    rng = np.random.default_rng((seed, n_samples, sample_rate, channels))
    samples = rng.integers(-32768, 32768, size=(n_samples, channels),
                           dtype=np.int64).astype(np.int16)
    return encode_wav(samples, sample_rate)


class AudioFeatures:
    """Real audio feature-extraction stage: PCM WAV decode via
    ops/wav.py (pure stdlib), per-clip duration / rate / channels /
    RMS / peak. Undecodable blobs yield nulls (quarantine-style)."""

    def __init__(self, audio_col: str = "audio"):
        self.audio_col = audio_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from maestro_ray.ops.wav import wav_features

        cols: dict[str, list] = {
            k: [] for k in (
                "sample_rate", "channels", "n_samples", "duration_sec",
                "rms", "peak",
            )
        }
        for blob in batch.column(self.audio_col).to_pylist():
            try:
                f = wav_features(blob) if blob is not None else None
            except ValueError:
                f = None
            for k in cols:
                cols[k].append(None if f is None else f[k])
        out = batch
        for k, typ in (
            ("sample_rate", pa.int32()), ("channels", pa.int32()),
            ("n_samples", pa.int64()), ("duration_sec", pa.float64()),
            ("rms", pa.float64()), ("peak", pa.float64()),
        ):
            out = out.append_column(k, pa.array(cols[k], typ))
        return out


class VideoMeta:
    """Real video-metadata stage: shallow MP4 demux via ops/mp4.py
    (pure stdlib box parsing) — duration, track count, per-type codec
    fourccs. Filtering/routing on container metadata is the common
    100 TB pre-pass; actual frame decode stays behind ``FrameSample``'s
    documented pyav call site."""

    def __init__(self, video_col: str = "video"):
        self.video_col = video_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from maestro_ray.ops.mp4 import parse_mp4

        durs, ntracks, vcodec, acodec = [], [], [], []
        for blob in batch.column(self.video_col).to_pylist():
            try:
                meta = parse_mp4(blob) if blob is not None else None
            except ValueError:
                meta = None
            if meta is None:
                durs.append(None), ntracks.append(None)
                vcodec.append(None), acodec.append(None)
                continue
            durs.append(meta["duration_sec"])
            ntracks.append(meta["n_tracks"])
            by_handler = {t["handler"]: t["codec"] for t in meta["tracks"]}
            vcodec.append(by_handler.get("vide"))
            acodec.append(by_handler.get("soun"))
        return (
            batch.append_column("duration_sec", pa.array(durs, pa.float64()))
            .append_column("n_tracks", pa.array(ntracks, pa.int32()))
            .append_column("video_codec", pa.array(vcodec, pa.string()))
            .append_column("audio_codec", pa.array(acodec, pa.string()))
        )


class FrameSample:
    """Video frame-sampling stage: one row per sampled frame — a
    flat_map-shaped batch op (more rows out than in), emitting
    (id cols…, frame_idx, frame binary).

    ``fake=False`` (MP4 mode, REAL since r3): demux via the pure-stdlib
    sample tables (ops/mp4.py:extract_samples — stsz/stsc/stco walking,
    the same layer pyav's demuxer implements), one row per every_n-th
    video SAMPLE with its raw bytes. Pixel DECODE of the extracted
    samples (h264 …) genuinely requires a codec library absent from
    this sandbox and is the one remaining gated step; undecodable /
    sample-table-less blobs quarantine to zero rows. ``fake=True``
    keeps the legacy fixed-size-frame toy protocol for plumbing tests.
    """

    def __init__(self, every_n: int = 10, video_col: str = "video",
                 frame_bytes: int = 1024, fake: bool = True):
        self.every_n, self.video_col, self.frame_bytes = every_n, video_col, frame_bytes
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        from maestro_ray.ops.mp4 import extract_samples

        keep_cols = [c for c in batch.column_names if c != self.video_col]
        parents, idxs, frames = [], [], []
        vids = batch.column(self.video_col).to_pylist()
        for i, blob in enumerate(vids):
            if blob is None:
                continue
            if self.fake:
                body = blob[8:]
                n_frames = len(body) // self.frame_bytes
                for f in range(0, n_frames, self.every_n):
                    parents.append(i)
                    idxs.append(f)
                    frames.append(
                        body[f * self.frame_bytes : (f + 1) * self.frame_bytes]
                    )
                continue
            try:
                samples = extract_samples(blob, every_n=self.every_n)
            except ValueError:
                continue  # quarantine: malformed container -> no rows
            for f, raw in samples:
                parents.append(i)
                idxs.append(f)
                frames.append(raw)
        take = pa.array(parents, pa.int64())
        cols = [batch.column(c).take(take) for c in keep_cols]
        cols.append(pa.array(idxs, pa.int32()))
        cols.append(pa.array(frames, pa.binary()))
        return pa.Table.from_arrays(cols, names=keep_cols + ["frame_idx", "frame"])


def decode_images(ds: rd.Dataset, img_col: str = "image",
                  concurrency: int = 4, batch_size: int = 64,
                  fake: bool = True) -> rd.Dataset:
    """Actor-pool wiring for the decode stage (small batches: binary
    payloads dominate memory). ``fake=False`` = real PNG decode."""
    return ds.map_batches(
        ImageDecode, fn_constructor_kwargs={"img_col": img_col, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


class AudioSpectrogram:
    """Audio spectral-feature stage (actor pool — FFT plan/window setup
    happens once per actor): STFT band energies via ops/wav.py
    wav_spectrogram. Undecodable/too-short clips yield nulls."""

    def __init__(self, audio_col: str = "audio", n_fft: int = 256,
                 hop: int = 128, n_bands: int = 8):
        self.audio_col = audio_col
        self.n_fft, self.hop, self.n_bands = n_fft, hop, n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from maestro_ray.ops.wav import wav_spectrogram

        bands, dom, cent = [], [], []
        for blob in batch.column(self.audio_col).to_pylist():
            try:
                f = wav_spectrogram(blob, self.n_fft, self.hop,
                                    self.n_bands) \
                    if blob is not None else None
            except ValueError:
                f = None
            bands.append(None if f is None else f["bands"])
            dom.append(None if f is None else f["dominant_band"])
            cent.append(None if f is None else f["spectral_centroid"])
        return (batch
                .append_column("bands",
                               pa.array(bands, pa.list_(pa.float64())))
                .append_column("dominant_band", pa.array(dom, pa.int32()))
                .append_column("spectral_centroid",
                               pa.array(cent, pa.float64())))
