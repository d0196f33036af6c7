"""Pure-stdlib PCM WAV codec (struct + numpy) — the real audio kernel
behind the multimodal stages.

RIFF/WAVE container with integer PCM (format tag 1): 8/16/32-bit,
any channel count / sample rate. Like ``ops/png.py`` this exists
because no audio library ships in the container but the format's
critical path is pure byte work. Float/ADPCM/extensible formats raise
``ValueError``; unknown chunks are skipped per the RIFF spec.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode PCM samples — (n,) mono or (n, channels) — as a WAV file.
    dtype must be uint8 (8-bit convention), int16 or int32."""
    a = np.asarray(samples)
    if a.dtype not in (np.uint8, np.int16, np.int32):
        raise ValueError(f"unsupported dtype {a.dtype} (uint8/int16/int32)")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"unsupported shape {samples.shape}")
    n, ch = a.shape
    bits = a.dtype.itemsize * 8
    block_align = ch * bits // 8
    byte_rate = sample_rate * block_align
    data = a.astype(a.dtype, copy=False).tobytes()  # interleaved LE
    pad = b"\x00" if len(data) & 1 else b""  # RIFF chunks are word-aligned
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, bits)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data) + len(pad))
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV → ((n, channels) array, sample_rate).

    Contract: EVERY malformed input raises ``ValueError`` (struct
    failures included), so quarantine handlers need catch only one
    type."""
    try:
        return _decode_wav_impl(data)
    except struct.error as e:
        raise ValueError(f"malformed WAV: {e}") from e


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("decode_wav expects bytes")
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"unsupported WAV format tag {audio_fmt} (PCM only)")
    if bits not in _DTYPES:
        raise ValueError(f"unsupported bit depth {bits}")
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    arr = np.frombuffer(pcm, dtype=_DTYPES[bits])
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), rate


def wav_features(data: bytes) -> dict:
    """Deterministic per-clip features: duration, rate, channels, RMS,
    peak — normalized to [-1, 1] regardless of bit depth."""
    samples, rate = decode_wav(data)
    if samples.dtype == np.uint8:
        x = (samples.astype(np.float64) - 128.0) / 128.0
    else:
        x = samples.astype(np.float64) / float(2 ** (samples.dtype.itemsize * 8 - 1))
    return {
        "sample_rate": int(rate),
        "channels": int(samples.shape[1]),
        "n_samples": int(samples.shape[0]),
        "duration_sec": round(samples.shape[0] / rate, 6) if rate else None,
        "rms": round(float(np.sqrt((x**2).mean())) if x.size else 0.0, 6),
        "peak": round(float(np.abs(x).max()) if x.size else 0.0, 6),
    }


def wav_spectrogram(
    data: bytes,
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 8,
) -> dict:
    """Deterministic STFT band-energy summary of a PCM WAV clip — the
    classic audio fingerprint/embedding front-end: Hann-windowed frames
    (length ``n_fft``, stride ``hop``) → |rFFT|² power → the spectrum
    folded into ``n_bands`` equal frequency bands, averaged over
    frames, log10-compressed. Mono mixdown first (channel mean). Pure
    numpy (rFFT is deterministic for a fixed input), no per-sample
    Python. Returns band energies plus the dominant-band index and the
    spectral centroid (a band-weighted mean) — scalars a downstream
    filter can threshold. Clips shorter than one frame yield None
    bands (quarantine-not-crash)."""
    samples, rate = decode_wav(data)
    if samples.dtype == np.uint8:
        x = (samples.astype(np.float64) - 128.0) / 128.0
    else:
        x = samples.astype(np.float64) / float(
            2 ** (samples.dtype.itemsize * 8 - 1))
    mono = x.mean(axis=1)
    n = len(mono)
    if n < n_fft:
        return {"bands": None, "dominant_band": None,
                "spectral_centroid": None}
    n_frames = 1 + (n - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = mono[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # frames × bins
    bins = power.shape[1]
    band_id = np.minimum((np.arange(bins) * n_bands) // bins,
                         n_bands - 1)
    band_power = np.zeros(n_bands)
    np.add.at(band_power, band_id, power.mean(axis=0))
    bands = np.log10(band_power + 1e-12)
    # centroid weights are the LINEAR band powers: weighting by the
    # mixed-sign log energies points away from the actual energy (a
    # pure band-0 tone centroided at 4.85/8 — review r4 s6 #3) and
    # near-cancelling logs blow the ratio up
    total = band_power.sum()
    centroid = float((band_power * np.arange(n_bands)).sum() / total) \
        if total > 0 else 0.0
    return {
        "bands": [round(float(b), 6) for b in bands],
        "dominant_band": int(np.argmax(band_power)),
        "spectral_centroid": round(centroid, 6),
    }
