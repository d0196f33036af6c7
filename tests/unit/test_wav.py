"""Pure-stdlib PCM WAV codec tests: round-trips, chunk alignment,
corruption, feature extraction."""

import struct

import numpy as np
import pytest

from maestro_ray.ops.wav import decode_wav, encode_wav, wav_features


@pytest.mark.parametrize("dtype,ch", [
    (np.int16, 1), (np.int16, 2), (np.uint8, 1), (np.int32, 2),
])
def test_roundtrip_exact(dtype, ch):
    rng = np.random.default_rng(3)
    info = np.iinfo(dtype)
    samples = rng.integers(info.min, int(info.max) + 1, size=(123, ch),
                           dtype=np.int64).astype(dtype)
    out, rate = decode_wav(encode_wav(samples, sample_rate=8000))
    assert rate == 8000
    assert out.shape == (123, ch) and out.dtype == dtype
    assert np.array_equal(out, samples)


def test_mono_1d_input_and_odd_chunk_alignment():
    # odd data length (8-bit, odd sample count) exercises the RIFF
    # word-alignment rule when another chunk follows
    samples = np.arange(7, dtype=np.uint8)
    wav = encode_wav(samples, sample_rate=4000)
    # append a trailing LIST chunk after data; decoder must still work
    out, rate = decode_wav(wav + b"LIST" + struct.pack("<I", 4) + b"INFO")
    assert np.array_equal(out[:, 0], samples)


def test_unknown_chunks_skipped():
    samples = np.array([[100, -100]], dtype=np.int16)
    wav = encode_wav(samples, 44100)
    # inject a junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    injected = wav[:fmt_end] + b"junk" + struct.pack("<I", 6) + b"abcdef" + wav[fmt_end:]
    out, rate = decode_wav(injected)
    assert rate == 44100 and np.array_equal(out, samples)


def test_corruption_and_unsupported_raise():
    wav = encode_wav(np.zeros(4, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + wav)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-3])
    # float format tag (3) rejected
    bad = bytearray(wav)
    bad[20] = 3
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="dtype"):
        encode_wav(np.zeros(4, dtype=np.float32), 8000)


def test_features_known_values():
    # full-scale square wave: rms == peak == 1.0 (int16 min is -32768,
    # use +/-32767 to keep symmetry exact at 6dp rounding)
    sq = np.tile(np.array([32767, -32767], dtype=np.int16), 50)
    f = wav_features(encode_wav(sq, sample_rate=100))
    assert f["n_samples"] == 100 and f["sample_rate"] == 100
    assert f["channels"] == 1 and f["duration_sec"] == 1.0
    assert abs(f["rms"] - 32767 / 32768) < 1e-6
    assert abs(f["peak"] - 32767 / 32768) < 1e-6
    silent = wav_features(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    assert silent["rms"] == 0.0 and silent["peak"] == 0.0


def test_audio_features_stage():
    import pyarrow as pa

    from maestro_ray.ops.multimodal import AudioFeatures, make_wav_clip

    blobs = [make_wav_clip(320, 16000, 2, seed=1), None, b"not audio"]
    t = pa.table({
        "clip_id": pa.array(range(3), pa.int64()),
        "audio": pa.array(blobs, pa.binary()),
    })
    out = AudioFeatures()(t)
    assert out.column("n_samples").to_pylist() == [320, None, None]
    assert out.column("channels").to_pylist() == [2, None, None]
    assert out.column("duration_sec").to_pylist()[0] == 0.02


# ------------------------------------------------------------- spectrogram


def test_spectrogram_pure_tone_lands_in_its_band():
    from maestro_ray.ops.wav import encode_wav, wav_spectrogram

    rate, n = 8000, 4000
    t = np.arange(n) / rate
    for freq in (200.0, 1700.0, 2600.0, 3900.0):
        tone = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
        blob = encode_wav(tone.reshape(-1, 1), rate)
        f = wav_spectrogram(blob, n_fft=256, hop=128, n_bands=8)
        # the op's own band rule: rfft bin (129 bins over 0..rate/2)
        # folded by (bin * n_bands) // n_bins
        bin_i = int(round(freq * 256 / rate))
        want_band = min((bin_i * 8) // 129, 7)
        assert f["dominant_band"] == want_band, freq
        assert len(f["bands"]) == 8


def test_spectrogram_deterministic_and_short_clip_null():
    from maestro_ray.ops.multimodal import make_wav_clip
    from maestro_ray.ops.wav import encode_wav, wav_spectrogram

    blob = make_wav_clip(1600, 8000, 2, seed=7)
    a = wav_spectrogram(blob)
    b = wav_spectrogram(blob)
    assert a == b
    tiny = encode_wav(np.zeros((10, 1), dtype=np.int16), 8000)
    f = wav_spectrogram(tiny, n_fft=256)
    assert f["bands"] is None and f["dominant_band"] is None


def test_spectrogram_centroid_tracks_energy():
    from maestro_ray.ops.wav import encode_wav, wav_spectrogram

    rate, n = 8000, 4000
    t = np.arange(n) / rate
    lo = (np.sin(2 * np.pi * 200.0 * t) * 20000).astype(np.int16)
    hi = (np.sin(2 * np.pi * 3900.0 * t) * 20000).astype(np.int16)
    f_lo = wav_spectrogram(encode_wav(lo.reshape(-1, 1), rate))
    f_hi = wav_spectrogram(encode_wav(hi.reshape(-1, 1), rate))
    # linear-power weighting: a pure tone's centroid sits at its band
    # (the log-weighted version put a band-0 tone at 4.85 — review #3)
    assert f_lo["spectral_centroid"] < 0.5
    assert f_hi["spectral_centroid"] > 6.5
