"""Multimodal stage plumbing tests (decode stubs, real Ray wiring)."""

import pyarrow as pa
import pytest

from maestro_ray.ops.multimodal import (
    FrameSample,
    ImageDecode,
    ImageResize,
    decode_images,
    make_fake_image,
)


def _images_table():
    return pa.table({
        "img_id": pa.array([0, 1, 2], pa.int64()),
        "image": pa.array(
            [make_fake_image(640, 480, 0), make_fake_image(100, 2000, 1), None],
            pa.binary(),
        ),
    })


def test_decode_metadata():
    out = ImageDecode(img_col="image")(_images_table())
    assert out.column("width").to_pylist() == [640, 100, None]
    assert out.column("height").to_pylist() == [480, 2000, None]
    assert out.column("n_bytes").to_pylist()[2] == 0


def test_resize_preserves_aspect():
    out = ImageResize(max_side=256, img_col="image")(_images_table())
    meta = ImageDecode(img_col="image")(out)
    assert meta.column("width").to_pylist()[0] == 256
    assert meta.column("height").to_pylist()[0] == 192
    assert meta.column("height").to_pylist()[1] == 256
    assert meta.column("width").to_pylist()[1] == 12


def test_corrupt_deflate_png_quarantined_not_fatal():
    """A CRC-valid PNG carrying a corrupt deflate stream must yield
    nulls through every image stage (ADVICE r2: zlib.error used to
    escape the ValueError-only handlers and kill the task)."""
    import struct as _struct
    import zlib as _zlib

    from maestro_ray.ops.multimodal import ImageFeatures, make_png_image

    good = make_png_image(8, 8, seed=3)
    pos = good.index(b"IDAT") - 4
    (length,) = _struct.unpack(">I", good[pos : pos + 4])
    garbage = (b"\xde\xad\xbe\xef" * (length // 4 + 1))[:length]
    chunk = (
        _struct.pack(">I", length) + b"IDAT" + garbage
        + _struct.pack(">I", _zlib.crc32(b"IDAT" + garbage) & 0xFFFFFFFF)
    )
    corrupt = good[:pos] + chunk + good[pos + 12 + length:]
    t = pa.table({
        "img_id": pa.array([0, 1], pa.int64()),
        "image": pa.array([make_png_image(8, 8, seed=4), corrupt], pa.binary()),
    })
    dec = ImageDecode(fake=False)(t)
    assert dec.column("width").to_pylist() == [8, None]
    res = ImageResize(max_side=4, fake=False)(t)  # corrupt passes through
    assert res.column("image").to_pylist()[1] == corrupt
    feat = ImageFeatures()(t)
    assert feat.column("lum_mean").to_pylist()[1] is None


def test_real_png_decode_resize_features():
    """fake=False is a REAL path now: PNG decode (ops/png.py), pixel
    resize, luminance features — no image library involved."""
    import numpy as np

    from maestro_ray.ops.multimodal import ImageFeatures, ImageResize, make_png_image
    from maestro_ray.ops.png import decode_png

    blobs = [
        make_png_image(40, 30, seed=1),          # RGB
        make_png_image(16, 64, seed=2, channels=1),  # gray
        None,
        b"not a png at all",
    ]
    t = pa.table({
        "img_id": pa.array(range(4), pa.int64()),
        "image": pa.array(blobs, pa.binary()),
    })
    dec = ImageDecode(fake=False)(t)
    assert dec.column("width").to_pylist() == [40, 16, None, None]
    assert dec.column("height").to_pylist() == [30, 64, None, None]
    # resize: longest side capped at 32, aspect preserved, output is a
    # VALID PNG of real resampled pixels
    res = ImageResize(max_side=32, fake=False)(t)
    out0 = decode_png(res.column("image")[0].as_py())
    assert out0.shape == (24, 32, 3)  # 40x30 -> 32x24
    out1 = decode_png(res.column("image")[1].as_py())
    assert out1.shape == (32, 8)  # 16x64 -> 8x32
    # original pixels survive the resample at the sampled grid points
    src = decode_png(blobs[0])
    ys = np.minimum((np.arange(24) * 30) // 24, 29)
    xs = np.minimum((np.arange(32) * 40) // 32, 39)
    assert np.array_equal(out0, src[ys][:, xs])
    feats = ImageFeatures()(t)
    lm = feats.column("lum_mean").to_pylist()
    assert lm[2] is None and lm[3] is None
    exp = (src[:, :, :3].astype(float) @ np.array([0.299, 0.587, 0.114])).mean()
    assert abs(lm[0] - exp) < 1e-3


def test_frame_sample_explodes():
    video = b"\x00" * 8 + bytes(range(256)) * 40  # 10240 body bytes = 10 frames
    t = pa.table({
        "vid_id": pa.array([7], pa.int64()),
        "video": pa.array([video], pa.binary()),
    })
    out = FrameSample(every_n=3, frame_bytes=1024)(t)
    assert out.column("frame_idx").to_pylist() == [0, 3, 6, 9]
    assert out.column("vid_id").to_pylist() == [7, 7, 7, 7]
    assert all(len(f) == 1024 for f in out.column("frame").to_pylist())


def test_actor_pool_wiring(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_images_table())
    out = decode_images(ds, concurrency=2, batch_size=2).to_pandas()
    assert sorted(out["n_bytes"].tolist())[-1] > 8
    assert set(out.columns) >= {"img_id", "image", "width", "height", "n_bytes"}
