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


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        ImageDecode(fake=False)


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
