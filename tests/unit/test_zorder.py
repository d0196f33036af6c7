"""Z-order clustering (ops/zorder.py): Morton-key exactness vs a
bit-by-bit reference, clustered write + zone-map pruned reads
(correctness AND an FS-level file-skip proof), guards."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.zorder import (
    add_morton_column,
    cluster_write,
    morton_code,
    pruned_file_count,
    read_clustered,
)


def _morton_ref(cols: list[np.ndarray], bits: int) -> np.ndarray:
    out = np.zeros(len(cols[0]), np.int64)
    for r in range(len(cols[0])):
        k = 0
        for i, c in enumerate(cols):
            q = int(c[r]) % (1 << bits)
            for j in range(bits):
                k |= ((q >> j) & 1) << (j * len(cols) + i)
        out[r] = k
    return out


def test_morton_matches_bitwise_reference():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 40, 500).astype(np.int64)
    b = rng.integers(0, 1 << 21, 500).astype(np.int64)
    # 2-col fast path (parallel-prefix spread)
    assert (morton_code([a, b], 21) == _morton_ref([a, b], 21)).all()
    # 3-col general path
    c = rng.integers(0, 1 << 10, 500).astype(np.int64)
    assert (morton_code([a, b, c], 10) == _morton_ref([a, b, c], 10)).all()


def test_morton_guards():
    with pytest.raises(ValueError, match="negative"):
        morton_code([np.array([-1, 2])], 21)
    with pytest.raises(ValueError, match="> 63"):
        morton_code([np.zeros(1, np.int64)] * 4, 21)


def test_morton_locality():
    """Adjacent cells in 2-D space share long key prefixes: the key of
    (x, y) and (x, y+1) differ by less than keys of far-apart cells on
    average — spot-check the canonical 4x4 Z curve."""
    xs, ys = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    k = morton_code([xs.ravel(), ys.ravel()], 2).reshape(4, 4)
    # canonical Z-curve values
    assert k[0, 0] == 0 and k[1, 0] == 1 and k[0, 1] == 2 and k[1, 1] == 3
    assert k[2, 2] == 12 and k[3, 3] == 15


def test_cluster_write_and_pruned_read(ray_session):
    rng = np.random.default_rng(11)
    n = 20_000
    x = rng.integers(0, 1000, n).astype(np.int64)
    y = rng.integers(0, 1000, n).astype(np.int64)
    v = rng.normal(size=n)
    tbl = pa.table({"x": x, "y": y, "v": v})
    out = tempfile.mkdtemp(prefix="zorder_test_")
    try:
        cluster_write(rd.from_arrow(tbl), ["x", "y"], out, num_files=16)
        assert os.path.exists(os.path.join(out, "_zones.json"))
        box = {"x": (100, 180), "y": (500, 560)}
        got = read_clustered(out, box).to_pandas()
        mask = (x >= 100) & (x <= 180) & (y >= 500) & (y <= 560)
        assert len(got) == int(mask.sum())
        assert abs(got["v"].sum() - v[mask].sum()) < 1e-9
        # FS-level proof: a small box must SKIP most shard files
        kept, total = pruned_file_count(out, box)
        assert total >= 8 and kept < total / 2, (kept, total)
        # a full box prunes nothing and returns everything
        full = read_clustered(out, {"x": (0, 1000)}).count()
        assert full == n
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_empty_box_keeps_schema(ray_session):
    tbl = pa.table({"x": pa.array([1, 2], pa.int64()),
                    "y": pa.array([3, 4], pa.int64())})
    out = tempfile.mkdtemp(prefix="zorder_test_")
    try:
        cluster_write(rd.from_arrow(tbl), ["x", "y"], out)
        got = read_clustered(out, {"x": (100, 200)}).to_pandas()
        assert len(got) == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cluster_write_refuses_dirty_dir(ray_session):
    tbl = pa.table({"x": pa.array([1], pa.int64())})
    out = tempfile.mkdtemp(prefix="zorder_test_")
    try:
        with open(os.path.join(out, "stale.parquet"), "wb") as fh:
            fh.write(b"junk")
        with pytest.raises(FileExistsError):
            cluster_write(rd.from_arrow(tbl), ["x"], out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_box_column_not_clustered_raises(ray_session):
    tbl = pa.table({"x": pa.array([1, 2], pa.int64()),
                    "y": pa.array([3, 4], pa.int64())})
    out = tempfile.mkdtemp(prefix="zorder_test_")
    try:
        cluster_write(rd.from_arrow(tbl), ["x"], out)
        with pytest.raises(ValueError, match="not in the clustered"):
            read_clustered(out, {"y": (0, 10)})
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_add_morton_null_guard(ray_session):
    tbl = pa.table({"x": pa.array([1, None], pa.int64()),
                    "y": pa.array([3, 4], pa.int64())})
    with pytest.raises(Exception, match="nulls"):
        add_morton_column(rd.from_arrow(tbl), ["x", "y"]).to_pandas()


def test_cluster_write_empty_input_stays_readable(ray_session):
    # empty input writes a typed empty shard + zone map; reads keep
    # the schema instead of IndexError (r4 review finding)
    tbl = pa.table({"x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64())})
    out = tempfile.mkdtemp(prefix="zorder_test_")
    try:
        meta = cluster_write(rd.from_arrow(tbl), ["x", "y"], out)
        assert len(meta["zones"]) == 1 and meta["zones"][0]["rows"] == 0
        got = read_clustered(out, {"x": (0, 10)}).to_pandas()
        assert len(got) == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)
