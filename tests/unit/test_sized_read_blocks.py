"""sized_read_blocks (ops/partition.py) — the shared block-sizing
rule at shuffle boundaries. The two measured cases it was lifted from
(BASELINE.md r4 s2/s3) are pinned as count regressions: identical
block counts reproduce the tuned times by construction."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from maestro_ray.ops.partition import sized_read_blocks


@pytest.fixture()
def tiny_parquet(tmp_path):
    # the merge_into shape: a ~tens-of-KB table Ray would shatter
    t = pa.table({"k": pa.array(np.arange(2000), pa.int64()),
                  "v": pa.array(np.arange(2000.0), pa.float64())})
    p = str(tmp_path / "tiny.parquet")
    pq.write_table(t, p)
    return p


def test_tiny_table_gets_few_blocks(ray_session, tiny_parquet):
    # the measured merge_into optimum: min(ncpu, 8*files), never the
    # ~200-block default shatter
    n = sized_read_blocks(tiny_parquet, ["k", "v"])
    assert n == min(int(ray.cluster_resources()["CPU"]), 8)


def test_wide_shuffle_floors_at_cpu_count(ray_session, tiny_parquet):
    # the measured outlier_iqr optimum: exchange volume decoupled from
    # input bytes -> floor at the cluster CPU count
    n = sized_read_blocks(tiny_parquet, ["k", "v"], wide_shuffle=True)
    assert n == int(ray.cluster_resources()["CPU"])
    assert n >= sized_read_blocks(tiny_parquet, ["k", "v"])


def test_big_payload_sizes_by_bytes(tmp_path, ray_session, monkeypatch):
    # payload past the byte target: block count follows bytes, not the
    # small-table floor; pruned sizing must not inherit the padded
    # file's count. Target shrunk so the test file stays small.
    import maestro_ray.io.changelog as cl

    monkeypatch.setattr(cl, "TARGET_READ_BLOCK_BYTES", 1 << 20)
    rows = 100_000
    p = str(tmp_path / "big.parquet")
    pq.write_table(pa.table({
        "a": pa.array(np.random.default_rng(0)
                      .integers(0, 2**60, rows), pa.int64()),
        "pad": pa.array(["x" * 80] * rows, pa.string()),
    }), p, compression="none", use_dictionary=False)
    n_pruned = sized_read_blocks(p, ["a"])   # ~0.8 MB -> floor
    n_all = sized_read_blocks(p)             # ~8.8 MB -> ~8 blocks
    assert n_all >= 8
    assert n_pruned < n_all


def test_directory_and_list_inputs(tmp_path, ray_session):
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    for i in range(3):
        pq.write_table(t, str(tmp_path / f"part-{i}.parquet"))
    d = sized_read_blocks(str(tmp_path))
    ls = sized_read_blocks(
        [str(tmp_path / f"part-{i}.parquet") for i in range(3)])
    assert d == ls > 0
