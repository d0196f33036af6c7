"""Determinism + order-insensitivity of the hashing/checksum kernels."""

import numpy as np
import pyarrow as pa

from maestro_ray.ops.hashing import checksum, hash_array, hash_columns, partition_ids


def test_hash_deterministic_across_calls():
    arr = pa.array(["a", "b", "c", None, "a"])
    h1, h2 = hash_array(arr), hash_array(arr)
    assert np.array_equal(h1, h2)
    assert h1[0] == h1[4]
    assert h1[0] != h1[1]


def test_hash_numeric_and_timestamp():
    ints = pa.array([1, 2, None], pa.int64())
    ts = pa.array([1, 2, None], pa.timestamp("us"))
    assert len(set(hash_array(ints)[:2])) == 2
    assert len(set(hash_array(ts)[:2])) == 2


def test_hash_binary():
    arr = pa.array([b"\x00\x01", b"\x00\x02", None], pa.binary())
    h = hash_array(arr)
    assert h[0] != h[1]


def test_checksum_order_insensitive_and_mergeable():
    t = pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    perm = t.take(pa.array([2, 0, 1]))
    assert checksum(t) == checksum(perm)
    part1, part2 = t.slice(0, 1), t.slice(1, 2)
    assert (checksum(part1) + checksum(part2)) % (1 << 64) == checksum(t)


def test_checksum_sensitive_to_values():
    t1 = pa.table({"k": ["a"], "v": [1]})
    t2 = pa.table({"k": ["a"], "v": [2]})
    assert checksum(t1) != checksum(t2)


def test_partition_ids_stable_and_bounded():
    urls = pa.array([f"https://x/{i}" for i in range(1000)])
    p = partition_ids(urls, 16)
    assert p.min() >= 0 and p.max() < 16
    assert np.array_equal(p, partition_ids(urls, 16))
    # roughly balanced: no partition > 3x the mean
    counts = np.bincount(p, minlength=16)
    assert counts.max() < 3 * counts.mean()


def test_hash_columns_combines():
    t = pa.table({"a": ["x", "x"], "b": [1, 2]})
    h = hash_columns(t)
    assert h[0] != h[1]
