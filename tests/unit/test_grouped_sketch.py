"""grouped_quantile_sketch (ops/aggregates.py): per-key error bound vs
numpy exact order statistics, partition invariance, guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.aggregates import grouped_quantile_sketch

RNG = np.random.default_rng(11)
N = 5000
KEYS = RNG.integers(0, 4, N)
# heavy-tailed per-key scales to exercise per-key bin widths
VALS = np.exp(RNG.normal(size=N)) * (10.0 ** KEYS)
QS = [0.1, 0.5, 0.9, 0.99]


def _ds(blocks=6):
    t = pa.table({
        "k": pa.array(KEYS, pa.int64()),
        "v": pa.array(VALS, pa.float64()),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_per_key_error_bound_holds():
    out = grouped_quantile_sketch(_ds(), "k", "v", QS, n_bins=512)
    for k in np.unique(KEYS):
        vk = np.sort(VALS[KEYS == k])
        sub = out[out.k == k]
        for _, r in sub.iterrows():
            rank = max(1, int(np.ceil(r.q * len(vk))))
            exact = vk[rank - 1]
            assert abs(r.value - exact) <= r.err_bound + 1e-9, \
                (k, r.q, r.value, exact, r.err_bound)


def test_partition_invariant():
    a = grouped_quantile_sketch(_ds(3), "k", "v", QS)
    b = grouped_quantile_sketch(_ds(11), "k", "v", QS)
    pd.testing.assert_frame_equal(a, b)


def test_nulls_and_guards():
    t = pa.table({
        "k": pa.array([1, 1, None, 2], pa.int64()),
        "v": pa.array([1.0, None, 3.0, 7.0], pa.float64()),
    })
    out = grouped_quantile_sketch(rd.from_arrow(t), "k", "v", [0.5])
    assert list(out.k) == [1, 2]
    assert list(out.value) == [1.0, 7.0]   # single-value keys: exact
    with pytest.raises(ValueError):
        grouped_quantile_sketch(rd.from_arrow(t), "k", "v", [])
    with pytest.raises(ValueError, match="max_keys"):
        grouped_quantile_sketch(_ds(), "k", "v", [0.5], max_keys=2)
