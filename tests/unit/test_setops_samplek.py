"""Bag set-ops (ops/setops.py) and exact-k sampling (ops/corpus.py
sample_exact_k), r4: multiset-count oracles vs pandas, partition
invariance, determinism and guard edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.corpus import sample_exact_k
from maestro_ray.ops.setops import except_all, intersect_all


def _bag(df, cols):
    return df.groupby(cols).size()


def _check_bag(got_df, a_df, b_df, cols, op):
    ca, cb = _bag(a_df, cols), _bag(b_df, cols)
    if op == "intersect":
        exp = np.minimum(ca, cb.reindex(ca.index, fill_value=0))
        exp = exp[exp > 0]
    else:
        exp = (ca - cb.reindex(ca.index, fill_value=0)).clip(lower=0)
        exp = exp[exp > 0]
    got = _bag(got_df, cols) if len(got_df) else pd.Series(dtype=int)
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()


@pytest.mark.parametrize("npart", [1, 4])
def test_bag_setops_multiset_counts(ray_session, npart):
    rng = np.random.default_rng(5)
    a_df = pd.DataFrame({"k": rng.integers(0, 6, 200),
                         "v": rng.integers(0, 3, 200)})
    b_df = pd.DataFrame({"k": rng.integers(0, 6, 150),
                         "v": rng.integers(0, 3, 150)})
    a = rd.from_pandas(a_df).repartition(npart)
    b = rd.from_pandas(b_df).repartition(npart)
    cols = ["k", "v"]
    _check_bag(intersect_all(a, b, cols).to_pandas(), a_df, b_df,
               cols, "intersect")
    _check_bag(except_all(a, b, cols).to_pandas(), a_df, b_df,
               cols, "except")


def test_bag_setops_disjoint_and_empty(ray_session):
    a = rd.from_items([{"k": 1}, {"k": 1}, {"k": 2}])
    b = rd.from_items([{"k": 9}])
    assert intersect_all(a, b, ["k"]).count() == 0
    got = except_all(a, b, ["k"]).to_pandas()["k"].tolist()
    assert sorted(got) == [1, 1, 2]
    # except with full cover on one key, partial on the other
    b2 = rd.from_items([{"k": 1}, {"k": 1}, {"k": 1}])
    assert except_all(a, b2, ["k"]).to_pandas()["k"].tolist() == [2]


def test_sample_exact_k_deterministic_and_sized(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64),
                       "x": np.arange(1000)})
    ds = rd.from_pandas(df).repartition(4)
    s1 = sample_exact_k(ds, "doc_id", 50)
    s2 = sample_exact_k(ds.repartition(7), "doc_id", 50)
    assert len(s1) == 50
    assert s1["doc_id"].tolist() == s2["doc_id"].tolist()  # partition-inv
    assert list(s1.columns) == ["doc_id", "x"]
    # subset property: top-25 is a prefix of top-50's order
    s3 = sample_exact_k(ds, "doc_id", 25)
    assert s3["doc_id"].tolist() == s1["doc_id"].tolist()[:25]


def test_sample_exact_k_null_and_negative(ray_session):
    t = pa.table({"doc_id": pa.array([1, None, 3], pa.int64())})
    out = sample_exact_k(rd.from_arrow(t), "doc_id", 10)
    assert sorted(out["doc_id"].tolist()) == [1, 3]  # nulls dropped
    t2 = pa.table({"doc_id": pa.array([-1, 2], pa.int64())})
    with pytest.raises(Exception, match="non-negative"):
        sample_exact_k(rd.from_arrow(t2), "doc_id", 1)
