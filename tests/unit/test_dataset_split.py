"""ops/corpus.py dataset_split: deterministic leakage-safe splits on
the shared multiplicative-hash contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.corpus import dataset_split, sample_hash


def _ds(n=500):
    return rd.from_arrow(pa.table({"k": pa.array(np.arange(n), pa.int64())}))


def test_split_partitions_key_space(ray_session):
    out = dataset_split(_ds(), "k", {"train": 80, "valid": 10, "test": 10}) \
        .to_pandas()
    assert len(out) == 500
    assert out["split"].notna().all()
    counts = out["split"].value_counts()
    assert set(counts.index) <= {"train", "valid", "test"}
    assert counts["train"] > counts["valid"]  # 80/10/10 shape


def test_split_is_deterministic_and_table_consistent(ray_session):
    fr = {"train": 80, "valid": 10, "test": 10}
    a = dataset_split(_ds(), "k", fr).to_pandas().set_index("k")["split"]
    b = dataset_split(_ds(1000), "k", fr).to_pandas() \
        .set_index("k")["split"]
    # the same key gets the same split regardless of the table it's in
    assert (a == b.loc[a.index]).all()


def test_split_null_key_gets_null_split(ray_session):
    t = pa.table({"k": pa.array([1, None, 3], pa.int64())})
    out = dataset_split(rd.from_arrow(t), "k", {"a": 50, "b": 50}) \
        .to_pandas()
    assert out["split"].isna().tolist() == [False, True, False]


def test_split_fractions_must_sum_to_100(ray_session):
    with pytest.raises(ValueError, match="sum"):
        dataset_split(_ds(), "k", {"train": 80, "test": 10})


def test_split_alphabetical_layout_matches_sample_hash(ray_session):
    # sorted names: a gets buckets [0, 30) — exactly sample_hash pct=30
    out = dataset_split(_ds(), "k", {"a": 30, "b": 70}).to_pandas()
    a_keys = set(out.loc[out["split"] == "a", "k"])
    sampled = set(sample_hash(_ds(), "k", 30).to_pandas()["k"])
    assert a_keys == sampled
