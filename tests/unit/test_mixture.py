"""Mixture sampling (ops/corpus.py mixture_sample): exact quotas,
partition invariance, short strata, excluded strata, guards."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.corpus import mixture_sample


def _ds(blocks=3):
    n = 120
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_exact_quotas_and_exclusion():
    out = mixture_sample(_ds(), "doc_id", "source",
                         {"s0": 7, "s1": 3}).to_pandas()
    counts = out.groupby("source").size().to_dict()
    assert counts == {"s0": 7, "s1": 3}          # s2/s3 excluded


def test_partition_invariant_selection():
    a = mixture_sample(_ds(2), "doc_id", "source", {"s0": 5, "s2": 9}) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = mixture_sample(_ds(8), "doc_id", "source", {"s0": 5, "s2": 9}) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a.doc_id) == list(b.doc_id)


def test_short_stratum_yields_all_its_rows():
    out = mixture_sample(_ds(), "doc_id", "source",
                         {"s0": 10_000}).to_pandas()
    assert len(out) == 30                        # stratum size, not quota


def test_guards():
    with pytest.raises(ValueError):
        mixture_sample(_ds(), "doc_id", "source", {})
    with pytest.raises(ValueError):
        mixture_sample(_ds(), "doc_id", "source", {"s0": -1})
