"""Persisted inverted text index (ops/searchidx.py): exact parity with
the brute bm25_scores fold, sublinear probe I/O (FS-level proof),
guards, empty/missing-term probes."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.corpus import bm25_scores
from maestro_ray.ops.searchidx import (
    build_text_index,
    probe_files,
    search_text_index,
)

DOCS = [
    (1, "stream of events in a window stream"),
    (2, "batch query over the batch stream"),
    (3, "query planner emits a scan"),
    (4, None),
    (5, "totally unrelated text body here"),
    (6, "stream stream stream stream"),
]


@pytest.fixture(scope="module")
def index(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    })
    idx = tempfile.mkdtemp(prefix="searchidx_test_")
    build_text_index(rd.from_arrow(tbl), idx, n_shards=8)
    yield idx, rd.from_arrow(tbl)
    shutil.rmtree(idx, ignore_errors=True)


def test_probe_matches_brute_exactly(index):
    idx, ds = index
    q = ["stream", "batch", "query"]
    got = search_text_index(idx, q, k=None)
    brute = (bm25_scores(ds, "doc_id", "text", query_terms=q)
             .to_pandas()
             .sort_values(["bm25", "doc_id"], ascending=[False, True],
                          kind="mergesort")
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, brute, check_exact=True)
    assert set(got["doc_id"]) == {1, 2, 3, 6}


def test_probe_is_sublinear_io(index):
    idx, _ds = index
    with open(os.path.join(idx, "_meta.json")) as fh:
        import json

        total = len(json.load(fh)["shards"])
    opened = probe_files(idx, ["stream"])
    assert len(opened) == 1 and total >= 4, (opened, total)
    for p in opened:
        assert os.path.exists(p)


def test_topk_ordering_and_cutoff(index):
    idx, _ds = index
    full = search_text_index(idx, ["stream"], k=None)
    top2 = search_text_index(idx, ["stream"], k=2)
    assert len(top2) == 2
    assert top2["bm25"].tolist() == full["bm25"].tolist()[:2]
    # deterministic tiebreak: score desc then id asc
    assert (top2["bm25"].values[0] >= top2["bm25"].values[1])


def test_unknown_term_empty_result(index):
    idx, _ds = index
    out = search_text_index(idx, ["zzzznotaword"], k=None)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "bm25"]


def test_max_postings_guard(index):
    idx, _ds = index
    with pytest.raises(RuntimeError, match="max_postings"):
        search_text_index(idx, ["stream", "batch", "query"],
                          max_postings=2)


def test_empty_query_raises(index):
    idx, _ds = index
    with pytest.raises(ValueError):
        search_text_index(idx, [])


def test_rebuild_is_idempotent(ray_session, tmp_path):
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta", "beta gamma"], pa.string()),
    })
    idx = str(tmp_path / "idx")
    m1 = build_text_index(rd.from_arrow(tbl), idx, n_shards=4)
    m2 = build_text_index(rd.from_arrow(tbl), idx, n_shards=4)
    assert m1 == m2
    out = search_text_index(idx, ["beta"], k=None)
    assert set(out["doc_id"]) == {1, 2}


def test_empty_corpus_builds_valid_index(ray_session, tmp_path):
    # zero-block generator sources lose their schema in to_pandas —
    # the build must still produce a valid (empty) index (r4 review)
    tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string())})
    idx = str(tmp_path / "emptyidx")
    meta = build_text_index(rd.from_arrow(tbl), idx, n_shards=4)
    assert meta["n_docs"] == 0 and meta["sum_dl"] == 0
    out = search_text_index(idx, ["anything"], k=None)
    assert len(out) == 0


def test_empty_probe_respects_string_id_kind(ray_session, tmp_path):
    tbl = pa.table({"url": pa.array(["https://a", "https://b"]),
                    "text": pa.array(["alpha beta", "beta gamma"])})
    idx = str(tmp_path / "urlidx")
    build_text_index(rd.from_arrow(tbl), idx, id_col="url", n_shards=4)
    out = search_text_index(idx, ["zzzznotaword"], k=None)
    assert len(out) == 0 and out["url"].dtype == object
