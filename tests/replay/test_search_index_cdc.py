"""Incremental full-text index over the CDC lake (pipelines/search.py):
segment-chain search must EXACTLY equal a full rebuild at every epoch
(inserts, updates, deletes, re-inserts), corpus stats must stay exact,
probes must be sublinear in files opened, maintenance idempotent, and
compaction must preserve results."""

import os

import pandas as pd
import pyarrow.parquet as pq
from maestro_ray.core.manifest import list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog, \
    _events_to_table
from maestro_ray.io.lake import read_lake_at
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.search import (
    bootstrap_text_index,
    compact_text_index,
    lake_probe_files,
    search_lake_index,
    update_text_index,
)

T0 = 1704067200000000


def _rebuild_reference(lake_dir, epoch, terms, tmpdir):
    """Ground truth: fresh one-segment build of the lake AT ``epoch``,
    searched with the plain index probe (itself pinned exact vs
    bm25_scores in tests/unit/test_searchidx.py)."""
    import shutil

    from maestro_ray.ops.searchidx import build_text_index, \
        search_text_index

    d = os.path.join(tmpdir, f"ref-{epoch}")
    shutil.rmtree(d, ignore_errors=True)
    ds = read_lake_at(lake_dir, epoch, columns=["url", "text"])
    build_text_index(ds, d, id_col="url", text_col="text", n_shards=8)
    return search_text_index(d, terms, k=None)


def _top_terms(lake_dir, epoch, n=3):
    pdf = read_lake_at(lake_dir, epoch, columns=["text"]).to_pandas()
    vc = pd.Series(" ".join(pdf["text"]).split(" ")).value_counts()
    return vc.index[:n].tolist()


def test_incremental_equals_rebuild_every_epoch(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(n_urls=40, n_events=300,
                                         seg_rows=50, evolution=False))
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=4, segments_per_epoch=2)
    epochs = list_epochs(lake)
    assert len(epochs) >= 3, "fixture must span several epochs"
    terms = _top_terms(lake, epochs[-1])

    idx = str(tmp_path / "idx")
    meta = bootstrap_text_index(idx, lake, n_shards=8)
    assert meta["indexed_epoch"] == epochs[-1]  # bootstrap reads head
    got = search_lake_index(idx, terms, k=None)
    exp = _rebuild_reference(lake, epochs[-1], terms, str(tmp_path))
    pd.testing.assert_frame_equal(got, exp, check_exact=True)

    # stepped maintenance over the SAME lake: start from head (no-op
    # rounds must be cheap and exact)
    again = update_text_index(idx, lake)
    assert again["indexed_epoch"] == meta["indexed_epoch"]
    pd.testing.assert_frame_equal(
        search_lake_index(idx, terms, k=None), exp, check_exact=True)


def _ev(off, op, url, ts_us, html):
    return {"offset": off, "op": op, "url": url, "warc_ts": ts_us,
            "html": html, "lang": None if op == "delete" else "en"}


def _write_segments(log_dir, segments):
    os.makedirs(log_dir, exist_ok=True)
    for rows in segments:
        first = rows[0]["offset"]
        pq.write_table(
            _events_to_table(rows, 3),
            os.path.join(log_dir, f"seg-{first:012d}.parquet"))


def test_stepped_chain_with_reinsert(ray_session, tmp_path):
    """Build the lake one epoch at a time, maintaining the index after
    each ingest round — the true incremental path, incl. re-insert
    after delete and update superseding."""
    urls = [f"https://s.example/{i}" for i in range(4)]
    all_segs = [
        [_ev(0, "insert", urls[0], T0, b"alpha beta common"),
         _ev(1, "insert", urls[1], T0, b"beta gamma common"),
         _ev(2, "insert", urls[2], T0, b"alpha alpha common"),
         _ev(3, "insert", urls[3], T0, b"delta epsilon common")],
        [_ev(4, "delete", urls[0], T0 + 10, None),
         _ev(5, "update", urls[1], T0 + 10, b"gamma gamma common")],
        [_ev(6, "insert", urls[0], T0 + 20, b"alpha reborn common")],
        [_ev(7, "delete", urls[0], T0 + 30, None),
         _ev(8, "update", urls[2], T0 + 30, b"beta moved common")],
    ]
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    terms = ["alpha", "beta", "gamma", "common"]
    meta = None
    for i, seg in enumerate(all_segs):
        _write_segments(log, [seg])
        ingest(log, lake, num_partitions=2, segments_per_epoch=1)
        epochs = list_epochs(lake)
        if meta is None:
            meta = bootstrap_text_index(idx, lake, n_shards=8)
        else:
            meta = update_text_index(idx, lake)
        assert meta["indexed_epoch"] == epochs[-1]
        got = search_lake_index(idx, terms, k=None)
        exp = _rebuild_reference(lake, epochs[-1], terms,
                                 str(tmp_path))
        pd.testing.assert_frame_equal(got, exp, check_exact=True,
                                      obj=f"epoch {epochs[-1]}")
        # exact corpus stats
        pdf = read_lake_at(lake, epochs[-1],
                           columns=["text"]).to_pandas()
        assert meta["n_docs"] == len(pdf)
        assert meta["sum_dl"] == int(
            pdf["text"].str.split(" ").str.len().sum())
    # segment chain actually accumulated (not silent rebuilds)
    assert len(meta["segments"]) >= 3
    assert len(meta["tombstone_rounds"]) >= 2

    # idempotent no-op round
    again = update_text_index(idx, lake)
    assert again == meta

    # probe I/O is (segments x query shards), not the whole index
    opened = lake_probe_files(idx, ["alpha"])
    all_postings = sum(
        1 for seg in meta["segments"]
        for f in os.listdir(os.path.join(idx, seg["name"]))
        if f.startswith("shard-"))
    assert 0 < len(opened) <= len(meta["segments"])
    assert all_postings > len(opened)

    # compaction: one segment, identical results
    final = search_lake_index(idx, terms, k=None)
    cmeta = compact_text_index(idx, lake)
    assert len(cmeta["segments"]) == 1 and not cmeta["tombstone_rounds"]
    pd.testing.assert_frame_equal(
        search_lake_index(idx, terms, k=None), final, check_exact=True)


def test_null_text_fails_loudly(ray_session, tmp_path):
    # the lake index pins total text; a null must raise, not skew avgdl
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from maestro_ray.pipelines.search import _build_segment

    tbl = pa.table({"url": pa.array(["https://a", "https://b"]),
                    "text": pa.array(["ok text", None])})
    with pytest.raises(Exception, match="null text"):
        _build_segment(rd.from_arrow(tbl), str(tmp_path / "seg"), 4)
