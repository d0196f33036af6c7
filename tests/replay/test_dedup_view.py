"""Incremental dedup view (pipelines/views.py maintain_dedup_view):
fingerprint live-counts must equal a full recompute at every epoch,
duplicates must appear/decrement/move as the lake upserts and deletes —
the cdc_ingest × webtext integration surface."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog, \
    _events_to_table
from maestro_ray.io.lake import read_lake_at
from maestro_ray.ops.hashing import hash_array
from maestro_ray.ops.extract_pure import extract_text
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.views import (
    HASH_GROUP_PREFIX,
    dedup_view_duplicates,
    maintain_dedup_view,
    read_view,
)

T0 = 1704067200000000


def _recompute_fp(lake_dir, epoch):
    pdf = read_lake_at(lake_dir, epoch, columns=["url", "text"]) \
        .to_pandas()
    h = hash_array(pdf["text"]).view(np.int64)
    vc = pd.Series(h).value_counts()
    return {int(k): int(v) for k, v in vc.items()}


def _as_dict(view):
    return {int(k): int(v) for k, v in zip(view["fingerprint"],
                                           view["n"])}


def test_dedup_view_matches_recompute_every_epoch(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(n_urls=50, n_events=400,
                                         seg_rows=50, evolution=False))
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=4, segments_per_epoch=3)
    final = maintain_dedup_view(lake)
    for e in list_epochs(lake):
        view = read_view(lake, HASH_GROUP_PREFIX + "text", e)
        assert view is not None
        got = {int(k): int(v) for k, v in zip(view.iloc[:, 0],
                                              view["n"])}
        assert got == _recompute_fp(lake, e), f"epoch {e}"
    assert _as_dict(final) == _recompute_fp(lake, list_epochs(lake)[-1])


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


def test_dedup_view_tracks_duplicates_through_cdc(ray_session, tmp_path):
    # epoch 1: three urls share one html (one fingerprint, n=3), one
    # unique url. epoch 2: delete a copy (n=2) and move the unique url
    # to the SHARED text (n=3 again, old fingerprint gone).
    shared = b"<p>same boilerplate body</p>"
    uniq = b"<p>original reporting</p>"
    urls = [f"https://s.example/{i}" for i in range(4)]
    segs = [
        [_ev(0, "insert", urls[0], T0, shared),
         _ev(1, "insert", urls[1], T0, shared),
         _ev(2, "insert", urls[2], T0, shared),
         _ev(3, "insert", urls[3], T0, uniq)],
        [_ev(4, "delete", urls[2], T0 + 10, None),
         _ev(5, "update", urls[3], T0 + 10, shared)],
    ]
    log = str(tmp_path / "log")
    _write_segments(log, segs)
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)

    fp_shared = int(hash_array(pd.Series([extract_text(shared)]))
                    .view(np.int64)[0])
    fp_uniq = int(hash_array(pd.Series([extract_text(uniq)]))
                  .view(np.int64)[0])

    final = maintain_dedup_view(lake)
    epochs = list_epochs(lake)
    v1 = read_view(lake, HASH_GROUP_PREFIX + "text", epochs[0])
    d1 = {int(k): int(v) for k, v in zip(v1.iloc[:, 0], v1["n"])}
    assert d1[fp_shared] == 3 and d1[fp_uniq] == 1

    d2 = _as_dict(final)
    assert d2[fp_shared] == 3  # -1 delete, +1 moved-in update
    assert fp_uniq not in d2   # moved away: count fell to zero
    dup = dedup_view_duplicates(final)
    assert list(dup["fingerprint"]) == [fp_shared]
    assert int(dup["redundant"].iloc[0]) == 2
    # idempotent re-run
    again = maintain_dedup_view(lake)
    assert _as_dict(again) == d2
