"""Incremental vector index over the CDC lake
(pipelines/vectorindex.py): incremental ≡ full-rebuild at every epoch,
delete/update propagation, crash idempotence, search quality."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.core.manifest import list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.ops.embed import embed_batch
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines import vectorindex as vx


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    base = tmp_path_factory.mktemp("vx")
    log = str(base / "log")
    write_changelog(log, ChangelogParams(
        n_urls=50, n_events=300, seg_rows=60, seed=44))
    lake = str(base / "lake")
    ingest(log, lake, num_partitions=4, segments_per_epoch=1)
    return lake


def _expected(lake_dir, dim=64) -> pd.DataFrame:
    """Direct re-encode of the lake's live head state."""
    from maestro_ray.io.lake import read_lake

    df = read_lake(lake_dir, columns=["url", "text"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    vecs = embed_batch(pa.array(df["text"].tolist(), pa.string()),
                       dim=dim)
    df["vec"] = [v.tobytes() for v in vecs]
    return df[["url", "vec"]]


def test_incremental_equals_rebuild_at_every_epoch(ray_session, lake,
                                                   tmp_path):
    idx = str(tmp_path / "idx")
    epochs = list_epochs(lake)
    assert len(epochs) >= 3
    # bootstrap at the FIRST epoch... read_lake reads head, so
    # bootstrap against a clone? Simpler: bootstrap at head of a
    # partial-history read isn't supported — bootstrap now, then
    # verify the head equivalence and the incremental path via a
    # second lake below. Here: bootstrap at head must equal rebuild.
    vx.bootstrap_vector_index(lake, idx, dim=64, n_shards=4)
    got = vx.read_vector_index(idx)
    pd.testing.assert_frame_equal(got, _expected(lake))


def test_update_applies_changes_incrementally(ray_session, tmp_path):
    """Ingest epoch-by-epoch, update the index after each, and pin
    index ≡ re-encode of the live state at EVERY epoch — deletes,
    updates and re-inserts included."""
    base = str(tmp_path)
    log = os.path.join(base, "log")
    write_changelog(log, ChangelogParams(
        n_urls=40, n_events=240, seg_rows=60, seed=55))
    lake = os.path.join(base, "lake")
    idx = os.path.join(base, "idx")
    booted = False
    for step in range(4):
        ingest(log, lake, num_partitions=4, segments_per_epoch=1,
               max_epochs=1)
        if not booted:
            vx.bootstrap_vector_index(lake, idx, dim=64, n_shards=4)
            booted = True
        else:
            vx.update_vector_index(lake, idx)
        got = vx.read_vector_index(idx)
        pd.testing.assert_frame_equal(got, _expected(lake))
    # idempotent no-op when already at head
    meta = vx.update_vector_index(lake, idx)
    assert meta["epoch"] == list_epochs(lake)[-1]


def test_crash_between_shard_and_meta_recovers(ray_session, tmp_path,
                                               monkeypatch):
    """A crash after shard rewrites but BEFORE the meta write: the next
    update re-applies the same net-change set onto the half-updated
    shards and converges (drop-then-insert is idempotent)."""
    base = str(tmp_path)
    log = os.path.join(base, "log")
    write_changelog(log, ChangelogParams(
        n_urls=30, n_events=160, seg_rows=80, seed=66))
    lake = os.path.join(base, "lake")
    ingest(log, lake, num_partitions=2, segments_per_epoch=1,
           max_epochs=1)
    idx = os.path.join(base, "idx")
    vx.bootstrap_vector_index(lake, idx, dim=64, n_shards=4)
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)

    real_replace = os.replace
    def crashing(src, dst):
        if dst.endswith(vx.META):
            raise RuntimeError("simulated crash before meta commit")
        return real_replace(src, dst)

    monkeypatch.setattr(vx.os, "replace", crashing)
    with pytest.raises(RuntimeError):
        vx.update_vector_index(lake, idx)
    monkeypatch.setattr(vx.os, "replace", real_replace)
    # cursor still old; rerun converges onto the final state
    with open(os.path.join(idx, vx.META)) as f:
        assert json.load(f)["epoch"] != list_epochs(lake)[-1]
    vx.update_vector_index(lake, idx)
    pd.testing.assert_frame_equal(vx.read_vector_index(idx),
                                  _expected(lake))


def test_search_finds_planted_near_dup(ray_session, lake, tmp_path):
    idx = str(tmp_path / "idx")
    vx.bootstrap_vector_index(lake, idx, dim=64, n_shards=4)
    store = vx.read_vector_index(idx)
    # query with the exact text of a stored page: itself at rank 1
    from maestro_ray.io.lake import read_lake

    df = read_lake(lake, columns=["url", "text"]).to_pandas()
    df = df[df["text"].str.len() > 50].reset_index(drop=True)
    probe = df.iloc[0]
    out = vx.search_vector_index(idx, [probe["text"]], k=5)
    assert len(out) == 5
    top = out[out["rank"] == 1].iloc[0]
    assert top["score"] >= out["score"].max() - 1e-12
    got_vec = store[store.url == top["url"]]
    assert len(got_vec) == 1
    # rank-1 is the probe page itself (or an exact-duplicate text)
    assert top["url"] == probe["url"] or \
        df[df.url == top["url"]]["text"].iloc[0] == probe["text"]
