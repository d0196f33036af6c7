"""Lake → RDBMS replication (pipelines/replicate.py): replica ==
live lake state after full load and after incremental catch-up,
idempotent re-runs, exactly-once under a simulated pre-commit crash,
cursor inspection."""

import os
import shutil

import duckdb
import pandas as pd
import pytest

from maestro_ray.core.manifest import list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import read_lake_at
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.replicate import (
    replicate_to_rdbms,
    replication_cursor,
)

PARAMS = ChangelogParams(n_urls=40, n_events=300, seg_rows=50,
                         evolution=False)


@pytest.fixture()
def lake(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    ingest(log, lake_dir, num_partitions=3, segments_per_epoch=2)
    assert len(list_epochs(lake_dir)) >= 3
    return lake_dir


def _replica(db, table="pages"):
    con = duckdb.connect(db, read_only=True)
    try:
        return con.execute(
            f"SELECT url, warc_ts, lang FROM {table} ORDER BY url"
        ).df().reset_index(drop=True)
    finally:
        con.close()


def _lake_state(lake_dir, epoch):
    pdf = read_lake_at(lake_dir, epoch,
                       columns=["url", "warc_ts", "lang"]).to_pandas()
    return pdf.sort_values("url").reset_index(drop=True)


def test_full_load_then_incremental_catchup(lake, tmp_path):
    db = str(tmp_path / "replica.db")
    stage = str(tmp_path / "stage")
    epochs = list_epochs(lake)
    mid, head = epochs[len(epochs) // 2 - 1], epochs[-1]

    r1 = replicate_to_rdbms(lake, db, "pages", stage, to_epoch=mid)
    assert r1["from_epoch"] is None and r1["to_epoch"] == mid
    assert replication_cursor(db, "pages") == mid
    pd.testing.assert_frame_equal(_replica(db), _lake_state(lake, mid),
                                  check_dtype=False)

    r2 = replicate_to_rdbms(lake, db, "pages", stage)
    assert r2["from_epoch"] == mid and r2["to_epoch"] == head
    pd.testing.assert_frame_equal(_replica(db), _lake_state(lake, head),
                                  check_dtype=False)

    # idempotent: nothing new applies nothing, cursor unchanged
    r3 = replicate_to_rdbms(lake, db, "pages", stage)
    assert r3["applied_rows"] == 0
    assert replication_cursor(db, "pages") == head


def test_exactly_once_after_precommit_crash(lake, tmp_path):
    db = str(tmp_path / "replica.db")
    stage = str(tmp_path / "stage")
    epochs = list_epochs(lake)
    mid, head = epochs[len(epochs) // 2 - 1], epochs[-1]
    replicate_to_rdbms(lake, db, "pages", stage, to_epoch=mid)

    # simulate a crash BEFORE commit: snapshot the db, run a catch-up,
    # then restore the snapshot — replica+cursor roll back together,
    # so the re-run applies the SAME range once more, converging
    shutil.copy(db, db + ".bak")
    replicate_to_rdbms(lake, db, "pages", stage)
    after_commit = _replica(db)
    shutil.copy(db + ".bak", db)
    assert replication_cursor(db, "pages") == mid  # rolled back whole
    r = replicate_to_rdbms(lake, db, "pages", stage)
    assert r["from_epoch"] == mid and r["to_epoch"] == head
    pd.testing.assert_frame_equal(_replica(db), after_commit,
                                  check_dtype=False)
    pd.testing.assert_frame_equal(_replica(db), _lake_state(lake, head),
                                  check_dtype=False)


def test_bad_epoch_rejected(lake, tmp_path):
    with pytest.raises(ValueError, match="never committed"):
        replicate_to_rdbms(lake, str(tmp_path / "r.db"), "pages",
                           str(tmp_path / "s"), to_epoch=10**9)


def test_staging_reaped_after_commit(lake, tmp_path):
    """ADVICE r3 (medium): a replication daemon must not leak one
    staged feed copy per catch-up call."""
    import glob

    db = str(tmp_path / "replica.db")
    stage = str(tmp_path / "stage")
    epochs = list_epochs(lake)
    replicate_to_rdbms(lake, db, "pages", stage,
                       to_epoch=epochs[len(epochs) // 2 - 1])
    assert glob.glob(os.path.join(stage, "attempt-*")) == []
    replicate_to_rdbms(lake, db, "pages", stage)  # incremental catch-up
    assert glob.glob(os.path.join(stage, "attempt-*")) == []


def test_full_load_over_pre_evolution_partition(lake, tmp_path):
    """ADVICE r3: a full load over a lake holding a partition file
    written BEFORE a payload column existed must null-fill that column
    (the incremental path already did; the full-load path crashed)."""
    import pyarrow.parquet as pq

    from maestro_ray.core.manifest import latest_manifest

    head = list_epochs(lake)[-1]
    live = _lake_state(lake, head)  # snapshot BEFORE the surgery

    # surgically strip `lang` from one live HEAD partition file,
    # simulating a partition untouched since before the column existed
    m = latest_manifest(lake)
    victim = None
    for p in sorted(m.partitions):
        if m.partitions[p]["rows"] > 0:
            f = os.path.join(lake, m.partitions[p]["file"])
            t = pq.read_table(f)
            if "lang" in t.column_names and t.num_rows:
                pq.write_table(t.drop_columns(["lang"]), f)
                victim = t
                break
    assert victim is not None

    db = str(tmp_path / "replica.db")
    stage = str(tmp_path / "stage")
    replicate_to_rdbms(lake, db, "pages", stage)  # full load: no crash
    rep = _replica(db)
    # stripped partition's urls replicate with NULL lang; totals intact
    assert len(rep) == len(live)
    stripped_urls = set(victim.column("url").to_pylist())
    got_null = rep[rep["url"].isin(stripped_urls)]["lang"]
    assert len(got_null) > 0 and got_null.isna().all()
