"""Multi-table transactional ingest (pipelines/multi.py): lockstep
epochs, atomic cross-table commit, crash recovery, idempotent rerun."""

import json
import os

import pandas as pd
import pytest

from maestro_ray.core.manifest import latest_manifest, manifest_path
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import read_lake_table
from maestro_ray.pipelines import multi
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.multi import (
    committed_epochs,
    ingest_multi,
    recover,
    table_dir,
)

P_A = ChangelogParams(n_urls=40, n_events=300, seg_rows=60, seed=11)
P_B = ChangelogParams(n_urls=30, n_events=240, seg_rows=60, seed=22)


@pytest.fixture(scope="module")
def logs(tmp_path_factory):
    root = tmp_path_factory.mktemp("multilogs")
    a, b = str(root / "a"), str(root / "b")
    write_changelog(a, P_A)
    write_changelog(b, P_B)
    return {"a": a, "b": b}


def _table_bytes(lake):
    t = read_lake_table(lake)
    return t.sort_by("url").to_pandas().to_csv(index=False)


def test_multi_matches_single_table_ingest(ray_session, logs, tmp_path):
    root = str(tmp_path / "root")
    out = ingest_multi(root, logs, num_partitions=4, segments_per_epoch=2)
    assert out["a"].watermark == P_A.n_events - 1
    assert out["b"].watermark == P_B.n_events - 1
    # every joint epoch has ONE txn record and both tables' manifests
    for e in committed_epochs(root):
        rec = json.load(open(multi._txn_path(root, e)))
        for name in rec["tables"]:
            assert os.path.exists(manifest_path(table_dir(root, name), e))
    # state identical to independent single-table ingest
    for name, params in (("a", P_A), ("b", P_B)):
        solo = str(tmp_path / f"solo_{name}")
        ingest(logs[name], solo, num_partitions=4, segments_per_epoch=2)
        assert _table_bytes(table_dir(root, name)) == _table_bytes(solo)


def test_crash_between_journal_and_apply_recovers(ray_session, logs,
                                                  tmp_path, monkeypatch):
    root = str(tmp_path / "root")
    # crash INSIDE apply, after table 'a' publishes but before 'b'
    orig = multi.publish_epoch
    calls = {"n": 0}

    def crashing(lake, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # second table of the first txn
            raise RuntimeError("simulated crash mid-apply")
        return orig(lake, *a, **kw)

    monkeypatch.setattr(multi, "publish_epoch", crashing)
    with pytest.raises(RuntimeError):
        ingest_multi(root, logs, num_partitions=4)
    monkeypatch.setattr(multi, "publish_epoch", orig)

    # torn state: txn exists, one table applied, one not
    e = committed_epochs(root)[0]
    applied = [os.path.exists(manifest_path(table_dir(root, n), e))
               for n in ("a", "b")]
    assert applied.count(True) == 1

    # recovery completes the txn from the journal alone
    assert recover(root) == 1
    for n in ("a", "b"):
        assert os.path.exists(manifest_path(table_dir(root, n), e))

    # and a rerun converges both tables to the full watermark
    out = ingest_multi(root, logs, num_partitions=4)
    assert out["a"].watermark == P_A.n_events - 1
    assert out["b"].watermark == P_B.n_events - 1


def test_rerun_is_idempotent(ray_session, logs, tmp_path):
    root = str(tmp_path / "root")
    ingest_multi(root, logs, num_partitions=4)
    before = {n: _table_bytes(table_dir(root, n)) for n in logs}
    epochs = committed_epochs(root)
    out = ingest_multi(root, logs, num_partitions=4)  # nothing to do
    assert committed_epochs(root) == epochs
    for n in logs:
        assert _table_bytes(table_dir(root, n)) == before[n]
        assert latest_manifest(table_dir(root, n)).watermark \
            == out[n].watermark


def test_uneven_tables_one_finishes_early(ray_session, tmp_path):
    # 'a' has 3 epochs of segments, 'b' only 1 — later txns cover 'a'
    root = str(tmp_path / "root")
    la, lb = str(tmp_path / "la"), str(tmp_path / "lb")
    write_changelog(la, ChangelogParams(n_urls=20, n_events=180,
                                        seg_rows=60, seed=5))
    write_changelog(lb, ChangelogParams(n_urls=20, n_events=60,
                                        seg_rows=60, seed=6))
    out = ingest_multi(root, {"a": la, "b": lb}, num_partitions=4,
                       segments_per_epoch=1)
    assert out["a"].watermark == 179
    assert out["b"].watermark == 59
    last = committed_epochs(root)[-1]
    rec = json.load(open(multi._txn_path(root, last)))
    assert set(rec["tables"]) == {"a"}  # b long since done


def test_crash_between_publish_and_lineage_recovers(ray_session, logs,
                                                    tmp_path):
    """r4 review finding: manifest landed but lineage didn't — recover
    must re-apply (both writes are the txn's applied condition)."""
    root = str(tmp_path / "root")
    ingest_multi(root, logs, num_partitions=4)
    e = committed_epochs(root)[0]
    lp = multi._lineage_path(table_dir(root, "b"), e)
    assert os.path.exists(lp)
    os.remove(lp)  # simulate the torn state
    assert recover(root) == 1
    assert os.path.exists(lp)


def test_file_group_counts_stored_measure_pre_evolution(tmp_path):
    """r4 review finding: a stored-column SUM measure over a file
    missing that column must yield zeros, not ArrowTypeError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from maestro_ray.pipelines.views import _file_group_counts

    p = str(tmp_path / "old.parquet")
    pq.write_table(pa.table({"lang": ["en", "en", "de"],
                             "op": ["insert"] * 3}), p)
    got = _file_group_counts(p, "lang", "n_chars")
    assert got == {"en": 0, "de": 0}
    # len: measure over the same pre-evolution file also yields zeros
    got2 = _file_group_counts(p, "lang", "len:text")
    assert got2 == {"en": 0, "de": 0}


def test_journal_gated_snapshot_reads(ray_session, logs, tmp_path,
                                      monkeypatch):
    """read_table honors the JOURNAL: a torn txn (applied for table a,
    not b) gates committed_epoch below it, so a reader can never pair
    table a at epoch e with table b at e-1 (r4 s4)."""
    from maestro_ray.pipelines.multi import committed_epoch, read_table

    root = str(tmp_path / "root")
    orig = multi.publish_epoch
    calls = {"n": 0}

    def crashing(lake, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-apply")
        return orig(lake, *a, **kw)

    monkeypatch.setattr(multi, "publish_epoch", crashing)
    with pytest.raises(RuntimeError):
        ingest_multi(root, logs, num_partitions=4)
    monkeypatch.setattr(multi, "publish_epoch", orig)

    # torn first txn: journal record exists, only table 'a' applied
    e = committed_epochs(root)[0]
    assert committed_epoch(root) is None  # gated below the torn txn
    with pytest.raises(ValueError, match="no fully-applied"):
        read_table(root, "a")

    recover(root)
    assert committed_epoch(root) == e
    a = read_table(root, "a").to_pandas()
    b = read_table(root, "b").to_pandas()
    assert len(a) > 0 and len(b) > 0

    # continue to head; snapshot pair at an EXPLICIT old epoch stays
    # consistent and the head gate advances
    ingest_multi(root, logs, num_partitions=4)
    head = committed_epoch(root)
    assert head == committed_epochs(root)[-1]
    old_a = read_table(root, "a", epoch=e).to_pandas()
    pd.testing.assert_frame_equal(
        old_a.sort_values("url").reset_index(drop=True),
        a.sort_values("url").reset_index(drop=True))
    with pytest.raises(ValueError, match="never committed"):
        read_table(root, "a", epoch=10_000)


def test_explicit_epoch_read_rejects_torn_txn(ray_session, logs,
                                              tmp_path, monkeypatch):
    """read_table(epoch=e) on a journaled-but-torn txn must refuse —
    it could pair table a@e with table b@e-1 (r4 s4 review)."""
    from maestro_ray.pipelines.multi import read_table

    root = str(tmp_path / "root")
    orig = multi.publish_epoch
    calls = {"n": 0}

    def crashing(lake, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("boom")
        return orig(lake, *a, **kw)

    monkeypatch.setattr(multi, "publish_epoch", crashing)
    with pytest.raises(RuntimeError):
        ingest_multi(root, logs, num_partitions=4)
    monkeypatch.setattr(multi, "publish_epoch", orig)
    e = committed_epochs(root)[0]
    with pytest.raises(ValueError, match="not fully applied"):
        read_table(root, "a", epoch=e)
    recover(root)
    assert len(read_table(root, "a", epoch=e).to_pandas()) > 0
