"""rollback_multi: atomic cross-table undo — every table restored to
the joint target, torn applies recovered from the journal, vacuum and
unknown-epoch refusals."""

import json

import pytest

from maestro_ray.core.manifest import latest_manifest, vacuum
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.pipelines import multi
from maestro_ray.pipelines.multi import (
    committed_epoch,
    committed_epochs,
    ingest_multi,
    read_table,
    recover,
    rollback_multi,
    table_dir,
)

P_A = ChangelogParams(n_urls=30, n_events=240, seg_rows=60, seed=31)
P_B = ChangelogParams(n_urls=25, n_events=180, seg_rows=60, seed=32)


@pytest.fixture()
def root(ray_session, tmp_path):
    logs = {"a": str(tmp_path / "la"), "b": str(tmp_path / "lb")}
    write_changelog(logs["a"], P_A)
    write_changelog(logs["b"], P_B)
    r = str(tmp_path / "root")
    ingest_multi(r, logs, num_partitions=4, segments_per_epoch=1)
    assert len(committed_epochs(r)) >= 3
    return r


def _state(root, name, epoch=None):
    return read_table(root, name, epoch) \
        .to_pandas().sort_values("url").reset_index(drop=True)


def test_rollback_multi_restores_both_tables(root):
    epochs = committed_epochs(root)
    tgt = epochs[1]
    want = {n: _state(root, n, tgt) for n in ("a", "b")}
    wm = {n: latest_manifest(table_dir(root, n)).watermark
          for n in ("a", "b")}
    new_e = rollback_multi(root, tgt)
    assert new_e == epochs[-1] + 1
    assert committed_epoch(root) == new_e
    for n in ("a", "b"):
        assert _state(root, n).equals(want[n]), n
        m = latest_manifest(table_dir(root, n))
        assert m.epoch == new_e
        assert m.watermark == wm[n]  # consumed events stay consumed
        assert m.counters["rolled_back_to"] <= tgt
    # idempotent: a second rollback to the same target is a no-op
    assert rollback_multi(root, tgt) is None


def test_rollback_multi_torn_apply_recovers(root, tmp_path,
                                            monkeypatch):
    epochs = committed_epochs(root)
    tgt = epochs[0]
    want = {n: _state(root, n, tgt) for n in ("a", "b")}

    calls = {"n": 0}
    orig = multi.write_lineage

    def crashing(lake, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # crash before table b's lineage lands
            raise RuntimeError("simulated crash mid-rollback-apply")
        return orig(lake, *a, **kw)

    monkeypatch.setattr(multi, "write_lineage", crashing)
    with pytest.raises(RuntimeError, match="simulated"):
        rollback_multi(root, tgt)
    monkeypatch.setattr(multi, "write_lineage", orig)

    # the journal gates the torn epoch; recover completes it
    assert committed_epoch(root) == epochs[-1]
    assert recover(root) == 1
    new_e = committed_epoch(root)
    assert new_e == epochs[-1] + 1
    for n in ("a", "b"):
        assert _state(root, n).equals(want[n]), n


def test_rollback_multi_refusals(root):
    with pytest.raises(ValueError, match="never committed"):
        rollback_multi(root, 999)
    tgt = committed_epochs(root)[0]
    vacuum(table_dir(root, "a"),
           latest_manifest(table_dir(root, "a")))
    with pytest.raises(ValueError, match="vacuum"):
        rollback_multi(root, tgt)
    # nothing was journaled by the refused attempt
    assert committed_epoch(root) == committed_epochs(root)[-1]
    rec = json.load(open(multi._txn_path(root, committed_epoch(root))))
    assert rec.get("kind") != "rollback"


def test_rollback_multi_refuses_foreign_journal_clobber(
        root, monkeypatch):
    """A txn record already journaled at the would-be epoch with
    DIFFERENT content must raise, never be overwritten (review r4
    s8b — a concurrent ingest mid-apply would have its journal
    clobbered and recovery wedged). The race window is 'other writer
    journals after our recover() pass' — recover is no-oped to land
    inside it."""
    from maestro_ray.core.manifest import ConcurrentCommitError

    applied = committed_epoch(root)
    foreign = multi._txn_path(root, applied + 1)
    # a torn concurrent-ingest record (table 'a' not yet published
    # at this epoch)
    multi._write_txn_atomic(
        foreign, {"tables": {"a": {}}, "note": "other"})
    monkeypatch.setattr(multi, "recover", lambda r: 0)
    with pytest.raises(ConcurrentCommitError, match="journaled"):
        rollback_multi(root, committed_epochs(root)[0])
    with open(foreign) as f:
        assert json.load(f)["note"] == "other"  # untouched
