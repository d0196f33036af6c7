"""rollback_lake: manifest-level undo — restored state byte-matches the
target epoch, history stays addressable, the feed across the rollback
epoch is the net inverse, ingest resumes cleanly on top, and vacuumed
targets refuse loudly."""

import os

import pytest

from maestro_ray.core.manifest import (
    latest_manifest,
    list_epochs,
    manifest_at,
    vacuum,
)
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import fsck_lake, read_lake_at, read_lake_table
from maestro_ray.pipelines.changefeed import table_changes
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.rollback import rollback_lake

PARAMS = ChangelogParams(n_urls=40, n_events=320, seg_rows=40,
                         evolution=False)


@pytest.fixture()
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("rb")
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    # 8 segments, 2/epoch → 4 committed epochs
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    return lake_dir


def _state(d, epoch=None):
    t = (read_lake_at(d, epoch) if epoch is not None
         else read_lake_table(d).to_pandas()
         if not hasattr(read_lake_table(d), "to_pandas") else None)
    if epoch is not None:
        return t.to_pandas().sort_values("url").reset_index(drop=True)
    return read_lake_table(d).to_pandas() \
        .sort_values("url").reset_index(drop=True)


def test_rollback_restores_target_state(lake):
    epochs = list_epochs(lake)
    tgt = epochs[1]
    head_before = latest_manifest(lake)
    want = _state(lake, tgt)
    m = rollback_lake(lake, tgt)
    assert m.epoch == head_before.epoch + 1
    assert m.watermark == head_before.watermark  # events stay consumed
    got = _state(lake)
    assert got.equals(want)
    # counters record the undo provenance
    assert m.counters == {"rolled_back_from": head_before.epoch,
                          "rolled_back_to": tgt}
    # the feed target→rollback-epoch is EMPTY (identical partition map)
    assert table_changes(lake, from_epoch=tgt).count() == 0
    # the bad epochs remain addressable (history preserved)
    assert _state(lake, head_before.epoch) is not None
    # the lake stays structurally sound, shared references included
    rep = fsck_lake(lake, deep=True)
    assert rep["ok"], rep


def test_feed_across_rollback_is_net_inverse(lake):
    epochs = list_epochs(lake)
    tgt, head = epochs[1], epochs[-1]
    fwd = table_changes(lake, from_epoch=tgt, to_epoch=head).to_pandas()
    rollback_lake(lake, tgt)
    new_head = list_epochs(lake)[-1]
    inv = table_changes(lake, from_epoch=head,
                        to_epoch=new_head).to_pandas()
    flip = {"insert": "delete", "delete": "insert", "update": "update"}
    want = {(u, flip[o]) for u, o in
            zip(fwd["url"], fwd["change_op"])}
    got = set(zip(inv["url"], inv["change_op"]))
    assert got == want


def test_rollback_noop_and_idempotent(lake):
    head = latest_manifest(lake)
    # target == head state → no empty epoch
    assert rollback_lake(lake, head.epoch).epoch == head.epoch
    tgt = list_epochs(lake)[0]
    m1 = rollback_lake(lake, tgt)
    # rolling back again to the same target: state already equal → no-op
    m2 = rollback_lake(lake, tgt)
    assert m2.epoch == m1.epoch


def test_rollback_unknown_epoch_rejected(lake):
    # a future/unknown epoch was never committed → manifest_at's loud
    # history-listing error (the "newer than head" branch only guards
    # a concurrently-advanced head)
    with pytest.raises(ValueError, match="available epochs"):
        rollback_lake(lake, latest_manifest(lake).epoch + 5)
    with pytest.raises(ValueError, match="available epochs"):
        rollback_lake(lake, 999)


def test_ingest_resumes_after_rollback(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("rb2")
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    # consume only the first 2 epochs' worth
    ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2,
           max_epochs=2)
    epochs = list_epochs(lake_dir)
    rollback_lake(lake_dir, epochs[0])
    # resume: the watermark survived the rollback, so ingest picks up
    # exactly where it left off — and the rolled-back urls get
    # re-merged only when newer events actually touch them
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None
    assert m.watermark == PARAMS.n_events - 1
    rep = fsck_lake(lake_dir, deep=True)
    assert rep["ok"], rep


def test_rollback_refuses_vacuumed_target(lake):
    tgt = list_epochs(lake)[0]
    vacuum(lake, latest_manifest(lake))
    with pytest.raises(ValueError, match="vacuum"):
        rollback_lake(lake, tgt)


def test_rollback_tolerates_empty_partition_entries(lake, tmp_path):
    """A target manifest entry with rows=0 and no file on disk (the
    purge/clone shape) must NOT be mistaken for a vacuumed target
    (review r4 s8b — rollback_lake lacked the lake_files rows>0
    rule)."""
    from maestro_ray.core.manifest import (
        Manifest,
        manifest_path,
        write_manifest_atomic,
    )

    head = latest_manifest(lake)
    # TARGET manifest carrying a rows=0 entry whose file never existed
    doctored = Manifest(
        epoch=head.epoch + 1, watermark=head.watermark,
        partitions={**{p: dict(v) for p, v in head.partitions.items()},
                    99: {"file": "p=99/epoch-000000000099.parquet",
                         "rows": 0, "checksum": 0, "watermark": -1}},
        counters={}, num_partitions=head.num_partitions)
    write_manifest_atomic(manifest_path(lake, doctored.epoch), doctored)
    # a newer head above it, with the ORIGINAL map
    head2 = Manifest(
        epoch=head.epoch + 2, watermark=head.watermark,
        partitions={p: dict(v) for p, v in head.partitions.items()},
        counters={}, num_partitions=head.num_partitions)
    write_manifest_atomic(manifest_path(lake, head2.epoch), head2)
    # rolling back TO the doctored epoch must not raise "vacuumed"
    m = rollback_lake(lake, doctored.epoch)
    assert m.epoch == head2.epoch + 1
    assert 99 in m.partitions


def test_rollback_crash_before_lineage_heals_on_retry(
        ray_session, tmp_path, monkeypatch):
    """Crash between the manifest write and write_lineage: the retry's
    early-return path must heal the missing lineage (review r4 s8b —
    the r4-s2 unrecoverable-lineage class)."""
    import maestro_ray.pipelines.rollback as rb

    root = tmp_path / "heal"
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    tgt = list_epochs(lake_dir)[0]

    monkeypatch.setattr(rb, "write_lineage",
                        lambda *a, **kw: (_ for _ in ()).throw(
                            RuntimeError("simulated crash")))
    with pytest.raises(RuntimeError, match="simulated"):
        rollback_lake(lake_dir, tgt)
    monkeypatch.undo()

    new_e = latest_manifest(lake_dir).epoch
    lin = os.path.join(lake_dir, "_lineage",
                       f"epoch-{new_e:012d}.parquet")
    assert not os.path.exists(lin)
    m = rollback_lake(lake_dir, tgt)  # retry → early return + heal
    assert m.epoch == new_e
    assert os.path.exists(lin)
    assert fsck_lake(lake_dir, deep=True)["ok"]
