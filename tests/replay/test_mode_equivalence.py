"""Tail mode and replay mode must produce BYTE-IDENTICAL lake partition
files (including persisted tombstones) when checkpoint boundaries equal
epoch boundaries — the cross-mode convergence invariant that lets tail
and replay epochs interleave on one lake."""

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.tail import tail_ingest


def test_tail_and_replay_produce_identical_partitions(ray_session, tmp_path):
    p = ChangelogParams(seed=13, n_urls=50, n_events=600, seg_rows=100,
                        p_delete=0.15, p_ooo=0.2, p_dup=0.08)
    log = str(tmp_path / "log")
    write_changelog(log, p)
    lake_r = str(tmp_path / "lake_replay")
    lake_t = str(tmp_path / "lake_tail")
    ingest(log, lake_r, num_partitions=4, segments_per_epoch=2)
    tail_ingest(log, lake_t, num_partitions=4, checkpoint_every=2)
    mr, mt = latest_manifest(lake_r), latest_manifest(lake_t)
    assert mr.watermark == mt.watermark == p.n_events - 1
    assert set(mr.partitions) == set(mt.partitions)
    for part, vr in mr.partitions.items():
        vt = mt.partitions[part]
        assert vr["rows"] == vt["rows"], f"partition {part} row count"
        assert vr["checksum"] == vt["checksum"], f"partition {part} checksum"


def test_incremental_views_agree_across_modes(ray_session, tmp_path):
    """The lakehouse layer (views, distinct view, dedup view, join-able
    reads) is mode-agnostic: maintained over a TAIL-built lake it must
    equal the same views over the replay-built lake — the cross-mode
    invariant extended from partition bytes to derived state."""
    import pandas as pd

    from maestro_ray.pipelines.views import (
        maintain_dedup_view,
        maintain_group_counts,
        maintain_group_distinct,
    )

    p = ChangelogParams(seed=29, n_urls=40, n_events=400, seg_rows=100,
                        p_delete=0.15, p_ooo=0.2, p_dup=0.08)
    log = str(tmp_path / "log")
    write_changelog(log, p)
    lake_r = str(tmp_path / "lake_replay")
    lake_t = str(tmp_path / "lake_tail")
    ingest(log, lake_r, num_partitions=4, segments_per_epoch=2)
    tail_ingest(log, lake_t, num_partitions=4, checkpoint_every=2)
    for fn in (lambda lk: maintain_group_counts(lk, "lang"),
               lambda lk: maintain_group_distinct(lk, "lang", "text"),
               lambda lk: maintain_dedup_view(lk),
               # event-time window view (r4 s5): same algebra, same
               # cross-mode invariant
               lambda lk: maintain_group_counts(
                   lk, "bucket:warc_ts:3600000000")):
        vr = fn(lake_r).reset_index(drop=True)
        vt = fn(lake_t).reset_index(drop=True)
        pd.testing.assert_frame_equal(vr, vt)
        assert len(vr) > 0

    # SCD2 history (r4 s5): byte-identical partitions + aligned epochs
    # ⇒ identical version history
    from maestro_ray.pipelines.scd2view import maintain_scd2, read_scd2

    def hist(lk, out):
        maintain_scd2(lk, out)
        return read_scd2(out).to_pandas().sort_values(
            ["url", "valid_from"]).reset_index(drop=True)

    hr = hist(lake_r, str(tmp_path / "scd2_r"))
    ht = hist(lake_t, str(tmp_path / "scd2_t"))
    pd.testing.assert_frame_equal(hr, ht)
    assert len(hr) > 0
