"""Log compaction (io/changelog.py compact_changelog): a fresh replay
of the compacted log must converge to the SAME final table state as
replaying the original — same winners, same tombstones — at
O(distinct urls) events."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.changelog import (compact_changelog, list_segments,
                                      read_changelog)
from maestro_ray.pipelines.ingest import ingest


def _state(lake_dir) -> pd.DataFrame:
    """PHYSICAL state incl. tombstones — the byte-level convergence
    target (read_lake_table drops tombstones, so read the files)."""
    import pyarrow as pa

    from maestro_ray.io.lake import lake_files

    t = pa.concat_tables(
        [pq.read_table(f) for f in lake_files(lake_dir, None)],
        promote_options="default").to_pandas()
    return (t[["url", "warc_ts", "text", "lang", "op"]]
            .sort_values(["url", "warc_ts"]).reset_index(drop=True))


@pytest.fixture()
def log(ray_session, tmp_path):
    d = str(tmp_path / "log")
    write_changelog(d, ChangelogParams(
        seed=23, n_urls=60, n_events=900, seg_rows=80,
        p_delete=0.2, evolution=False))
    return d


def test_compacted_replay_converges_identically(log, tmp_path):
    lake_a = str(tmp_path / "lake_a")
    ingest(log, lake_a, num_partitions=4, segments_per_epoch=3)

    out = str(tmp_path / "compacted")
    stats = compact_changelog(log, out, seg_rows=25)
    # one winner per url present in the log
    ev = read_changelog(out).to_pandas()
    assert stats["events_out"] == ev["url"].nunique() == len(ev)
    assert stats["events_out"] < 900
    # contiguous renumbered offsets 0..k-1, order-preserving
    assert sorted(ev["offset"]) == list(range(len(ev)))

    lake_b = str(tmp_path / "lake_b")
    ingest(out, lake_b, num_partitions=4, segments_per_epoch=3)
    pd.testing.assert_frame_equal(_state(lake_a), _state(lake_b))


def test_compaction_idempotent(log, tmp_path):
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    compact_changelog(log, c1, seg_rows=25)
    compact_changelog(c1, c2, seg_rows=25)
    a = read_changelog(c1).to_pandas().sort_values("offset") \
        .reset_index(drop=True)
    b = read_changelog(c2).to_pandas().sort_values("offset") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_compaction_segment_layout(log, tmp_path):
    out = str(tmp_path / "c")
    stats = compact_changelog(log, out, seg_rows=25)
    segs = list_segments(out)
    assert len(segs) == stats["segments"]
    # segment files are contiguous 25-row ranges named by first offset
    for i, (first, path) in enumerate(segs):
        assert first == i * 25
        offs = pq.read_table(path, columns=["offset"]) \
            .column("offset").to_pylist()
        assert offs == sorted(offs)
        assert offs[0] == first


def test_compaction_refuses_nonempty_out(log, tmp_path):
    out = str(tmp_path / "c")
    os.makedirs(out)
    open(os.path.join(out, "junk"), "w").close()
    with pytest.raises(FileExistsError):
        compact_changelog(log, out)
