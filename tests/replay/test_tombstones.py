"""Tombstone persistence across epoch boundaries (ADVICE r1, high).

A delete whose epoch has been committed must keep losing the LWW race
against later-arriving OUT-OF-ORDER events (older ``warc_ts``) — i.e.
tombstones are remembered in the lake partition files, not only in the
memory of the epoch that saw them. The sequential oracle keeps every
url's winner for the whole stream; these tests pin the engine to it on
the exact 3-event scenario that used to diverge, in replay mode, tail
mode (including an actor restart, which used to lose in-memory
tombstones), and through compaction vacuum.
"""

import os

import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import _events_to_table
from maestro_ray.io.lake import compact_partitions, lake_files, read_lake_table
from maestro_ray.oracle import replay_to_table
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.tail import tail_ingest

T0 = 1704067200000000  # 2024-01-01T00:00:00Z in µs
URL = "https://site0.example/0"
HTML_V1 = b"<p>version one</p>"
HTML_OOO = b"<p>late out-of-order update</p>"
HTML_NEW = b"<p>legitimately newer than the delete</p>"


def _ev(off, op, ts_us, html):
    return {
        "offset": off,
        "op": op,
        "url": URL,
        "warc_ts": ts_us,
        "html": html,
        "lang": None if op == "delete" else "en",
    }


def _write_segments(log_dir, segments):
    os.makedirs(log_dir, exist_ok=True)
    for rows in segments:
        first = rows[0]["offset"]
        pq.write_table(
            _events_to_table(rows, 3),
            os.path.join(log_dir, f"seg-{first:012d}.parquet"),
        )


# the poison pill: insert, delete 2s later, then an out-of-order update
# timestamped BETWEEN them arriving in a LATER epoch — the delete must win
POISON = [
    [_ev(0, "insert", T0, HTML_V1), _ev(1, "delete", T0 + 2_000_000, None)],
    [_ev(2, "update", T0 + 1_500_000, HTML_OOO)],
]


def _check(lake, events):
    expected = replay_to_table(None, events)
    got = read_lake_table(lake)
    assert got.num_rows == expected.num_rows
    for col in expected.column_names:
        assert got.column(col).equals(expected.column(col)), col


def test_replay_ooo_update_cannot_resurrect_delete(ray_session, tmp_path):
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    _write_segments(log, POISON)
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    _check(lake, [e for seg in POISON for e in seg])  # oracle: 0 rows
    # and the tombstone is physically persisted in the partition file
    raw = pa_concat(lake)
    assert raw.num_rows == 1 and raw.column("op").to_pylist() == ["delete"]


def test_replay_newer_update_resurrects_legitimately(ray_session, tmp_path):
    segments = [
        POISON[0],
        [_ev(2, "update", T0 + 3_000_000, HTML_NEW)],  # NEWER than delete
    ]
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    _write_segments(log, segments)
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    events = [e for seg in segments for e in seg]
    _check(lake, events)
    assert read_lake_table(lake).num_rows == 1


def test_tail_restart_keeps_tombstones(ray_session, tmp_path):
    """checkpoint_every=1 + two separate tail_ingest calls: the second
    call's fresh actors must reload the tombstone from the lake file."""
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    _write_segments(log, POISON)
    m1 = tail_ingest(log, lake, num_partitions=2, checkpoint_every=1,
                     max_segments=1)
    assert m1.watermark == 1
    m2 = tail_ingest(log, lake, num_partitions=2, checkpoint_every=1)
    assert m2.watermark == 2
    _check(lake, [e for seg in POISON for e in seg])  # 0 rows


def test_vacuum_drops_expired_tombstones_only(ray_session, tmp_path):
    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    segments = [
        POISON[0],
        [
            _ev(2, "update", T0 + 1_500_000, HTML_OOO),
            _ev(3, "insert", T0 + 9_000_000, HTML_NEW),
        ],
    ]
    # second event targets a different url so a live row survives
    segments[1][1]["url"] = "https://site0.example/1"
    _write_segments(log, segments)
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    assert pa_concat(lake).num_rows == 2  # 1 live + 1 tombstone
    # event-time watermark safely past the delete's warc_ts
    m = compact_partitions(lake, vacuum_tombstones_ts=T0 + 10_000_000)
    assert m.epoch == latest_manifest(lake).epoch
    raw = pa_concat(lake)
    assert raw.num_rows == 1  # tombstone vacuumed, live row intact
    assert "delete" not in raw.column("op").to_pylist()
    _check(lake, [e for seg in segments for e in seg])


def pa_concat(lake):
    import pyarrow as pa

    files = lake_files(lake)
    if not files:
        from maestro_ray.core.schema import LAKE_V2

        return LAKE_V2.empty_table()
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_read_lake_columns_handles_mixed_op_files(ray_session, tmp_path):
    """A lake upgraded mid-life keeps pre-tombstone (no `op` column)
    files for untouched partitions; the pruned-columns reader must
    handle the mix instead of crashing on the missing field
    (self-review r2 finding)."""
    from maestro_ray.io.lake import read_lake

    log, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    segments = [
        [_ev(0, "insert", T0, HTML_V1), _ev(1, "delete", T0 + 2_000_000, None)],
        [_ev(2, "insert", T0 + 3_000_000, HTML_NEW)],
    ]
    segments[1][0]["url"] = "https://site0.example/1"
    _write_segments(log, segments)
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    # simulate an r1 leftover: strip `op` from one partition's file
    files = lake_files(lake)
    assert len(files) >= 2
    legacy = pq.read_table(files[0]).drop_columns(["op"])
    pq.write_table(legacy, files[0])
    stripped_rows = legacy.num_rows
    # narrow read must not crash and must still hide NEW files' tombstones
    got = read_lake(lake, columns=["url", "warc_ts"]).to_pandas()
    raw = read_lake(lake, columns=["url", "op"]).to_pandas()
    tomb_in_new = sum(
        1 for f in files[1:]
        for v in pq.read_table(f).column("op").to_pylist() if v == "delete"
    )
    assert len(raw) == stripped_rows + sum(
        pq.read_table(f).num_rows for f in files[1:]
    )
    assert raw["op"].isna().sum() == stripped_rows  # legacy rows: null op
    assert (raw["op"] == "delete").sum() == tomb_in_new
    assert len(got) == len(raw) - tomb_in_new  # filtered view hides them
    # the NO-columns read and the driver-side full read must survive
    # the same mix (ADVICE r2: both crashed on schema unification)
    from maestro_ray.io.lake import read_lake_table

    full = read_lake(lake).to_pandas()
    assert len(full) == len(got)
    assert set(full["url"]) == set(got["url"])
    tab = read_lake_table(lake)
    assert tab.num_rows == len(got)
    assert set(tab.column("url").to_pylist()) == set(got["url"])
