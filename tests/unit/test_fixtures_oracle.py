"""Fixture-generator determinism + replay-oracle sanity (M0)."""

import pyarrow.parquet as pq

from maestro_ray.core.schema import PAGES_V2
from maestro_ray.fixtures import (
    ChangelogParams,
    gen_changelog_events,
    gen_pages,
    write_changelog,
)
from maestro_ray.oracle import replay, replay_to_table

SMALL = ChangelogParams(n_urls=50, n_events=400, seg_rows=100)


def test_generator_deterministic():
    a = gen_changelog_events(SMALL)
    b = gen_changelog_events(SMALL)
    assert a == b
    assert gen_pages(20, seed=7).equals(gen_pages(20, seed=7))


def test_events_shape():
    evs = gen_changelog_events(SMALL)
    assert [e["offset"] for e in evs] == list(range(400))
    ops = {e["op"] for e in evs}
    assert ops == {"insert", "update", "delete"}
    for e in evs:
        if e["op"] == "delete":
            assert e["html"] is None
        else:
            assert isinstance(e["html"], bytes)


def test_segments_written_with_evolution(tmp_path):
    d = str(tmp_path / "log")
    write_changelog(d, SMALL)
    import os

    segs = sorted(os.listdir(d))
    assert segs[0] == "seg-000000000000.parquet"
    first = pq.read_schema(os.path.join(d, segs[0]))
    last = pq.read_schema(os.path.join(d, segs[-1]))
    assert "lang" not in first.names  # v1
    assert "lang" in last.names  # v3
    assert str(last.field("warc_ts").type) == "timestamp[us]"


def test_oracle_lww_and_tombstones():
    events = [
        {"offset": 0, "op": "insert", "url": "u1", "warc_ts": 100, "html": b"<p>a</p>", "lang": "en"},
        {"offset": 1, "op": "update", "url": "u1", "warc_ts": 300, "html": b"<p>b</p>", "lang": "en"},
        {"offset": 2, "op": "update", "url": "u1", "warc_ts": 200, "html": b"<p>c</p>", "lang": "en"},  # late
        {"offset": 3, "op": "insert", "url": "u2", "warc_ts": 100, "html": b"<p>x</p>", "lang": None},
        {"offset": 4, "op": "delete", "url": "u2", "warc_ts": 400, "html": None, "lang": None},
    ]
    state = replay(None, events)
    assert state["u1"][2] == "b"  # LWW by warc_ts, not offset
    assert "u2" not in state  # tombstone


def test_oracle_tie_breaks_by_offset_and_dups_noop():
    events = [
        {"offset": 0, "op": "insert", "url": "u", "warc_ts": 100, "html": b"a", "lang": None},
        {"offset": 1, "op": "update", "url": "u", "warc_ts": 100, "html": b"b", "lang": None},
    ]
    assert replay(None, events)["u"][2] == "b"
    assert replay(None, events + [events[0]]) == replay(None, events)


def test_oracle_base_pages_participate():
    pages = gen_pages(5, seed=1)
    # no events: final state == base pages
    t = replay_to_table(pages, [])
    assert t.num_rows == 5
    assert t.schema.equals(PAGES_V2)
    # a delete newer than everything removes a url
    url = pages.column("url")[0].as_py()
    ev = [{"offset": 0, "op": "delete", "url": url,
           "warc_ts": 10**18, "html": None, "lang": None}]
    assert replay_to_table(pages, ev).num_rows == 4
