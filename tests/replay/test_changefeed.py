"""Change feed (pipelines/changefeed.py): net changes over any epoch
range must match the pure-replay oracle's state diff, compose (applying
the feed to the from-state reproduces the to-state), collapse to empty
over a compaction epoch, and fail loudly once vacuum ate a diff side."""

import pytest

from maestro_ray.core.manifest import latest_manifest, list_epochs, manifest_at, vacuum
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import compact_partitions
from maestro_ray.oracle import replay
from maestro_ray.pipelines.changefeed import table_changes
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=60, n_events=600, seg_rows=50,
                         evolution=False)


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cf")
    log = str(root / "log")
    events = write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=3)
    assert m is not None and m.epoch >= 3
    return {"dir": lake_dir, "events": events}


def _state(events, wm):
    """Oracle winner map at watermark: url -> (ts_us, lang)."""
    s = replay(None, [e for e in events if e["offset"] <= wm])
    return {u: (v[0], v[3]) for u, v in s.items()}


def _expected(events, wm_from, wm_to):
    a, b = _state(events, wm_from), _state(events, wm_to)
    out = {}
    for u in b:
        if u not in a:
            out[u] = "insert"
        elif a[u] != b[u]:
            out[u] = "update"
    for u in a:
        if u not in b:
            out[u] = "delete"
    return out


def _feed_dict(ds):
    pdf = ds.to_pandas()
    assert pdf["url"].is_unique  # net semantics: one change per url
    return dict(zip(pdf["url"], pdf["change_op"]))


def test_every_adjacent_range_matches_oracle_diff(lake):
    epochs = list_epochs(lake["dir"])
    wm = {e: manifest_at(lake["dir"], e).watermark for e in epochs}
    for prev_e, e in zip([None] + epochs[:-1], epochs):
        got = _feed_dict(table_changes(lake["dir"], prev_e, e))
        exp = _expected(lake["events"], wm[prev_e] if prev_e else -1, wm[e])
        assert got == exp, f"range ({prev_e}, {e}]"


def test_range_collapses_to_net_diff(lake):
    epochs = list_epochs(lake["dir"])
    first, last = epochs[0], epochs[-1]
    got = _feed_dict(table_changes(lake["dir"], first, last))
    exp = _expected(lake["events"],
                    manifest_at(lake["dir"], first).watermark,
                    manifest_at(lake["dir"], last).watermark)
    assert got == exp


def test_every_epoch_pair_matches_oracle_diff(lake):
    """ALL (i < j) epoch pairs, not just adjacent ones: a range feed is
    exactly the state diff of its endpoints, whatever happened between
    them (the algebra that makes feeds composable and resumable)."""
    epochs = list_epochs(lake["dir"])
    wm = {e: manifest_at(lake["dir"], e).watermark for e in epochs}
    for i, a in enumerate(epochs):
        for b in epochs[i + 1:]:
            got = _feed_dict(table_changes(lake["dir"], a, b))
            exp = _expected(lake["events"], wm[a], wm[b])
            assert got == exp, f"range ({a}, {b}]"


def test_genesis_feed_is_live_state_as_inserts(lake):
    last = list_epochs(lake["dir"])[-1]
    pdf = table_changes(lake["dir"], None, last).to_pandas()
    state = _state(lake["events"], manifest_at(lake["dir"], last).watermark)
    assert set(pdf["change_op"]) == {"insert"}
    assert sorted(pdf["url"]) == sorted(state)
    ts = dict(zip(pdf["url"], pdf["warc_ts"]))
    for u, (t_us, _lang) in state.items():
        assert ts[u].value // 1000 == t_us, u


def test_feed_applied_to_from_state_gives_to_state(lake):
    epochs = list_epochs(lake["dir"])
    first, last = epochs[0], epochs[-1]
    state = dict(_state(lake["events"],
                        manifest_at(lake["dir"], first).watermark))
    pdf = table_changes(lake["dir"], first, last).to_pandas()
    for _i, r in pdf.iterrows():
        if r["change_op"] == "delete":
            state.pop(r["url"])
        else:
            state[r["url"]] = (r["warc_ts"].value // 1000, r["lang"])
    assert state == _state(lake["events"],
                           manifest_at(lake["dir"], last).watermark)


def test_unknown_epoch_and_inverted_range_fail(lake):
    with pytest.raises(ValueError, match="available epochs"):
        table_changes(lake["dir"], None, 999)
    epochs = list_epochs(lake["dir"])
    with pytest.raises(ValueError, match="newer than"):
        table_changes(lake["dir"], epochs[-1], epochs[0])


def test_compaction_epoch_feed_is_empty(lake):
    before = list_epochs(lake["dir"])[-1]
    compact_partitions(lake["dir"])
    after = list_epochs(lake["dir"])[-1]
    assert after == before + 1
    ds = table_changes(lake["dir"], before, after)
    assert ds.count() == 0


def test_vacuum_invalidates_feed_loudly(lake):
    first = list_epochs(lake["dir"])[0]
    assert vacuum(lake["dir"], latest_manifest(lake["dir"])) > 0
    with pytest.raises(ValueError, match="vacuumed"):
        table_changes(lake["dir"], None, first)


def test_feed_from_bootstrap_epoch_zero(ray_session, tmp_path):
    """from_epoch=0 (a bootstrapped lake's base epoch) must diff
    against the base state — NOT be mistaken for genesis, which would
    re-report the whole base table as inserts (falsy-zero regression)."""
    import pyarrow.parquet as pq

    from maestro_ray.fixtures import gen_pages
    from maestro_ray.pipelines.ingest import bootstrap

    params = ChangelogParams(n_urls=40, n_events=300, seg_rows=50,
                             evolution=False)
    pages = gen_pages(params.n_urls, seed=7)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    log = str(tmp_path / "log")
    events = write_changelog(log, params)
    lake_dir = str(tmp_path / "lake")
    bootstrap(pages_path, lake_dir, num_partitions=4)
    assert list_epochs(lake_dir)[0] == 0
    ingest(log, lake_dir, num_partitions=4, segments_per_epoch=4)
    last = list_epochs(lake_dir)[-1]
    got = _feed_dict(table_changes(lake_dir, 0, last))
    base = {u: (v[0], v[3]) for u, v in replay(pages, []).items()}
    final = {u: (v[0], v[3]) for u, v in replay(pages, events).items()}
    exp = {}
    for u in final:
        if u not in base:
            exp[u] = "insert"
        elif base[u] != final[u]:
            exp[u] = "update"
    for u in base:
        if u not in final:
            exp[u] = "delete"
    assert got == exp
    # the decisive check: base urls never touched by the log are silent
    touched = {e["url"] for e in events}
    untouched = set(base) - touched
    assert untouched and not (untouched & set(got))


def test_read_side_pre_evolution_and_binary_payloads(tmp_path):
    """_read_side must null-fill payload columns absent from old files
    (pre-evolution) and type absent-side placeholders from the lake
    schema (html is binary, not string)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from maestro_ray.pipelines.changefeed import _diff_partition, _read_side

    old = pa.table({
        "url": pa.array(["a", "b"], pa.string()),
        "warc_ts": pa.array([1, 2], pa.timestamp("us")),
    })  # oldest shape: no op, no lang, no html
    path = str(tmp_path / "old.parquet")
    pq.write_table(old, path)
    side = _read_side(path, ["lang", "html"])
    assert side.column("lang").null_count == 2
    assert side.schema.field("html").type == pa.binary()
    # an absent side joins/concats cleanly against a real binary side
    new = pa.table({
        "url": pa.array(["a"], pa.string()),
        "warc_ts": pa.array([5], pa.timestamp("us")),
        "op": pa.array(["insert"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
        "html": pa.array([b"<x>"], pa.binary()),
    })
    d = _diff_partition(new, _read_side(None, ["lang", "html"]),
                        ["lang", "html"])
    assert d.schema.field("html").type == pa.binary()
    assert d.column("change_op").to_pylist() == ["insert"]
