"""op='patch' partial updates (Debezium-style column-level CDC):
engine replay ≡ the sequential epoch-batched oracle
(oracle.replay_epochs) on a patch-heavy fixture, exchange variants
agree, winner-only paths refuse loudly, and the closed-form merge
edges are pinned."""

import numpy as np
import pyarrow as pa
import pytest

from maestro_ray.core.manifest import list_epochs, manifest_at
from maestro_ray.fixtures import (
    ChangelogParams,
    gen_changelog_events,
    write_changelog,
)
from maestro_ray.io.lake import read_lake_table
from maestro_ray.ops.extract_pure import extract_text
from maestro_ray.ops.merge import (
    CANDIDATE,
    combine_candidates,
    events_to_candidates,
    merge_candidates,
)
from maestro_ray.ops.partition import lww_reduce
from maestro_ray.oracle import replay_epochs
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=600, seg_rows=60,
                         evolution=True, p_patch=0.35, p_ooo=0.15)


def _ev_table(rows):
    """list of event dicts → CANDIDATE table (warc_ts int µs)."""
    t = pa.table({
        "offset": pa.array([r["offset"] for r in rows], pa.int64()),
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            pa.timestamp("us")),
        "html": pa.array([r.get("html") for r in rows], pa.binary()),
        "lang": pa.array([r.get("lang") for r in rows], pa.string()),
    })
    return events_to_candidates(t)


def _oracle_df(events, watermarks):
    groups, prev = [], -1
    for wm in watermarks:
        groups.append([e for e in events if prev < e["offset"] <= wm])
        prev = wm
    state = replay_epochs(None, groups)
    urls = sorted(state)
    import pandas as pd

    return pd.DataFrame({
        "url": urls,
        "warc_ts": [state[u][0] for u in urls],
        "html": [state[u][1] for u in urls],
        "text": [state[u][2] for u in urls],
        "lang": [state[u][3] for u in urls],
    })


def _live_df(lake_dir):
    t = read_lake_table(lake_dir)
    df = t.select(["url", "warc_ts", "html", "text", "lang"]).to_pandas()
    df["warc_ts"] = df["warc_ts"].astype("int64")
    return df.sort_values("url").reset_index(drop=True)


def test_replay_matches_sequential_oracle(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    events = gen_changelog_events(PARAMS)
    assert any(e["op"] == "patch" for e in events)

    lake = str(tmp_path / "lake")
    m = ingest(log, lake, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    wms = [manifest_at(lake, e).watermark for e in list_epochs(lake)]
    want = _oracle_df(events, wms)
    got = _live_df(lake)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["warc_ts"].tolist() == want["warc_ts"].tolist()
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["html"].tolist() == want["html"].tolist()
    # the frozen extract contract holds through patched html
    assert got["text"].tolist() == want["text"].tolist()


def test_files_exchange_agrees(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ingest(log, a, num_partitions=4, segments_per_epoch=2)
    ingest(log, b, num_partitions=4, segments_per_epoch=2,
           exchange="files")
    assert _live_df(a).equals(_live_df(b))


def test_slim_and_tail_refuse_patches(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    with pytest.raises(Exception, match="does not support op='patch'"):
        ingest(log, str(tmp_path / "s"), num_partitions=4,
               segments_per_epoch=2, exchange="slim_sort")
    from maestro_ray.pipelines.tail import tail_ingest

    with pytest.raises(Exception, match="does not support op='patch'"):
        tail_ingest(log, str(tmp_path / "t"), num_partitions=4)


# ---------- closed-form merge edges (pure, no cluster) ----------

_TS = 1_700_000_000_000_000


def _full(off, url, ts, html, lang, op="insert"):
    return {"offset": off, "op": op, "url": url, "warc_ts": _TS + ts,
            "html": html, "lang": lang}


def _patch(off, url, ts, html=None, lang=None):
    return {"offset": off, "op": "patch", "url": url,
            "warc_ts": _TS + ts, "html": html, "lang": lang}


def _merge(rows, prev=None):
    out = merge_candidates(prev, _ev_table(rows))
    return {r["url"]: r for r in out.to_pylist()}


def test_patch_applies_only_named_columns():
    got = _merge([
        _full(0, "u", 0, b"<p>base</p>", "en"),
        _patch(1, "u", 10, lang="fr"),
    ])
    r = got["u"]
    assert r["lang"] == "fr"
    assert r["html"] == b"<p>base</p>"
    assert r["text"] == extract_text(b"<p>base</p>")
    # recency advanced to the patch's event time
    assert int(r["warc_ts"].timestamp() * 1_000_000) == _TS + 10


def test_html_patch_reextracts_text():
    got = _merge([
        _full(0, "u", 0, b"<p>old</p>", "en"),
        _patch(1, "u", 10, html=b"<p>new</p>"),
    ])
    r = got["u"]
    assert r["html"] == b"<p>new</p>"
    assert r["text"] == extract_text(b"<p>new</p>")
    assert r["lang"] == "en"


def test_stale_orphan_and_tombstone_patches_ignored():
    got = _merge([
        _full(0, "u", 50, b"<p>u</p>", "en"),
        _patch(1, "u", 10, lang="fr"),        # stale: older than base
        _patch(2, "ghost", 99, lang="fr"),    # orphan: no row to patch
        _full(3, "d", 0, None, None, op="delete"),
        _patch(4, "d", 99, lang="fr"),        # tombstone stays dead
    ])
    assert got["u"]["lang"] == "en"
    assert "ghost" not in got
    assert got["d"]["op"] == "delete" and got["d"]["lang"] is None


def test_newer_full_update_overrides_patch():
    got = _merge([
        _full(0, "u", 0, b"<p>a</p>", "en"),
        _patch(1, "u", 10, lang="fr"),
        _full(2, "u", 20, b"<p>b</p>", "de", op="update"),
    ])
    assert got["u"]["lang"] == "de" and got["u"]["html"] == b"<p>b</p>"


def test_full_update_older_than_patch_loses():
    # within one epoch the patch bumped recency to ts=30; an update at
    # ts=20 arrives in the SAME batch → sequential order applies it
    # BEFORE the patch (ascending key), so the patch lands on top
    got = _merge([
        _full(0, "u", 0, b"<p>a</p>", "en"),
        _patch(1, "u", 30, lang="fr"),
        _full(2, "u", 20, b"<p>b</p>", "de", op="update"),
    ])
    assert got["u"]["html"] == b"<p>b</p>"  # update applied first
    assert got["u"]["lang"] == "fr"         # then the newer patch


def test_cross_epoch_patch_on_stored_row(tmp_path):
    prev = merge_candidates(None, _ev_table(
        [_full(0, "u", 0, b"<p>a</p>", "en")]))
    got = {r["url"]: r for r in merge_candidates(
        prev, _ev_table([_patch(5, "u", 10, lang="fr")])).to_pylist()}
    assert got["u"]["lang"] == "fr" and got["u"]["html"] == b"<p>a</p>"
    assert got["u"]["text"] == extract_text(b"<p>a</p>")


def test_combiner_fast_path_and_split():
    rows = [_full(0, "u", 0, b"<p>a</p>", "en"),
            _full(1, "v", 1, b"<p>b</p>", "de", op="update")]
    t = _ev_table(rows)
    assert combine_candidates(t).equals(lww_reduce(t))
    # a 2-column patch splits into two single-column patch rows
    both = _ev_table(rows + [_patch(2, "u", 5, html=b"<p>c</p>",
                                    lang="fr")])
    c = combine_candidates(both)
    patches = c.to_pylist()
    pr = [r for r in patches if r["op"] == "patch"]
    assert len(pr) == 2
    assert {(r["html"], r["lang"]) for r in pr} == \
        {(None, "fr"), (b"<p>c</p>", None)}
    # combiner + merge ≡ merge alone
    assert merge_candidates(None, c).equals(merge_candidates(None, both))
