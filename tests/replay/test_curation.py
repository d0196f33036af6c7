"""Incremental curated-corpus view (pipelines/curation.py): derived
store ≡ full rebuild at every epoch, curated winners ≡ recompute from
raw lake text, and winner handover through CDC deletes/updates."""

import pandas as pd
import pytest

from maestro_ray.core.manifest import list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import read_lake
from maestro_ray.ops.hashing import hash_array
from maestro_ray.pipelines import curation as cu
from maestro_ray.pipelines.ingest import ingest

MIN_T, MAX_T = 3, 50


def _curated_recompute(lake):
    """Ground truth from the RAW lake text: gate + min passing url per
    content hash — independent of the store."""
    ds = read_lake(lake, columns=["url", "text"])
    df = ds.to_pandas() if ds is not None else pd.DataFrame(
        {"url": [], "text": []})
    txt = df["text"].fillna("")
    n_tok = txt.str.split(" ").map(len)
    df = df.assign(chash=hash_array(txt).view("int64"),
                   n_tokens=n_tok,
                   ok=(n_tok >= MIN_T) & (n_tok <= MAX_T))
    win = (df[df["ok"]].groupby("chash")["url"].min()
           .reset_index().sort_values("chash").reset_index(drop=True))
    return win


def _snapshot(idx):
    out = cu.curated_corpus(idx).to_pandas()
    if out.empty:
        return pd.DataFrame({"chash": pd.Series(dtype="int64"),
                             "url": pd.Series(dtype="object")})
    return out.sort_values("chash").reset_index(drop=True)


def test_incremental_store_and_winners_per_epoch(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(
        n_urls=40, n_events=240, seg_rows=60, seed=31))
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    booted = False
    step = 0
    while True:
        m = ingest(log, lake, num_partitions=4, segments_per_epoch=1,
                   max_epochs=1)
        if not booted:
            cu.bootstrap_curation(lake, idx, n_shards=4,
                                  min_tokens=MIN_T, max_tokens=MAX_T)
            booted = True
        else:
            cu.update_curation(lake, idx)
        # store ≡ fresh bootstrap over the same lake head
        fresh = str(tmp_path / f"fresh{step}")
        cu.bootstrap_curation(lake, fresh, n_shards=4,
                              min_tokens=MIN_T, max_tokens=MAX_T)
        pd.testing.assert_frame_equal(cu.read_curation_store(idx),
                                      cu.read_curation_store(fresh))
        # winners ≡ recompute from raw text
        pd.testing.assert_frame_equal(_snapshot(idx),
                                      _curated_recompute(lake))
        step += 1
        if m is not None and m.watermark >= 239:
            break
    assert step >= 3
    assert list_epochs(lake)[-1] >= 2


def test_update_noop_when_current(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(
        n_urls=20, n_events=80, seg_rows=40, seed=5))
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=2, segments_per_epoch=2)
    idx = str(tmp_path / "idx")
    cu.bootstrap_curation(lake, idx, n_shards=2,
                          min_tokens=MIN_T, max_tokens=MAX_T)
    before = cu.read_curation_store(idx)
    meta = cu.update_curation(lake, idx)  # no new epochs
    pd.testing.assert_frame_equal(cu.read_curation_store(idx), before)
    assert meta["epoch"] == list_epochs(lake)[-1]


def test_gate_filters_and_dedup_winner(ray_session, tmp_path):
    """Direct semantics on a hand-built changelog: failing docs never
    win; duplicate content resolves to the smallest url. The standard
    fixture's html is constant-width (150 tokens/doc), so plant docs
    with VARYING token counts and an exact content twin explicitly."""
    import os

    import pyarrow.parquet as pq

    from maestro_ray.fixtures import _events_to_table

    def ev(off, url, words):
        html = ("<p>" + " ".join(words) + "</p>").encode()
        return {"offset": off, "op": "insert", "url": url,
                "warc_ts": 1_600_000_000_000_000 + off * 1_000_000,
                "html": html, "lang": "en"}

    short = ["too", "short"]                       # 2 tokens → fails
    mid = ["alpha", "beta", "gamma", "delta"]      # 4 tokens → passes
    long = [f"w{i}" for i in range(40)]            # 40 tokens → fails
    events = [
        ev(0, "https://a.example/0", short),
        ev(1, "https://a.example/1", mid),
        ev(2, "https://a.example/2", mid),   # content twin of /1
        ev(3, "https://a.example/3", long),
        ev(4, "https://a.example/4", ["solo", "passing", "doc"]),
    ]
    log = str(tmp_path / "log")
    os.makedirs(log)
    pq.write_table(_events_to_table(events, 3),
                   os.path.join(log, "seg-000000000000.parquet"))
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    idx = str(tmp_path / "idx")
    # a tight gate that FAILS the short and long docs
    cu.bootstrap_curation(lake, idx, n_shards=2, min_tokens=3,
                          max_tokens=10)
    store = cu.read_curation_store(idx)
    assert (~store["pass"]).any() and store["pass"].any()
    snap = _snapshot(idx)
    merged = snap.merge(store, on=["chash", "url"], how="left")
    assert merged["pass"].all()  # every winner passed the gate
    # winner is the min passing url of its hash group
    passing = store[store["pass"]]
    want = passing.groupby("chash")["url"].min()
    got = snap.set_index("chash")["url"]
    assert got.sort_index().equals(want.sort_index())
