"""Branch merge (pipelines/branch.py): clone → diverge BOTH sides →
merge back. The merged live state must equal the per-url LWW fold of
the source state with the branch's net feed (ties → branch), branch
text must land byte-identical, deletes must propagate, the merge must
be idempotent, and fsck must stay clean."""

import pandas as pd
import pytest

from maestro_ray.core.manifest import latest_manifest, list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import clone_lake, fsck_lake, read_lake_table
from maestro_ray.pipelines.branch import merge_branch
from maestro_ray.pipelines.changefeed import table_changes
from maestro_ray.pipelines.ingest import ingest


def _live(lake_dir) -> pd.DataFrame:
    t = read_lake_table(lake_dir).to_pandas()
    return (t[["url", "warc_ts", "text", "lang"]]
            .sort_values("url").reset_index(drop=True))


@pytest.fixture()
def forked(ray_session, tmp_path):
    """src ingests log A; branch clones at head; branch ingests log B;
    src ingests log C — real three-way divergence over one url space."""
    logs = {}
    # B and C must carry offsets ABOVE A's watermark (399) or the
    # replay dedup filters them as already-applied
    for name, seed, n in (("A", 5, 400), ("B", 6, 700), ("C", 7, 700)):
        d = str(tmp_path / f"log{name}")
        write_changelog(d, ChangelogParams(
            seed=seed, n_urls=50, n_events=n, seg_rows=50,
            p_delete=0.15, evolution=False))
        logs[name] = d
    src = str(tmp_path / "src")
    ingest(logs["A"], src, num_partitions=4, segments_per_epoch=3)
    fork = latest_manifest(src).epoch
    branch = str(tmp_path / "branch")
    clone_lake(src, branch, epoch=fork)
    ingest(logs["B"], branch, num_partitions=4, segments_per_epoch=3)
    ingest(logs["C"], src, num_partitions=4, segments_per_epoch=3)
    return {"src": src, "branch": branch, "fork": fork}


def _expected_after_merge(src, branch, fork) -> pd.DataFrame:
    """Reference fold: apply the branch's net feed onto the source's
    PHYSICAL pre-merge state (incl. remembered tombstones — a source
    delete newer than a branch update must keep the url dead), per
    url, LWW by warc_ts with ties → branch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from maestro_ray.io.lake import lake_files

    phys = pa.concat_tables(
        [pq.read_table(f) for f in lake_files(src, None)],
        promote_options="default").to_pandas()
    state = {
        r["url"]: {"warc_ts": r["warc_ts"], "text": r["text"],
                   "lang": r["lang"], "dead": r["op"] == "delete"}
        for _i, r in phys.iterrows()
    }
    feed = table_changes(branch, from_epoch=fork,
                         payload_columns=("text", "lang")).to_pandas()
    for _i, ev in feed.iterrows():
        u = ev["url"]
        cur = state.get(u)
        if cur is not None and cur["warc_ts"] > ev["warc_ts"]:
            continue  # source is strictly newer — keeps its winner
        state[u] = {"warc_ts": ev["warc_ts"], "text": ev["text"],
                    "lang": ev["lang"],
                    "dead": ev["change_op"] == "delete"}
    alive = {u: {k: v for k, v in r.items() if k != "dead"}
             for u, r in state.items() if not r["dead"]}
    out = pd.DataFrame.from_dict(alive, orient="index") \
        .rename_axis("url").reset_index()
    out["warc_ts"] = out["warc_ts"].astype("datetime64[us]")
    return out.sort_values("url").reset_index(drop=True)


def test_merge_matches_lww_fold(forked):
    src, branch, fork = forked["src"], forked["branch"], forked["fork"]
    want = _expected_after_merge(src, branch, fork)
    m = merge_branch(src, branch, fork_epoch=fork)
    assert m.epoch == latest_manifest(src).epoch
    got = _live(src)
    pd.testing.assert_frame_equal(
        got[["url", "warc_ts", "text", "lang"]],
        want[["url", "warc_ts", "text", "lang"]])
    # the branch itself is untouched
    assert latest_manifest(branch) is not None
    # text byte-identity for branch-won urls
    bl = _live(branch).set_index("url")
    gl = got.set_index("url")
    feed_urls = set(table_changes(branch, from_epoch=fork)
                    .to_pandas()["url"])
    won = [u for u in feed_urls
           if u in gl.index and u in bl.index
           and gl.loc[u, "warc_ts"] == bl.loc[u, "warc_ts"]]
    assert won, "fixture must produce branch-won urls"
    for u in won:
        assert gl.loc[u, "text"] == bl.loc[u, "text"]


def test_merge_is_idempotent_and_fsck_clean(forked):
    src, branch, fork = forked["src"], forked["branch"], forked["fork"]
    merge_branch(src, branch, fork_epoch=fork)
    first = _live(src)
    e1 = latest_manifest(src).epoch
    # re-merging the same feed changes nothing (LWW re-applies equal
    # rows; content-identical partitions)
    merge_branch(src, branch, fork_epoch=fork)
    pd.testing.assert_frame_equal(_live(src), first)
    rep = fsck_lake(src, deep=True)
    assert rep["ok"], rep
    assert e1 in list_epochs(src)


def test_zero_divergence_publishes_nothing(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(
        seed=9, n_urls=30, n_events=200, seg_rows=50, evolution=False))
    src = str(tmp_path / "src")
    ingest(log, src, num_partitions=4, segments_per_epoch=2)
    fork = latest_manifest(src).epoch
    branch = str(tmp_path / "branch")
    clone_lake(src, branch, epoch=fork)
    m = merge_branch(src, branch, fork_epoch=fork)
    assert m.epoch == fork  # no empty epoch published


def test_repartitioned_branch_merges_as_noop(ray_session, tmp_path):
    """A branch that was only REPARTITIONED emits paired delete@old +
    insert@new with identical (url, warc_ts) for every moved url —
    the merge must resolve those ties to the insert (upserts carry a
    higher synthetic offset than deletes), not tombstone live rows by
    concatenation order (review finding, blocking)."""
    from maestro_ray.io.lake import repartition_lake

    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(
        seed=11, n_urls=40, n_events=300, seg_rows=50,
        p_delete=0.1, evolution=False))
    src = str(tmp_path / "src")
    ingest(log, src, num_partitions=4, segments_per_epoch=2)
    fork = latest_manifest(src).epoch
    branch = str(tmp_path / "branch")
    clone_lake(src, branch, epoch=fork)
    repartition_lake(branch, 7)  # moves urls, changes no data
    before = _live(src)
    merge_branch(src, branch, fork_epoch=fork)
    pd.testing.assert_frame_equal(_live(src), before)


def test_merge_never_advances_changelog_watermark(forked):
    """Merge candidates are not changelog events: the watermark must
    stay put, or the next ingest silently drops the real event at the
    stolen offset (review finding, blocking)."""
    src, branch, fork = forked["src"], forked["branch"], forked["fork"]
    wm_before = latest_manifest(src).watermark
    merge_branch(src, branch, fork_epoch=fork)
    assert latest_manifest(src).watermark == wm_before
    merge_branch(src, branch, fork_epoch=fork)
    assert latest_manifest(src).watermark == wm_before
