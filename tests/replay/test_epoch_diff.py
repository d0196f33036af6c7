"""Epoch reconciliation invariant: diffing two time-travel reads of the
lake (ops/diff.diff_tables over read_lake_at) must agree with the
change feed's net view of the same epoch range — two independent code
paths (full-outer join over materialized states vs per-partition
manifest diff) over the same history."""

import pytest

from maestro_ray.core.manifest import list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import read_lake_at
from maestro_ray.ops.diff import diff_tables
from maestro_ray.pipelines.changefeed import table_changes
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=60, n_events=500, seg_rows=50,
                         evolution=False)


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("epochdiff")
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    return lake_dir


def _diff_pairs(lake_dir, e0, e1):
    a = read_lake_at(lake_dir, e0, columns=["url", "warc_ts", "lang"])
    b = read_lake_at(lake_dir, e1, columns=["url", "warc_ts", "lang"])
    df = diff_tables(a, b, "url", ["warc_ts", "lang"]).to_pandas()
    if df.empty:
        return set()
    return set(zip(df["url"], df["diff_op"]))


def _feed_pairs(lake_dir, e0, e1):
    df = table_changes(lake_dir, from_epoch=e0, to_epoch=e1).to_pandas()
    if df.empty:
        return set()
    return set(zip(df["url"], df["change_op"]))


def test_epoch_diff_equals_change_feed(lake):
    epochs = list_epochs(lake)
    for e0, e1 in [(epochs[0], epochs[-1]),
                   (epochs[len(epochs) // 2], epochs[-1]),
                   (epochs[0], epochs[1])]:
        assert _diff_pairs(lake, e0, e1) == _feed_pairs(lake, e0, e1), \
            f"diff vs feed disagree over ({e0}, {e1}]"


def test_epoch_diff_same_epoch_is_empty(lake):
    head = list_epochs(lake)[-1]
    assert _diff_pairs(lake, head, head) == set()
