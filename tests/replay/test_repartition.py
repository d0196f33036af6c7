"""repartition_lake (io/lake.py): content invariance incl. tombstones,
checksum invariance, resumed ingest under the new P, history intact."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import (
    lake_files,
    read_lake_at,
    read_lake_table,
    repartition_lake,
)
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=400, seg_rows=80, seed=33)


def _all_rows(lake):
    """Full physical content INCLUDING tombstones, order-normalized."""
    import pyarrow.compute as pc

    t = pa.concat_tables([pq.read_table(f) for f in lake_files(lake)],
                         promote_options="default")
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def test_repartition_preserves_content_and_resumes(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)

    lake = str(tmp_path / "lake")
    # ingest only the first part of the log at P=4
    m = ingest(log, lake, num_partitions=4, segments_per_epoch=2,
               max_epochs=2)
    assert m.num_partitions == 4
    before_live = read_lake_table(lake)
    before_all = _all_rows(lake)
    before_epoch = m.epoch

    m2 = repartition_lake(lake, 9)
    assert m2.num_partitions == 9 and m2.epoch == before_epoch + 1
    assert m2.watermark == m.watermark
    assert set(m2.partitions) <= set(range(9))
    # content identical, tombstones included
    assert _all_rows(lake).equals(before_all)
    assert read_lake_table(lake).equals(before_live)
    # history below the migration reads the OLD partitioning unchanged
    assert read_lake_at(lake, before_epoch, columns=["url", "warc_ts"]) \
        .count() == before_live.num_rows

    # old P is now rejected, new P resumes and converges
    with pytest.raises(ValueError, match="num_partitions"):
        ingest(log, lake, num_partitions=4)
    final = ingest(log, lake, num_partitions=9, segments_per_epoch=2)
    assert final.watermark == PARAMS.n_events - 1

    solo = str(tmp_path / "solo")
    ingest(log, solo, num_partitions=9, segments_per_epoch=2)
    got = read_lake_table(lake)
    want = read_lake_table(solo)
    assert got.num_rows == want.num_rows
    for c in want.column_names:
        assert got.column(c).equals(want.column(c)), c


def test_repartition_noop_and_guards(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(n_urls=20, n_events=80,
                                         seg_rows=40, seed=4))
    lake = str(tmp_path / "lake")
    m = ingest(log, lake, num_partitions=3)
    assert repartition_lake(lake, 3) is not None  # no-op, same manifest
    assert latest_manifest(lake).epoch == m.epoch
    with pytest.raises(ValueError):
        repartition_lake(lake, 0)
    with pytest.raises(FileNotFoundError):
        repartition_lake(str(tmp_path / "nope"), 2)


def test_change_feed_across_migration_is_applyable(ray_session, tmp_path):
    """r4 review finding: a migration epoch moves live urls between
    partitions; the feed must emit PAIRED delete@old + insert@new (the
    old-only join rows used to be silently dropped by non-Kleene null
    propagation), so delete-then-insert appliers converge and nothing
    is a phantom."""
    import pandas as pd

    from maestro_ray.pipelines.changefeed import table_changes

    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(n_urls=30, n_events=200,
                                         seg_rows=100, seed=8))
    lake = str(tmp_path / "lake")
    m = ingest(log, lake, num_partitions=8)
    m2 = repartition_lake(lake, 3)

    feed = table_changes(lake, m.epoch, m2.epoch).to_pandas()
    ins = feed[feed.change_op == "insert"]
    dels = feed[feed.change_op == "delete"]
    assert len(feed) == len(ins) + len(dels)      # no spurious updates
    # every moved url appears exactly once on each side — a net no-op
    assert sorted(ins.url) == sorted(dels.url)
    assert len(ins) > 0                           # 8->3 moves something
    # delete-then-insert application over the pre-migration state is a
    # no-op on the url set
    before = set(read_lake_table(lake).column("url").to_pylist())
    applied = (before - set(dels.url)) | set(ins.url)
    assert applied == before


def test_empty_edge_pagerank_and_mlprep_guards(ray_session):
    """r4 review finding: maybe-empty driver collections (the
    documented schema-loss class) must not KeyError."""
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.graph import pagerank
    from maestro_ray.ops.mlprep import (
        categorical_encode,
        one_hot,
        standardize,
    )

    empty_edges = rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    assert len(pagerank(empty_edges)) == 0
    nulls = rd.from_arrow(pa.table({
        "a": pa.array([None], pa.int64()), "b": pa.array([1], pa.int64())}))
    assert len(pagerank(nulls)) == 0  # the only edge is null -> empty

    allnull = rd.from_arrow(pa.table({
        "k": pa.array([None, None], pa.string()),
        "v": pa.array([None, None], pa.float64()),
        "c": pa.array([None, None], pa.string()),
    }))
    z = standardize(allnull, "k", "v").to_pandas()
    assert z.z.isna().all()
    oh = one_hot(allnull, "c").to_pandas()
    assert len(oh) == 2                       # no category columns added
    ce = categorical_encode(allnull, "c").to_pandas()
    assert ce.code.isna().all()


def test_replicate_across_migration_converges(ray_session, tmp_path):
    """End-to-end: a replica synced before a repartition must converge
    to the identical table after applying the migration epoch's feed
    (the paired delete+insert moves)."""
    import duckdb

    from maestro_ray.pipelines.replicate import replicate_to_rdbms

    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(n_urls=25, n_events=160,
                                         seg_rows=80, seed=13))
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=6)
    db = str(tmp_path / "replica.db")
    stage = str(tmp_path / "stage")
    replicate_to_rdbms(lake, db, "pages", stage)
    repartition_lake(lake, 2)
    replicate_to_rdbms(lake, db, "pages", stage)

    con = duckdb.connect(db)
    got = con.execute(
        "SELECT url, warc_ts FROM pages ORDER BY url").fetch_df()
    want = read_lake_table(lake).select(["url", "warc_ts"]) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, want)


def test_incremental_views_net_zero_across_migration(ray_session,
                                                     tmp_path):
    """A migration epoch rewrites every file but changes no content —
    the partition-diff view algebra (incl. the vanished-partition walk
    in changed_partitions) must fold it to a zero delta."""
    from maestro_ray.pipelines.views import (
        maintain_group_counts,
        maintain_group_sums,
    )

    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(n_urls=30, n_events=200,
                                         seg_rows=100, seed=21))
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=6)
    before_c = maintain_group_counts(lake, "lang")
    before_s = maintain_group_sums(lake, "lang", "len:text")
    repartition_lake(lake, 2)
    after_c = maintain_group_counts(lake, "lang")
    after_s = maintain_group_sums(lake, "lang", "len:text")
    import pandas as pd
    pd.testing.assert_frame_equal(before_c, after_c)
    pd.testing.assert_frame_equal(before_s, after_s)
