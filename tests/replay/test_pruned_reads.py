"""Pruned lake reads: keyed point lookup (hash routing — opens only
owning partition files) and time-window scans (manifest ts_max stats —
skips files untouched since the bound). Pruning is proven at the
filesystem level: non-prunable files are physically deleted and the
reads still succeed, so any un-pruned access would crash."""

import os
import shutil

import pyarrow as pa
import pytest

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import (
    lookup_urls,
    read_lake_since,
    read_lake_table,
)
from maestro_ray.ops.hashing import partition_ids
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=80, n_events=800, seg_rows=60,
                         evolution=False)
P = 4


def _as_us(series):
    """µs-since-epoch ints regardless of the pandas datetime resolution
    (arrow timestamp[us] round-trips as datetime64[us] on pandas 2.x)."""
    import pandas as pd

    return pd.Series(series.values.astype("datetime64[us]").astype("int64"),
                     index=series.index)


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("pruned")
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    m = ingest(log, lake_dir, num_partitions=P, segments_per_epoch=3)
    assert m is not None
    return lake_dir


def test_manifest_records_ts_max(lake):
    m = latest_manifest(lake)
    assert all("ts_max" in v for v in m.partitions.values())
    # each recorded ts_max is a real µs timestamp (2024 fixture range)
    assert all(v["ts_max"] > 1_600_000_000_000_000
               for v in m.partitions.values())


def test_lookup_matches_full_scan(lake):
    full = read_lake_table(lake).to_pandas()
    urls = list(full["url"].head(7)) + ["https://never.example/x"]
    got = lookup_urls(lake, urls,
                      columns=["url", "warc_ts", "lang"]).to_pandas()
    exp = full[full["url"].isin(urls)].sort_values("url") \
        .reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    assert list(got["warc_ts"]) == list(exp["warc_ts"])
    assert list(got["lang"]) == list(exp["lang"])


def test_lookup_hides_tombstones(lake):
    import pyarrow.parquet as pq

    from maestro_ray.io.lake import lake_files

    # find a tombstoned url straight from the raw partition files
    dead = None
    for f in lake_files(lake):
        t = pq.read_table(f, columns=["url", "op"])
        mask = t.column("op").to_pandas() == "delete"
        if mask.any():
            dead = t.column("url").to_pandas()[mask].iloc[0]
            break
    assert dead is not None, "fixture produced no tombstones"
    assert lookup_urls(lake, [dead]).num_rows == 0


def test_lookup_reads_only_owning_partitions(lake, tmp_path):
    full = read_lake_table(lake).to_pandas()
    urls = [full["url"].iloc[0]]
    owner = int(partition_ids(pa.array(urls, pa.string()), P)[0])
    clone = str(tmp_path / "clone")
    shutil.copytree(lake, clone)
    m = latest_manifest(clone)
    removed = 0
    for p, v in m.partitions.items():
        if p != owner:
            os.remove(os.path.join(clone, v["file"]))
            removed += 1
    assert removed == P - 1
    got = lookup_urls(clone, urls, columns=["url", "warc_ts"])
    assert got.num_rows == 1 and got.column("url")[0].as_py() == urls[0]


def test_read_since_matches_full_filter(lake):
    full = read_lake_table(lake).to_pandas()
    ts_us = _as_us(full["warc_ts"])
    since = int(ts_us.median())  # non-degenerate: live rows on both sides
    got = read_lake_since(lake, since, columns=["url", "warc_ts"]) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    exp = full[ts_us >= since][["url", "warc_ts"]] \
        .sort_values("url").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_read_since_column_projection_drops_helper(lake):
    full = read_lake_table(lake).to_pandas()
    since = int(_as_us(full["warc_ts"]).median())
    ds = read_lake_since(lake, since, columns=["url", "lang"])
    pdf = ds.to_pandas()
    assert sorted(pdf.columns) == ["lang", "url"]


def test_read_since_skips_files_via_manifest(lake, tmp_path):
    m = latest_manifest(lake)
    maxes = sorted((v["ts_max"], p) for p, v in m.partitions.items())
    since = maxes[-1][0]  # only the newest-activity partition qualifies
    qualifying = {p for ts, p in maxes if ts >= since}
    assert 0 < len(qualifying) < P
    full = read_lake_table(lake).to_pandas()
    exp = full[_as_us(full["warc_ts"]) >= since]
    clone = str(tmp_path / "clone")
    shutil.copytree(lake, clone)
    for p, v in m.partitions.items():
        if p not in qualifying:
            os.remove(os.path.join(clone, v["file"]))
    ds = read_lake_since(clone, since, columns=["url", "warc_ts"])
    n = 0 if ds is None else ds.count()
    assert n == len(exp)


def test_read_since_future_bound_prunes_everything(lake):
    m = latest_manifest(lake)
    beyond = max(v["ts_max"] for v in m.partitions.values()) + 1
    assert read_lake_since(lake, beyond) is None
