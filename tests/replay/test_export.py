"""Lake export sink (io/lake.py export_lake): jsonl/csv round trip vs
the live lake state, per-partition resumability, binary rejection."""

import json
import os

import duckdb
import pandas as pd
import pytest

from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import export_lake, read_lake
from maestro_ray.pipelines.ingest import ingest


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    base = tmp_path_factory.mktemp("ex")
    log = str(base / "log")
    write_changelog(log, ChangelogParams(
        n_urls=40, n_events=200, seg_rows=100, seed=77))
    lake = str(base / "lake")
    ingest(log, lake, num_partitions=4, segments_per_epoch=1)
    return lake


def _live(lake_dir) -> pd.DataFrame:
    df = read_lake(lake_dir, columns=["url", "lang"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def test_jsonl_round_trip(ray_session, lake, tmp_path):
    out_dir = str(tmp_path / "jsonl")
    res = export_lake(lake, out_dir, fmt="jsonl",
                      columns=["url", "lang"])
    assert res["skipped"] == 0 and res["files"] > 0
    con = duckdb.connect()
    got = con.execute(
        f"SELECT url, lang FROM read_json_auto('{out_dir}/part-*.jsonl') "
        "ORDER BY url").df()
    pd.testing.assert_frame_equal(got, _live(lake), check_dtype=False)
    assert res["rows"] == len(got)


def test_csv_round_trip(ray_session, lake, tmp_path):
    out_dir = str(tmp_path / "csv")
    export_lake(lake, out_dir, fmt="csv", columns=["url", "lang"])
    con = duckdb.connect()
    got = con.execute(
        f"SELECT url, lang FROM read_csv_auto('{out_dir}/part-*.csv') "
        "ORDER BY url").df()
    pd.testing.assert_frame_equal(got, _live(lake), check_dtype=False)


def test_resume_skips_existing_parts(ray_session, lake, tmp_path):
    out_dir = str(tmp_path / "resume")
    first = export_lake(lake, out_dir, fmt="jsonl",
                        columns=["url", "lang"])
    # wipe ONE part; the rerun redoes only it
    victims = sorted(n for n in os.listdir(out_dir)
                     if n.startswith("part-"))
    os.remove(os.path.join(out_dir, victims[0]))
    again = export_lake(lake, out_dir, fmt="jsonl",
                        columns=["url", "lang"])
    assert again["files"] == 1
    assert again["skipped"] == first["files"] - 1
    # content complete again
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_json_auto('{out_dir}/part-*.jsonl')"
    ).fetchone()[0]
    assert n == len(_live(lake))


def test_binary_column_rejected(ray_session, lake, tmp_path):
    with pytest.raises(ValueError, match="binary"):
        export_lake(lake, str(tmp_path / "b"), fmt="jsonl",
                    columns=["url", "html"])


def test_resume_identity_guard(ray_session, lake, tmp_path):
    """A part dir from a DIFFERENT run identity (older epoch / other
    columns / other format) must be refused, not silently mixed."""
    out_dir = str(tmp_path / "ident")
    export_lake(lake, out_dir, fmt="jsonl", columns=["url", "lang"])
    with pytest.raises(ValueError, match="fresh directory"):
        export_lake(lake, out_dir, fmt="jsonl", columns=["url"])
    with pytest.raises(ValueError, match="fresh directory"):
        export_lake(lake, out_dir, fmt="csv", columns=["url", "lang"])
    # markerless dirs with part files are refused too
    os.remove(os.path.join(out_dir, "_export_meta.json"))
    with pytest.raises(ValueError, match="no export marker"):
        export_lake(lake, out_dir, fmt="jsonl", columns=["url", "lang"])


def test_unknown_column_fails_loudly(ray_session, lake, tmp_path):
    with pytest.raises(ValueError, match="unknown column"):
        export_lake(lake, str(tmp_path / "u"), fmt="jsonl",
                    columns=["url", "langg"])
