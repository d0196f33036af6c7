"""S10 RDBMS import/export (sqoop analog over DuckDB)."""

import os

import duckdb
import pyarrow as pa
import pytest

from maestro_ray.io.rdbms import read_rdbms, write_rdbms


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "src.duckdb")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE t AS SELECT range AS k, range * 2 AS v, "
        "'s' || range AS s FROM range(0, 1000)"
    )
    con.execute("INSERT INTO t VALUES (NULL, -1, 'nullkey')")
    con.close()
    return path


def test_read_rdbms_parallel_ranges_complete(ray_session, db):
    ds = read_rdbms(db, "t", split_col="k", num_partitions=7)
    got = ds.to_pandas()
    assert len(got) == 1001  # every row exactly once, incl. the NULL key
    assert got["s"].loc[got["v"] == -1].iloc[0] == "nullkey"
    assert sorted(got["k"].dropna()) == list(range(1000))


def test_read_rdbms_predicate_and_columns(ray_session, db):
    ds = read_rdbms(db, "t", split_col="k", num_partitions=3,
                    columns=["k", "v"], predicate="v % 4 = 0")
    got = ds.to_pandas()
    assert list(got.columns) == ["k", "v"]
    assert len(got) == 500
    assert (got["v"] % 4 == 0).all()


def test_read_rdbms_more_partitions_than_rows(ray_session, tmp_path):
    path = str(tmp_path / "tiny.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE t AS SELECT 1 AS k UNION ALL SELECT 2")
    con.close()
    assert len(read_rdbms(path, "t", "k", num_partitions=16).to_pandas()) == 2


def test_read_rdbms_empty_table(ray_session, tmp_path):
    path = str(tmp_path / "empty.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE t (k BIGINT, v BIGINT)")
    con.close()
    assert read_rdbms(path, "t", "k", num_partitions=4).count() == 0


def test_read_rdbms_nan_split_col_fails_loudly(ray_session, tmp_path):
    path = str(tmp_path / "nan.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE t AS SELECT 1.0 AS k UNION ALL SELECT 'nan'::DOUBLE")
    con.close()
    with pytest.raises(ValueError, match="NaN"):
        read_rdbms(path, "t", "k", num_partitions=2)


def test_write_rdbms_roundtrip_and_modes(ray_session, db, tmp_path):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "k": pa.array(range(50), pa.int64()),
        "v": pa.array(range(50), pa.int64()),
    }))
    out_db = str(tmp_path / "dst.duckdb")
    stage = str(tmp_path / "stage")  # SHARED dir: attempts must isolate
    n = write_rdbms(ds, out_db, "exported", stage)
    assert n == 50  # rows THIS call inserted
    n = write_rdbms(ds, out_db, "exported", stage, mode="append")
    assert n == 50
    con = duckdb.connect(out_db, read_only=True)
    assert con.execute("SELECT count(*) FROM exported").fetchone()[0] == 100
    con.close()
    n = write_rdbms(ds, out_db, "exported", stage, mode="overwrite")
    assert n == 50
    con = duckdb.connect(out_db, read_only=True)
    # overwrite replaced the table — reused staging dir leaked nothing
    assert con.execute("SELECT count(*) FROM exported").fetchone()[0] == 50
    con.close()
    with pytest.raises(ValueError, match="already exists"):
        write_rdbms(ds, out_db, "exported", stage, mode="create")
    # imported back == exported
    back = read_rdbms(out_db, "exported", "k", num_partitions=4).to_pandas()
    assert sorted(back["k"]) == list(range(50))
