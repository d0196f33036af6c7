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


def test_identifiers_quoted_and_schema_scoped(ray_session, tmp_path):
    """ADVICE r3: unusual identifiers round-trip (quoted, not raw SQL),
    and the existence probe is scoped to the current schema — a
    same-named table in another schema must not flip CREATE to INSERT."""
    import ray.data as rd

    path = str(tmp_path / "q.duckdb")
    con = duckdb.connect(path)
    con.execute('CREATE TABLE "odd name" AS SELECT range AS "the key", '
                "range * 10 AS v FROM range(0, 20)")
    # decoy with the SAME name in a different schema
    con.execute("CREATE SCHEMA other")
    con.execute('CREATE TABLE other."exported odd" (x INT)')
    con.close()

    ds = read_rdbms(path, "odd name", split_col="the key",
                    num_partitions=3)
    assert ds.count() == 20

    stage = str(tmp_path / "stage")
    out = rd.from_items([{"a": 1}, {"a": 2}])
    # the decoy exists in schema `other`; mode=append on a fresh main
    # table must CREATE (not INSERT into nothing / crash)
    n = write_rdbms(out, path, "exported odd", stage)
    assert n == 2
    con = duckdb.connect(path, read_only=True)
    try:
        assert con.execute(
            'SELECT count(*) FROM main."exported odd"').fetchone()[0] == 2
    finally:
        con.close()


def test_write_rdbms_staging_reaped_after_commit(ray_session, db, tmp_path):
    """ADVICE r3 (medium): committed attempts must not leak one staged
    copy of the data per call — the attempt dir is removed after COMMIT
    and dead leftovers are reaped by the next call."""
    import glob

    import ray.data as rd

    out_db = str(tmp_path / "out.duckdb")
    stage = str(tmp_path / "stage")
    ds = rd.from_items([{"k": i} for i in range(5)])
    write_rdbms(ds, out_db, "t1", stage)
    assert glob.glob(os.path.join(stage, "attempt-*")) == []
    # a dead (crashed pre-commit) attempt is reaped once it goes quiet,
    # but a RECENT (possibly in-flight, concurrent) attempt survives
    dead = os.path.join(stage, "attempt-deadbeef")
    os.makedirs(dead)
    os.utime(dead, (0, 0))  # quiet for decades
    live = os.path.join(stage, "attempt-c0ffee")
    os.makedirs(live)  # fresh mtime = concurrent in-flight export
    write_rdbms(ds, out_db, "t1", stage, mode="append")
    assert glob.glob(os.path.join(stage, "attempt-*")) == [live]
