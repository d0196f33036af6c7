"""SQLite source/sink (S10 family, embedded edge — io/sqlite.py)."""

import sqlite3

import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.io.sqlite import read_sqlite, write_sqlite


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "src.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE t (k INTEGER, v INTEGER, s TEXT, b BLOB)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?,?)",
        [(i, i * 2, f"s{i}", bytes([i % 256])) for i in range(1000)])
    con.execute("INSERT INTO t VALUES (NULL, -1, 'nullkey', NULL)")
    con.commit()
    con.close()
    return path


def test_read_sqlite_parallel_ranges_complete(ray_session, db):
    ds = read_sqlite(db, "t", split_col="k", num_partitions=7)
    got = ds.to_pandas()
    assert len(got) == 1001  # every row exactly once, incl. the NULL key
    assert got["s"].loc[got["v"] == -1].iloc[0] == "nullkey"
    assert sorted(got["k"].dropna()) == list(range(1000))
    # declared-type → Arrow typing contract
    sch = pa.Schema.from_pandas(got[["b"]])
    assert pa.types.is_binary(sch.field("b").type) or \
        pa.types.is_large_binary(sch.field("b").type) or \
        got["b"].iloc[0] == b"\x00"


def test_read_sqlite_predicate_and_columns(ray_session, db):
    ds = read_sqlite(db, "t", split_col="k", num_partitions=3,
                     columns=["k", "v"], predicate="v % 4 = 0")
    got = ds.to_pandas()
    assert list(got.columns) == ["k", "v"]
    assert len(got) == 500
    assert (got["v"] % 4 == 0).all()


def test_read_sqlite_rowid_split(ray_session, db):
    # tables without a natural numeric key split on rowid
    ds = read_sqlite(db, "t", split_col="rowid", num_partitions=4,
                     columns=["s"])
    assert ds.count() == 1001


def test_read_sqlite_missing_column_fails_loudly(ray_session, db):
    with pytest.raises(ValueError, match="nope"):
        read_sqlite(db, "t", split_col="k", columns=["k", "nope"])


def test_read_sqlite_missing_table_fails_loudly(ray_session, db):
    with pytest.raises(ValueError, match="not found"):
        read_sqlite(db, "missing", split_col="k")


def test_read_sqlite_empty_table(ray_session, tmp_path):
    path = str(tmp_path / "empty.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (k INTEGER, v REAL)")
    con.commit()
    con.close()
    ds = read_sqlite(path, "t", split_col="k", num_partitions=4)
    got = ds.to_pandas()
    assert len(got) == 0


def test_write_sqlite_round_trip(ray_session, db, tmp_path):
    src = rd.from_arrow(pa.table({
        "a": pa.array([3, 1, 2], pa.int64()),
        "s": pa.array(["x", None, "z"]),
        "f": pa.array([0.5, 1.5, None], pa.float64()),
        "ts": pa.array([10, 20, 30], pa.timestamp("us")),
    }))
    n = write_sqlite(src, db, "out", staging_dir=str(tmp_path / "stage"))
    assert n == 3
    con = sqlite3.connect(db)
    rows = con.execute("SELECT a, s, f, ts FROM out ORDER BY a").fetchall()
    con.close()
    # timestamps land as INTEGER microseconds (documented contract)
    assert rows == [(1, None, 1.5, 20), (2, "z", None, 30),
                    (3, "x", 0.5, 10)]
    # and the staged attempt dir is reaped after COMMIT
    import glob
    assert glob.glob(str(tmp_path / "stage" / "attempt-*")) == []


def test_write_sqlite_modes(ray_session, db, tmp_path):
    src = rd.from_arrow(pa.table({"a": pa.array([1], pa.int64())}))
    stage = str(tmp_path / "stage2")
    assert write_sqlite(src, db, "m", staging_dir=stage) == 1
    with pytest.raises(ValueError, match="already exists"):
        write_sqlite(src, db, "m", staging_dir=stage, mode="create")
    assert write_sqlite(src, db, "m", staging_dir=stage,
                        mode="append") == 1
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM m").fetchone()[0] == 2
    con.close()
    assert write_sqlite(src, db, "m", staging_dir=stage,
                        mode="overwrite") == 1
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM m").fetchone()[0] == 1
    con.close()


def test_write_then_read_sqlite_identity(ray_session, tmp_path):
    """Sink→source round trip preserves values and row count."""
    path = str(tmp_path / "rt.db")
    src = rd.from_arrow(pa.table({
        "k": pa.array(range(100), pa.int64()),
        "txt": pa.array([f"d{i}" for i in range(100)]),
    }))
    write_sqlite(src, path, "docs", staging_dir=str(tmp_path / "st"))
    back = read_sqlite(path, "docs", split_col="k",
                       num_partitions=5).to_pandas()
    assert sorted(back["k"]) == list(range(100))
    assert set(back["txt"]) == {f"d{i}" for i in range(100)}
