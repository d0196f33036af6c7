"""Avro object-container source (io/avro.py, r4): pure-stdlib
round-trip (null + deflate codecs, nullable unions, timestamp-micros),
loud failures on unsupported constructs, distributed read."""

import json

import pyarrow as pa
import pytest

from maestro_ray.io.avro import parse_avro_blob, read_avro, write_avro


def _table():
    return pa.table({
        "id": pa.array([1, 2, None, 4], pa.int64()),
        "name": pa.array(["a", None, "ccc", "déjà vu"], pa.string()),
        "score": pa.array([1.5, None, -3.25, 0.0], pa.float64()),
        "flag": pa.array([True, False, None, True], pa.bool_()),
        "blob": pa.array([b"\x00\xff", b"", None, b"xyz"], pa.binary()),
        "ts": pa.array([1_000_000, None, 3, 4], pa.timestamp("us")),
    })


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_all_types(tmp_path, codec):
    t = _table()
    path = str(tmp_path / f"t_{codec}.avro")
    assert write_avro(path, t, block_rows=3, codec=codec) == 4
    back = parse_avro_blob(open(path, "rb").read())
    assert back.schema.equals(t.schema)
    for c in t.column_names:
        assert back.column(c).to_pylist() == t.column(c).to_pylist()


def test_empty_table_keeps_schema(tmp_path):
    path = str(tmp_path / "e.avro")
    write_avro(path, _table().slice(0, 0))
    back = parse_avro_blob(open(path, "rb").read())
    assert back.num_rows == 0 and back.schema.equals(_table().schema)


def test_unsupported_constructs_fail_loudly(tmp_path):
    with pytest.raises(ValueError, match="bad magic"):
        parse_avro_blob(b"PK\x03\x04xxxx")
    # nested record schema: rejected with the construct named
    t = _table()
    path = str(tmp_path / "t.avro")
    write_avro(path, t)
    blob = bytearray(open(path, "rb").read())
    # corrupt the sync marker of the first data block
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        parse_avro_blob(bytes(blob))
    with pytest.raises(ValueError, match="unsupported Avro type"):
        from maestro_ray.io.avro import _arrow_type
        _arrow_type({"type": "map", "values": "string"})
    with pytest.raises(ValueError, match="unsupported Avro union"):
        from maestro_ray.io.avro import _arrow_type
        _arrow_type(["null", "string", "long"])


def test_read_avro_distributed(ray_session, tmp_path):
    t = _table()
    for s in range(3):
        write_avro(str(tmp_path / f"s{s}.avro"), t,
                   codec="deflate" if s % 2 else "null")
    ds = read_avro([str(tmp_path / f"s{s}.avro") for s in range(3)])
    df = ds.to_pandas()
    assert len(df) == 12
    assert sorted(df.columns) == sorted([*t.column_names, "path"])
    assert df["path"].nunique() == 3


def test_read_orc_distributed_with_pruning(ray_session, tmp_path):
    """r4: ORC source — per-file parallel decode, column pruning."""
    import pyarrow.orc as orc

    from maestro_ray.io.readers import read_orc

    t = pa.table({"k": pa.array(range(20), pa.int64()),
                  "v": pa.array([f"s{i}" for i in range(20)], pa.string()),
                  "w": pa.array([float(i) for i in range(20)])})
    for s in range(2):
        orc.write_table(t, str(tmp_path / f"p{s}.orc"))
    ds = read_orc([str(tmp_path / f"p{s}.orc") for s in range(2)],
                  columns=["k", "w"])
    df = ds.to_pandas()
    assert len(df) == 40 and sorted(df.columns) == ["k", "w"]
    assert df["k"].sum() == 2 * sum(range(20))
