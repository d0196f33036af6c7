"""Generic readers, landing zone, delimited parse, sliding windows."""

import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.io.readers import LandingZone, parse_delimited_batch
from maestro_ray.ops.aggregates import sliding_window


def test_parse_delimited_typed_and_quarantine():
    schema = pa.schema([("id", pa.int64()), ("name", pa.string()),
                        ("score", pa.float64())])
    lines = pa.table({"text": [
        "1|alice|3.5",
        "2||1.0",          # empty -> null via sentinel
        "3|bob",           # wrong field count
        "x|carol|2.0",     # uncastable id
    ]})
    out = parse_delimited_batch(lines, schema, none_sentinel="")
    assert out.column("id").to_pylist() == [1, 2, None, None]
    assert out.column("name").to_pylist() == ["alice", None, None, "carol"]
    errs = out.column("_error_reason").to_pylist()
    assert errs[0] is None and "field_count" in errs[2]


def test_parse_fixed_width_typed_and_quarantine():
    from maestro_ray.io.readers import parse_fixed_width_batch

    schema = pa.schema([("id", pa.int64()), ("name", pa.string()),
                        ("score", pa.float64())])
    # widths: id=4, name=8, score=6
    lines = pa.table({"text": [
        "   1alice      3.5",
        "   2           1.0",   # all-pad name -> null via sentinel
        "   3bob",              # line too short -> quarantined
        "xxxxcarol    2.0  ",   # uncastable id -> null id, rest kept
        "   5dave     2.25  IGNORED-TRAILING",
    ]})
    out = parse_fixed_width_batch(lines, schema, widths=[4, 8, 6])
    assert out.column("id").to_pylist() == [1, 2, None, None, 5]
    assert out.column("name").to_pylist() == [
        "alice", None, None, "carol", "dave"
    ]
    assert out.column("score").to_pylist() == [3.5, 1.0, None, 2.0, 2.25]
    errs = out.column("_error_reason").to_pylist()
    assert errs[0] is None and "line_len" in errs[2] and errs[4] is None
    with pytest.raises(ValueError):
        parse_fixed_width_batch(lines, schema, widths=[4, 8])


def test_landing_zone_idempotent(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    for n in ("a.parquet", "b.parquet"):
        (d / n).write_bytes(b"x")
    lz = LandingZone(str(d))
    first = lz.discover()
    assert [f.split("/")[-1] for f in first] == ["a.parquet", "b.parquet"]
    lz.commit(first)
    assert lz.discover() == []
    (d / "c.parquet").write_bytes(b"y")
    assert [f.split("/")[-1] for f in lz.discover()] == ["c.parquet"]
    # re-commit is a no-op
    lz.commit(first)
    assert [f.split("/")[-1] for f in lz.discover()] == ["c.parquet"]


def test_sliding_window_counts(ray_session):
    import ray.data as rd

    # events at minutes 0, 10, 20, 35 for one key
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:10",
        "2024-01-01 00:20", "2024-01-01 00:35",
    ])
    ds = rd.from_pandas(pd.DataFrame({"k": [1, 1, 1, 1], "ts": ts, "v": [1.0] * 4}))
    out = sliding_window(ds, "ts", window="30min", slide="10min", keys=["k"],
                         specs={"n": (None, "count")})
    got = {row.window_start.strftime("%H:%M"): row.n for row in out.itertuples()}
    # window [23:40,00:10) contains ev@00:00 etc. Check a few:
    assert got["00:00"] == 3   # 00:00,00:10,00:20
    assert got["00:10"] == 3   # 00:10,00:20,00:35
    assert got["00:20"] == 2   # 00:20,00:35
    assert got["00:30"] == 1   # 00:35


def test_sliding_window_rejects_bad_ratio(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "k": [1], "ts": pd.to_datetime(["2024-01-01"]), "v": [1.0]}))
    with pytest.raises(ValueError):
        sliding_window(ds, "ts", window="25min", slide="10min", keys=["k"],
                       specs={"n": (None, "count")})
