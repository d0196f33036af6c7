"""Schema inference for landing feeds (maestro parity: propose a typed
contract from raw samples; VERDICT r2 missing #2)."""

import pyarrow as pa
import pytest

from maestro_ray.core.schema import check_evolvable
from maestro_ray.io.readers import (
    infer_schema,
    infer_schema_file,
    parse_delimited_batch,
    parse_fixed_width_batch,
)

LINES = [
    "1|alice|2024-01-02|2024-01-02T03:04:05|3.5|true|",
    "2|bob|2024-02-03|2024-02-03T04:05:06|4.25|false|note",
    "3|carol|2024-03-04|2024-03-04T05:06:07|5|true|x",
]


def test_infer_delimited_types():
    s = infer_schema(LINES, delimiter="|")
    assert [f.name for f in s] == [f"c{i}" for i in range(7)]
    assert s.field(0).type == pa.int64()
    assert s.field(1).type == pa.string()
    assert s.field(2).type == pa.date32()          # dates stay dates
    assert s.field(3).type == pa.timestamp("us")   # not demoted to string
    assert s.field(4).type == pa.float64()         # int-looking "5" mixed in
    assert s.field(5).type == pa.bool_()
    assert s.field(6).type == pa.string()          # sentinel null + text
    check_evolvable(s, s)  # a valid contract target


def test_infer_header_names_and_roundtrip(ray_session):
    lines = ["id|name|score"] + ["7|dora|1.5", "8|erin|2.25"]
    s = infer_schema(lines, delimiter="|", header=True)
    assert [f.name for f in s] == ["id", "name", "score"]
    # round-trip: parse the same sample with the inferred contract —
    # typed columns, no quarantined rows
    batch = pa.table({"text": pa.array(lines[1:], pa.string())})
    out = parse_delimited_batch(batch, s, delimiter="|")
    assert out.column("_error_reason").null_count == 2
    assert out.column("id").to_pylist() == [7, 8]
    assert out.column("score").to_pylist() == [1.5, 2.25]


def test_infer_majority_field_count_excludes_garbage():
    lines = ["1|a", "2|b", "3|c", "garbage line without delimiter"]
    s = infer_schema(lines, delimiter="|")
    assert len(s) == 2
    assert s.field(0).type == pa.int64()


def test_infer_fixed_width_roundtrip(ray_session):
    widths = [4, 8, 4]
    lines = [
        "42".rjust(4) + "alpha".ljust(8) + "3.5".rjust(4),
        "107".rjust(4) + "beta".ljust(8) + "4.0".rjust(4),
    ]
    s = infer_schema(lines, widths=widths)
    assert s.field(0).type == pa.int64()
    assert s.field(1).type == pa.string()
    assert s.field(2).type == pa.float64()
    batch = pa.table({"text": pa.array(lines, pa.string())})
    out = parse_fixed_width_batch(batch, s, widths=widths)
    assert out.column("c0").to_pylist() == [42, 107]
    assert out.column("c2").to_pylist() == [3.5, 4.0]


def test_infer_all_null_column_stays_string():
    s = infer_schema(["1|", "2|"], delimiter="|")
    assert s.field(1).type == pa.string()


def test_infer_schema_file_and_cli(tmp_path):
    p = tmp_path / "feed.psv"
    p.write_text("\n".join(["id|d|v", "1|2024-01-02|2.5", "2|2024-02-03|3"]))
    s = infer_schema_file(str(p), header=True)
    assert [f.name for f in s] == ["id", "d", "v"]
    assert s.field(0).type == pa.int64()
    assert s.field(1).type == pa.date32()
    assert s.field(2).type == pa.float64()
    # CLI hook (no Ray session involved)
    import json
    from maestro_ray.__main__ import main

    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["infer-schema", "--path", str(p), "--header"])
    assert rc == 0
    got = json.loads(buf.getvalue())
    assert got == {"id": "int64", "d": "date32[day]", "v": "double"}


def test_infer_errors():
    with pytest.raises(ValueError, match="no sample"):
        infer_schema([])
    with pytest.raises(ValueError, match="names for"):
        infer_schema(["1|2"], names=["only_one"])
