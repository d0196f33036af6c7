"""XML source (io/readers.read_xml + fixtures.write_xml): round-trip
incl. entity escaping, typed casts, missing children, malformed-shard
quarantine, empty shards."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from maestro_ray.fixtures import write_xml
from maestro_ray.io.readers import parse_xml_blob, read_xml

FIELDS = {"doc_id": pa.int64(), "text": pa.string()}


def test_round_trip_with_escaping(ray_session, tmp_path):
    recs = [
        {"doc_id": 1, "text": "plain body"},
        {"doc_id": 2, "text": "a < b && c > d \"quoted\" 'single'"},
        {"doc_id": 3, "text": "unicode héllo — dash"},
        {"doc_id": 4, "text": None},  # omitted child -> null
    ]
    p = str(tmp_path / "shard-0.xml")
    write_xml(p, recs)
    out = read_xml([p], "doc", FIELDS).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["text"][1] == "a < b && c > d \"quoted\" 'single'"
    assert out["text"][2] == "unicode héllo — dash"
    assert out["text"][3] is None or out["text"].isna()[3]
    assert out["path"].nunique() == 1


def test_multi_shard_parallel_intake(ray_session, tmp_path):
    for s in range(3):
        write_xml(str(tmp_path / f"shard-{s}.xml"),
                  [{"doc_id": s * 10 + i, "text": f"t{i}"}
                   for i in range(5)])
    files = sorted(str(tmp_path / f) for f in os.listdir(tmp_path))
    out = read_xml(files, "doc", FIELDS).to_pandas()
    assert len(out) == 15
    assert out["path"].nunique() == 3


def test_malformed_shard_quarantines_not_raises():
    blob = (b"<?xml version='1.0'?><docs>"
            b"<doc><doc_id>1</doc_id><text>ok</text></doc>"
            b"<doc><doc_id>2</doc_id><text>also ok</text></doc>"
            b"<doc><doc_id>3</doc_id><text>truncated")  # no close
    recs = parse_xml_blob(blob, "doc", ["doc_id", "text"])
    # records fully closed before the damage survive; the scan stops
    assert [r["doc_id"] for r in recs] == ["1", "2"]


def test_not_xml_at_all_yields_nothing():
    assert parse_xml_blob(b"\x00\x01 garbage", "doc", ["x"]) == []


def test_bad_typed_literal_fails_loudly(ray_session, tmp_path):
    p = str(tmp_path / "bad.xml")
    write_xml(p, [{"doc_id": "not-a-number", "text": "x"}])
    with pytest.raises(Exception):
        read_xml([p], "doc", FIELDS).to_pandas()


def test_empty_shard_yields_no_rows(ray_session, tmp_path):
    p = str(tmp_path / "empty.xml")
    write_xml(p, [])
    out = read_xml([p], "doc", FIELDS).to_pandas()
    assert len(out) == 0


def test_nested_record_tags_only_match_exact(ray_session, tmp_path):
    # a child element that happens to nest under a record must not be
    # emitted as its own record
    p = str(tmp_path / "n.xml")
    with open(p, "wb") as f:
        f.write(b"<?xml version='1.0'?><docs>"
                b"<doc><doc_id>1</doc_id><text>a</text></doc>"
                b"<other><doc_id>9</doc_id></other></docs>")
    out = read_xml([p], "doc", FIELDS).to_pandas()
    assert out["doc_id"].tolist() == [1]


def test_writer_rejects_non_roundtrippable_chars(tmp_path):
    p = str(tmp_path / "bad.xml")
    with pytest.raises(ValueError, match="normalized"):
        write_xml(p, [{"doc_id": 1, "text": "line1\rline2"}])
    with pytest.raises(ValueError, match="not round-trippable"):
        write_xml(p, [{"doc_id": 1, "text": "ctrl\x01char"}])
