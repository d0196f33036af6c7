"""Round-trip and tolerance oracles for the WARC shard source."""

import gzip
import os

import pytest

from maestro_ray.fixtures import write_warc
from maestro_ray.io.readers import parse_warc_blob, read_warc

RECS = [
    ("https://a.example/x", "2024-01-01T00:00:00Z", b"hello world"),
    ("https://b.example/y", "2024-01-02T00:00:00Z",
     "unicode ☃ payload".encode()),
    ("https://c.example/z", "2024-01-03T00:00:00Z", b""),  # empty body
]


def _roundtrip(tmp_path, gz):
    name = "s.warc.gz" if gz else "s.warc"
    p = os.path.join(tmp_path, name)
    write_warc(p, RECS, gzip_members=gz)
    return p


@pytest.mark.parametrize("gz", [True, False])
def test_warc_roundtrip(ray_session, tmp_path, gz):
    p = _roundtrip(str(tmp_path), gz)
    df = read_warc([p]).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert len(df) == 3
    assert df["url"].tolist() == [u for u, _, _ in RECS]
    assert [bytes(b) for b in df["payload"]] == [b for _, _, b in RECS]
    assert df["content_length"].tolist() == [len(b) for _, _, b in RECS]
    assert (df["warc_type"] == "response").all()
    assert df["record_id"].str.startswith("<urn:uuid:").all()


def test_warc_multi_shard_and_type_filter(ray_session, tmp_path):
    p1 = os.path.join(str(tmp_path), "a.warc.gz")
    p2 = os.path.join(str(tmp_path), "b.warc.gz")
    write_warc(p1, RECS[:2])
    write_warc(p2, RECS[2:])
    df = read_warc([p1, p2], record_types=["response"]).to_pandas()
    assert len(df) == 3
    assert sorted(df["path"].str.endswith("a.warc.gz").tolist()) \
        == [False, True, True]
    none = read_warc([p1], record_types=["request"]).to_pandas()
    assert len(none) == 0


def test_warc_truncated_record_quarantines_tail():
    """A truncated final record must not poison the shard: records
    before it parse, the scan stops at the damage."""
    good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://ok.example\r\n"
            b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://bad.example\r\n"
           b"Content-Length: 999\r\n\r\nshort")
    recs = parse_warc_blob(good + bad)
    assert [r["url"] for r in recs] == ["https://ok.example"]
    assert recs[0]["payload"] == b"hi"
    # garbage prefix: nothing parses, nothing raises
    assert parse_warc_blob(b"not a warc at all") == []


def test_warc_gzip_members_concatenate():
    """Per-record gzip members must decompress as ONE stream (the
    .warc.gz convention relied on by parse_warc_batch)."""
    import io

    m1 = gzip.compress(b"WARC/1.0\r\nContent-Length: 1\r\n\r\nA\r\n\r\n")
    m2 = gzip.compress(b"WARC/1.0\r\nContent-Length: 1\r\n\r\nB\r\n\r\n")
    blob = gzip.decompress(m1 + m2)
    recs = parse_warc_blob(blob)
    assert [r["payload"] for r in recs] == [b"A", b"B"]
