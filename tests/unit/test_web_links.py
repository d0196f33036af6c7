"""ops/web.py link extraction + compression-ratio quality signal."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.web import compression_ratio, extract_links


def _ds(table: pa.Table) -> rd.Dataset:
    return rd.from_arrow(table)


# ----------------------------------------------------------- extract_links


def test_extract_links_basic_and_multiplicity(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "html": pa.array([
            '<a href="http://a.com/x">1</a><a href="http://b.org/y">2</a>',
            "no links here",
            '<a href="http://a.com/x">dup</a><a href="http://a.com/x">dup</a>',
            None,
        ]),
    })
    out = extract_links(_ds(t), "html", "doc_id").to_pandas()
    out = out.sort_values(["doc_id", "href"]).reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 1, 3, 3]
    assert out["href"].tolist() == [
        "http://a.com/x", "http://b.org/y",
        "http://a.com/x", "http://a.com/x",  # multiplicity preserved
    ]


def test_extract_links_unclosed_quote_keeps_prefix(ray_session):
    # a malformed trailing href (no closing quote) yields the fragment
    # itself — quarantine-not-crash; well-formed links are unaffected
    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "html": pa.array(['<a href="http://ok.com/1">x</a><a href="broken']),
    })
    out = extract_links(_ds(t), "html", "doc_id").to_pandas()
    assert "http://ok.com/1" in out["href"].tolist()
    assert len(out) == 2


def test_extract_links_empty_batch(ray_session):
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "html": pa.array([], pa.string())})
    out = extract_links(_ds(t), "html", "doc_id").to_pandas()
    assert len(out) == 0


# ------------------------------------------------------- compression_ratio


def test_compression_ratio_planted_redundancy(ray_session):
    rng = np.random.default_rng(11)
    random_text = " ".join(
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), 8))
        for _ in range(200))
    repetitive = "the same sentence again. " * 200
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([random_text, repetitive, "", None]),
    })
    out = compression_ratio(_ds(t), "text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    r = out["zlib_ratio"]
    assert r[1] < 0.1              # repetition compresses hard
    assert r[0] > 3 * r[1]         # random text is far less compressible
    assert 0 < r[0] <= 1.5
    assert np.isnan(r[2]) and np.isnan(r[3])  # empty/null → null


def test_compression_ratio_deterministic(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["alpha beta gamma " * 30,
                                    "unique words only once"])})
    a = compression_ratio(_ds(t), "text").to_pandas()
    b = compression_ratio(_ds(t), "text").to_pandas()
    assert a["zlib_ratio"].tolist() == b["zlib_ratio"].tolist()
