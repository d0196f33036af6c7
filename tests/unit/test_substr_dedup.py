"""Exact duplicated-substring dedup (ops/substr.py) — span stats vs a
brute-force character-level reference, text surgery byte-for-byte,
unicode/null handling, and the broadcast-set guard."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.substr import (
    duplicated_span_stats,
    remove_duplicated_spans,
)


def _reference(docs: list[tuple[int, str | None]], L: int):
    """Brute-force char-level reference: (stats, cleaned_text)."""
    cnt: Counter = Counter()
    for _, t in docs:
        t = t or ""
        for i in range(len(t) - L + 1):
            cnt[t[i: i + L]] += 1
    stats, cleaned = {}, {}
    for d, t in docs:
        t0 = t or ""
        spans: list[list[int]] = []
        for i in range(len(t0) - L + 1):
            if cnt[t0[i: i + L]] > 1:
                if spans and i <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], i + L)
                else:
                    spans.append([i, i + L])
        stats[d] = (sum(e - s for s, e in spans), len(spans))
        out, prev = [], 0
        for s, e in spans:
            out.append(t0[prev:s])
            prev = e
        out.append(t0[prev:])
        cleaned[d] = None if t is None else "".join(out)
    return stats, cleaned


DOCS: list[tuple[int, str | None]] = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "xx the quick brown fox jumps zz totally unique text here 1"),
    (3, "short"),
    (4, None),
    (5, "a" * 30),  # self-repetitive: within-doc duplication counts
    (6, "héllo wörld héllo wörld héllo wörld unicode répeat test"),
    (7, "completely unique sentence with no duplication at all qq"),
    (8, ""),
]
L = 12


def _ds() -> rd.Dataset:
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    })
    return rd.from_arrow(tbl)


def test_span_stats_match_reference(ray_session):
    ref, _ = _reference(DOCS, L)
    got = duplicated_span_stats(_ds(), L=L).to_pandas() \
        .set_index("doc_id")
    assert len(got) == len(DOCS)
    for d, _ in DOCS:
        assert (int(got.loc[d, "dup_chars"]),
                int(got.loc[d, "n_spans"])) == ref[d], d
    # sanity on the fixture itself: cross-doc, within-doc and unicode
    # duplication all present, plus clean docs
    assert ref[1][0] > 0 and ref[5][0] > 0 and ref[6][0] > 0
    assert ref[3] == (0, 0) and ref[7] == (0, 0)


def test_surgery_matches_reference(ray_session):
    _, cleaned = _reference(DOCS, L)
    got = remove_duplicated_spans(_ds(), L=L).to_pandas() \
        .set_index("doc_id")
    for d, t in DOCS:
        g = got.loc[d, "text"]
        if t is None:
            assert g is None or (isinstance(g, float) and np.isnan(g))
        else:
            assert g == cleaned[d], (d, g, cleaned[d])


def test_surgery_preserves_other_columns(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["abcdefghijklmnop XX", "abcdefghijklmnop YY"]),
        "lang": pa.array(["en", "de"]),
    })
    out = remove_duplicated_spans(rd.from_arrow(tbl), L=16) \
        .to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "text", "lang"]
    assert out["lang"].tolist() == ["en", "de"]
    # the shared gram at position 1 ends in the space ⇒ the merged
    # span covers chars [0, 17) and the space goes with it
    assert out["text"].tolist() == ["XX", "YY"]


def test_no_duplication_is_identity(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["every doc fully unique one", "and another x"]),
    })
    out = remove_duplicated_spans(rd.from_arrow(tbl), L=10) \
        .to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == [
        "every doc fully unique one", "and another x"]


def test_guard_fires_on_huge_dup_set(ray_session):
    # two copies of a long random-ish doc ⇒ every position duplicated;
    # max_dup_grams=10 must fail loudly, naming the fallback
    body = " ".join(f"tok{i}" for i in range(200))
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([body, body])})
    with pytest.raises(RuntimeError, match="dedup_near_minhash"):
        duplicated_span_stats(rd.from_arrow(tbl), L=12,
                              max_dup_grams=10).to_pandas()


def test_l_validation(ray_session):
    with pytest.raises(ValueError):
        duplicated_span_stats(_ds(), L=1)
    with pytest.raises(ValueError):
        remove_duplicated_spans(_ds(), L=0)


def test_empty_corpus(ray_session):
    tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string())})
    out = duplicated_span_stats(rd.from_arrow(tbl), L=5).to_pandas()
    assert len(out) == 0
