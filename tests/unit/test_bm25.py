"""BM25 scoring (ops/corpus.py bm25_scores): hand-computed oracle on a
tiny corpus, null/miss handling."""

import math

import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.corpus import bm25_scores


def _expected(docs, query, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in docs.items() if t is not None}
    n = len(docs)
    dls = {i: len(w) for i, w in toks.items()}
    avgdl = sum(dls.values()) / len(dls)
    out = {}
    for i, w in toks.items():
        s = 0.0
        for t in sorted(set(query)):
            tf = w.count(t)
            if tf == 0:
                continue
            df = sum(1 for ww in toks.values() if t in ww)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dls[i] / avgdl))
        if s:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_reference_formula():
    docs = {
        1: "cat dog cat fish",
        2: "dog dog bird",
        3: "fish fish fish fish",
        4: None,
        5: "bird",
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": list(docs), "text": list(docs.values())}))
    got = bm25_scores(ds, "doc_id", "text", ["cat", "fish"]) \
        .to_pandas().set_index("doc_id")["bm25"].to_dict()
    assert got == _expected(docs, ["cat", "fish"])


def test_bm25_no_hits_and_empty_query():
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["a b"]}))
    assert bm25_scores(ds, "doc_id", "text", ["zzz"]).count() == 0
    with pytest.raises(ValueError):
        bm25_scores(ds, "doc_id", "text", [])
