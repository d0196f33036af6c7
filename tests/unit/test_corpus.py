"""chunk_documents, hash sampling, term stats, tfidf — edge cases the
DuckDB oracle twins don't reach (nulls, empty docs, validation)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.corpus import (
    chunk_documents,
    sample_hash,
    stratified_sample_hash,
    term_doc_stats,
    tfidf_scores,
)


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _docs(rd):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j",   # 10 toks → chunks of 4/stride 3
            "x",                      # shorter than one chunk
            "",                       # empty string = one empty token
            None,                     # null → no chunks at all
            "p  q",                   # double space → empty middle token
        ]),
    }))


def test_chunk_documents_boundaries_and_overlap(rd):
    out = chunk_documents(_docs(rd), "doc_id", "text", 4, 1).to_pandas()
    d0 = out[out["doc_id"] == 0].sort_values("chunk_id")
    # stride 3 over 10 tokens → starts 0,3,6,9
    assert list(d0["chunk_text"]) == ["a b c d", "d e f g", "g h i j", "j"]
    assert list(d0["n_tokens"]) == [4, 4, 4, 1]
    assert list(out[out["doc_id"] == 1]["chunk_text"]) == ["x"]
    # empty string: one chunk, one empty token (string_split semantics)
    d2 = out[out["doc_id"] == 2]
    assert list(d2["chunk_text"]) == [""] and list(d2["n_tokens"]) == [1]
    assert len(out[out["doc_id"] == 3]) == 0  # null text drops
    # double space: 3 tokens p,'',q → one chunk, text verbatim
    d4 = out[out["doc_id"] == 4]
    assert list(d4["chunk_text"]) == ["p  q"] and list(d4["n_tokens"]) == [3]


def test_chunk_documents_no_overlap_partitions_tokens(rd):
    out = chunk_documents(_docs(rd), "doc_id", "text", 3, 0).to_pandas()
    d0 = out[out["doc_id"] == 0].sort_values("chunk_id")
    joined = " ".join(d0["chunk_text"])
    assert joined == "a b c d e f g h i j"
    assert d0["n_tokens"].sum() == 10


def test_chunk_documents_validates(rd):
    with pytest.raises(ValueError):
        chunk_documents(_docs(rd), "doc_id", "text", 0, 0)
    with pytest.raises(ValueError):
        chunk_documents(_docs(rd), "doc_id", "text", 4, 4)
    with pytest.raises(ValueError):
        chunk_documents(_docs(rd), "doc_id", "text", 4, -1)


def _keys(rd, n=2000):
    ids = list(range(n)) + [None]
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))


def test_sample_hash_deterministic_and_bounded(rd):
    a = sample_hash(_keys(rd), "doc_id", 25).to_pandas()
    b = sample_hash(_keys(rd), "doc_id", 25).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 0.15 < len(a) / 2000 < 0.35  # multiplicative hash is uniform
    assert a["doc_id"].notna().all()     # null key never sampled
    assert len(sample_hash(_keys(rd), "doc_id", 0).to_pandas()) == 0
    full = sample_hash(_keys(rd), "doc_id", 100).to_pandas()
    assert len(full) == 2000  # everything but the null row
    with pytest.raises(ValueError):
        sample_hash(_keys(rd), "doc_id", 101)


def test_sample_hash_negative_keys_fail_loudly(rd):
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([3, -7], pa.int64())}))
    with pytest.raises(Exception, match="non-negative"):
        sample_hash(ds, "doc_id", 50).to_pandas()


def test_sample_hash_join_compatible_across_tables(rd):
    # the same key set is kept from BOTH tables → sampled joins line up
    t1 = sample_hash(_keys(rd), "doc_id", 40).to_pandas()
    t2 = sample_hash(_keys(rd, n=1000), "doc_id", 40).to_pandas()
    small = set(t2["doc_id"])
    assert small == {k for k in t1["doc_id"] if k < 1000}


def test_stratified_sample_hash_per_stratum(rd):
    n = 3000
    langs = ["en", "es", "zz"] * (n // 3)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(langs),
    }))
    out = stratified_sample_hash(
        ds, "doc_id", "lang", {"en": 100, "es": 0}, default_pct=50
    ).to_pandas()
    got = out["lang"].value_counts()
    assert got.get("en", 0) == n // 3      # 100% kept
    assert got.get("es", 0) == 0           # 0% kept
    assert 0.35 < got.get("zz", 0) / (n // 3) < 0.65
    with pytest.raises(ValueError):
        stratified_sample_hash(ds, "doc_id", "lang", {"en": 200})


def test_term_doc_stats_df_counts_docs_not_occurrences(rd):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["cat cat dog", "cat fish", None]),
    }))
    out = term_doc_stats(ds, "doc_id", "text").to_pandas()
    row = out.set_index("term")
    assert row.loc["cat", "df"] == 2 and row.loc["cat", "tf"] == 3
    assert row.loc["dog", "df"] == 1 and row.loc["fish", "tf"] == 1
    filtered = term_doc_stats(ds, "doc_id", "text", min_df=2).to_pandas()
    assert list(filtered["term"]) == ["cat"]


def test_tfidf_scores_formula(rd):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["cat cat dog", "cat fish"]),
    }))
    out = tfidf_scores(ds, "doc_id", "text").to_pandas()
    out = out.set_index(["doc_id", "term"])
    # cat: df=2, N=2 → idf=ln(1)=0 everywhere
    assert out.loc[(0, "cat"), "score"] == 0.0
    # dog: tf=1, idf=ln(2)
    assert out.loc[(0, "dog"), "score"] == round(float(np.log(2.0)), 6)
    assert out.loc[(1, "fish"), "tf"] == 1


def test_decontaminate_edges(rd):
    from maestro_ray.ops.corpus import decontaminate

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps",    # shares a 3-gram with eval
            "the quick brown fox jumps",    # duplicate: same overlap
            "quick brown cats sit still",   # no shared 3-gram
            "a b",                          # < n tokens → overlap 0
            None,                           # null text → NO row
        ]),
    }))
    ev = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["quick brown fox leaps high quick brown fox"]),
    }))
    out = decontaminate(corpus, ev, n=3).to_pandas() \
        .set_index("doc_id").sort_index()
    # eval 3-grams: {quick brown fox, brown fox leaps, fox leaps high,
    #   leaps high quick, high quick brown} — doc0/1 share exactly one
    assert list(out.index) == [0, 1, 2, 3]
    assert out.loc[0, "overlap"] == 1 and bool(out.loc[0, "contaminated"])
    assert out.loc[1, "overlap"] == 1
    assert out.loc[2, "overlap"] == 0 and not bool(out.loc[2, "contaminated"])
    assert out.loc[3, "overlap"] == 0
    # distinctness: repeating the shared 3-gram in one doc counts ONCE
    rep = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["quick brown fox and quick brown fox"]),
    }))
    out2 = decontaminate(rep, ev, n=3).to_pandas()
    assert int(out2.loc[0, "overlap"]) == 1
    # empty eval set: everything clean, relation still full
    empty_ev = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    out3 = decontaminate(corpus, empty_ev, n=3).to_pandas()
    assert len(out3) == 4 and (out3["overlap"] == 0).all()
    with pytest.raises(ValueError):
        decontaminate(corpus, ev, n=0)


# -------------------------------------------------------------- doc_bigrams


def test_doc_bigrams_never_span_documents(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.corpus import doc_bigrams

    t = pa.table({
        "lang": pa.array(["en", "en", "de", "de"]),
        "text": pa.array(["a b c", "x", "", None]),
    })
    out = doc_bigrams(rd.from_arrow(t), "text", "lang").to_pandas()
    got = sorted(zip(out["lang"], out["bigram"]))
    # "x" has no pair; ""/null contribute nothing; no "c x" cross-doc pair
    assert got == [("en", "a b"), ("en", "b c")]


def test_doc_bigrams_consecutive_delims_match_sql_split(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.corpus import doc_bigrams

    t = pa.table({"lang": pa.array(["en"]),
                  "text": pa.array(["a  b c "])})  # empty tokens
    out = doc_bigrams(rd.from_arrow(t), "text", "lang").to_pandas()
    want = duckdb.sql(
        "WITH u AS (SELECT generate_subscripts(str_split('a  b c ', ' '),"
        " 1) AS o, unnest(str_split('a  b c ', ' ')) AS tok) "
        "SELECT tok || ' ' || lead(tok) OVER (ORDER BY o) AS bg FROM u "
        "QUALIFY bg IS NOT NULL").df()
    assert sorted(out["bigram"]) == sorted(want["bg"])
