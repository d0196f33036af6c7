"""Unit oracles for the webtext curation batch (ops/web.py): URL
structure parsing, PII redaction (incl. Python-re / RE2 / DuckDB
pattern parity), Gopher repetition signals, and corpus-wide chunk
dedup with document reassembly."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.web import (
    PII_PATTERNS,
    dedup_chunks_global,
    parse_urls,
    pii_redact,
    repetition_stats,
)


def _ds(ray_session, table: pa.Table, parts: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(parts)


# ------------------------------------------------------------- parse_urls


def test_parse_urls_fields_and_quarantine(ray_session):
    t = pa.table({
        "i": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "url": pa.array([
            "https://www.example3.com/p/42?ref=en",
            "http://sub.a.example.org/x/y",
            "https://example.net",        # no path -> "/"
            "not a url at all",           # unparseable -> nulls
            None,                         # null in, nulls out
        ]),
    })
    out = (parse_urls(_ds(ray_session, t), "url")
           .to_pandas().sort_values("i").reset_index(drop=True))
    assert out["scheme"].tolist()[:3] == ["https", "http", "https"]
    assert out["host"].tolist()[:3] == [
        "www.example3.com", "sub.a.example.org", "example.net"]
    assert out["domain"].tolist()[:3] == [
        "example3.com", "example.org", "example.net"]
    assert out["path"].tolist()[:3] == ["/p/42", "/x/y", "/"]
    for col in ("scheme", "host", "domain", "path"):
        assert out[col].isna().tolist()[3:] == [True, True]


# ------------------------------------------------------------- pii_redact


PII_SAMPLES = [
    "mail a.b+c@mail.co.uk and x_1%y@d.io now",
    "server 10.0.255.1 then call 555-867-5309",
    "phone-in-email 555-123-4567@evil.com stays one email",
    "edge .@. not-an-email 1.2.3 not-an-ip 12-345-6789 not-a-phone",
    "",
    None,
]


def _redact_re(text):
    """Sequential Python-re oracle for the documented semantics."""
    if text is None:
        return None, None
    n = 0
    for pat, rep in PII_PATTERNS:
        n += len(re.findall(pat, text))
        text = re.sub(pat, rep, text)
    return text, n


def test_pii_redact_matches_python_re_oracle(ray_session):
    t = pa.table({
        "i": pa.array(range(len(PII_SAMPLES)), pa.int64()),
        "text": pa.array(PII_SAMPLES, pa.string()),
    })
    out = (pii_redact(_ds(ray_session, t), "text", concurrency=2)
           .to_pandas().sort_values("i").reset_index(drop=True))
    for i, s in enumerate(PII_SAMPLES):
        want_text, want_n = _redact_re(s)
        got_text = out.loc[i, "text_redacted"]
        got_n = out.loc[i, "pii_count"]
        if s is None:
            assert pd.isna(got_text) and pd.isna(got_n)
        else:
            assert got_text == want_text, (i, s)
            assert got_n == want_n, (i, s)


def test_pii_patterns_duckdb_parity():
    """The SQL twin relies on RE2 (DuckDB) matching Python re on these
    patterns — pin it on adversarial samples, not just the corpus."""
    import duckdb

    con = duckdb.connect()
    for s in PII_SAMPLES:
        if s is None:
            continue
        cur, n_sql = s, 0
        for pat, rep in PII_PATTERNS:
            n_sql += con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [cur, pat]
            ).fetchone()[0]
            cur = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [cur, pat, rep]
            ).fetchone()[0]
        want_text, want_n = _redact_re(s)
        assert cur == want_text and n_sql == want_n, s


def test_pii_phone_inside_email_not_double_counted(ray_session):
    t = pa.table({"text": pa.array(["555-123-4567@evil.com"])})
    out = pii_redact(_ds(ray_session, t, parts=1), "text").to_pandas()
    assert out.loc[0, "text_redacted"] == "<EMAIL>"
    assert out.loc[0, "pii_count"] == 1


# ------------------------------------------------------- repetition_stats


def test_repetition_stats_hand_computed(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b a b a",      # 5 words, 2 distinct, top a=3; bigrams:
                              # (a,b)x2 (b,a)x2 of 4 -> 0.5
            "x",              # 1 word -> bigram null
            "z z z z",        # all same: top=1.0, bigram (z,z)=3/3
            None,             # null text -> no row
        ]),
    })
    out = (repetition_stats(_ds(ray_session, t), "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_words"].tolist() == [5, 1, 4]
    assert out["distinct_frac"].tolist() == pytest.approx([2/5, 1.0, 1/4])
    assert out["top_word_frac"].tolist() == pytest.approx([3/5, 1.0, 1.0])
    assert out.loc[0, "top_bigram_frac"] == pytest.approx(2/4)
    assert pd.isna(out.loc[1, "top_bigram_frac"])
    assert out.loc[2, "top_bigram_frac"] == pytest.approx(1.0)


def test_repetition_stats_empty_string_tokenizer_contract(ray_session):
    # '' splits to ONE empty token (the module's single-space contract)
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([""])})
    out = repetition_stats(_ds(ray_session, t, parts=1)).to_pandas()
    assert out["n_words"].tolist() == [1]
    assert out["distinct_frac"].tolist() == [1.0]


# --------------------------------------------------- dedup_chunks_global


def test_dedup_chunks_global_planted(ray_session):
    # chunk_tokens=2: doc0 = [a b][c d]; doc1 repeats [a b] then new
    # [e f]; doc2 is entirely doc0 -> disappears; doc3 repeats its OWN
    # first chunk within-doc -> second occurrence removed.
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d",
            "a b e f",
            "a b c d",
            "g h g h i",
        ]),
    })
    out = (dedup_chunks_global(_ds(ray_session, t), "doc_id", "text",
                               chunk_tokens=2, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 3]       # doc2 fully gone
    assert out["text_dedup"].tolist() == ["a b c d", "e f", "g h i"]
    assert out["n_chunks_kept"].tolist() == [2, 1, 2]


def test_dedup_chunks_global_first_occurrence_is_lexicographic_min(
        ray_session):
    # the duplicate chunk sits EARLIER in the higher doc_id: winner must
    # be (doc 0, chunk 1), not (doc 9, chunk 0)
    t = pa.table({
        "doc_id": pa.array([9, 0], pa.int64()),
        "text": pa.array(["p q r s", "x y p q"]),
    })
    out = (dedup_chunks_global(_ds(ray_session, t, parts=2), "doc_id",
                               "text", chunk_tokens=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 9]
    assert out["text_dedup"].tolist() == ["x y p q", "r s"]


def test_dedup_chunks_global_id_packing_guard(ray_session):
    t = pa.table({"doc_id": pa.array([2**31], pa.int64()),
                  "text": pa.array(["a b"])})
    with pytest.raises(Exception, match="uint31"):
        dedup_chunks_global(_ds(ray_session, t, parts=1), "doc_id",
                            "text", chunk_tokens=2).materialize()


def test_canonicalize_urls_rules(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.web import canonicalize_urls

    cases = {
        "HTTPS://WWW.Ex.COM:443/A/B/?utm=x#frag": "https://www.ex.com/A/B",
        "http://ex.com:80/": "http://ex.com/",
        "http://ex.com:8080/p": "http://ex.com:8080/p",  # non-default kept
        "https://ex.com": "https://ex.com/",             # empty path -> /
        "notaurl": None,
        None: None,
    }
    ds = rd.from_arrow(pa.table({"url": list(cases)}))
    out = canonicalize_urls(ds, "url").to_pandas()
    got = dict(zip(out.url, out.url_canonical))
    for k, v in cases.items():
        if v is None:
            import pandas as pd_
            assert pd_.isna(got.get(k)), k
        else:
            assert got[k] == v, (k, got[k])
