"""Flesch readability scoring (ops/text.py readability_batch) — the
synthetic corpus has no sentence punctuation, so the score formula is
pinned here against DuckDB on punctuation-bearing text."""

import duckdb
import pandas as pd
import pyarrow as pa

from maestro_ray.ops.text import readability_batch


def test_readability_counts_and_score_vs_duckdb():
    texts = [
        "The cat sat on the mat. It was happy! Was it?",
        "Comprehensive readability estimation requires syllables.",
        "no punctuation here at all",
        "",
        None,
        "A! E? I. O! U.",
        "Rhythm myths fly by.",  # y-as-vowel heuristic
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = readability_batch(t).to_pandas()
    exp = duckdb.query_df(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "d", """
        SELECT doc_id,
          CAST(len(regexp_extract_all(coalesce(text,''), '[A-Za-z]+'))
            AS BIGINT) AS n_words,
          CAST(len(regexp_extract_all(coalesce(text,''), '[.!?]+'))
            AS BIGINT) AS n_sentences,
          CAST(len(regexp_extract_all(lower(coalesce(text,'')),
            '[aeiouy]+')) AS BIGINT) AS n_syllables,
          round(CASE WHEN n_words = 0 OR n_sentences = 0 THEN NULL
            ELSE 206.835 - 1.015 * (CAST(n_words AS DOUBLE) /
            n_sentences) - 84.6 * (CAST(n_syllables AS DOUBLE) /
            n_words) END, 4) AS flesch
        FROM d ORDER BY doc_id
    """).df()
    for c in ["n_words", "n_sentences", "n_syllables", "flesch"]:
        pd.testing.assert_series_equal(got[c], exp[c], check_exact=True)
    # spot facts: empty/null text → zero counts, null score
    assert got.loc[3, "n_words"] == 0 and pd.isna(got.loc[3, "flesch"])
    assert got.loc[4, "n_words"] == 0 and pd.isna(got.loc[4, "flesch"])
    # no sentences → null score even with words
    assert got.loc[2, "n_words"] == 5 and pd.isna(got.loc[2, "flesch"])
    # "A! E? I. O! U." = 5 words, 5 sentence runs, 5 vowel groups
    assert (got.loc[5, ["n_words", "n_sentences", "n_syllables"]]
            .tolist() == [5, 5, 5])
