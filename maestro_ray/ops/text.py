"""Text analysis for webtext pipelines (SURVEY.md §2 P7/P8/C2 + the
training-data text suite): language-ID, quality scoring, token
counting, document fingerprinting, and the distributed extract_text
stage.

All stateful stages are CALLABLE CLASSES (actor pools): expensive setup
(regex compilation, stop-word tables) happens once per actor in
``__init__``, per-batch work is vectorized pandas/numpy.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.extract_pure import extract_text
from maestro_ray.ops.hashing import hash_array


def extract_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "text") -> pa.Table:
    """P7: the distributed extract_text stage — delegates every row to
    the frozen pure contract (ops/extract_pure.py) so the byte-identity
    invariant holds by construction."""
    texts = [extract_text(h) for h in batch.column(html_col).to_pylist()]
    return batch.append_column(out_col, pa.array(texts, pa.string()))


#: minimal deterministic stop-word tables for the lang heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "se", "no"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"},
}


class LangDetect:
    """P8: deterministic language-ID heuristic (stop-word hit rates +
    CJK codepoint ratio). Actor-pool stage: tables built once per actor.
    """

    def __init__(self, text_col: str = "text", out_col: str = "lang_detected"):
        self.text_col, self.out_col = text_col, out_col
        self.word_re = re.compile(r"[a-zA-ZäöüßáéíóúàèñçÀ-ÿ]+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")

    def detect(self, text: str | None) -> str:
        if not text:
            return "und"
        cjk = len(self.cjk_re.findall(text))
        if cjk * 10 > len(text):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        scores = {
            lang: sum(w in table for w in words)
            for lang, table in _STOPWORDS.items()
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        return best if scores[best] > 0 else "und"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = [self.detect(t) for t in batch[self.text_col]]
        return batch


class QualityScore:
    """Quality scoring: length, punctuation ratio, stop-word ratio,
    mean word length — the standard web-corpus quality signals, all
    deterministic and Arrow-native (pyarrow.compute kernels; the
    pandas round-trip was VERDICT r2 anti-pattern #4).

    Punctuation is ``[^\\p{L}\\p{N}_\\s]`` in RE2 terms — the closest
    RE2 equivalent of Python's ``[^\\w\\s]`` (both exclude unicode
    letters/digits/underscore/whitespace). Stop-word counting runs as
    split → flatten → ``is_in`` → segmented prefix-sum, one C/numpy
    pass per batch instead of per-row Python."""

    def __init__(self, text_col: str = "text"):
        import pyarrow.compute as pc  # noqa: F401 — validated at init

        self.text_col = text_col
        self.stop_arr = pa.array(sorted(_STOPWORDS["en"]), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(batch.column(self.text_col), "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
        n_words = pc.cast(pc.count_substring_regex(texts, r"\S+"), pa.int64())
        n_punct = pc.cast(
            pc.count_substring_regex(texts, r"[^\p{L}\p{N}_\s]"), pa.int64()
        )
        # stop-word hits: whitespace-split words, lowered, membership
        # tested in one is_in kernel, then summed per row via cumsum
        # indexed at list offsets (reduceat breaks on empty lists)
        words = pc.split_pattern_regex(texts, r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        hits = pc.is_in(
            pc.utf8_lower(words.flatten()), value_set=self.stop_arr
        ).to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(hits.astype(np.int64))])
        n_stop = cs[offs[1:]] - cs[offs[:-1]]
        nc = n_chars.to_numpy(zero_copy_only=False)
        nw = n_words.to_numpy(zero_copy_only=False)
        nw1 = np.maximum(nw, 1)
        return (
            batch.append_column("n_chars", n_chars)
            .append_column("n_words", n_words)
            .append_column("punct_ratio", pa.array(
                n_punct.to_numpy(zero_copy_only=False) / np.maximum(nc, 1),
                pa.float64()))
            .append_column("stopword_ratio", pa.array(
                n_stop / nw1, pa.float64()))
            .append_column("mean_word_len", pa.array(
                (nc - nw1 + 1) / nw1, pa.float64()))
        )


class TokenCount:
    """C2-pattern token counter: whitespace tokens plus a BPE-ish
    regex tokenization (GPT-2-style word/punct/space classes).

    Arrow-native for the whitespace count (``count_substring_regex``);
    the BPE pattern needs a negative lookahead, which RE2 (Arrow's
    regex engine) does not support, so that one stays a compiled-once
    Python ``finditer`` count."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bpe_re = re.compile(
            r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(batch.column(self.text_col), "")
        n_ws = pc.cast(pc.count_substring_regex(texts, r"\S+"), pa.int64())
        n_bpe = [
            sum(1 for _ in self.bpe_re.finditer(t)) for t in texts.to_pylist()
        ]
        return (
            batch.append_column("n_ws_tokens", n_ws)
            .append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64()))
        )


class Fingerprint:
    """Document fingerprint: 64-bit rolling-hash over the word sequence
    (order-sensitive, whitespace-insensitive) — cheap near-exact-dup
    signal."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col, self.out_col = text_col, out_col
        self.word_re = re.compile(r"\S+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        B, M = np.uint64(1000003), np.uint64(0xFFFFFFFFFFFFFFFF)
        for t in batch[self.text_col].fillna(""):
            words = self.word_re.findall(t)
            h = np.uint64(14695981039346656037)
            with np.errstate(over="ignore"):
                if words:
                    whs = hash_array(pd.Series(words))  # one vectorized hash per doc
                    for wh in whs:
                        h = (h * B + wh) & M
            out.append(int(h))
        batch[self.out_col] = pd.Series(out, index=batch.index, dtype="uint64")
        return batch


class WordCountScorer:
    """The oracle-checkable stateful scorer (C2): n_words per doc,
    defined so a SQL twin exists (space-separated word count).
    Arrow-native: one ``count_substring`` kernel per batch."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(batch.column(self.text_col), "")
        n = pc.add(pc.count_substring(texts, " "), 1)
        return batch.append_column("n_words", pc.cast(n, pa.int64()))


class LinearModelScorer:
    """The batched-model-inference pattern (C2): a weight vector is
    derived ONCE per actor in ``__init__`` (stand-in for loading model
    weights from disk/object store), then every batch is scored with a
    single vectorized matmul. Deterministic: weights come from a seeded
    RNG, so a DuckDB ``list_dot_product`` twin can verify the scores.
    """

    def __init__(self, dim: int = 64, seed: int = 11,
                 emb_col: str = "embedding", out_col: str = "score"):
        import numpy as np

        self.emb_col, self.out_col = emb_col, out_col
        # "model load": done once per actor, never per batch
        self.weights = (
            np.random.default_rng(seed).standard_normal(dim).astype(np.float64)
        )

    def weights_list(self) -> list[float]:
        return [float(w) for w in self.weights]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        col = batch.column(self.emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        emb = flat.reshape(len(col), -1)
        scores = np.round(emb @ self.weights, 4)
        return batch.append_column(self.out_col, pa.array(scores, pa.float64()))


def readability_batch(
    batch: pa.Table,
    text_col: str = "text",
    round_to: int = 4,
) -> pa.Table:
    """Flesch reading-ease score from EXACT integer counts — the
    standard document-quality feature for corpus filtering. Words =
    ``[A-Za-z]+`` runs, sentences = ``[.!?]+`` runs, syllables =
    ``[aeiouy]+`` vowel groups (lowercased) — all three are single
    vectorized RE2 ``count_substring_regex`` kernels, no per-doc loop,
    and each is an exact int a SQL twin can replay via
    ``len(regexp_extract_all(...))``. Score = 206.835 − 1.015·(W/S) −
    84.6·(Y/W) with fixed operation order; W = 0 or S = 0 → null.
    Null text counts as empty (0s, null score)."""
    import pyarrow.compute as pc

    texts = pc.fill_null(batch.column(text_col), "")
    w = pc.cast(pc.count_substring_regex(texts, "[A-Za-z]+"), pa.int64())
    s = pc.cast(pc.count_substring_regex(texts, "[.!?]+"), pa.int64())
    y = pc.cast(pc.count_substring_regex(
        pc.utf8_lower(texts), "[aeiouy]+"), pa.int64())
    wn = w.to_numpy(zero_copy_only=False).astype(np.float64)
    sn = s.to_numpy(zero_copy_only=False).astype(np.float64)
    yn = y.to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        score = 206.835 - 1.015 * (wn / sn) - 84.6 * (yn / wn)
    score = np.where((wn == 0) | (sn == 0), np.nan,
                     np.round(score, round_to))
    return (batch.append_column("n_words", w)
            .append_column("n_sentences", s)
            .append_column("n_syllables", y)
            .append_column("flesch", pa.array(score, pa.float64(),
                                              from_pandas=True)))


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm_text") -> pa.Table:
    """Curation-standard text normalization, fully Arrow-vectorized:
    lowercase → collapse whitespace runs to one space → trim. RE2
    semantics match DuckDB's regexp_replace(…, 'g'), so the op is
    SQL-twinnable verbatim."""
    import pyarrow.compute as pc

    t = pc.fill_null(batch.column(text_col), "")
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    # trim with the SAME RE2 \s class as the collapse (and as the
    # DuckDB twin's regexp_replace): utf8_trim_whitespace strips
    # Unicode White_Space (\v, NBSP, U+2028 …) that RE2 \s does not,
    # which would silently diverge engine and oracle on non-ASCII text
    t = pc.replace_substring_regex(t, r"^\s+|\s+$", "")
    return batch.append_column(out_col, t)


def lang_detect(ds: rd.Dataset, text_col: str = "text", concurrency: int = 4) -> rd.Dataset:
    return ds.map_batches(
        LangDetect, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=concurrency,
    )
