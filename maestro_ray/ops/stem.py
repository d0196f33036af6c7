"""Porter stemming (Porter 1980, "An algorithm for suffix stripping"
— the public-domain algorithm) as a corpus normalization stage: the
classic 5-step suffix stripper, plus a distributed term-stemming
operator that memoizes over UNIQUE tokens per batch (vocabulary is
Zipfian — the per-batch unique set is tiny next to the token stream,
so the scalar automaton runs O(unique) times, not O(tokens))."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form."""
    m, i, n = 0, 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    """*o: ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3)
            and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)
            and w[-1] not in "wxy")


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
          ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
          ("iviti", "ive"), ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
          ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    """The scalar Porter automaton. Lower-case ASCII input assumed;
    words of length <= 2 pass through (the original convention)."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (longest match wins — scan by suffix length descending)
    for suf, rep in sorted(_STEP2, key=lambda p: -len(p[0])):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in sorted(_STEP3, key=lambda p: -len(p[0])):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and (not stem or stem[-1] not in "st"):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized-by-memoization stemming of a token array: the scalar
    automaton runs once per UNIQUE token (Zipf makes that tiny), the
    stream is rebuilt with one dictionary gather."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    uniq = d.dictionary.to_pylist()
    stems = pa.array([porter_stem(u) if u is not None else None
                      for u in uniq], pa.string())
    idx = d.indices
    return stems.take(idx)


def stem_terms(
    ds: rd.Dataset,
    text_col: str = "text",
    k: int = 20,
) -> pd.DataFrame:
    """Top-``k`` Porter stems by corpus frequency — the normalized
    term-stats query (merges inflections the raw term count splits).
    One vectorized split + per-batch memoized stemming + one bucketed
    count; top-k via the local-combiner ``topk``. Ordered (n desc,
    stem asc). Rows-only (the automaton has no SQL spelling) — pytest
    pins the kernel against Porter's published examples."""
    from maestro_ray.ops.aggregates import bucketed_agg, topk

    def toks(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.drop_null()
        # all-null batches arrive as type null — no utf8 kernel for
        # that (the repo-documented empty-schema class); type the
        # empty output explicitly
        if len(texts) == 0 or pa.types.is_null(texts.type):
            return pa.table({"stem": pa.array([], pa.string())})
        flat = pc.list_flatten(pc.split_pattern(
            pc.utf8_lower(texts), pattern=" "))
        return pa.table({"stem": stem_column(flat)})

    counts = bucketed_agg(
        ds.map_batches(toks, batch_format="pyarrow"),
        ["stem"], [(None, "count_all", "n")]).materialize()
    if counts.count() == 0:
        # empty Dataset loses its schema — topk's sort would KeyError
        return pd.DataFrame({"stem": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    out = topk(counts, "n", k, descending=True, tie_break=["stem"])
    out["n"] = out["n"].astype("int64")
    return out[["stem", "n"]].reset_index(drop=True)
