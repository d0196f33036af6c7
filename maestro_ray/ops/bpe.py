"""Byte-pair-encoding tokenizer: distributed training, actor-pool
encoding.

BPE training factors exactly like the real systems (GPT-2/sentencepiece
lineage): the corpus-scale work is ONE distributed word-frequency
histogram (split → per-batch partial counts → one groupby shuffle);
the merge loop then runs over the COMPRESSED (word, freq) table —
O(distinct words), not O(corpus) — so a 100-TB corpus trains from the
same histogram a 1-GB corpus does. The distinct-word table is collected
to the driver behind an explicit guard (the standard bounded-side rule;
hash-sample the corpus first when a web-scale vocabulary blows past
it).

Tokenizer contract: words are the module's single-space split (see
ops/corpus.py); a word is encoded independently as its byte/char
sequence with an end-of-word marker — merges never cross word
boundaries, matching the word-level BPE definition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

#: end-of-word marker appended to each word's symbol sequence (GPT-2
#: uses a leading space convention; </w> is the original Sennrich rule)
EOW = "</w>"


def word_frequencies(
    ds: rd.Dataset, text_col: str = "text",
    max_distinct_words: int = 5_000_000,
) -> pd.DataFrame:
    """Distributed (word, freq) histogram: per-batch partial counts,
    one groupby shuffle, driver collection GUARDED by
    ``max_distinct_words``."""

    def partial(t: pa.Table) -> pa.Table:
        tbl = t.filter(pc.is_valid(t.column(text_col)))
        toks = pc.split_pattern(tbl.column(text_col).combine_chunks(),
                                " ")
        flat = pa.table({"word": toks.flatten()})
        g = flat.group_by(["word"]).aggregate([([], "count_all")])
        return g.rename_columns(["word", "freq"])

    # materialized ONCE: count() (the guard) and to_pandas() both
    # consume it — lazy, the whole histogram pipeline would run twice
    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("word").sum("freq").materialize())
    n = merged.count()
    if n > max_distinct_words:
        raise ValueError(
            f"bpe: {n} distinct words > max_distinct_words="
            f"{max_distinct_words} — train on a hash sample "
            "(ops/corpus.sample_hash) or raise the guard")
    out = merged.to_pandas()
    out.columns = ["word", "freq"]
    return out.sort_values("word").reset_index(drop=True)


def bpe_train(
    ds: rd.Dataset,
    text_col: str = "text",
    n_merges: int = 200,
    max_distinct_words: int = 5_000_000,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges. Returns the ranked merge table
    (rank, left, right) — deterministic: pair-count ties break on the
    lexicographically smallest (left, right).

    The merge loop is the textbook Sennrich algorithm over the
    word-frequency table: each word is a symbol tuple (chars + EOW);
    each round counts adjacent symbol pairs weighted by word freq,
    merges the argmax pair everywhere, repeats. Stops early when no
    pair occurs twice."""
    if n_merges < 1:
        raise ValueError(f"bpe_train: n_merges={n_merges}")
    wf = word_frequencies(ds, text_col, max_distinct_words)
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in zip(wf["word"], wf["freq"]):
        vocab[tuple(w) + (EOW,)] = vocab.get(tuple(w) + (EOW,), 0) + int(f)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        top = max(pairs.values())
        if top < 2:
            break
        a, b = min(p for p, c in pairs.items() if c == top)
        merges.append((a, b))
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return pd.DataFrame(
        [(r, a, b) for r, (a, b) in enumerate(merges)],
        columns=["rank", "left", "right"])


class BpeEncode:
    """Actor-pool encoding stage: the merge table is rebuilt into a
    rank dict ONCE per actor (``__init__``), each batch encodes its
    docs and emits (id, n_tokens, tokens-as-string). Apply with
    ``ds.map_batches(BpeEncode, fn_constructor_kwargs=...,
    concurrency=N, batch_format="pyarrow")``."""

    def __init__(self, merges: pd.DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.rank = {(a, b): r for r, a, b in
                     zip(merges["rank"], merges["left"],
                         merges["right"])}
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        got = self._cache.get(w)
        if got is not None:
            return got
        syms = list(w) + [EOW]
        while len(syms) > 1:
            ranked = [
                (self.rank.get((syms[i], syms[i + 1])), i)
                for i in range(len(syms) - 1)
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            _r, i = min(ranked)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        if len(self._cache) < 1_000_000:  # bound actor memory
            self._cache[w] = syms
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        tbl = t.filter(pc.is_valid(t.column(self.text_col)))
        texts = tbl.column(self.text_col).to_pylist()
        toks = [
            [s for w in txt.split(" ") for s in self._encode_word(w)]
            for txt in texts
        ]
        return pa.table({
            self.id_col: tbl.column(self.id_col),
            "n_bpe_tokens": pa.array([len(x) for x in toks], pa.int64()),
            "bpe_tokens": pa.array([" ".join(x) for x in toks],
                                   pa.string()),
        })
