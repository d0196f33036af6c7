"""BPE training + encoding: hand-computed merges on a tiny corpus,
encode/train consistency, round-trip, guards."""

import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.bpe import EOW, BpeEncode, bpe_train, \
    word_frequencies


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _corpus(rd, texts, parts=3):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    return rd.from_arrow(t).repartition(parts)


def test_word_frequencies_and_guard(rd):
    ds = _corpus(rd, ["a b a", "b c", None])
    wf = word_frequencies(ds, "text").set_index("word")["freq"]
    assert wf["a"] == 2 and wf["b"] == 2 and wf["c"] == 1
    with pytest.raises(ValueError, match="distinct words"):
        word_frequencies(ds, "text", max_distinct_words=2)


def test_bpe_hand_computed_merges(rd):
    # corpus: "low" x5, "lower" x2 — classic Sennrich example shape.
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2,
    # (e,r)=2, (r,</w>)=2 -> tie (l,o) vs (o,w): min picks (l,o)
    ds = _corpus(rd, ["low low low low low", "lower lower"])
    m = bpe_train(ds, n_merges=3)
    got = list(zip(m["left"], m["right"]))
    assert got[0] == ("l", "o")
    assert got[1] == ("lo", "w")    # (lo,w)=7 dominates round 2
    assert got[2] == ("low", EOW)   # low</w> x5 beats (e,r)/(w,e) x2
    # encoding follows the learned merges, lowest rank first
    enc = BpeEncode(m)
    out = enc(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["low lower lox"]),
    })).to_pandas()
    toks = out.loc[0, "bpe_tokens"].split(" ")
    assert toks[0] == "low" + EOW                 # fully merged
    assert toks[1:3] == ["low", "e"]              # partial merge
    assert toks[-2:] == ["x", EOW] or "lo" in toks  # unseen word splits
    assert out.loc[0, "n_bpe_tokens"] == len(toks)


def test_bpe_early_stop_and_guards(rd):
    # every word unique and single-char: no pair occurs twice
    ds = _corpus(rd, ["a b", "c d"])
    m = bpe_train(ds, n_merges=50)
    assert len(m) <= 4  # stops early, never invents rare merges
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(ds, n_merges=0)


def test_bpe_encode_roundtrip_concat(rd):
    # concatenating a word's tokens (minus EOW) reproduces the word
    ds = _corpus(rd, ["banana bandana banana", "ban bananas"])
    m = bpe_train(ds, n_merges=10)
    enc = BpeEncode(m)
    out = enc(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["banana bandana unknownword"]),
    })).to_pandas()
    toks = out.loc[0, "bpe_tokens"].split(" ")
    words, cur = [], ""
    for s in toks:
        if s.endswith(EOW):
            words.append(cur + s[:-len(EOW)])
            cur = ""
        else:
            cur += s
    assert words == ["banana", "bandana", "unknownword"]
