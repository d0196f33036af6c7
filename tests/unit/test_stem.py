"""Porter stemmer (ops/stem.py): the scalar automaton against the
published examples from Porter (1980), and the distributed term-stem
pipeline."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.stem import porter_stem, stem_column, stem_terms

# (word, stem) pairs from the examples in Porter's paper, step by step
PAPER_CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_paper_examples():
    bad = {w: (porter_stem(w), e) for w, e in PAPER_CASES.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_porter_short_words_pass_through():
    for w in ("a", "is", "be", ""):
        assert porter_stem(w) == w


def test_stem_column_memoized_gather_matches_scalar():
    words = ["motoring", "cats", "motoring", None, "agreed", "cats"]
    out = stem_column(pa.array(words, pa.string())).to_pylist()
    assert out == ["motor", "cat", "motor", None, "agre", "cat"]


def test_stem_terms_merges_inflections(ray_session):
    docs = ["running runs run", "runs running", "jumped jumping"]
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    out = stem_terms(ds, "text", k=5)
    got = dict(zip(out["stem"], out["n"]))
    assert got["run"] == 5
    assert got["jump"] == 2
    # ordered n desc then stem asc
    assert list(out["stem"]) == sorted(
        out["stem"], key=lambda s: (-got[s], s))


def test_stem_terms_empty(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"text": pd.Series([None],
                                                        dtype="object")}))
    out = stem_terms(ds, "text", k=5)
    assert list(out.columns) == ["stem", "n"]
