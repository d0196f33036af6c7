"""bigram_diversity + anova_oneway: hand-checked fixtures, reference
formulas, degenerate-input guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import anova_oneway
from maestro_ray.ops.corpus import bigram_diversity


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_bigram_diversity_hand_checked(rd):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "a b a b a",      # pairs: ab ba ab ba → 4 total, 2 distinct
            "x y z",          # xy yz → 2/2
            "solo",           # no bigram → omitted
            "",               # no bigram → omitted
            "w w w w",        # ww ww ww → 3 total, 1 distinct
        ], pa.string()),
    })
    out = bigram_diversity(rd.from_arrow(t).repartition(2)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 5]
    assert out["n_bigrams"].tolist() == [4, 2, 3]
    assert out["n_distinct"].tolist() == [2, 2, 1]
    assert out["diversity"].tolist() == [0.5, 1.0, 1 / 3]


def test_bigram_diversity_exact_distinct_no_hash_shortcut(rd):
    # many docs sharing bigrams must not leak counts across docs
    texts = ["p q p q", "p q r", "r p q"]
    t = pa.table({"doc_id": pa.array([10, 20, 30], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = bigram_diversity(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_distinct"].tolist() == [2, 2, 2]
    assert out["n_bigrams"].tolist() == [3, 2, 2]


def test_anova_matches_reference(rd):
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 300)
    v = rng.integers(0, 100, 300) + g * 10  # real group effect
    t = pa.table({"g": pa.array([f"s{i}" for i in g], pa.string()),
                  "v": pa.array(v, pa.int64())})
    out = anova_oneway(rd.from_arrow(t).repartition(4), "g", "v")
    # textbook reference
    df = pd.DataFrame({"g": g, "v": v.astype(float)})
    grand = df["v"].mean()
    ssb = sum(len(x) * (x["v"].mean() - grand) ** 2
              for _, x in df.groupby("g"))
    ssw = sum(((x["v"] - x["v"].mean()) ** 2).sum()
              for _, x in df.groupby("g"))
    k, n = 4, 300
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["k_groups"].iloc[0] == k
    assert out["n"].iloc[0] == n
    assert out["df_between"].iloc[0] == 3
    assert out["df_within"].iloc[0] == 296
    # the op rounds F to 6dp (cross-engine policy) — compare at grain
    np.testing.assert_allclose(out["f_stat"].iloc[0], f_ref, atol=5e-7)
    assert out["f_stat"].iloc[0] > 10  # the planted effect is visible


def test_anova_excludes_nulls_and_guards(rd):
    t = pa.table({
        "g": pa.array(["a", "a", None, "b", "b"], pa.string()),
        "v": pa.array([1, 2, 3, None, 5], pa.int64()),
    })
    out = anova_oneway(rd.from_arrow(t), "g", "v")
    assert out["n"].iloc[0] == 3  # null group + null value excluded

    one = pa.table({"g": pa.array(["a", "a"], pa.string()),
                    "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match=">= 2 groups"):
        anova_oneway(rd.from_arrow(one), "g", "v")
    const = pa.table({"g": pa.array(["a", "a", "b", "b"], pa.string()),
                      "v": pa.array([3, 3, 7, 7], pa.int64())})
    with pytest.raises(Exception, match="variance"):
        anova_oneway(rd.from_arrow(const), "g", "v")
