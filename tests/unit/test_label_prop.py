"""label_propagation: planted communities, deterministic ties, seed
clamping, unreached nodes, guards."""

import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.graph import label_propagation


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _edges(rd, pairs):
    t = pa.table({"a": pa.array([p[0] for p in pairs], pa.int64()),
                  "b": pa.array([p[1] for p in pairs], pa.int64())})
    return rd.from_arrow(t).repartition(3)


def _clique(ids):
    return [(u, v) for i, u in enumerate(ids) for v in ids[i + 1:]]


def test_planted_communities_recovered(rd):
    a = list(range(1, 6))
    b = list(range(11, 16))
    pairs = _clique(a) + _clique(b) + [(5, 11)]  # one weak bridge
    seeds = pd.DataFrame({"node": [1, 15], "label": ["A", "B"]})
    out = label_propagation(_edges(rd, pairs), seeds, rounds=5) \
        .to_pandas().set_index("node").sort_index()
    assert (out.loc[a, "label"] == "A").all()
    assert (out.loc[b, "label"] == "B").all()


def test_tie_breaks_to_min_label_and_seed_clamped(rd):
    # node 5 sees one "A" and one "B" neighbor → min label "A";
    # seed 2 keeps its label even though all neighbors say otherwise
    pairs = [(1, 5), (9, 5), (1, 2), (9, 2)]
    seeds = pd.DataFrame({"node": [1, 9, 2],
                          "label": ["A", "B", "Z"]})
    out = label_propagation(_edges(rd, pairs), seeds, rounds=3) \
        .to_pandas().set_index("node")
    assert out.loc[5, "label"] == "A"
    assert out.loc[2, "label"] == "Z"


def test_unreached_nodes_stay_null(rd):
    pairs = [(1, 2), (50, 51)]  # the 50-51 island has no seed
    seeds = pd.DataFrame({"node": [1], "label": ["A"]})
    out = label_propagation(_edges(rd, pairs), seeds, rounds=4) \
        .to_pandas().set_index("node")
    assert out.loc[2, "label"] == "A"
    assert pd.isna(out.loc[50, "label"]) and pd.isna(out.loc[51, "label"])


def test_propagation_depth_matches_rounds(rd):
    # a path 1-2-3-4-5: after 2 rounds the label reaches node 3 only
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    seeds = pd.DataFrame({"node": [1], "label": ["A"]})
    out = label_propagation(_edges(rd, pairs), seeds, rounds=2) \
        .to_pandas().set_index("node")
    assert out.loc[2, "label"] == "A" and out.loc[3, "label"] == "A"
    assert pd.isna(out.loc[4, "label"])


def test_guards(rd):
    seeds = pd.DataFrame({"node": [1], "label": [None]})
    with pytest.raises(ValueError, match="null seed"):
        label_propagation(_edges(rd, [(1, 2)]), seeds, rounds=1)
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(_edges(rd, [(1, 2)]),
                          pd.DataFrame({"node": [1], "label": ["A"]}),
                          rounds=0)


def test_no_matching_seed_all_null_no_crash(rd):
    # review r4 s8b (execution-confirmed): a seed node absent from the
    # edge set left ZERO labeled nodes → empty cand lost its schema
    # through the join probe and crashed
    pairs = [(1, 2), (2, 3)]
    seeds = pd.DataFrame({"node": [99], "label": ["A"]})
    out = label_propagation(_edges(rd, pairs), seeds, rounds=3) \
        .to_pandas().set_index("node").sort_index()
    assert sorted(out.index) == [1, 2, 3]
    assert out["label"].isna().all()
