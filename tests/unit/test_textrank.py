"""TextRank keywords (ops/corpus.py keywords_textrank) vs an
independent numpy reference over the same pair multiset, plus the
planted-hub sanity and degenerate inputs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.corpus import keywords_textrank

DOCS = [
    "data lake data lake data pipeline",
    "data shuffle beats lake house",
    "lake house lake shuffle",
    "solo",
    None,
    "pipeline shuffle data",
]


def _table():
    return pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    })


def _reference(k, damping=0.85, iterations=20):
    """Token-string power iteration mirroring ops/graph.pagerank."""
    edges = []
    for d in DOCS:
        if not d:
            continue
        t = d.split(" ")
        for i in range(len(t) - 1):
            edges.append((t[i], t[i + 1]))
            edges.append((t[i + 1], t[i]))
    nodes = sorted({x for e in edges for x in e})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _b in edges:
        deg[idx[a]] += 1
    ranks = np.full(n, 1.0 / n)
    for _ in range(iterations):
        share = ranks / np.maximum(deg, 1.0)
        inflow = np.zeros(n)
        for a, b in edges:
            inflow[idx[b]] += share[idx[a]]
        ranks = (1 - damping) / n + damping * inflow  # no dangling here
    order = sorted(range(n), key=lambda i: (-ranks[i], nodes[i]))[:k]
    return [(nodes[i], ranks[i]) for i in order]


def test_textrank_matches_reference(ray_session):
    out = keywords_textrank(rd.from_arrow(_table()), k=5)
    want = _reference(5)
    assert out["token"].tolist() == [w for w, _r in want]
    assert np.allclose(out["rank"].to_numpy(),
                       [r for _w, r in want], atol=1e-9)
    # the two hub tokens dominate the periphery
    assert set(out["token"].head(2)) == {"data", "lake"}


def test_textrank_single_token_docs_empty(ray_session):
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["solo", "alone"], pa.string())})
    out = keywords_textrank(rd.from_arrow(t), k=5)
    assert out.empty
    assert list(out.columns) == ["token", "rank"]


def test_textrank_k_truncates(ray_session):
    out = keywords_textrank(rd.from_arrow(_table()), k=2)
    assert len(out) == 2
    assert out["rank"].is_monotonic_decreasing
