"""Event-sequence analytics (ops/analytics.py markov_transitions,
sequence_gaps; ops/corpus.py explode_tokens) — hand-computable edges
the sf-level DuckDB parity can't isolate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.analytics import markov_transitions, sequence_gaps
from maestro_ray.ops.corpus import explode_tokens


def _events(rows):
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }))


def test_markov_counts_and_probabilities(ray_session):
    rows = [  # user 1: a->b->a->c   user 2: b->a
        (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "a"),
        (1, 40, 4, "c"), (2, 15, 5, "b"), (2, 25, 6, "a"),
    ]
    out = markov_transitions(_events(rows), key="user_id",
                             order_cols=["ts", "event_id"],
                             state_col="event_type")
    got = {(r.cur_state, r.next_state): (r.n, r.p)
           for r in out.itertuples()}
    assert got == {
        ("a", "b"): (1, 0.5), ("a", "c"): (1, 0.5),
        ("b", "a"): (2, 1.0),
    }
    # probabilities per cur_state sum to exactly 1
    sums = out.groupby("cur_state")["p"].sum()
    assert (sums == 1.0).all()


def test_markov_tiebreak_orders_equal_timestamps(ray_session):
    rows = [(1, 10, 2, "b"), (1, 10, 1, "a"), (1, 20, 3, "c")]
    out = markov_transitions(_events(rows), key="user_id",
                             order_cols=["ts", "event_id"],
                             state_col="event_type")
    assert set(zip(out.cur_state, out.next_state)) == \
        {("a", "b"), ("b", "c")}


def test_markov_single_event_users_emit_nothing(ray_session):
    rows = [(1, 10, 1, "a"), (2, 20, 2, "b")]
    out = markov_transitions(_events(rows), key="user_id",
                             order_cols=["ts", "event_id"],
                             state_col="event_type")
    assert out.empty
    assert list(out.columns) == ["cur_state", "next_state", "n", "p"]


def test_sequence_gaps_interior_runs_only(ray_session):
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([1, 2, 5, 9, 100, 101], pa.int64()),
    }))
    out = sequence_gaps(ds, key="user_id", id_col="event_id") \
        .to_pandas().sort_values(["user_id", "gap_start"]) \
        .reset_index(drop=True)
    exp = pd.DataFrame({"user_id": [1, 1],
                        "gap_start": [3, 6], "gap_end": [4, 8]})
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_explode_tokens_positions_and_empties(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b  c", "x"], pa.string()),
    }))
    out = explode_tokens(ds).to_pandas() \
        .sort_values(["doc_id", "tidx"]).reset_index(drop=True)
    # double space yields an empty token — same as SQL str_split
    assert out[out.doc_id == 1]["token"].tolist() == ["a", "b", "", "c"]
    assert out[out.doc_id == 1]["tidx"].tolist() == [1, 2, 3, 4]
    assert out[out.doc_id == 2]["token"].tolist() == ["x"]


def test_last_touch_attribution_edges(ray_session):
    from maestro_ray.ops.analytics import last_touch_attribution

    rows = [  # user 1: purchase BEFORE any view -> null; then view, purchase
        (1, 10, 1, "purchase"), (1, 20, 2, "view"), (1, 30, 3, "purchase"),
        # user 2: two views then purchase -> LAST view wins; same-ts
        # tiebreak by event_id keeps the view strictly before
        (2, 10, 4, "view"), (2, 20, 5, "view"), (2, 20, 6, "purchase"),
    ]
    ds = _events(rows)
    out = last_touch_attribution(
        ds, key="user_id", order_cols=["ts", "event_id"],
        type_col="event_type", id_col="event_id") \
        .to_pandas().sort_values("conv_event_id").reset_index(drop=True)
    assert out["conv_event_id"].tolist() == [1, 3, 6]
    assert pd.isna(out["touch_event_id"].iloc[0])
    assert out["touch_event_id"].iloc[1] == 2
    assert out["touch_event_id"].iloc[2] == 5


def test_null_ids_fail_loudly(ray_session):
    """astype(int64) folds null ids onto INT64_MIN — both sequence ops
    must refuse instead of emitting garbage (r4 s4 review finding)."""
    import pytest
    from maestro_ray.ops.analytics import last_touch_attribution

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_id": pa.array([1, None, 9], pa.int64()),
    }))
    with pytest.raises(Exception, match="null"):
        sequence_gaps(ds, key="user_id", id_col="event_id").to_pandas()

    ds2 = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 20], pa.timestamp("us")),
        "event_id": pa.array([None, 2], pa.int64()),
        "event_type": pa.array(["view", "purchase"], pa.string()),
    }))
    with pytest.raises(Exception, match="null"):
        last_touch_attribution(
            ds2, key="user_id", order_cols=["ts", "event_id"],
            type_col="event_type", id_col="event_id").to_pandas()
