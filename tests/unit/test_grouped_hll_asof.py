"""Grouped HLL accuracy vs exact; as-of join directions vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def test_grouped_approx_ndistinct_within_epsilon(ray_session, sf_dir):
    import ray.data as rd

    from maestro_ray.ops.aggregates import grouped_approx_ndistinct

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_partkey"])
    got = grouped_approx_ndistinct(ds, "l_returnflag", "l_partkey")
    exact = duckdb.sql(
        f"SELECT l_returnflag, count(DISTINCT l_partkey) AS n "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    merged = got.merge(exact, on="l_returnflag")
    rel_err = (merged["approx_n"] - merged["n"]).abs() / merged["n"]
    assert (rel_err < 0.05).all(), merged  # HLL p=12 -> ~1.6% typical


def test_asof_directions_match_duckdb(ray_session, sf_dir):
    import ray.data as rd

    from maestro_ray.ops.joins import asof_join
    from maestro_ray.ops.parse import filter_rows, project
    import pyarrow as pa
    import pyarrow.compute as pc

    left = rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts"])
    right = filter_rows(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_type"]),
        lambda t: pc.equal(t.column("event_type"), pa.scalar("purchase")),
    )
    right = project(right, columns=["user_id", "ts"])
    for direction, cmp in (
        ("backward", "e.ts >= p.ts"),  # greatest p.ts <= e.ts
        ("forward", "e.ts <= p.ts"),   # least p.ts >= e.ts
    ):
        got = (
            asof_join(left, right, by="user_id", on="ts", direction=direction)
            .to_pandas()[["event_id", "ts_r"]]
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        kw = "ASOF LEFT JOIN"
        exp = duckdb.sql(
            f"SELECT e.event_id, p.ts AS ts_r FROM "
            f"'{sf_dir}/events.parquet' e {kw} "
            f"(SELECT user_id, ts FROM '{sf_dir}/events.parquet' "
            f" WHERE event_type = 'purchase') p "
            f"ON e.user_id = p.user_id AND {cmp}"
        ).df().sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, obj=direction)


def test_asof_tolerance_and_nearest_tie(ray_session):
    """Tolerance bounds the match window; equidistant nearest ties go
    BACKWARD (the rule the join_asof_near SQL twin encodes)."""
    import pandas as pd_
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.joins import asof_join

    t = pd_.Timestamp
    left = rd.from_arrow(pa.table({
        "k": [1, 1], "ts": [t("2024-01-02"), t("2024-01-10")]}))
    right = rd.from_arrow(pa.table({
        "k": [1, 1], "ts": [t("2024-01-01"), t("2024-01-03")],
        "v": ["back", "fwd"]}))
    out = asof_join(left, right, by="k", on="ts", right_cols=["v"],
                    direction="nearest",
                    tolerance=pd_.Timedelta("2D")) \
        .to_pandas().sort_values("ts").reset_index(drop=True)
    assert out.v.iloc[0] == "back"      # equidistant -> backward wins
    assert pd_.isna(out.v.iloc[1])      # beyond tolerance -> null
