"""Schema contract + evolution tests (SURVEY.md §1.4, op U4)."""

import pyarrow as pa
import pytest

from maestro_ray.core.schema import (
    CHANGELOG_V1,
    CHANGELOG_V2,
    CHANGELOG_V3,
    DAG,
    SchemaContractError,
    Stage,
    check_evolvable,
    evolve_table,
    unify,
)


def test_column_add_null_fill():
    t = pa.table({"offset": pa.array([1, 2], pa.int64()),
                  "op": pa.array(["insert", "delete"]),
                  "url": pa.array(["a", "b"]),
                  "warc_ts": pa.array([1, 2], pa.timestamp("us")),
                  "html": pa.array([b"x", None], pa.binary())})
    out = evolve_table(t, CHANGELOG_V3)
    assert out.schema.equals(CHANGELOG_V3)
    assert out.column("lang").null_count == 2


def test_widen_timestamp_seconds_to_us():
    t = pa.table({"warc_ts": pa.array([5], pa.timestamp("s"))})
    target = pa.schema([("warc_ts", pa.timestamp("us"))])
    out = evolve_table(t, target)
    assert out.column("warc_ts").cast(pa.int64()).to_pylist() == [5_000_000]


def test_widen_int32_to_int64_and_float():
    t = pa.table({"a": pa.array([1], pa.int32())})
    assert evolve_table(t, pa.schema([("a", pa.int64())])).schema.field("a").type == pa.int64()
    assert evolve_table(t, pa.schema([("a", pa.float64())])).schema.field("a").type == pa.float64()


def test_narrowing_rejected():
    t = pa.table({"a": pa.array([1], pa.int64())})
    with pytest.raises(SchemaContractError):
        evolve_table(t, pa.schema([("a", pa.int32())]))


def test_unknown_column_rejected():
    t = pa.table({"zzz": pa.array([1])})
    with pytest.raises(SchemaContractError):
        check_evolvable(t.schema, CHANGELOG_V3)


def test_unify_changelog_versions():
    u = unify(CHANGELOG_V1, CHANGELOG_V2, CHANGELOG_V3)
    assert u.field("warc_ts").type == pa.timestamp("us")
    assert "lang" in u.names


def test_dag_composition_checked_eagerly():
    a = Stage("a", None, CHANGELOG_V1, lambda t: t)
    b = Stage("b", CHANGELOG_V3, CHANGELOG_V3, lambda t: t)
    dag = a >> b  # v1 evolves into v3: OK
    assert [s.name for s in dag.stages] == ["a", "b"]
    narrow = Stage("narrow", CHANGELOG_V1, CHANGELOG_V1, lambda t: t)
    wide = Stage("wide", None, CHANGELOG_V3, lambda t: t)
    with pytest.raises(SchemaContractError):
        _ = DAG([wide]) >> narrow  # v3 -> v1 would drop 'lang': rejected
