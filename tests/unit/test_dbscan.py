"""dbscan: planted chain-connected blobs, border attachment, noise,
and the no-core degenerate case."""

import pyarrow as pa
import pytest

from maestro_ray.ops.spatial import dbscan


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _run(rd, pts, eps, min_pts):
    t = pa.table({
        "id": pa.array([p[0] for p in pts], pa.int64()),
        "x": pa.array([p[1] for p in pts], pa.int64()),
        "y": pa.array([p[2] for p in pts], pa.int64()),
    })
    out = dbscan(rd.from_arrow(t).repartition(3), eps, min_pts) \
        .to_pandas().set_index("id").sort_index()
    return out


def test_dbscan_chain_blobs_border_noise(rd):
    # blob A: ids 10..19 on a line, spacing 1 (chain-connected at
    # eps=2, NOT a clique — exercises transitive density connection)
    pts = [(10 + i, i, 0) for i in range(10)]
    # blob B: ids 30..39, far away
    pts += [(30 + i, 1000 + i, 500) for i in range(10)]
    # border: 2 away from A's end point (9,0): N = {self, id19} < 3
    pts += [(50, 11, 0)]
    # noise: isolated
    pts += [(60, 5000, 5000)]
    out = _run(rd, pts, eps=2, min_pts=3)

    a = out.loc[10:19]
    assert (a["role"] == "core").all()
    assert (a["cluster"] == 10).all()  # min core id in the component
    b = out.loc[30:39]
    assert (b["role"] == "core").all()
    assert (b["cluster"] == 30).all()
    assert out.loc[50, "role"] == "border"
    assert out.loc[50, "cluster"] == 10
    assert out.loc[60, "role"] == "noise"
    assert out.loc[60, "cluster"] is None or \
        out.loc[60:60, "cluster"].isna().all()


def test_dbscan_border_ties_to_min_cluster(rd):
    # two unit squares (every corner core at min_pts=4); the mid point
    # reaches exactly one core of EACH square (|N|=3 < 4 → border) and
    # must pin to the MIN cluster label
    pts = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),    # cluster 1
           (7, 5, 0), (8, 6, 0), (9, 5, 1), (11, 6, 1),   # cluster 7
           (5, 3, 0)]                                      # the border
    out = _run(rd, pts, eps=2, min_pts=4)
    assert (out.loc[[1, 2, 3, 4], "role"] == "core").all()
    assert (out.loc[[1, 2, 3, 4], "cluster"] == 1).all()
    assert (out.loc[[7, 8, 9, 11], "cluster"] == 7).all()
    assert out.loc[5, "role"] == "border"
    assert out.loc[5, "cluster"] == 1


def test_dbscan_no_cores_all_noise(rd):
    pts = [(1, 0, 0), (2, 100, 100), (3, 200, 200)]
    out = _run(rd, pts, eps=2, min_pts=3)
    assert (out["role"] == "noise").all()
    assert out["cluster"].isna().all()


def test_dbscan_isolated_core_identity_label(rd):
    # min_pts=1: every point is core even with no neighbors — isolated
    # cores must get their OWN id as cluster (the comp-absent fill)
    pts = [(4, 0, 0), (9, 100, 100)]
    out = _run(rd, pts, eps=2, min_pts=1)
    assert (out["role"] == "core").all()
    assert out.loc[4, "cluster"] == 4
    assert out.loc[9, "cluster"] == 9


def test_dbscan_guard(rd):
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(rd.from_arrow(pa.table({
            "id": pa.array([1], pa.int64()),
            "x": pa.array([0], pa.int64()),
            "y": pa.array([0], pa.int64())})), 2, 0)


def test_radius_join_max_pairs_guard(rd):
    # 200 coincident points: candidate volume = 9 * 200 * 200 = 360k
    # (every point's cell + its 8 halo replicas hit the same cell) —
    # a tiny max_pairs must trip the loud density guard BEFORE any
    # pair materializes; the r5 10x-density soak died OutOfDisk
    # without it
    from maestro_ray.ops.spatial import radius_join

    t = pa.table({
        "id": pa.array(list(range(200)), pa.int64()),
        "x": pa.array([5] * 200, pa.int64()),
        "y": pa.array([5] * 200, pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    with pytest.raises(ValueError, match="max_pairs"):
        radius_join(ds, ds, 2, left_cols=("id", "x", "y"),
                    right_cols=("id", "x", "y"), max_pairs=1000)
    # same data passes with the guard sized for it, and dbscan's
    # result is unaffected by the estimation pass
    out = _run(rd, [(i, 5, 5) for i in range(6)], 2, 5)
    assert set(out["role"]) == {"core"}
