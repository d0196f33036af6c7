"""Incremental materialized view (pipelines/views.py): the maintained
per-group live-row count must equal a full recompute at EVERY epoch,
resume idempotently, survive compaction as a zero delta, and fail
loudly when vacuum outran maintenance."""

import pandas as pd
import pytest

from maestro_ray.core.manifest import latest_manifest, list_epochs, vacuum
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import compact_partitions, read_lake_at
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.views import (
    maintain_group_counts,
    read_view,
)

PARAMS = ChangelogParams(n_urls=60, n_events=500, seg_rows=50,
                         evolution=False)


def _recompute(lake_dir, epoch):
    ds = read_lake_at(lake_dir, epoch, columns=["url", "lang"])
    pdf = ds.to_pandas()
    vc = pdf.groupby("lang", dropna=False)["url"].count()
    return {k if pd.notna(k) else None: int(v) for k, v in vc.items()}


def _as_dict(view):
    return {
        (k if pd.notna(k) else None): int(v)
        for k, v in zip(view.iloc[:, 0], view["n"])
    }


@pytest.fixture()
def lake(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=3)
    assert m is not None and m.epoch >= 3
    return lake_dir


def test_view_matches_recompute_at_every_epoch(lake):
    final = maintain_group_counts(lake, "lang")
    for e in list_epochs(lake):
        view = read_view(lake, "lang", e)
        assert view is not None
        assert _as_dict(view) == _recompute(lake, e), f"epoch {e}"
    assert _as_dict(final) == _recompute(lake, list_epochs(lake)[-1])


def test_view_resume_is_incremental_and_idempotent(lake, tmp_path):
    # maintain, ingest MORE epochs from a second log, maintain again:
    # the second call only processes the new epochs and converges
    first = maintain_group_counts(lake, "lang")
    again = maintain_group_counts(lake, "lang")
    assert _as_dict(first) == _as_dict(again)
    more = ChangelogParams(n_urls=60, n_events=700, seg_rows=50,
                           evolution=False)
    log2 = str(tmp_path / "log2")
    write_changelog(log2, more)
    ingest(log2, lake, num_partitions=4, segments_per_epoch=4)
    caught_up = maintain_group_counts(lake, "lang")
    last = list_epochs(lake)[-1]
    assert _as_dict(caught_up) == _recompute(lake, last)


def test_compaction_epoch_is_zero_delta(lake):
    before = maintain_group_counts(lake, "lang")
    compact_partitions(lake)
    after = maintain_group_counts(lake, "lang")
    assert _as_dict(before) == _as_dict(after)


def test_vacuum_before_maintenance_bootstraps_or_errors(lake):
    # never maintained; vacuum removed the historical diff sides
    vacuum(lake, latest_manifest(lake))
    with pytest.raises(ValueError, match="vacuumed"):
        maintain_group_counts(lake, "lang", on_vacuumed="error")
    # default: re-anchor with one full count at the newest readable epoch
    view = maintain_group_counts(lake, "lang")
    last = list_epochs(lake)[-1]
    assert _as_dict(view) == _recompute(lake, last)


def test_vacuum_preserves_views_and_cursor(lake):
    before = maintain_group_counts(lake, "lang")
    vacuum(lake, latest_manifest(lake))
    on_disk = read_view(lake, "lang")
    assert on_disk is not None and _as_dict(on_disk) == _as_dict(before)
    # cursor survives → catch-up is a no-op, not a bricked restart
    again = maintain_group_counts(lake, "lang")
    assert _as_dict(again) == _as_dict(before)


def test_nonhead_vacuum_fails_loudly_not_forever(lake):
    """A vacuum that kept a NON-head manifest deletes newer epochs'
    files; maintenance must detect that no re-anchor can get past the
    damage and raise — not loop on the same anchor forever."""
    from maestro_ray.core.manifest import manifest_at

    eps = list_epochs(lake)
    mid = eps[len(eps) // 2]
    vacuum(lake, manifest_at(lake, mid))
    with pytest.raises(ValueError, match="not maintainable"):
        maintain_group_counts(lake, "lang")


def test_group_counts_null_bucket_for_pre_evolution_files(tmp_path):
    """A lake file predating the group column counts its live rows in
    the null bucket instead of crashing the maintenance read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from maestro_ray.pipelines.views import _live_group_counts

    t = pa.table({
        "url": pa.array(["a", "b", "c"], pa.string()),
        "warc_ts": pa.array([1, 2, 3], pa.timestamp("us")),
        "op": pa.array(["insert", "delete", "insert"], pa.string()),
    })  # no 'lang' at all
    path = str(tmp_path / "old.parquet")
    pq.write_table(t, path)
    counts = _live_group_counts([path], "lang")
    assert dict(counts) == {None: 2}  # tombstone excluded


def test_latest_manifest_ignores_tmp_leftovers(lake):
    import os

    from maestro_ray.core.manifest import latest_manifest as lm
    from maestro_ray.core.manifest import list_epochs as le

    junk = os.path.join(lake, "_manifests", "manifest-999999999999.json.tmp")
    with open(junk, "w") as f:
        f.write("{not json")
    try:
        assert lm(lake).epoch == le(lake)[-1]
    finally:
        os.remove(junk)


def test_sum_view_matches_recompute_at_every_epoch(lake):
    """Grouped-SUM views (len:text — live text bytes per lang) ride the
    same partition-diff algebra; must equal a full recompute at EVERY
    epoch and resume idempotently."""
    from maestro_ray.pipelines.views import (
        maintain_group_sums,
        sum_view_name,
    )

    name = sum_view_name("lang", "len:text")
    final = maintain_group_sums(lake, "lang", "len:text")

    def recompute(epoch):
        pdf = read_lake_at(lake, epoch,
                           columns=["url", "lang", "text"]).to_pandas()
        pdf["b"] = pdf["text"].fillna("").str.encode("utf-8").str.len()
        vc = pdf.groupby("lang", dropna=False)["b"].sum()
        return {k if pd.notna(k) else None: int(v)
                for k, v in vc.items() if v != 0}

    for e in list_epochs(lake):
        view = read_view(lake, name, e)
        assert view is not None
        assert _as_dict(view) == recompute(e), f"epoch {e}"
    # idempotent rerun
    again = maintain_group_sums(lake, "lang", "len:text")
    assert _as_dict(again) == _as_dict(final)
    # count view and sum view coexist under distinct identities
    counts = maintain_group_counts(lake, "lang")
    assert set(counts.columns) == {"lang", "n"}


WIDTH_US = 3_600_000_000  # 1h tumbling windows over warc_ts


def _recompute_windows(lake_dir, epoch):
    ds = read_lake_at(lake_dir, epoch, columns=["url", "warc_ts"])
    pdf = ds.to_pandas()
    buckets = pdf["warc_ts"].astype("int64") // WIDTH_US
    vc = buckets.value_counts()
    return {int(k): int(v) for k, v in vc.items()}


def test_window_view_matches_recompute_at_every_epoch(lake):
    """bucket:<col>:<width> virtual group = incremental event-time
    tumbling-window counts; out-of-order events need no watermark —
    the partition diff moves their bucket like any other group."""
    spec = f"bucket:warc_ts:{WIDTH_US}"
    final = maintain_group_counts(lake, spec)
    for e in list_epochs(lake):
        view = read_view(lake, spec, e)
        assert view is not None
        assert _as_dict(view) == _recompute_windows(lake, e), f"epoch {e}"
    got = _as_dict(final)
    assert got == _recompute_windows(lake, list_epochs(lake)[-1])
    assert len(got) >= 2  # fixture must actually span several windows


def test_window_sum_view(lake):
    """Windowed SUM (live text bytes per hour window) through the same
    partition-diff algebra."""
    from maestro_ray.pipelines.views import maintain_group_sums

    spec = f"bucket:warc_ts:{WIDTH_US}"
    view = maintain_group_sums(lake, spec, "len:text")
    last = list_epochs(lake)[-1]
    pdf = read_lake_at(lake, last, columns=["warc_ts", "text"]).to_pandas()
    buckets = pdf["warc_ts"].astype("int64") // WIDTH_US
    nbytes = pdf["text"].fillna("").str.encode("utf-8").str.len()
    want = {int(k): int(v)
            for k, v in nbytes.groupby(buckets).sum().items() if v != 0}
    assert _as_dict(view) == want


def test_bucket_spec_validation(lake):
    with pytest.raises(ValueError, match="bucket"):
        maintain_group_counts(lake, "bucket:warc_ts")  # no width
    with pytest.raises(ValueError, match="bucket"):
        maintain_group_counts(lake, "bucket:warc_ts:0")  # zero width


def test_quantile_sketch_view(lake):
    """Incremental quantile-sketch view: pairs ≡ recompute at head;
    the per-group median estimate brackets the exact median within one
    bin; incremental catch-up ≡ fresh rebuild."""
    from maestro_ray.pipelines.views import (
        maintain_quantile_sketch_view,
        quantile_from_sketch,
    )

    W = 3_600_000_000
    pairs = maintain_quantile_sketch_view(lake, "lang", "warc_ts", W)
    last = list_epochs(lake)[-1]
    pdf = read_lake_at(lake, last, columns=["lang", "warc_ts"]) \
        .to_pandas()
    pdf["bin"] = pdf["warc_ts"].astype("int64") // W
    want = pdf.groupby(["lang", "bin"], dropna=False).size()
    got = {(r.iloc[0], r.iloc[1]): r["n"]
           for _i, r in pairs.iterrows()}
    for (g, b), n in want.items():
        key = (g if pd.notna(g) else None, b)
        assert got.get(key) == n, (key, n)
    assert len(got) == len(want)

    est = quantile_from_sketch(pairs, "lang", 0.5, W)
    for _i, row in est.iterrows():
        g = row.iloc[0]
        sub = pdf[pdf["lang"] == g] if pd.notna(g) else \
            pdf[pdf["lang"].isna()]
        exact = sub["warc_ts"].astype("int64").quantile(
            0.5, interpolation="lower")
        lo = row["estimate"]
        assert lo <= exact < lo + W, (g, lo, exact)


def test_quantile_from_sketch_rank_robust_and_null_groups():
    """Unit-level: the rank is an integer (0.55·20 must pick the 11th
    order statistic, not the 12th via IEEE round-up), and an all-null-
    measure group yields a NULL-estimate row, not a missing row."""
    import pandas as pd

    from maestro_ray.pipelines.views import quantile_from_sketch

    W = 10
    pairs = pd.DataFrame({
        "g": ["a"] * 2 + ["b"],
        "bucket:v:10": pd.array([0, 1, None], dtype="Int64"),
        "n": [11, 9, 4],
    })
    # group a: 20 rows, ranks 1..11 in bin 0, 12..20 in bin 1.
    # q=0.55 → rank ceil(11.000000000000002 - eps) = 11 → bin 0
    out = quantile_from_sketch(pairs, "g", 0.55, W)
    a = out[out["g"] == "a"]["estimate"].iloc[0]
    assert a == 0, out
    # q=0.551 → rank 12 → bin 1
    out2 = quantile_from_sketch(pairs, "g", 0.551, W)
    assert out2[out2["g"] == "a"]["estimate"].iloc[0] == 10
    # group b: only null-measure rows → present with NULL estimate
    b = out[out["g"] == "b"]["estimate"]
    assert len(b) == 1 and pd.isna(b.iloc[0])


def test_minmax_view_matches_recompute_and_retracts(lake):
    """Retractable MIN/MAX view: (1) head view == recompute; (2) the
    per-epoch history equals recompute at EVERY epoch; (3) at least
    one epoch transition actually RETRACTED an extreme (vmax shrank or
    vmin grew for some group) — otherwise the fixture never exercised
    the behavior this view exists for and the test is vacuous."""
    from maestro_ray.pipelines.views import (
        maintain_group_minmax,
        minmax_view_name,
        read_view,
    )

    def recompute(epoch):
        pdf = read_lake_at(lake, epoch, columns=["lang", "warc_ts"]) \
            .to_pandas()
        out = {}
        for g, sub in pdf.groupby("lang", dropna=False):
            vals = sub["warc_ts"].dropna().astype("int64")
            key = g if pd.notna(g) else None
            out[key] = ((int(vals.min()), int(vals.max()))
                        if len(vals) else (None, None))
        return out

    head = maintain_group_minmax(lake, "lang", "warc_ts")
    got_head = {
        (g if pd.notna(g) else None): (
            None if pd.isna(lo) else int(lo),
            None if pd.isna(hi) else int(hi))
        for g, lo, hi in zip(head.iloc[:, 0], head["vmin"], head["vmax"])
    }
    want_head = {k: (v if v != (None, None) else (None, None))
                 for k, v in recompute(list_epochs(lake)[-1]).items()}
    assert got_head == {k: v for k, v in want_head.items()}

    # history: reuse the persisted per-epoch pair states
    vid = minmax_view_name("lang", "warc_ts")
    retracted = False
    prev = None
    for e in list_epochs(lake):
        pairs = read_view(lake, vid, e)
        assert pairs is not None, f"epoch {e} state missing"
        bin_col = [c for c in pairs.columns if c.startswith("bucket:")][0]
        p = pairs.dropna(subset=[bin_col])
        got = {
            (g if pd.notna(g) else None): (int(v["min"]), int(v["max"]))
            for g, v in p.groupby("lang", dropna=False)[bin_col]
            .agg(["min", "max"]).iterrows()
        }
        want = {k: v for k, v in recompute(e).items()
                if v != (None, None)}
        assert got == want, f"epoch {e}"
        if prev is not None:
            for g, (lo, hi) in got.items():
                if g in prev and (hi < prev[g][1] or lo > prev[g][0]):
                    retracted = True
        prev = got
    assert retracted, "fixture never retracted an extreme"
