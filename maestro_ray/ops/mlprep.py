"""Feature-preparation operators for training pipelines: per-group
z-score standardization, one-hot encoding, dense categorical ids.

All follow the broadcast-small-side shape: the statistics / category
vocabulary are tiny grouped aggregates folded once, broadcast via
``ray.put``, and applied in a single vectorized per-batch pass — the
corpus never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _group_moments(ds: rd.Dataset, key: str, col: str) -> pd.DataFrame:
    """Mergeable per-key (n, Σx, Σx²) partials → driver fold. O(keys)
    rows per batch ever leave a worker."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(key)),
                             pc.is_valid(t.column(col))))
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        keys = t.column(key)
        tt = pa.table({key: keys,
                       "n": pa.array(np.ones(len(v), np.int64)),
                       "s": pa.array(v, pa.float64()),
                       "ss": pa.array(v * v, pa.float64())})
        g = tt.group_by([key]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns([key, "n", "s", "ss"])

    parts = ds.select_columns([key, col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # all rows null: empty collect loses its schema
        return pd.DataFrame(columns=[key, "n", "s", "ss"]).set_index(key)
    return parts.groupby(key, sort=True).sum()


def standardize(
    ds: rd.Dataset,
    key: str,
    col: str,
    out_col: str = "z",
    round_to: int | None = 6,
) -> rd.Dataset:
    """Per-group z-score: (x − μ_k) / σ_k with the POPULATION std
    (SQL ``(v − avg(v) OVER w) / stddev_pop(v) OVER w``). Stats come
    from one mergeable moment pass and broadcast; the scoring pass is
    batch-local. A zero-variance group yields null (SQL div-by-zero →
    the twin NULLIFs it); null key/value rows pass through with null z.

    σ is computed CENTERED on the driver fold (Σ(x)²-free on the group
    scale: σ² = Σx²/n − μ² is fine here because μ and x share magnitude
    inside one group's stats — for covariance-scale cancellation see
    ops/similarity._moment_partials)."""
    stats = _group_moments(ds, key, col)
    mu = (stats["s"] / stats["n"]).to_numpy()
    var = stats["ss"].to_numpy() / stats["n"].to_numpy() - mu * mu
    sd = np.sqrt(np.maximum(var, 0.0))
    keys_sorted = stats.index.to_numpy()
    ref = ray.put((keys_sorted, mu, sd))

    def score(t: pa.Table) -> pa.Table:
        ks, mus, sds = ray.get(ref)
        if len(ks) == 0:  # no stats at all: every z is null
            return t.append_column(
                out_col, pa.nulls(t.num_rows, pa.float64()))
        kv = t.column(key).to_pandas().to_numpy(dtype=object)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        valid = pd.notna(kv)
        pos = np.zeros(len(kv), dtype=np.int64)
        pos[valid] = np.minimum(np.searchsorted(ks, kv[valid]),
                                len(ks) - 1)
        hit = np.zeros(len(kv), dtype=bool)
        hit[valid] = ks[pos[valid]] == kv[valid]
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(hit & (sds[pos] > 0.0),
                         (v - mus[pos]) / sds[pos], np.nan)
        if round_to is not None:
            z = np.round(z, round_to)
        return t.append_column(
            out_col, pa.array(z, pa.float64(), from_pandas=True))

    return ds.map_batches(score, batch_format="pyarrow")


def one_hot(
    ds: rd.Dataset,
    col: str,
    categories: list[str] | None = None,
    prefix: str | None = None,
) -> rd.Dataset:
    """One-hot encode a categorical column: one int64 0/1 column per
    category (sorted order; nulls encode all-zero). ``categories=None``
    folds the distinct set first (small grouped aggregate) — pass the
    list explicitly in pipelines that need a frozen feature space."""
    if categories is None:
        def dist(t: pa.Table) -> pa.Table:
            u = pc.unique(t.column(col).combine_chunks())
            return pa.table({col: u.filter(pc.is_valid(u))})

        cats = ds.select_columns([col]) \
            .map_batches(dist, batch_format="pyarrow").to_pandas()
        categories = sorted(cats[col].unique()) if not cats.empty else []
    pre = prefix if prefix is not None else col
    cats = list(categories)

    def encode(t: pa.Table) -> pa.Table:
        v = t.column(col)
        for c in cats:
            m = pc.cast(pc.fill_null(pc.equal(v, pa.scalar(c)), False),
                        pa.int64())
            t = t.append_column(f"{pre}_{c}", m)
        return t

    return ds.map_batches(encode, batch_format="pyarrow")


def bin_equal_width(
    ds: rd.Dataset,
    col: str,
    n_bins: int,
    lo: float | None = None,
    hi: float | None = None,
    out_col: str = "bin",
) -> rd.Dataset:
    """Equal-width discretization: 1-based bin id over [lo, hi] split
    into ``n_bins`` buckets (SQL ``least(floor((x−lo)/((hi−lo)/n)),
    n−1)+1`` — the expression is evaluated with the SAME operation
    order in both engines, so identical doubles give identical bins
    with no rounding policy needed). ``lo``/``hi`` default to the
    column's exact min/max (mergeable partials — no shuffle anywhere).
    x outside [lo, hi] clips to the edge bins; null → null;
    a constant column (lo == hi) puts everything in bin 1."""
    if n_bins < 1:
        raise ValueError(f"bin_equal_width: n_bins={n_bins}")
    if lo is None or hi is None:

        def mm(t: pa.Table) -> pa.Table:
            v = t.column(col)
            return pa.table({"lo": pa.array([pc.min(v).as_py()],
                                            pa.float64()),
                             "hi": pa.array([pc.max(v).as_py()],
                                            pa.float64())})

        parts = ds.select_columns([col]) \
            .map_batches(mm, batch_format="pyarrow").to_pandas()
        if parts.empty or parts["lo"].isna().all():
            lo_v, hi_v = 0.0, 0.0  # all-null column: every bin is null
        else:
            lo_v = float(parts["lo"].min()) if lo is None else float(lo)
            hi_v = float(parts["hi"].max()) if hi is None else float(hi)
    else:
        lo_v, hi_v = float(lo), float(hi)
    w = (hi_v - lo_v) / n_bins

    def encode(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            if w > 0:
                b = np.floor((v - lo_v) / w)
            else:
                b = np.zeros(len(v), np.float64)
            b = np.minimum(np.maximum(b, 0.0), n_bins - 1) + 1
        b = np.where(np.isnan(v), np.nan, b)
        return t.append_column(
            out_col,
            pa.array(b, pa.float64(), from_pandas=True).cast(pa.int64()))

    return ds.map_batches(encode, batch_format="pyarrow")


def target_encode(
    ds: rd.Dataset,
    key: str,
    target: str,
    smoothing: float = 10.0,
    out_col: str = "enc",
    round_to: int | None = 6,
) -> rd.Dataset:
    """Smoothed mean target encoding: enc_k = (Σ_k target + m·ḡ) /
    (n_k + m) where ḡ is the global target mean and m = ``smoothing``
    — the standard leakage-averse categorical feature for gradient
    models. Per-key (n, Σ) partials fold once and broadcast; the
    scoring pass is batch-local (corpus never shuffles). Null key →
    the global prior ḡ; a key whose targets are all null → ḡ too
    (n = 0 collapses the formula). Rounded at ``round_to`` (summation
    order differs across engines)."""
    if smoothing < 0:
        raise ValueError(f"target_encode: smoothing={smoothing}")
    stats = _group_moments(ds, key, target)
    n_tot = float(stats["n"].sum())
    gmean = float(stats["s"].sum()) / n_tot if n_tot > 0 else float("nan")
    keys_sorted = stats.index.to_numpy()
    enc = ((stats["s"].to_numpy() + smoothing * gmean)
           / (stats["n"].to_numpy() + smoothing)
           if len(keys_sorted) else np.array([], np.float64))
    ref = ray.put((keys_sorted, enc))

    def score(t: pa.Table) -> pa.Table:
        ks, es = ray.get(ref)
        kv = t.column(key).to_pandas().to_numpy(dtype=object)
        valid = pd.notna(kv)
        out = np.full(len(kv), gmean, np.float64)
        if len(ks):
            pos = np.zeros(len(kv), dtype=np.int64)
            pos[valid] = np.minimum(np.searchsorted(ks, kv[valid]),
                                    len(ks) - 1)
            hit = np.zeros(len(kv), dtype=bool)
            hit[valid] = ks[pos[valid]] == kv[valid]
            out[hit] = es[pos[hit]]
        if round_to is not None:
            out = np.round(out, round_to)
        return t.append_column(
            out_col, pa.array(out, pa.float64(), from_pandas=True))

    return ds.map_batches(score, batch_format="pyarrow")


def categorical_encode(
    ds: rd.Dataset,
    col: str,
    out_col: str = "code",
) -> rd.Dataset:
    """Dense integer ids for a categorical column: 1-based rank in the
    SORTED distinct vocabulary (SQL ``dense_rank() OVER (ORDER BY
    col)`` semantics), null → null. Vocabulary folds once, broadcasts,
    and the mapping is one searchsorted per batch."""
    def dist(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column(col).combine_chunks())
        return pa.table({col: u.filter(pc.is_valid(u))})

    vocab = ds.select_columns([col]) \
        .map_batches(dist, batch_format="pyarrow").to_pandas()
    vs = (np.sort(vocab[col].unique()) if not vocab.empty
          else np.array([], dtype=object))
    ref = ray.put(vs)

    def encode(t: pa.Table) -> pa.Table:
        v = ray.get(ref)
        if len(v) == 0:  # all-null vocabulary: every code is null
            return t.append_column(
                out_col, pa.nulls(t.num_rows, pa.int64()))
        col_np = t.column(col).to_pandas().to_numpy(dtype=object)
        valid = pd.notna(col_np)
        code = np.zeros(len(col_np), dtype=np.float64)
        code[valid] = np.searchsorted(v, col_np[valid]) + 1
        code[~valid] = np.nan
        return t.append_column(
            out_col, pa.array(code, pa.float64(), from_pandas=True)
            .cast(pa.int64()))
    return ds.map_batches(encode, batch_format="pyarrow")


def winsorize(
    ds: rd.Dataset,
    key: str,
    col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    out: str | None = None,
) -> rd.Dataset:
    """Per-group winsorization: clip ``col`` to its group's
    [``q_lo``, ``q_hi``] interpolated quantiles — the standard outlier
    cap before training. The per-group bounds come from
    ``grouped_quantiles_cont`` (DuckDB ``quantile_cont`` interpolation
    rule, O(distinct (key, value)) driver frame behind its guard); the
    O(groups) bounds table then broadcasts via ``ray.put`` into one
    vectorized clip per batch — searchsorted key lookup +
    min/max_element_wise, no shuffle of the data itself. Null values
    stay null; rows whose group has no bounds (all-null group) pass
    through unclipped. Clip expression is ``least(greatest(v, lo),
    hi)`` — bit-exact against the SQL twin."""
    from maestro_ray.ops.aggregates import grouped_quantiles_cont

    if not 0.0 <= q_lo <= q_hi <= 1.0:
        raise ValueError(f"need 0 <= q_lo <= q_hi <= 1, got {q_lo}, {q_hi}")
    qdf = grouped_quantiles_cont(ds, key, col, [q_lo, q_hi])
    qdf = qdf[qdf[key].notna()]  # null-key group: pass through unclipped
    lo = qdf[qdf["q"] == q_lo].set_index(key)["value"]
    hi = qdf[qdf["q"] == q_hi].set_index(key)["value"]
    keys_sorted = np.sort(lo.index.to_numpy())
    lo_v = lo.loc[keys_sorted].to_numpy(dtype=np.float64)
    hi_v = hi.loc[keys_sorted].to_numpy(dtype=np.float64)
    bounds_ref = ray.put((keys_sorted, lo_v, hi_v))
    out_col = out or f"{col}_w"

    def clip(t: pa.Table) -> pa.Table:
        ks, lov, hiv = ray.get(bounds_ref)
        kcol = t.column(key)
        valid = pc.is_valid(kcol).to_numpy(zero_copy_only=False)
        if len(ks) == 0 or not valid.any():
            hit = np.zeros(t.num_rows, dtype=bool)
            idx_c = np.zeros(t.num_rows, dtype=np.int64)
            lov = np.array([0.0])
            hiv = np.array([0.0])
        else:
            kv = kcol.to_numpy(zero_copy_only=False)
            kv_safe = np.where(valid, kv, ks[0])
            idx = np.searchsorted(ks, kv_safe)
            idx_c = np.clip(idx, 0, len(ks) - 1)
            hit = valid & (idx < len(ks)) & (ks[idx_c] == kv_safe)
        v = pc.cast(t.column(col), pa.float64())
        lo_row = pa.array(np.where(hit, lov[idx_c], -np.inf))
        hi_row = pa.array(np.where(hit, hiv[idx_c], np.inf))
        # skip_nulls=False: a null value must STAY null, not collapse
        # onto the bound (element-wise min/max skip nulls by default)
        opts = pc.ElementWiseAggregateOptions(skip_nulls=False)
        clipped = pc.min_element_wise(
            pc.max_element_wise(v, lo_row, options=opts),
            hi_row, options=opts)
        return t.append_column(out_col, clipped)

    return ds.map_batches(clip, batch_format="pyarrow")


def robust_scale(
    ds: rd.Dataset,
    cols: list[str],
) -> rd.Dataset:
    """Robust (median/IQR) feature scaling: for each column,
    ``scaled = (x − median) / (q75 − q25)`` — the outlier-immune
    alternative to z-score ``standardize`` (one huge value shifts a
    mean/σ fit but not the quartiles). Quantiles are exact DuckDB
    ``quantile_cont`` semantics (``_cont_pick``), so with the same
    float expression a SQL twin is bit-exact.

    Plan: one ``_value_counts`` distinct-value pass per column (loud
    ``max_distinct`` driver bound — the exact-quantile tier; use
    ``quantile_sketch`` stats for continuous 100-TB columns), then ONE
    vectorized broadcast-constant pass. Zero-IQR columns scale to null
    (constant feature); nulls stay null. Adds ``<col>_scaled``."""
    from maestro_ray.ops.aggregates import _value_counts, _cont_pick

    stats: dict[str, tuple[float, float]] = {}
    for c in cols:
        series, cum, n = _value_counts(ds, c)
        if n == 0:
            stats[c] = (0.0, 0.0)
            continue
        vals = series.to_numpy(dtype="float64")
        med = _cont_pick(vals, cum, n, 0.5)
        iqr = _cont_pick(vals, cum, n, 0.75) - _cont_pick(vals, cum, n, 0.25)
        stats[c] = (med, iqr)

    def scale(t: pa.Table) -> pa.Table:
        for c in cols:
            med, iqr = stats[c]
            if iqr == 0.0:
                scaled = pa.array([None] * t.num_rows, pa.float64())
            else:
                x = pc.cast(t.column(c), pa.float64())
                scaled = pc.divide(pc.subtract(x, pa.scalar(med)),
                                   pa.scalar(iqr))
            t = t.append_column(f"{c}_scaled", scaled)
        return t

    return ds.map_batches(scale, batch_format="pyarrow")


def quantile_transform(
    ds: rd.Dataset,
    col: str,
    out_col: str = "q_uniform",
) -> rd.Dataset:
    """Rank-based uniform quantile transform: each non-null value maps
    to its SQL ``percent_rank() OVER (ORDER BY col)`` — (min_rank−1) /
    (n−1), ties share their group's minimum rank — flattening any
    input distribution onto [0, 1]. The heavy-tail normalizer for
    feature columns before training.

    Plan: the ranks are pure algebra over the ``_value_counts``
    distinct-value frame (min_rank of value v = 1 + Σ counts of
    smaller values — exact integers), broadcast once via ``ray.put``
    and applied with one ``searchsorted`` per batch; the corpus never
    shuffles and never sorts. Same loud driver bound as the exact
    quantile tier. Nulls transform to null; n == 1 maps to 0.0 (the
    SQL convention)."""
    from maestro_ray.ops.aggregates import _value_counts

    series, cum, n = _value_counts(ds, col)
    vals = series.to_numpy(dtype="float64")
    # min_rank of distinct value i = cum[i-1] + 1; percent_rank =
    # (min_rank - 1) / (n - 1) = cum[i-1] / (n - 1)
    prev = np.concatenate([[0], cum[:-1]]).astype(np.float64)
    pr = prev / (n - 1) if n > 1 else np.zeros_like(prev)
    ref = ray.put((vals, pr))

    def apply(t: pa.Table) -> pa.Table:
        v, p = ray.get(ref)
        x = pc.cast(t.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ok = ~np.isnan(x)
        idx = np.searchsorted(v, np.where(ok, x, v[0] if len(v) else 0.0))
        idx = np.clip(idx, 0, max(len(v) - 1, 0))
        out = np.where(ok, p[idx] if len(p) else np.nan, np.nan)
        return t.append_column(out_col, pa.array(
            out, pa.float64(), from_pandas=True))

    return ds.map_batches(apply, batch_format="pyarrow")
