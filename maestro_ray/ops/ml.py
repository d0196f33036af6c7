"""Distributed model TRAINING primitives (the scoring side lives in
``ops/text.py:LinearModelScorer`` / ``ops/similarity.py:kmeans_fit``).

``logreg_fit`` is full-batch gradient descent with MERGEABLE gradient
partials — the canonical iterative-algorithm shape on Ray Data: the
weight vector broadcasts into every batch task each iteration, each
batch emits ONE (d+2)-float partial row (X^T·residual, Σresidual, n),
and the driver folds O(batches) rows. Feature vectors never shuffle,
never leave their blocks, and the driver never holds more than the
d-dim weight vector and the partial rows.

Determinism contract (same as kmeans_fit): partials are folded in
sorted batch-key order, so a fit is bitwise reproducible for a FIXED
partitioning; float folds across different partitionings agree to
rounding only — by construction, not a bug.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _feature_matrix(t: pa.Table, col: str) -> np.ndarray:
    lst = t.column(col).combine_chunks()
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.chunk(0) if lst.num_chunks else pa.array([], pa.list_(pa.float32()))
    flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(lst)
    if n == 0:
        return flat.reshape(0, 0)
    d = len(flat) // n
    return flat.reshape(n, d)


def _feature_width(ds: rd.Dataset, feature_col: str, caller: str) -> int:
    """Feature-vector width from the first NON-NULL list in the head of
    the dataset — ``take(1)`` alone crashes with a bare TypeError when
    the first row happens to hold a null list (review r4 s6 #5), and
    which row Ray returns first is scheduling-dependent."""
    for row in ds.take(64):
        v = row[feature_col]
        if v is not None:
            return len(v)
    raise ValueError(
        f"{caller}: no non-null {feature_col!r} in the first 64 rows — "
        "an all-null (or empty) feature column cannot size the model")


def logreg_fit(
    ds: rd.Dataset,
    feature_col: str,
    label_col: str,
    iters: int = 25,
    lr: float = 0.5,
    l2: float = 0.0,
) -> tuple[np.ndarray, float, pd.DataFrame]:
    """Full-batch logistic regression over a ``list<float>`` feature
    column and a 0/1 integer label column. Returns ``(weights, bias,
    history)`` where history has one (iter, loss) row per step —
    loss is the mean log-loss co-computed by the SAME pass that
    produces the gradient (no extra sweep).

    Gradient exchange is O(batches × d) per iteration; rows with null
    features or labels are dropped. Raises on empty input (no data to
    fit) — never returns silent garbage."""
    if iters < 1:
        raise ValueError(f"logreg_fit: iters={iters}")

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([feature_col, label_col])
        return t.filter(pc.and_(pc.is_valid(t.column(feature_col)),
                                pc.is_valid(t.column(label_col))))

    from maestro_ray.ops.partition import compact_blocks

    # ONE materialization (select+clean fused — review r3: the earlier
    # two-step version parked a redundant full feature copy in plasma),
    # then bound the block count: per-iteration cost is one pass over
    # proj's BLOCKS, so a read shattered into tiny blocks pays
    # task-launch per block per GD step
    proj = compact_blocks(
        ds.map_batches(clean, batch_format="pyarrow").materialize())
    first = next(iter(proj.iter_batches(batch_size=1,
                                        batch_format="pyarrow")), None)
    if first is None or first.num_rows == 0:
        raise ValueError("logreg_fit: no non-null rows to fit")
    d = len(first.column(feature_col)[0].as_py())
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    hist: list[tuple[int, float]] = []

    for it in range(iters):
        w_c, b_c = w.copy(), b  # captured by value per iteration

        def grad_partial(t: pa.Table) -> pa.Table:
            x = _feature_matrix(t, feature_col)
            y = t.column(label_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
            if x.shape[0] == 0:
                z = np.zeros(d + 3, dtype=np.float64)
                return pa.table({"p": pa.array([z.tobytes()], pa.binary())})
            p = 1.0 / (1.0 + np.exp(-(x @ w_c + b_c)))
            r = p - y
            eps = 1e-12
            loss = -np.sum(y * np.log(p + eps) +
                           (1 - y) * np.log(1 - p + eps))
            part = np.concatenate([x.T @ r, [r.sum(), loss,
                                             float(len(y))]])
            return pa.table({"p": pa.array([part.tobytes()], pa.binary())})

        parts = proj.map_batches(grad_partial,
                                 batch_format="pyarrow").to_pandas()
        # deterministic fold: sort partials by their own bytes (arrival
        # order depends on scheduling; Python hash() is process-salted
        # and would NOT be stable)
        parts = parts.sort_values("p", kind="mergesort") \
            .reset_index(drop=True)
        acc = np.zeros(d + 3, dtype=np.float64)
        for buf in parts["p"]:
            acc += np.frombuffer(buf, dtype=np.float64)
        g, gb, loss_sum, n = acc[:d], acc[d], acc[d + 1], acc[d + 2]
        if n == 0:
            raise ValueError("logreg_fit: no non-null rows to fit")
        w -= lr * (g / n + l2 * w)
        b -= lr * (gb / n)
        hist.append((it, float(loss_sum / n)))

    history = pd.DataFrame(hist, columns=["iter", "loss"])
    return w, float(b), history


def logreg_predict(
    ds: rd.Dataset,
    feature_col: str,
    weights: np.ndarray,
    bias: float,
    out_col: str = "prob",
) -> rd.Dataset:
    """Score a Dataset with a fitted model: one vectorized matvec per
    batch, weights captured in the closure (d floats — smaller than
    the task metadata; no broadcast machinery needed). Null feature
    vectors score to NULL (review r3: ListArray.flatten drops null
    entries, so an unguarded reshape crashed or misaligned rows)."""
    w = np.asarray(weights, dtype=np.float64)

    def score(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t.column(feature_col))
        vmask = valid.to_numpy(zero_copy_only=False)
        x = _feature_matrix(t.filter(valid), feature_col)
        p = np.full(t.num_rows, np.nan)
        if x.shape[0]:
            p[vmask] = 1.0 / (1.0 + np.exp(-(x @ w + bias)))
        return t.append_column(
            out_col, pa.array(p, pa.float64(), mask=~vmask))

    return ds.map_batches(score, batch_format="pyarrow")


def auc_exact(
    ds: rd.Dataset,
    score_col: str,
    label_col: str,
    round_to: int | None = 6,
    max_distinct: int = 2_000_000,
) -> pd.DataFrame:
    """Exact ROC-AUC (= the Mann-Whitney rank statistic with average
    tie ranks): the probability a random positive outscores a random
    negative, ties counting half.

    Plan: ONE high-cardinality grouped aggregate over the distinct
    score values (``bucketed_agg`` — pos/neg counts per score, rows
    never on the driver), then a driver cumsum over the O(distinct
    scores) frame, guarded by the repo's standard loud ``max_distinct``
    bound. AUC = sum_s pos(s) * (cum_neg_below(s) + neg(s)/2) / (P*N).
    All terms are exact integers (and exact halves) below 2^52, so the
    result is bit-reproducible across partitionings — the ``round_to``
    default exists only for the cross-engine float-division policy.

    Rows with a null score or null label are excluded (SQL twin:
    WHERE both non-null). Returns a one-row frame
    (auc, n_pos, n_neg); auc is NULL when either class is absent."""
    df = _score_histogram(ds, score_col, label_col, max_distinct,
                          "auc_exact")
    if df.empty:
        return pd.DataFrame({"auc": pd.Series([None], dtype="float64"),
                             "n_pos": pd.Series([0], dtype="int64"),
                             "n_neg": pd.Series([0], dtype="int64")})
    df = df.sort_values("__s", kind="stable").reset_index(drop=True)
    pos = df["pos"].to_numpy(dtype=np.int64)
    neg = df["cnt"].to_numpy(dtype=np.int64) - pos
    p_total = int(pos.sum())
    n_total = int(neg.sum())
    if p_total == 0 or n_total == 0:
        auc = None
    else:
        cneg_below = np.concatenate(([0], np.cumsum(neg)[:-1]))
        num = float(np.sum(pos * (cneg_below + neg / 2.0)))
        auc = num / (float(p_total) * float(n_total))
        if round_to is not None:  # SQL tie rule (half away from zero)
            from maestro_ray.ops.aggregates import sql_round
            auc = sql_round(auc, round_to)
    return pd.DataFrame({"auc": pd.Series([auc], dtype="float64"),
                         "n_pos": pd.Series([p_total], dtype="int64"),
                         "n_neg": pd.Series([n_total], dtype="int64")})


def stump_splits(
    ds: rd.Dataset,
    feature_col: str,
    label_col: str,
    max_distinct: int = 2_000_000,
) -> pd.DataFrame:
    """Depth-1 decision tree (stump) split table for a binary 0/1
    label: every candidate threshold t (each distinct feature value
    except the last — ``x <= t`` vs ``x > t``) with exact left/right
    class counts and the weighted Gini impurity
    ``n_l - (pos_l² + neg_l²)/n_l + n_r - (pos_r² + neg_r²)/n_r``;
    ``is_best`` marks the impurity-minimizing split (ties → smallest
    threshold).

    Plan: the shared eval-metric histogram (ONE ``bucketed_agg`` over
    distinct feature values, rows never on the driver, loud
    ``max_distinct`` bound — bin continuous features first), then an
    O(distinct) driver cumsum. Every count is an exact integer and the
    impurity is two IEEE divisions combined in a FIXED left-to-right
    order, so values — and the argmin — are engine-exact with no
    rounding. Null feature or label rows are excluded."""
    df = _score_histogram(ds, feature_col, label_col, max_distinct,
                          "stump_splits")
    if len(df) < 2:  # no split possible: typed empty frame
        return pd.DataFrame({
            "threshold": pd.Series([], dtype="int64"),
            "n_left": pd.Series([], dtype="int64"),
            "pos_left": pd.Series([], dtype="int64"),
            "n_right": pd.Series([], dtype="int64"),
            "pos_right": pd.Series([], dtype="int64"),
            "gini": pd.Series([], dtype="float64"),
            "is_best": pd.Series([], dtype="bool"),
        })
    n = df["cnt"].to_numpy(dtype=np.int64)
    pos = df["pos"].to_numpy(dtype=np.int64)
    total_n, total_p = int(n.sum()), int(pos.sum())
    nl = np.cumsum(n)[:-1]
    pl = np.cumsum(pos)[:-1]
    nr, pr = total_n - nl, total_p - pl
    ln, rn = nl - pl, nr - pr
    # fixed evaluation order ((nl - t1) + nr) - t2 — the SQL twin
    # spells the same expression left-to-right
    t1 = (pl * pl + ln * ln).astype(np.float64) / nl
    t2 = (pr * pr + rn * rn).astype(np.float64) / nr
    gini = nl - t1 + nr - t2
    out = pd.DataFrame({
        "threshold": df["__s"].to_numpy()[:-1],
        "n_left": nl, "pos_left": pl,
        "n_right": nr, "pos_right": pr,
        "gini": gini,
    })
    best = out.sort_values(["gini", "threshold"], kind="stable").index[0]
    out["is_best"] = out.index == best
    return out.reset_index(drop=True)


def isotonic_fit(
    ds: rd.Dataset,
    score_col: str,
    label_col: str,
    max_distinct: int = 2_000_000,
) -> pd.DataFrame:
    """Isotonic calibration by pool-adjacent-violators (PAV): the
    least-squares NONDECREASING fit of a binary 0/1 label rate to the
    score order — the standard post-hoc calibrator next to
    ``calibration_curve``'s fixed bins.

    Plan: the shared eval-metric histogram (ONE ``bucketed_agg`` over
    distinct scores, loud driver bound), then the O(distinct) PAV
    stack on the driver. Pool means are kept RATIONAL (Σpos, Σcnt
    exact ints; violation test by integer cross-multiplication), so
    the fit is deterministic bit-for-bit across partitionings — the
    one division per pool happens at output. SQL-inexpressible
    (data-dependent iterative pooling) → pytest-oracled, rows-only.

    Returns (score, n, pos, fitted) ascending by score; ``fitted`` is
    nondecreasing, equals pos/n wherever the empirical rate is already
    monotone, and preserves each pool's weighted mean."""
    df = _score_histogram(ds, score_col, label_col, max_distinct,
                          "isotonic_fit")
    if df.empty:
        return pd.DataFrame({"score": pd.Series(dtype="float64"),
                             "n": pd.Series(dtype="int64"),
                             "pos": pd.Series(dtype="int64"),
                             "fitted": pd.Series(dtype="float64")})
    pos = df["pos"].to_numpy(dtype=np.int64)
    cnt = df["cnt"].to_numpy(dtype=np.int64)
    # PAV stack: blocks of (Σpos, Σcnt, span); merge while the previous
    # block's mean EXCEEDS the new one's (strict — equal means pool to
    # the same fitted values either way)
    blocks: list[list[int]] = []
    for p, c in zip(pos.tolist(), cnt.tolist()):
        blocks.append([p, c, 1])
        while (len(blocks) > 1
               and blocks[-2][0] * blocks[-1][1]
               > blocks[-1][0] * blocks[-2][1]):
            p2, c2, s2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += c2
            blocks[-1][2] += s2
    fitted = np.concatenate([
        np.full(s, p / c) for p, c, s in blocks])
    return pd.DataFrame({
        "score": df["__s"].to_numpy(),
        "n": cnt, "pos": pos, "fitted": fitted,
    })


def _score_histogram(ds: rd.Dataset, score_col: str, label_col: str,
                     max_distinct: int, caller: str) -> pd.DataFrame:
    """Shared eval-metric plan: ONE high-cardinality grouped aggregate
    over distinct score values → (__s, pos, cnt) driver frame, sorted
    ascending by score, behind the standard loud driver bound. Rows
    with a null score or label are excluded."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        s = t.column(score_col)
        lab = pc.cast(t.column(label_col), pa.int64())
        ok = pc.and_(pc.is_valid(s), pc.is_valid(lab))
        return pa.table({"__s": s, "__l": lab}).filter(ok)

    per_score = bucketed_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        ["__s"], [("__l", "sum", "pos"), (None, "count_all", "cnt")],
    ).materialize()
    n_scores = per_score.count()
    if n_scores > max_distinct:
        raise RuntimeError(
            f"{caller}: {n_scores} distinct score values exceed the "
            f"driver bound {max_distinct}; quantize scores (e.g. round "
            "to fixed precision) or raise max_distinct explicitly")
    df = per_score.to_pandas()
    if df.empty:
        return df
    return df.sort_values("__s", kind="stable").reset_index(drop=True)


def gain_curve(
    ds: rd.Dataset,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int | None = 6,
    max_distinct: int = 2_000_000,
) -> pd.DataFrame:
    """Cumulative gains / lift table: "take the top decile of rows by
    score — what share of all positives did we capture?" for each of
    ``n_bins`` cutoffs. GROUPED-TIE semantics: the cutoff for bin d is
    rank ceil(d*n/n_bins), extended to the end of the score-tie run it
    lands in — so the result is a pure function of per-score counts
    (the same distributed histogram AUC uses; ``_score_histogram``),
    independent of any within-tie row order. ntile()-based gain tables
    are NOT reproducible across engines under ties; this spelling is.

    All counts exact ints (cutoff ranks via integer ceil, never float
    q*n — the repo's threshold-crossing rule); capture/precision/lift
    ratios follow the 6dp SQL-round policy. Returns one row per bin:
    (bin, cutoff_rank, n_taken, n_pos_taken, capture, prec, lift)."""
    from maestro_ray.ops.aggregates import sql_round

    if n_bins < 1:
        raise ValueError(f"gain_curve: n_bins={n_bins}")
    df = _score_histogram(ds, score_col, label_col, max_distinct,
                          "gain_curve")
    cols = ["bin", "cutoff_rank", "n_taken", "n_pos_taken"]
    if df.empty:
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in cols})
        for c in ("capture", "prec", "lift"):
            out[c] = pd.Series([], dtype="float64")
        return out
    # descending score order: best rows first
    pos = df["pos"].to_numpy(dtype=np.int64)[::-1]
    cnt = df["cnt"].to_numpy(dtype=np.int64)[::-1]
    cum_cnt = np.cumsum(cnt)
    cum_pos = np.cumsum(pos)
    n = int(cum_cnt[-1])
    p = int(cum_pos[-1])
    bins = np.arange(1, n_bins + 1, dtype=np.int64)
    cutoff = (bins * n + n_bins - 1) // n_bins  # integer ceil
    idx = np.searchsorted(cum_cnt, cutoff, side="left")
    taken = cum_cnt[idx]
    pos_taken = cum_pos[idx]
    capture = pos_taken / p if p else np.full(n_bins, np.nan)
    prec = pos_taken / taken
    base = p / n
    lift = prec / base if p else np.full(n_bins, np.nan)
    if round_to is not None:
        capture = sql_round(capture, round_to)
        prec = sql_round(prec, round_to)
        lift = sql_round(lift, round_to)
    return pd.DataFrame({
        "bin": bins, "cutoff_rank": cutoff,
        "n_taken": taken.astype("int64"),
        "n_pos_taken": pos_taken.astype("int64"),
        "capture": capture, "prec": prec, "lift": lift})


def confusion_report(
    ds: rd.Dataset,
    score_col: str,
    label_col: str,
    thresholds: list[float],
) -> pd.DataFrame:
    """Binary-classification confusion matrix + derived metrics at each
    threshold (predict positive when ``score >= thr``): tp/fp/fn/tn,
    accuracy, precision, recall, f1.

    ONE streaming pass: each batch emits one row of exact integer
    counts per threshold (a |thresholds|-row partial — vectorized
    comparisons, no per-row Python), and the driver folds O(batches ×
    thresholds) integer rows — order-independent, so the result is
    bit-reproducible across partitionings. The ratio columns are
    per-row float divisions of exact ints (cross-engine bit-exact);
    zero denominators yield null, the SQL CASE rule. Rows with a null
    score or label are excluded everywhere."""
    if not thresholds:
        raise ValueError("confusion_report: empty threshold list")
    thr = np.asarray(sorted(thresholds), dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = ~(np.isnan(s) | np.isnan(y))
        s, y = s[ok], y[ok].astype(np.int64)
        pred = s[None, :] >= thr[:, None]  # |thr| × n
        pos = y == 1
        tp = (pred & pos[None, :]).sum(axis=1)
        fp = (pred & ~pos[None, :]).sum(axis=1)
        fn = (~pred & pos[None, :]).sum(axis=1)
        tn = (~pred & ~pos[None, :]).sum(axis=1)
        return pa.table({
            "thr": pa.array(thr, pa.float64()),
            "tp": pa.array(tp, pa.int64()),
            "fp": pa.array(fp, pa.int64()),
            "fn": pa.array(fn, pa.int64()),
            "tn": pa.array(tn, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        agg = pd.DataFrame({"thr": thr})
        for c in ("tp", "fp", "fn", "tn"):
            agg[c] = np.int64(0)
    else:
        agg = (parts.groupby("thr", as_index=False)
               [["tp", "fp", "fn", "tn"]].sum()
               .sort_values("thr").reset_index(drop=True))
    tp = agg["tp"].to_numpy(np.float64)
    fp = agg["fp"].to_numpy(np.float64)
    fn = agg["fn"].to_numpy(np.float64)
    tn = agg["tn"].to_numpy(np.float64)

    def ratio(num, den):
        with np.errstate(invalid="ignore", divide="ignore"):
            r = num / den
        return np.where(den > 0, r, np.nan)

    prec = ratio(tp, tp + fp)
    rec = ratio(tp, tp + fn)
    agg["accuracy"] = ratio(tp + tn, tp + fp + fn + tn)
    agg["precision"] = prec
    agg["recall"] = rec
    agg["f1"] = ratio(2.0 * prec * rec, prec + rec)
    for c in ("tp", "fp", "fn", "tn"):
        agg[c] = agg[c].astype("int64")
    return agg


def calibration_curve(
    ds: rd.Dataset,
    score_col: str,
    label_col: str,
    bin_width: float,
    round_to: int = 6,
) -> pd.DataFrame:
    """Reliability diagram: equal-width score bins (``floor(s / w) *
    w`` — the same IEEE expression in both engines) vs the observed
    positive rate. Per bin: n, n_pos (exact ints), pos_rate =
    n_pos / n (exact int division, bit-exact cross-engine), and the
    mean score (a float SUM reduction → rounded to ``round_to`` per the
    repo's cross-engine float policy). ONE ``bucketed_agg`` exchange;
    the driver holds O(bins). Null score/label rows are excluded."""
    from maestro_ray.ops.aggregates import bucketed_agg, sql_round

    def binify(t: pa.Table) -> pa.Table:
        s = t.column(score_col)
        y = pc.cast(t.column(label_col), pa.int64())
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        s = pc.cast(s, pa.float64())
        b = pc.multiply(pc.floor(pc.divide(s, bin_width)), bin_width)
        return pa.table({"bin": b, "__y": y, "__s": s}).filter(ok)

    out = bucketed_agg(
        ds.map_batches(binify, batch_format="pyarrow"),
        ["bin"],
        [("__y", "sum", "n_pos"), (None, "count_all", "n"),
         ("__s", "sum", "s_sum")],
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({
            "bin": pd.Series(dtype="float64"),
            "n": pd.Series(dtype="int64"),
            "n_pos": pd.Series(dtype="int64"),
            "pos_rate": pd.Series(dtype="float64"),
            "mean_score": pd.Series(dtype="float64"),
        })
    out["n"] = out["n"].astype("int64")
    out["n_pos"] = out["n_pos"].astype("int64")
    out["pos_rate"] = out["n_pos"].to_numpy(np.float64) \
        / out["n"].to_numpy(np.float64)
    out["mean_score"] = (out["s_sum"] / out["n"]).map(
        lambda v: sql_round(v, round_to))
    return (out.drop(columns=["s_sum"])
            .sort_values("bin").reset_index(drop=True))


def ridge_fit(
    ds: rd.Dataset,
    feature_col: str,
    label_col: str,
    l2: float = 1.0,
    fit_intercept: bool = True,
) -> pd.DataFrame:
    """Closed-form ridge regression ``(XᵀX + λI)⁻¹ Xᵀy`` with MERGEABLE
    per-batch partials — the one-shot sibling of ``logreg_fit``: each
    batch emits ONE flattened (d², d, 1)-float row (XᵀX, Xᵀy, n);
    feature vectors never shuffle and the driver folds O(batches) rows
    in sorted batch-key order (bitwise reproducible for a fixed
    partitioning, the kmeans/logreg determinism contract). The
    intercept column is appended inside the batch task and is NOT
    penalized (standard ridge). Null/NaN feature vectors or labels are
    dropped via validity masks. Numerical note: raw XᵀX normal
    equations lose precision when |μ| ≫ σ — center large-offset
    features upstream (``ops/mlprep.standardize``)."""
    d0 = _feature_width(ds, feature_col, "ridge_fit")
    d = d0 + (1 if fit_intercept else 0)

    def partial(t: pa.Table) -> pa.Table:
        # null lists/labels must leave the TABLE before the matrix
        # reshape (_feature_matrix infers width from flat/n — a null
        # list contributes 0 floats but 1 row)
        t = t.filter(pc.and_(pc.is_valid(t.column(feature_col)),
                             pc.is_valid(t.column(label_col))))
        x = _feature_matrix(t, feature_col)
        y = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = ~np.isnan(y)
        if x.shape[0]:
            ok &= ~np.isnan(x).any(axis=1)
        x, y = x[ok], y[ok]
        if fit_intercept and x.size:
            x = np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)
        if not x.size:
            xtx = np.zeros((d, d))
            xty = np.zeros(d)
        else:
            xtx = x.T @ x
            xty = x.T @ y
        row = np.concatenate([xtx.ravel(), xty, [float(len(y))]])
        return pa.table({"p": pa.array([row.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # deterministic fold: sort partials by their own bytes (the
    # logreg_fit idiom — arrival order depends on scheduling)
    parts = parts.sort_values("p", kind="mergesort").reset_index(drop=True)
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    n = 0
    for blob in parts["p"]:
        row = np.frombuffer(blob, dtype=np.float64)
        xtx += row[: d * d].reshape(d, d)
        xty += row[d * d : d * d + d]
        n += int(row[-1])
    pen = np.eye(d) * l2
    if fit_intercept:
        pen[-1, -1] = 0.0
    coef = np.linalg.solve(xtx + pen, xty)
    names = [f"x{i}" for i in range(d0)] + (
        ["intercept"] if fit_intercept else [])
    return pd.DataFrame({
        "feature": pd.Series(names, dtype="object"),
        "coef": pd.Series(coef, dtype="float64"),
        "n": pd.Series([n] * d, dtype="int64"),
    })


def ridge_cv(
    ds: rd.Dataset,
    key_col: str,
    feature_col: str,
    label_col: str,
    n_folds: int = 5,
    l2: float = 1.0,
) -> pd.DataFrame:
    """K-fold cross-validation for closed-form ridge in TWO data passes
    total (not 2k): fold membership is the shared deterministic
    multiplicative key hash (leakage-safe, reproducible across runs and
    cluster sizes — the ``dataset_split`` contract), pass 1 emits ONE
    byte-packed (XᵀX, Xᵀy, n) partial per (batch, fold) and the driver
    trains fold f on the SUM OVER THE OTHER FOLDS' partials (exclusion
    fold — k models from one pass); pass 2 broadcasts all k coefficient
    vectors and accumulates per-fold held-out squared error. Returns
    one row per fold (n_train, n_test, rmse) plus coefficients are NOT
    returned (use ``ridge_fit`` on the full data for the final model).
    Partials fold in sorted-bytes order per fold — bitwise reproducible
    for a fixed partitioning (the logreg/kmeans contract)."""
    from maestro_ray.ops.corpus import _mult_hash

    if n_folds < 2:
        raise ValueError(f"ridge_cv: need n_folds >= 2, got {n_folds}")
    d = _feature_width(ds, feature_col, "ridge_cv") + 1  # + intercept

    def clean(t: pa.Table):
        # null KEYS must leave via the validity bitmap too: a null key
        # becomes float NaN, silently bypasses _mult_hash's
        # negative-key guard (NaN.min() < 0 is False) and NaN→uint64
        # is platform-undefined (review r4 s6 #2; the repo's
        # drop-nulls-never-cast rule)
        t = t.filter(pc.and_(
            pc.and_(pc.is_valid(t.column(feature_col)),
                    pc.is_valid(t.column(label_col))),
            pc.is_valid(t.column(key_col))))
        x = _feature_matrix(t, feature_col)
        y = t.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        ok = ~np.isnan(y)
        if x.shape[0]:
            ok &= ~np.isnan(x).any(axis=1)
        x, y, keys = x[ok], y[ok], keys[ok]
        if x.size:
            x = np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)
        fold = (_mult_hash(keys, "ridge_cv") % np.uint64(n_folds)) \
            .astype(np.int64)
        return x, y, fold

    def train_partial(t: pa.Table) -> pa.Table:
        x, y, fold = clean(t)
        rows = []
        for f in np.unique(fold):
            m = fold == f
            xf, yf = x[m], y[m]
            row = np.concatenate([[float(f)], (xf.T @ xf).ravel(),
                                  xf.T @ yf, [float(m.sum())]])
            rows.append(row.tobytes())
        return pa.table({"p": pa.array(rows, pa.binary())})

    parts = ds.map_batches(train_partial, batch_format="pyarrow") \
        .to_pandas().sort_values("p", kind="mergesort")
    per_fold = {f: [np.zeros((d, d)), np.zeros(d), 0]
                for f in range(n_folds)}
    for blob in parts["p"]:
        row = np.frombuffer(blob, dtype=np.float64)
        f = int(row[0])
        per_fold[f][0] += row[1: 1 + d * d].reshape(d, d)
        per_fold[f][1] += row[1 + d * d: 1 + d * d + d]
        per_fold[f][2] += int(row[-1])
    tot_xtx = sum(v[0] for v in per_fold.values())
    tot_xty = sum(v[1] for v in per_fold.values())
    tot_n = sum(v[2] for v in per_fold.values())
    pen = np.eye(d) * l2
    pen[-1, -1] = 0.0  # intercept unpenalized
    coefs = {}
    for f in range(n_folds):
        coefs[f] = np.linalg.solve(
            (tot_xtx - per_fold[f][0]) + pen, tot_xty - per_fold[f][1])
    coef_ref = ray.put({f: c for f, c in coefs.items()})

    def eval_partial(t: pa.Table) -> pa.Table:
        x, y, fold = clean(t)
        cs = ray.get(coef_ref)
        rows = []
        for f in np.unique(fold):
            m = fold == f
            err = x[m] @ cs[int(f)] - y[m]
            rows.append(np.array([float(f), float(err @ err),
                                  float(m.sum())]).tobytes())
        return pa.table({"p": pa.array(rows, pa.binary())})

    ev = ds.map_batches(eval_partial, batch_format="pyarrow") \
        .to_pandas().sort_values("p", kind="mergesort")
    sse = {f: 0.0 for f in range(n_folds)}
    n_test = {f: 0 for f in range(n_folds)}
    for blob in ev["p"]:
        row = np.frombuffer(blob, dtype=np.float64)
        f = int(row[0])
        sse[f] += row[1]
        n_test[f] += int(row[2])
    out = pd.DataFrame({
        "fold": pd.Series(range(n_folds), dtype="int64"),
        "n_train": pd.Series([tot_n - per_fold[f][2]
                              for f in range(n_folds)], dtype="int64"),
        "n_test": pd.Series([n_test[f] for f in range(n_folds)],
                            dtype="int64"),
        "rmse": pd.Series(
            [np.sqrt(sse[f] / n_test[f]) if n_test[f] else np.nan
             for f in range(n_folds)], dtype="float64"),
    })
    return out


def naive_bayes_classify(
    train: rd.Dataset,
    test: rd.Dataset,
    feature_cols: list[str],
    label_col: str,
    id_col: str,
    alpha: int = 1,
    max_cells: int = 1_000_000,
) -> pd.DataFrame:
    """Categorical naive Bayes: fit per-(class, feature-value) count
    tables on ``train``, predict the max-posterior class for every
    ``test`` row. Laplace-``alpha`` smoothing; the per-feature
    vocabulary V_j = distinct values of feature j observed in train.

        score(c | x) = ln((n_c + α)/(n + α·K))
                     + Σ_j ln((n_{c,x_j} + α)/(n_c + α·V_j))

    Exactness: every count is an exact integer from one mergeable
    grouped pass per feature (tiny tables, guarded); each score is a
    fixed left-associated sum of ln terms of exact-int ratios, so the
    argmax is engine-reproducible; ties break by class ascending.
    Rows with a null feature or label are excluded on each side.
    Prediction is a vectorized per-batch gather: per feature a
    value→row indexer (``Index.get_indexer``, unseen → the
    smoothing-only row) into a precomputed (values+1, classes)
    log-likelihood matrix — the test stream never lands on the
    driver and no Python runs per row. Returns (id, predicted)
    sorted by id."""
    from maestro_ray.ops.aggregates import grouped_agg

    def clean(cols):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.is_valid(t.column(cols[0]))
            for c in cols[1:]:
                keep = pc.and_(keep, pc.is_valid(t.column(c)))
            return t.select(cols).filter(keep)
        return f

    tr = train.map_batches(clean([label_col] + feature_cols),
                           batch_format="pyarrow").materialize()
    class_counts = grouped_agg(tr, [label_col],
                               {"n_c": (None, "count")})
    if class_counts.empty:
        raise ValueError("naive_bayes_classify: empty training set")
    classes = sorted(class_counts[label_col].tolist())
    kk = len(classes)
    n_total = int(class_counts["n_c"].sum())
    n_c = {c: int(v) for c, v in
           zip(class_counts[label_col], class_counts["n_c"])}

    # per-feature (values+1, classes) log-likelihood matrix; the extra
    # LAST row is the unseen-value (smoothing-only) likelihood
    a = int(alpha)
    ll = {}
    vals_idx = {}
    for fcol in feature_cols:
        cells = grouped_agg(tr, [label_col, fcol],
                            {"n_cv": (None, "count")})
        if len(cells) > max_cells:
            raise ValueError(
                f"naive_bayes_classify: {len(cells)} (class, value) "
                f"cells for {fcol} exceeds max_cells={max_cells} — "
                "bucket the feature upstream")
        vj = cells[fcol].nunique()
        vidx = pd.Index(sorted(cells[fcol].unique().tolist()))
        mat = np.empty((len(vidx) + 1, kk), dtype=np.float64)
        counts = {(c, v): int(n) for c, v, n in
                  zip(cells[label_col], cells[fcol], cells["n_cv"])}
        for j, c in enumerate(classes):
            denom = float(n_c[c] + a * vj)
            for i, v in enumerate(vidx):
                mat[i, j] = np.log((counts.get((c, v), 0) + a) / denom)
            mat[len(vidx), j] = np.log(a / denom)
        ll[fcol] = mat
        vals_idx[fcol] = vidx

    prior = np.array(
        [np.log((n_c[c] + a) / float(n_total + a * kk))
         for c in classes], dtype=np.float64)
    model_ref = ray.put((ll, vals_idx, prior))

    class Predict:
        def __init__(self):
            self.ll, self.vals, self.prior = ray.get(model_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = pc.is_valid(t.column(feature_cols[0]))
            for c in feature_cols[1:]:
                keep = pc.and_(keep, pc.is_valid(t.column(c)))
            t = t.filter(keep)
            n = t.num_rows
            if n == 0:
                return pa.table({
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "predicted": pa.array([], pa.string())})
            scores = np.tile(self.prior, (n, 1))
            for f in feature_cols:
                vidx = self.vals[f]
                pos = vidx.get_indexer(
                    pd.Series(t.column(f).to_numpy(
                        zero_copy_only=False)))
                pos = np.where(pos < 0, len(vidx), pos)
                scores += self.ll[f][pos]
            best = np.argmax(scores, axis=1)  # first max = class asc
            return pa.table({
                id_col: t.column(id_col),
                "predicted": pa.array(
                    [classes[i] for i in best], pa.string()),
            })

    # concurrency 2, not 4: an actor pool sized to the whole cluster
    # (the 4-CPU pytest session) reserves every CPU and starves the
    # upstream read tasks — observed as a full-suite deadlock
    out = test.map_batches(Predict, batch_format="pyarrow",
                           concurrency=2).to_pandas()
    if out.empty:
        return pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "predicted": pd.Series([], dtype="object")})
    return out.sort_values(id_col).reset_index(drop=True)


def als_factorize(
    ds: rd.Dataset,
    user_col: str,
    item_col: str,
    value_col: str,
    k: int = 8,
    rounds: int = 6,
    reg: float = 0.1,
    max_side_rows: int = 200_000,
) -> dict:
    """Alternating-least-squares matrix factorization of a (user,
    item, rating) relation: minimize Σ(r − u·v)² + λ(‖u‖² + ‖v‖²) by
    alternating exact ridge solves. Returns {"user_factors": df(user,
    f0..fk-1), "item_factors": df(item, f0..fk-1), "rmse": float}.

    Distributed shape — the broadcast-factor ALS (the standard
    layout): the ITEM factor matrix broadcasts via ``ray.put`` (items
    are the small side by contract — a catalog, not a corpus; the
    guard fails loudly above ``max_side_rows``), each user's k×k
    normal-equation solve runs inside ONE ``groupby(user)`` group with
    rows sorted by item id (deterministic accumulation — the kmeans
    determinism lesson), then the sides swap. Ratings never
    materialize on the driver; per round the driver holds only the two
    factor matrices. Init is a deterministic hash of the id, so runs
    are reproducible across partitionings. Null ids/values are
    excluded up front."""
    from maestro_ray.ops.partition import compact_blocks

    if k < 1 or rounds < 1:
        raise ValueError(f"als_factorize: k={k}, rounds={rounds}")

    def clean(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column(user_col), pa.int64())
        i = pc.cast(t.column(item_col), pa.int64())
        v = pc.cast(t.column(value_col), pa.float64())
        ok = pc.and_(pc.and_(pc.is_valid(u), pc.is_valid(i)),
                     pc.is_valid(v))
        return pa.table({"__u": u, "__i": i, "__r": v}).filter(ok)

    r = compact_blocks(
        ds.map_batches(clean, batch_format="pyarrow").materialize())

    def _ids(col: str) -> np.ndarray:
        from maestro_ray.ops.aggregates import bucketed_distinct

        out = bucketed_distinct(
            r.map_batches(lambda t, c=col: t.select([c]),
                          batch_format="pyarrow"), [col]).to_pandas()
        if len(out) > max_side_rows:
            raise RuntimeError(
                f"als_factorize: {col} side has {len(out)} distinct "
                f"ids > max_side_rows={max_side_rows} — the factor "
                "matrix must broadcast; bucket/shard the model first")
        return np.sort(out.iloc[:, 0].to_numpy(dtype=np.int64))

    users = _ids("__u")
    items = _ids("__i")
    if not len(users) or not len(items):
        raise ValueError("als_factorize: empty rating relation")

    def _init(ids: np.ndarray) -> np.ndarray:
        # deterministic small factors from a splitmix-style id hash
        h = (ids[:, None].astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             + np.arange(k, dtype=np.uint64)[None, :]
             * np.uint64(0xBF58476D1CE4E5B9))
        return ((h >> np.uint64(11)).astype(np.float64)
                / float(2 ** 53) - 0.5) * 0.1

    v_mat = _init(items)
    u_mat = np.zeros((len(users), k))

    def _solve_side(group_col, other_col, other_ids, other_ref):
        def per_key(g: pa.Table) -> pa.Table:
            ov = ray.get(other_ref)
            s = g.take(pc.sort_indices(
                g, sort_keys=[(other_col, "ascending")]))
            oid = s.column(other_col).to_numpy(zero_copy_only=False)
            rv = s.column("__r").to_numpy(zero_copy_only=False)
            fm = ov[np.searchsorted(other_ids, oid)]
            a = fm.T @ fm + reg * np.eye(k)
            b = fm.T @ rv
            w = np.linalg.solve(a, b)
            key = g.column(group_col).slice(0, 1)
            return pa.table({
                group_col: key,
                "__w": pa.array([w.tolist()],
                                pa.list_(pa.float64())),
            })

        out = r.groupby(group_col).map_groups(
            per_key, batch_format="pyarrow").to_pandas()
        out = out.sort_values(group_col)
        return np.stack(out["__w"].to_numpy())

    rmse = None
    for _ in range(rounds):
        u_mat = _solve_side("__u", "__i", items, ray.put(v_mat))
        v_mat = _solve_side("__i", "__u", users, ray.put(u_mat))

    u_ref = ray.put(u_mat)
    v_ref = ray.put(v_mat)

    def sq_err(t: pa.Table) -> pa.Table:
        um = ray.get(u_ref)
        vm = ray.get(v_ref)
        ui = np.searchsorted(users, t.column("__u").to_numpy(
            zero_copy_only=False))
        ii = np.searchsorted(items, t.column("__i").to_numpy(
            zero_copy_only=False))
        pred = (um[ui] * vm[ii]).sum(axis=1)
        err = t.column("__r").to_numpy(zero_copy_only=False) - pred
        return pa.table({"se": pa.array([float((err * err).sum())]),
                         "n": pa.array([len(err)], pa.int64())})

    parts = r.map_batches(sq_err, batch_format="pyarrow").to_pandas()
    rmse = float(np.sqrt(parts["se"].sum() / parts["n"].sum()))

    def _frame(ids, mat, name):
        cols = {name: pd.Series(ids, dtype="int64")}
        for j in range(k):
            cols[f"f{j}"] = mat[:, j]
        return pd.DataFrame(cols)

    return {"user_factors": _frame(users, u_mat, user_col),
            "item_factors": _frame(items, v_mat, item_col),
            "rmse": rmse}
