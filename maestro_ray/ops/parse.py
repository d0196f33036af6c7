"""Row-level parse / clean / validate ops (P1–P6) — the maestro
load-side vocabulary (field cleaners, validators, row filters, error
thresholds; SURVEY.md §2.B ``[M]``) as vectorized Arrow batch kernels.

Every op is a ``map_batches``-shaped function (pa.Table → pa.Table) or a
Dataset-level helper. The ok/bad split routes failed rows to a
quarantine channel with an ``_error_reason`` column instead of failing
the job; ``error_threshold`` reproduces maestro's abort-if-too-dirty
load semantics.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ----------------------------------------------------------------- cleaners


def clean_fields(
    batch: pa.Table,
    trim: list[str] = (),
    lower: list[str] = (),
    upper: list[str] = (),
    strip_nonprintable: list[str] = (),
) -> pa.Table:
    """P2: per-column normalizers (maestro Clean.trim / removeNonPrintables)."""
    for col in trim:
        i = batch.schema.get_field_index(col)
        batch = batch.set_column(i, col, pc.utf8_trim_whitespace(batch.column(i)))
    for col in lower:
        i = batch.schema.get_field_index(col)
        batch = batch.set_column(i, col, pc.utf8_lower(batch.column(i)))
    for col in upper:
        i = batch.schema.get_field_index(col)
        batch = batch.set_column(i, col, pc.utf8_upper(batch.column(i)))
    for col in strip_nonprintable:
        i = batch.schema.get_field_index(col)
        batch = batch.set_column(
            i, col,
            pc.replace_substring_regex(batch.column(i), r"[^\x20-\x7E\s]", ""),
        )
    return batch


# ---------------------------------------------------------------- validators


def validation_mask(
    batch: pa.Table,
    non_empty: list[str] = (),
    one_of: dict[str, list] | None = None,
    ranges: dict[str, tuple] | None = None,
    regex: dict[str, str] | None = None,
) -> pa.ChunkedArray:
    """P3: vectorized row-validity mask (maestro Check.nonempty/oneOf/...)."""
    ok = pa.array([True] * batch.num_rows)
    for col in non_empty:
        c = batch.column(col)
        ok = pc.and_kleene(
            ok, pc.and_kleene(c.is_valid(), pc.not_equal(c.cast(pa.string()), ""))
        )
    for col, allowed in (one_of or {}).items():
        ok = pc.and_kleene(ok, pc.is_in(batch.column(col), value_set=pa.array(allowed)))
    for col, (lo, hi) in (ranges or {}).items():
        c = batch.column(col)
        m = c.is_valid()
        if lo is not None:
            m = pc.and_kleene(m, pc.greater_equal(c, pa.scalar(lo)))
        if hi is not None:
            m = pc.and_kleene(m, pc.less_equal(c, pa.scalar(hi)))
        ok = pc.and_kleene(ok, m)
    for col, pat in (regex or {}).items():
        ok = pc.and_kleene(ok, pc.match_substring_regex(batch.column(col), pat))
    return pc.fill_null(ok, False)


def validate_split(batch: pa.Table, reason: str = "validation_failed", **rules):
    """P3: (ok_rows, bad_rows-with-_error_reason) split of one batch."""
    mask = validation_mask(batch, **rules)
    ok = batch.filter(mask)
    bad = batch.filter(pc.invert(mask))
    bad = bad.append_column(
        "_error_reason", pa.array([reason] * bad.num_rows, pa.string())
    )
    return ok, bad


def validate_rows(ds: rd.Dataset, **rules) -> rd.Dataset:
    """P3 (ok side): keep rows passing all rules; vectorized filter."""

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(validation_mask(batch, **rules))

    return ds.map_batches(keep, batch_format="pyarrow")


def quarantine_rows(ds: rd.Dataset, reason: str = "validation_failed", **rules) -> rd.Dataset:
    """P3 (bad side): the quarantine channel."""

    def bad_only(batch: pa.Table) -> pa.Table:
        _ok, bad = validate_split(batch, reason=reason, **rules)
        return bad

    return ds.map_batches(bad_only, batch_format="pyarrow")


def error_threshold(ds: rd.Dataset, threshold: float, **rules) -> tuple[rd.Dataset, float]:
    """P4: compute the failed-row fraction; raise if it exceeds θ.

    Counts are two cheap distributed aggregations over boolean masks —
    no driver-side row iteration. Returns (ok_dataset, failed_fraction).
    """

    def counts(batch: pa.Table) -> pa.Table:
        mask = validation_mask(batch, **rules)
        n_ok = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        return pa.table({"n": [batch.num_rows], "n_ok": [n_ok]})

    agg = ds.map_batches(counts, batch_format="pyarrow").sum(["n", "n_ok"])
    total, n_ok = agg["sum(n)"], agg["sum(n_ok)"]
    frac = 0.0 if not total else (total - n_ok) / total
    if frac > threshold:
        raise ValueError(
            f"error_threshold exceeded: {frac:.4f} > {threshold} "
            f"({total - n_ok}/{total} rows failed validation)"
        )
    return validate_rows(ds, **rules), frac


# ------------------------------------------------------------ filter/project


def union_evolved(datasets: list[rd.Dataset], schemas: list[pa.Schema]) -> rd.Dataset:
    """D1: bag union of schema-COMPATIBLE datasets — each input is
    evolved (column-add null-fill + widen casts, SURVEY.md §1.4) to the
    unified schema inside ``map_batches`` before the union, so the
    result has one consistent Arrow schema. ``schemas[i]`` declares
    input i's schema (passed explicitly to keep this lazy — probing a
    Dataset's schema can trigger execution)."""
    from maestro_ray.core.schema import evolve_table, unify

    target = unify(*schemas)

    def make(t_schema):
        def f(batch: pa.Table) -> pa.Table:
            return evolve_table(batch, target)

        return f

    out = None
    for ds, s in zip(datasets, schemas):
        part = ds.map_batches(make(s), batch_format="pyarrow")
        out = part if out is None else out.union(part)
    return out


def filter_rows(ds: rd.Dataset, expr) -> rd.Dataset:
    """P5: vectorized predicate filter. ``expr`` is a pyarrow.compute
    expression (preferred — pushed into the scan when possible) or a
    ``pa.Table -> BooleanArray`` callable."""
    if callable(expr):
        return ds.map_batches(
            lambda t: t.filter(expr(t)), batch_format="pyarrow"
        )
    return ds.filter(expr=expr)


def project(
    ds: rd.Dataset,
    columns: list[str] | None = None,
    rename: dict[str, str] | None = None,
    computed: dict[str, object] | None = None,
) -> rd.Dataset:
    """P6: select / rename / computed columns in one vectorized stage.

    Evaluation order: ``computed`` (sees original names) → ``rename`` →
    ``columns`` selection (by FINAL names).
    """

    def do(batch: pa.Table) -> pa.Table:
        for name, fn in (computed or {}).items():
            col = fn(batch)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            batch = batch.append_column(name, col)
        if rename:
            batch = batch.rename_columns(
                [rename.get(c, c) for c in batch.column_names]
            )
        if columns:
            batch = batch.select(columns)
        return batch

    return ds.map_batches(do, batch_format="pyarrow")
