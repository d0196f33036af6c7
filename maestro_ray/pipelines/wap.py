"""Write-Audit-Publish over the CDC lake — the lakehouse ingestion
safety pattern: stage incoming change events on an isolated zero-copy
branch, run validation against the WOULD-BE table state, and only then
fold the branch back into the main lake; a failing audit leaves main
bit-for-bit untouched.

Composition of existing primitives (no new storage semantics):
``clone_lake`` (hardlinked branch, O(metadata)), ``ingest`` (the
exactly-once replay path applies the events to the branch), a caller
audit over the branch directory, and ``merge_branch`` (net
``(fork, head]`` changes re-enter the source merge as LWW candidates,
O(branch churn)). Crash safety is inherited: every stage is either the
manifest-committed ingest/merge or an idempotent clone into a fresh
directory — re-running ``write_audit_publish`` after any crash repeats
at most completed-idempotent work.
"""

from __future__ import annotations

import shutil
from typing import Any, Callable

from maestro_ray.core.manifest import latest_manifest


def write_audit_publish(
    src_dir: str,
    log_dir: str,
    branch_dir: str,
    audit_fn: Callable[[str], tuple[bool, Any]],
    *,
    num_partitions: int = 16,
    segments_per_epoch: int | None = None,
    keep_failed_branch: bool = True,
) -> dict:
    """Stage ``log_dir``'s change events on a fresh branch of
    ``src_dir`` at ``branch_dir``, audit, publish on success.

    ``audit_fn(branch_dir) -> (ok, report)`` runs against the staged
    branch lake — it sees exactly the table state that WOULD become
    main. On ok the branch's net changes merge into ``src_dir`` as one
    epoch and the branch is removed; on failure ``src_dir`` is
    untouched and the branch is kept for inspection (unless
    ``keep_failed_branch=False``). ``branch_dir`` must not exist (each
    WAP attempt is its own branch — re-use would mix audits).

    Returns {published, report, src_epoch_before, src_epoch_after,
    branch_dir}."""
    from maestro_ray.io.lake import clone_lake
    from maestro_ray.pipelines.branch import merge_branch
    from maestro_ray.pipelines.ingest import ingest

    head = latest_manifest(src_dir)
    if head is None:
        raise ValueError(f"no committed epochs in source {src_dir}")
    fork = head.epoch
    clone_lake(src_dir, branch_dir)
    ingest(log_dir, branch_dir, num_partitions=num_partitions,
           segments_per_epoch=segments_per_epoch)
    ok, report = audit_fn(branch_dir)
    if not ok:
        if not keep_failed_branch:
            shutil.rmtree(branch_dir, ignore_errors=True)
        after = latest_manifest(src_dir)
        return {"published": False, "report": report,
                "src_epoch_before": fork,
                "src_epoch_after": after.epoch,
                "branch_dir": branch_dir if keep_failed_branch
                else None}
    merge_branch(src_dir, branch_dir, fork_epoch=fork)
    shutil.rmtree(branch_dir, ignore_errors=True)
    after = latest_manifest(src_dir)
    return {"published": True, "report": report,
            "src_epoch_before": fork, "src_epoch_after": after.epoch,
            "branch_dir": None}


def structural_audit(
    max_null_frac: float = 0.0,
    null_col: str = "lang",
    min_rows: int = 1,
) -> Callable[[str], tuple[bool, dict]]:
    """A ready-made audit: live-state structural gate over the staged
    branch — row floor plus a null-fraction ceiling on ``null_col``.
    Fully distributed (two streaming aggregates, no driver
    materialization); returns the (ok, report) contract."""
    import pyarrow.compute as pc

    def audit(branch_dir: str) -> tuple[bool, dict]:
        import pyarrow as pa

        from maestro_ray.io.lake import read_lake

        ds = read_lake(branch_dir, columns=["url", null_col])

        def counts(t: pa.Table) -> pa.Table:
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "n_null": pa.array(
                    [t.num_rows
                     - pc.count(t.column(null_col)).as_py()],
                    pa.int64()),
            })

        agg = ds.map_batches(counts, batch_format="pyarrow") \
            .to_pandas().sum()
        n = int(agg["n"])
        n_null = int(agg["n_null"])
        frac = (n_null / n) if n else 1.0
        ok = n >= min_rows and frac <= max_null_frac
        return ok, {"rows": n, "null_rows": n_null,
                    "null_frac": frac, "min_rows": min_rows,
                    "max_null_frac": max_null_frac}

    return audit
