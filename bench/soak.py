"""60M-event soak (VERDICT r4 #4): one 10×-scaling-tier ingest with
driver-RSS / staging / ray-tmp growth accounting — catches
driver-bound state, O(n²) behavior and leaks the sf0.1 sweep can't
see. Run from /root/repo:  python bench/soak.py  (owns a Ray session;
run it single-session — concurrent local Ray sessions crash the
raylet on this box, CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_SCRATCH = "/dev/shm/maestro_bench"
SOAK_SCALE = dict(n_urls=1_500_000, n_events=60_000_000,
                  seg_rows=250_000, fast_html=True, with_pages=False)


from bench import du_bytes as _du  # noqa: E402  (shared helper)


def main() -> None:
    from bench import _fixture

    t0 = time.perf_counter()
    log_dir, _ = _fixture(SOAK_SCALE)
    gen_sec = time.perf_counter() - t0
    log_bytes = _du(log_dir)

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from maestro_ray.pipelines.ingest import ingest

    lake_dir = os.path.join(_SCRATCH, "soak_lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    t0 = time.perf_counter()
    m = ingest(log_dir, lake_dir, num_partitions=64,
               exchange=os.environ.get("MAESTRO_BENCH_EXCHANGE",
                                       "shuffle"))
    ingest_sec = time.perf_counter() - t0
    assert m is not None and m.watermark == SOAK_SCALE["n_events"] - 1

    staging = os.path.join(lake_dir, "_staging")
    out = {
        "metric": "cdc_soak_60m",
        "n_events": SOAK_SCALE["n_events"],
        "gen_sec": round(gen_sec, 1),
        "log_gb": round(log_bytes / 1e9, 2),
        "ingest_sec": round(ingest_sec, 1),
        "events_per_sec": round(SOAK_SCALE["n_events"] / ingest_sec, 1),
        "lake_rows": m.counters.get("rows_final"),
        "watermark": m.watermark,
        "driver_peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "staging_leftover_files": sum(
            len(fs) for _, _, fs in os.walk(staging)) if
        os.path.isdir(staging) else 0,
        "lake_gb": round(_du(lake_dir) / 1e9, 2),
        "ray_tmp_gb": round(_du("/tmp/ray/ray") / 1e9, 2)
        if os.path.isdir("/tmp/ray/ray") else 0.0,
    }
    ray.shutdown()
    shutil.rmtree(lake_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
