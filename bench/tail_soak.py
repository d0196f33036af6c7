"""Continuous-tail-daemon SOAK (VERDICT r4 #4 tail-watch): run
``tail_ingest(follow=True)`` for many minutes while a feeder lands
fresh segments, sampling staging / ray-tmp / lake / driver-RSS growth
— proves the daemon leaks nothing (the rdbms staging GC was the r4
fix; this watches everything else). Ends with a deep ``fsck_lake``.

    python bench/tail_soak.py [--minutes 12] [--feed-interval 2.0]

Owns a Ray session (single-session rule). One JSON line at the end:
growth samples + final integrity verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCRATCH = "/dev/shm/maestro_bench" if os.path.isdir("/dev/shm") else "/tmp"


from bench import du_bytes as _du  # noqa: E402  (shared helper)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--feed-interval", type=float, default=2.0)
    ap.add_argument("--seg-rows", type=int, default=50_000)
    ap.add_argument("--n-urls", type=int, default=100_000)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--sample-every", type=float, default=30.0)
    args = ap.parse_args()

    n_segments = max(4, int(args.minutes * 60 / args.feed_interval))
    n_events = n_segments * args.seg_rows

    from maestro_ray.fixtures import ChangelogParams, write_changelog_fast

    key = f"tailsoak_u{args.n_urls}_e{n_events}_s{args.seg_rows}"
    staged = os.path.join(_SCRATCH, "cache", key)
    if not os.path.exists(os.path.join(staged, "_DONE")):
        shutil.rmtree(staged, ignore_errors=True)
        os.makedirs(staged, exist_ok=True)
        write_changelog_fast(staged, ChangelogParams(
            n_urls=args.n_urls, n_events=n_events,
            seg_rows=args.seg_rows, fast_html=True))
        open(os.path.join(staged, "_DONE"), "w").close()
    seg_files = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet"))

    log_dir = os.path.join(_SCRATCH, "tailsoak_log")
    lake_dir = os.path.join(_SCRATCH, "tailsoak_lake")
    for d in (log_dir, lake_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from maestro_ray.pipelines.tail import tail_ingest

    stop = threading.Event()
    samples: list[dict] = []

    def feeder():
        for f in seg_files:
            if stop.is_set():
                return
            tmp = os.path.join(log_dir, f + ".tmp")
            shutil.copy(os.path.join(staged, f), tmp)
            os.replace(tmp, os.path.join(log_dir, f))
            time.sleep(args.feed_interval)

    def sampler():
        t0 = time.monotonic()
        while not stop.is_set():
            samples.append({
                "t_min": round((time.monotonic() - t0) / 60, 1),
                "staging_mb": round(_du(os.path.join(
                    lake_dir, "_staging")) / 1e6, 1),
                "lake_mb": round(_du(lake_dir) / 1e6, 1),
                "ray_tmp_mb": round(_du("/tmp/ray/ray") / 1e6, 1)
                if os.path.isdir("/tmp/ray/ray") else 0.0,
                "rss_gb": round(resource.getrusage(
                    resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
            })
            stop.wait(args.sample_every)

    tf = threading.Thread(target=feeder, daemon=True)
    ts = threading.Thread(target=sampler, daemon=True)
    t0 = time.monotonic()
    tf.start()
    ts.start()
    tail_ingest(log_dir, lake_dir, num_partitions=args.partitions,
                checkpoint_every=4, follow=True,
                poll_interval=0.5,
                idle_timeout=max(10.0, 4 * args.feed_interval))
    wall = time.monotonic() - t0
    stop.set()
    tf.join()
    ts.join()

    from maestro_ray.core.manifest import latest_manifest
    from maestro_ray.io.lake import fsck_lake

    m = latest_manifest(lake_dir)
    report = fsck_lake(lake_dir, deep=True)
    err_counts = {k: len(v) for k, v in report.items()
                  if isinstance(v, list) and k != "epochs"}
    out = {
        "metric": "tail_soak",
        "minutes": round(wall / 60, 1),
        "segments_fed": len(seg_files),
        "n_events": n_events,
        "watermark": m.watermark if m else None,
        "events_per_sec": round(n_events / wall, 1),
        "samples": samples,
        "staging_leftover_files": sum(len(fs) for _, _, fs in os.walk(
            os.path.join(lake_dir, "_staging"))) if os.path.isdir(
            os.path.join(lake_dir, "_staging")) else 0,
        "fsck_epochs": len(report.get("epochs", [])),
        "fsck_error_counts": err_counts,
        "fsck_clean": not any(err_counts.values()),
    }
    ray.shutdown()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
