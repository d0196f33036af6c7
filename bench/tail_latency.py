"""Tail-mode end-to-end LATENCY bench (r3 VERDICT #8).

Measures what the micro-batch path actually optimizes: the time from a
changelog segment LANDING in the log directory to its rows being
VISIBLE in the lake (covered by a committed manifest watermark), as a
function of the checkpoint cadence — alongside the throughput number
the ingest bench already reports.

Method: a feeder thread drops pre-generated segments into the log dir
(atomic rename) every ``--feed-interval`` seconds while
``tail_ingest(follow=True)`` runs in the main thread; a watcher thread
polls the newest manifest watermark at ~20 ms resolution. Per segment:
latency = first time the committed watermark >= the segment's max
offset, minus its land time. One fresh lake per cadence, same fixture
and feed schedule, one Ray session (owned here — CLI rule).

    python bench/tail_latency.py [--cadences 1 2 4 8]

Prints one JSON line per cadence plus a summary table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCRATCH = "/dev/shm/maestro_bench" if os.path.isdir("/dev/shm") else "/tmp"


def _gen_fixture(n_events: int, seg_rows: int, n_urls: int) -> str:
    from maestro_ray.fixtures import ChangelogParams, write_changelog_fast

    key = f"tail_u{n_urls}_e{n_events}_s{seg_rows}"
    root = os.path.join(_SCRATCH, "cache", key)
    done = os.path.join(root, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        write_changelog_fast(root, ChangelogParams(
            n_urls=n_urls, n_events=n_events, seg_rows=seg_rows,
            fast_html=True))
        open(done, "w").close()
    return root


def run_one(cadence: int, staged: str, feed_interval: float,
            num_partitions: int) -> dict:
    import pyarrow.parquet as pq

    from maestro_ray.core.manifest import latest_manifest
    from maestro_ray.pipelines.tail import tail_ingest

    seg_files = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet"))
    seg_max = {
        f: pq.read_table(os.path.join(staged, f), columns=["offset"])
        .column("offset").to_numpy().max()
        for f in seg_files
    }
    log_dir = os.path.join(_SCRATCH, f"tail_lat_log_{cadence}")
    lake_dir = os.path.join(_SCRATCH, f"tail_lat_lake_{cadence}")
    for d in (log_dir, lake_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)

    land: dict[str, float] = {}
    wm_trace: list[tuple[float, int]] = []  # (time, committed watermark)
    stop = threading.Event()

    def feeder():
        for f in seg_files:
            src = os.path.join(staged, f)
            tmp = os.path.join(log_dir, f + ".tmp")
            shutil.copy(src, tmp)
            os.replace(tmp, os.path.join(log_dir, f))  # atomic land
            land[f] = time.monotonic()
            time.sleep(feed_interval)

    def watcher():
        last = -1
        while not stop.is_set():
            m = latest_manifest(lake_dir)
            wm = m.watermark if m else -1
            if wm != last:
                wm_trace.append((time.monotonic(), wm))
                last = wm
            time.sleep(0.02)

    tf = threading.Thread(target=feeder, daemon=True)
    tw = threading.Thread(target=watcher, daemon=True)
    t0 = time.monotonic()
    tf.start()
    tw.start()
    tail_ingest(log_dir, lake_dir, num_partitions=num_partitions,
                checkpoint_every=cadence, follow=True,
                poll_interval=0.05, idle_timeout=3.0)
    tf.join()
    time.sleep(0.1)
    stop.set()
    tw.join()

    lat = []
    for f in seg_files:
        commit_t = next((t for (t, wm) in wm_trace if wm >= seg_max[f]),
                        None)
        if commit_t is not None:
            lat.append(commit_t - land[f])
    n_events = int(max(seg_max.values())) + 1
    if not wm_trace:
        raise RuntimeError(
            "no manifest ever committed — tail ingest made no progress "
            "(events_per_sec over a non-positive window would be nonsense)")
    last_commit = wm_trace[-1][0]
    first_land = min(land.values())
    lat_sorted = sorted(lat)
    return {
        "cadence": cadence,
        "segments": len(seg_files),
        "measured": len(lat),
        "lat_p50_s": round(lat_sorted[len(lat) // 2], 3) if lat else None,
        "lat_max_s": round(lat_sorted[-1], 3) if lat else None,
        "lat_mean_s": round(sum(lat) / len(lat), 3) if lat else None,
        "events_per_sec": round(n_events / (last_commit - first_land), 1),
        "wall_s": round(last_commit - first_land, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cadences", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--n-events", type=int, default=500_000)
    ap.add_argument("--seg-rows", type=int, default=31_250)
    ap.add_argument("--n-urls", type=int, default=25_000)
    ap.add_argument("--feed-interval", type=float, default=0.25)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    staged = _gen_fixture(args.n_events, args.seg_rows, args.n_urls)
    results = []
    # warmup: absorb actor/worker cold start outside the measured runs
    run_one(args.cadences[0], staged, args.feed_interval, args.partitions)
    for c in args.cadences:
        r = run_one(c, staged, args.feed_interval, args.partitions)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"metric": "tail_latency_by_cadence",
                      "feed_interval_s": args.feed_interval,
                      "results": results}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
