"""CLI — the ``ray job submit`` entry point (BASELINE.json north_rule).

    ray job submit --working-dir . -- python -m maestro_ray ingest \
        --log-dir /data/changelog --lake-dir /data/lake --partitions 256

Subcommands: ``ingest`` (replay / resume), ``tail`` (incremental
actor-pool mode, ``--follow`` daemon), ``landing``, ``infer-schema``,
``compact``, ``vacuum``, ``status`` (``--epoch``/``--history`` time
travel), ``view`` (incremental materialized view), ``changes`` (CDC-out
feed), ``clone`` (zero-copy branch). This module is
the ONLY library-side owner of a Ray session, and only when run
standalone (``ray job submit`` drivers init their own session via the
runtime; a pre-initialised session is respected).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="maestro_ray")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone local runs")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="replay changelog into the lake (resumes)")
    p_ing.add_argument("--log-dir", required=True)
    p_ing.add_argument("--lake-dir", required=True)
    p_ing.add_argument("--base-pages", default=None)
    p_ing.add_argument("--partitions", type=int, default=64)
    p_ing.add_argument("--segments-per-epoch", type=int, default=None)
    p_ing.add_argument("--salt-hot-keys", action="store_true")
    p_ing.add_argument("--exchange", choices=["shuffle", "slim", "slim_sort", "files"], default="shuffle")

    p_tail = sub.add_parser("tail", help="incremental tail mode (actor pool)")
    p_tail.add_argument("--log-dir", required=True)
    p_tail.add_argument("--lake-dir", required=True)
    p_tail.add_argument("--partitions", type=int, default=64)
    p_tail.add_argument("--checkpoint-every", type=int, default=4)
    p_tail.add_argument("--follow", action="store_true",
                        help="keep polling the log dir for new segments "
                             "(continuous daemon mode)")
    p_tail.add_argument("--poll-interval", type=float, default=0.5)
    p_tail.add_argument("--idle-timeout", type=float, default=None,
                        help="exit after this many idle seconds "
                             "(default: run until killed)")

    p_land = sub.add_parser(
        "landing",
        help="convert new landing files to changelog segments "
             "(idempotent; quarantine + error threshold)",
    )
    p_land.add_argument("--landing-dir", required=True)
    p_land.add_argument("--log-dir", required=True)
    p_land.add_argument("--delimiter", default="|")
    p_land.add_argument("--error-threshold", type=float, default=0.05)
    p_land.add_argument("--pattern", default="*.txt")

    p_inf = sub.add_parser(
        "infer-schema",
        help="propose a typed contract from a landing file sample "
             "(no Ray session needed)",
    )
    p_inf.add_argument("--path", required=True)
    p_inf.add_argument("--delimiter", default="|")
    p_inf.add_argument("--widths", default=None,
                       help="comma-separated field widths (fixed-width mode)")
    p_inf.add_argument("--header", action="store_true")
    p_inf.add_argument("--n-sample", type=int, default=100)
    p_inf.add_argument("--none-sentinel", default="")

    p_cmp = sub.add_parser("compact", help="rewrite partition files (U8)")
    p_cmp.add_argument("--lake-dir", required=True)
    p_cmp.add_argument("--vacuum-tombstones-ts", type=int, default=None,
                       help="event-time low watermark (us); tombstones older "
                            "than this are dropped — ONLY pass a bound the "
                            "source guarantees no older event can still arrive")

    p_vac = sub.add_parser("vacuum", help="delete unreferenced files")
    p_vac.add_argument("--lake-dir", required=True)
    p_vac.add_argument("--keep-last", type=int, default=None,
                       help="snapshot expiration: drop all but the newest "
                            "N epochs' manifests+lineage, then GC files no "
                            "retained manifest references (time travel "
                            "keeps working inside the retention window). "
                            "Default: keep full history, GC only files "
                            "outside the newest manifest")

    p_mb = sub.add_parser(
        "merge-branch",
        help="fold a clone's net changes since the fork back into the "
             "source lake (LWW by warc_ts, ties -> branch)")
    p_mb.add_argument("--src", required=True)
    p_mb.add_argument("--branch", required=True)
    p_mb.add_argument("--fork-epoch", type=int, required=True)

    p_rb = sub.add_parser(
        "rollback",
        help="restore the lake to an earlier epoch as a NEW epoch "
             "(manifest-level undo; history preserved, watermark kept)")
    p_rb.add_argument("--lake-dir", default=None)
    p_rb.add_argument("--root", default=None,
                      help="multi-table root: roll back EVERY table "
                           "transactionally to the joint epoch")
    p_rb.add_argument("--to-epoch", type=int, required=True)

    p_fs = sub.add_parser(
        "fsck", help="lake integrity audit (referenced files, rows, "
                     "checksums, strays)")
    p_fs.add_argument("--lake-dir", required=True)
    p_fs.add_argument("--deep", action="store_true",
                      help="recompute content checksums (full read)")

    p_pg = sub.add_parser(
        "purge", help="hard-delete urls from ALL retained history "
                      "(GDPR right-to-be-forgotten)")
    p_pg.add_argument("--lake-dir", required=True)
    p_pg.add_argument("--urls", required=True,
                      help="comma-separated urls to erase")

    p_s2 = sub.add_parser(
        "scd2", help="maintain the incremental SCD2 history view")
    p_s2.add_argument("--lake-dir", required=True)
    p_s2.add_argument("--out-dir", required=True)
    p_s2.add_argument("--attrs", default="lang",
                      help="comma-separated tracked payload columns")

    p_vw = sub.add_parser(
        "view", help="maintain/print an incremental per-group count view")
    p_vw.add_argument("--lake-dir", required=True)
    p_vw.add_argument("--group-col", default="lang")
    p_vw.add_argument("--sum", default=None, metavar="MEASURE",
                      help="maintain a grouped SUM view instead of the "
                      "count view: a stored int column, or len:<col> "
                      "for live utf8 bytes of <col>")
    p_vw.add_argument("--distinct", default=None, metavar="OF_COL",
                      help="maintain a grouped DISTINCT-count view of "
                      "this column instead of the count view "
                      "(mutually exclusive with --sum)")

    p_rp = sub.add_parser(
        "repartition",
        help="migrate the lake to a new partition count (new epoch, "
        "checksum-invariant; resume ingest with the new value)")
    p_rp.add_argument("--lake-dir", required=True)
    p_rp.add_argument("--num-partitions", type=int, required=True)

    p_ch = sub.add_parser(
        "changes",
        help="print the net change feed over an epoch range (CDC-out)")
    p_ch.add_argument("--lake-dir", required=True)
    p_ch.add_argument("--from-epoch", type=int, default=None,
                      help="exclusive lower bound (default: genesis)")
    p_ch.add_argument("--to-epoch", type=int, default=None,
                      help="inclusive upper bound (default: newest)")
    p_ch.add_argument("--columns", default="lang",
                      help="comma-separated payload columns")

    p_cl = sub.add_parser(
        "clone", help="zero-copy branch of a lake at an epoch (hardlinks)")
    p_cl.add_argument("--src", required=True)
    p_cl.add_argument("--dst", required=True)
    p_cl.add_argument("--epoch", type=int, default=None,
                      help="base epoch (default: newest committed)")

    p_rp = sub.add_parser(
        "replicate",
        help="catch an RDBMS replica up to the lake (exactly-once)")
    p_rp.add_argument("--lake-dir", required=True)
    p_rp.add_argument("--db", required=True, help="DuckDB file path")
    p_rp.add_argument("--table", default="pages")
    p_rp.add_argument("--staging-dir", required=True)
    p_rp.add_argument("--columns", default="lang",
                      help="comma-separated payload columns")
    p_rp.add_argument("--to-epoch", type=int, default=None)

    p_ex = sub.add_parser(
        "export", help="export the lake's live rows to csv/jsonl "
        "(one file per partition, resumable)")
    p_ex.add_argument("--lake-dir", required=True)
    p_ex.add_argument("--out-dir", required=True)
    p_ex.add_argument("--format", choices=["jsonl", "csv"],
                      default="jsonl")
    p_ex.add_argument("--columns", default=None,
                      help="comma-separated; default: all non-binary")

    p_st = sub.add_parser("status", help="print newest manifest")
    p_st.add_argument("--lake-dir", required=True)
    p_st.add_argument("--epoch", type=int, default=None,
                      help="print a historical epoch's manifest instead "
                           "(time travel; see io/lake.py read_lake_at)")
    p_st.add_argument("--history", action="store_true",
                      help="also print the list of committed epochs")

    args = ap.parse_args(argv)

    from maestro_ray.core.manifest import latest_manifest

    if args.cmd == "status":
        if args.epoch is not None:
            from maestro_ray.core.manifest import manifest_at

            print(manifest_at(args.lake_dir, args.epoch).to_json())
        else:
            m = latest_manifest(args.lake_dir)
            print(m.to_json() if m else "{}")
        if args.history:
            from maestro_ray.core.manifest import list_epochs

            print(json.dumps({"epochs": list_epochs(args.lake_dir)}))
        return 0

    if args.cmd == "clone":  # pure driver-side metadata op, no Ray
        from maestro_ray.io.lake import clone_lake

        m = clone_lake(args.src, args.dst, args.epoch)
        print(json.dumps({"cloned_epoch": m.epoch,
                          "partitions": len(m.partitions)}))
        return 0

    if args.cmd == "rollback":  # pure manifest surgery, no Ray
        if bool(args.lake_dir) == bool(args.root):
            raise SystemExit("rollback: pass exactly one of "
                             "--lake-dir / --root")
        if args.root:
            from maestro_ray.pipelines.multi import rollback_multi

            e = rollback_multi(args.root, args.to_epoch)
            print(json.dumps({"joint_epoch": e}))
            return 0
        from maestro_ray.pipelines.rollback import rollback_lake

        m = rollback_lake(args.lake_dir, args.to_epoch)
        print(json.dumps({"epoch": m.epoch, "watermark": m.watermark,
                          "counters": m.counters}))
        return 0

    if args.cmd == "fsck":  # thread-pool file checks, no Ray session
        from maestro_ray.io.lake import fsck_lake

        rep = fsck_lake(args.lake_dir, deep=args.deep)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1

    if args.cmd == "purge":  # thread-pool rewrites without a session
        from maestro_ray.io.lake import purge_urls

        urls = [u.strip() for u in args.urls.split(",") if u.strip()]
        print(json.dumps(purge_urls(args.lake_dir, urls)))
        return 0

    if args.cmd == "scd2":  # partition applies run serial without Ray
        from maestro_ray.pipelines.scd2view import maintain_scd2

        res = maintain_scd2(args.lake_dir, args.out_dir,
                            attrs=tuple(args.attrs.split(",")))
        print(json.dumps(res))
        return 0

    if args.cmd == "view":  # no Ray session: thread-pool file counts
        from maestro_ray.pipelines.views import (
            maintain_group_counts,
            maintain_group_distinct,
            maintain_group_sums,
        )

        if args.sum and args.distinct:
            print("--sum and --distinct are mutually exclusive",
                  file=sys.stderr)
            return 2
        if args.distinct:
            out = maintain_group_distinct(args.lake_dir, args.group_col,
                                          args.distinct)
        elif args.sum:
            out = maintain_group_sums(args.lake_dir, args.group_col,
                                      args.sum)
        else:
            out = maintain_group_counts(args.lake_dir, args.group_col)
        print(out.to_json(orient="records"))
        return 0

    if args.cmd == "infer-schema":  # pure driver-side sampling, no Ray
        from maestro_ray.io.readers import infer_schema_file

        widths = (
            [int(w) for w in args.widths.split(",")] if args.widths else None
        )
        schema = infer_schema_file(
            args.path, n_sample=args.n_sample,
            delimiter=None if widths else args.delimiter,
            widths=widths, header=args.header,
            none_sentinel=args.none_sentinel,
        )
        print(json.dumps({f.name: str(f.type) for f in schema}, indent=1))
        return 0

    _ensure_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "merge-branch":
            from maestro_ray.pipelines.branch import merge_branch

            m = merge_branch(args.src, args.branch, args.fork_epoch)
            print(json.dumps({"epoch": m.epoch,
                              "watermark": m.watermark}))
            return 0
        if args.cmd == "ingest":
            from maestro_ray.pipelines.ingest import ingest

            m = ingest(
                args.log_dir,
                args.lake_dir,
                num_partitions=args.partitions,
                base_pages=args.base_pages,
                segments_per_epoch=args.segments_per_epoch,
                salt_hot_keys=args.salt_hot_keys,
                exchange=args.exchange,
            )
        elif args.cmd == "tail":
            from maestro_ray.pipelines.tail import tail_ingest

            m = tail_ingest(
                args.log_dir,
                args.lake_dir,
                num_partitions=args.partitions,
                checkpoint_every=args.checkpoint_every,
                follow=args.follow,
                poll_interval=args.poll_interval,
                idle_timeout=args.idle_timeout,
            )
        elif args.cmd == "landing":
            from maestro_ray.pipelines.landing import convert_landing_files

            written = convert_landing_files(
                args.landing_dir, args.log_dir,
                delimiter=args.delimiter,
                error_threshold=args.error_threshold,
                pattern=args.pattern,
            )
            print(json.dumps({"segments_written": len(written),
                              "segments": [os.path.basename(w)
                                           for w in written]}))
            return 0
        elif args.cmd == "changes":  # the feed is a Dataset → session
            from maestro_ray.core.schema import LAKE_V2
            from maestro_ray.pipelines.changefeed import table_changes

            cols = tuple(c.strip() for c in args.columns.split(",")
                         if c.strip())
            known = {f.name for f in LAKE_V2}
            bad = [c for c in cols if c not in known]
            if bad:  # a typo would otherwise emit silently-null columns
                ap.error(f"unknown payload column(s) {bad}; "
                         f"lake columns: {sorted(known)}")
            ds = table_changes(args.lake_dir, args.from_epoch,
                               args.to_epoch, payload_columns=cols)
            for batch in ds.iter_batches(batch_format="pandas"):
                for c in batch.columns:  # bytes (html) aren't JSON: hex
                    if batch[c].map(lambda v: isinstance(v, bytes)).any():
                        batch[c] = batch[c].map(
                            lambda v: v.hex() if isinstance(v, bytes)
                            else v)
                sys.stdout.write(batch.to_json(orient="records",
                                               lines=True,
                                               date_format="iso"))
            return 0
        elif args.cmd == "replicate":  # staging write needs the session
            from maestro_ray.pipelines.replicate import replicate_to_rdbms

            cols = tuple(c.strip() for c in args.columns.split(",")
                         if c.strip())
            res = replicate_to_rdbms(args.lake_dir, args.db, args.table,
                                     args.staging_dir,
                                     payload_columns=cols,
                                     to_epoch=args.to_epoch)
            print(json.dumps(res))
            return 0
        elif args.cmd == "export":  # per-partition tasks use the session
            from maestro_ray.io.lake import export_lake

            cols = ([c.strip() for c in args.columns.split(",")
                     if c.strip()] if args.columns else None)
            out = export_lake(args.lake_dir, args.out_dir,
                              fmt=args.format, columns=cols)
            print(json.dumps(out))
            return 0
        elif args.cmd == "repartition":
            from maestro_ray.io.lake import repartition_lake

            m = repartition_lake(args.lake_dir, args.num_partitions)
        elif args.cmd == "compact":
            from maestro_ray.io.lake import compact_partitions

            m = compact_partitions(
                args.lake_dir,
                vacuum_tombstones_ts=args.vacuum_tombstones_ts,
            )
        elif args.cmd == "vacuum":
            from maestro_ray.core.manifest import expire_epochs, vacuum

            if args.keep_last is not None:
                print(json.dumps(
                    expire_epochs(args.lake_dir, args.keep_last)))
                return 0
            m = latest_manifest(args.lake_dir)
            if m is None:
                print(json.dumps({"removed": 0}))
                return 0
            removed = vacuum(args.lake_dir, m)
            print(json.dumps({"removed": removed, "epoch": m.epoch}))
            return 0
        if m is None:
            print(json.dumps({"status": "nothing to do"}))
        else:
            print(json.dumps({
                "epoch": m.epoch,
                "watermark": m.watermark,
                "partitions": len(m.partitions),
                "rows": sum(v["rows"] for v in m.partitions.values()),
                "counters": m.counters,
            }))
        return 0
    finally:
        if os.environ.get("MAESTRO_KEEP_RAY") != "1":
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
