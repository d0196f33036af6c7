"""Full-contract validation CLI (r3 VERDICT #6).

The driver's per-round CORRECTNESS file samples 50 of the contract's
queries() keys; this module runs the WHOLE contract — every key with an
``oracle_sql()`` twin compared against DuckDB exactly the way the
driver compares (row count, column names, dtype-kind drift, order-
insensitive values), every rows-only key executed for a row count —
and writes a CORRECTNESS-shaped JSON next to the driver's sample, so
each round ships its own full-contract evidence.

    python -m maestro_ray.validate --sf /root/testdata/sf0.01 \
        --out CORRECTNESS_full.json

Owns a Ray session (CLI rule); the library itself never inits Ray.
Rows-only keys (genuinely non-SQL: near-dup recall, ANN probes, CDC
engine checks, ...) are marked ``"oracle": "rows_only"`` — their
oracles live in pytest (planted pairs, recall floors, byte-identity).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run(sf_dir: str, only: list[str] | None = None) -> dict:
    import duckdb

    from maestro_ray.oracle_compare import compare, to_df

    sys.path.insert(0, os.getcwd())
    import __ray_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results: dict = {}
    names = [n for n in queries if only is None or n in only]
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            got_raw = to_df(queries[name](sf_dir))
            if name in oracles:
                exp_raw = con.execute(oracles[name]).fetch_df()
                rec = compare(got_raw, exp_raw)
                rec["oracle"] = "duckdb"
            else:
                rec = {"rows_match": None, "schema_match": None,
                       "hash_match": None,
                       "spark_rows": int(len(got_raw)),
                       "oracle_rows": None, "err": None,
                       "oracle": "rows_only"}
        except Exception as exc:  # record, keep going — this is CI
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None,
                   "err": f"{type(exc).__name__}: {exc}",
                   "oracle": "duckdb" if name in oracles else "rows_only"}
            traceback.print_exc(limit=3)
        rec["sec"] = round(time.time() - t0, 3)
        results[name] = rec
        status = ("PASS" if rec.get("hash_match")
                  else "rows-only" if rec.get("oracle") == "rows_only"
                  and not rec.get("err") else "FAIL")
        print(f"[{i + 1}/{len(names)}] {name}: {status} "
              f"({rec['sec']}s)", flush=True)
    return results


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="maestro_ray.validate")
    ap.add_argument("--sf", default="/root/testdata/sf0.01",
                    help="testdata dir with the parquet tables")
    ap.add_argument("--out", default=None,
                    help="output JSON path (default: stdout summary only)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these query names")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from maestro_ray.__main__ import _ensure_ray

    _ensure_ray(args.num_cpus)
    import ray

    try:
        results = run(args.sf, only=args.only)
    finally:
        ray.shutdown()

    oracle_keys = [n for n, r in results.items() if r["oracle"] == "duckdb"]
    rows_only = [n for n, r in results.items() if r["oracle"] == "rows_only"]
    fails = [n for n in oracle_keys if not results[n]["hash_match"]]
    errs = [n for n in rows_only if results[n]["err"]]
    summary = {
        "sf": args.sf,
        "total": len(results),
        "oracle_exact": len(oracle_keys),
        "oracle_pass": len(oracle_keys) - len(fails),
        "oracle_fail": fails,
        "rows_only": len(rows_only),
        "rows_only_err": errs,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "results": results}, f,
                      indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    print(json.dumps(summary))
    return 1 if (fails or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
