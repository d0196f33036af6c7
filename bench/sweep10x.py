"""10×-sf0.1 heavy-key sweep (VERDICT r4 #4): replicate the sf0.1
tables 10× with key-family-shifted ids into a synthetic ~sf1 dir,
then time the heaviest contract keys over it with driver-RSS
accounting — catches O(n²)/driver-bound behavior the sf0.1 sweep
can't see. Text/payload columns replicate verbatim (exact duplicate
docs are a legitimate dedup stress). Run from /root/repo single-Ray-
session:  python bench/sweep10x.py [key ...]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = "/dev/shm/maestro_bench/sf1syn"
REPLICAS = 10

# key-family strides come from the table that OWNS the family, so
# foreign keys stay consistent across replicas
_FAMILY_OWNER = {
    "O": ("orders", "o_orderkey"),
    "P": ("part", "p_partkey"),
    "S": ("supplier", "s_suppkey"),
    "C": ("customer", "c_custkey"),
    "E": ("events", "event_id"),
    "U": ("events", "user_id"),
    "D": ("documents", "doc_id"),
    "V": ("embeddings", "vec_id"),
}
_SHIFT_COLS = {
    "part": {"p_partkey": "P"},
    "supplier": {"s_suppkey": "S"},
    "customer": {"c_custkey": "C"},
    "orders": {"o_orderkey": "O", "o_custkey": "C"},
    "lineitem": {"l_orderkey": "O", "l_partkey": "P", "l_suppkey": "S"},
    "events": {"event_id": "E", "user_id": "U"},
    "documents": {"doc_id": "D"},
    "embeddings": {"vec_id": "V"},
}
_COPY_ONCE = ("region", "nation")

HEAVY_KEYS = [
    "dbscan", "dedup_ngram", "dedup_near", "dedup_substring",
    "semantic_dedup", "als_factorize", "pagerank", "graph_components",
    "label_propagation", "outlier_iqr", "knn_brute", "kmeans_cluster",
]


def build_fixture() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    done = os.path.join(DST, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(DST, exist_ok=True)
    strides = {}
    for fam, (tbl, col) in _FAMILY_OWNER.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"),
                          columns=[col])
        strides[fam] = int(pc.max(t.column(col)).as_py()) + 1
    for tbl in _COPY_ONCE:
        pq.write_table(pq.read_table(os.path.join(SRC, f"{tbl}.parquet")),
                       os.path.join(DST, f"{tbl}.parquet"))
    for tbl, shifts in _SHIFT_COLS.items():
        base = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        parts = []
        for r in range(REPLICAS):
            t = base
            for col, fam in shifts.items():
                i = t.schema.get_field_index(col)
                shifted = pc.add(pc.cast(t.column(col), pa.int64()),
                                 pa.scalar(r * strides[fam], pa.int64()))
                t = t.set_column(i, t.schema.field(i).name, shifted)
            parts.append(t)
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(DST, f"{tbl}.parquet"))
    open(done, "w").close()


def main() -> None:
    build_fixture()
    keys = sys.argv[1:] or HEAVY_KEYS

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    rd.range(1_000_000).map_batches(lambda b: b).count()  # warmup

    import __ray_entry__ as M

    q = M.queries()
    results = {}
    for name in keys:
        t0 = time.perf_counter()
        try:
            import pandas as pd

            r = q[name](DST)
            # pandas DataFrames also have .count() — a per-COLUMN
            # Series, not a row count (bit the first sweep run)
            n = len(r) if isinstance(r, pd.DataFrame) else (
                r.count() if hasattr(r, "count") else len(r))
            results[name] = {
                "sec": round(time.perf_counter() - t0, 1),
                "rows": int(n),
                "rss_gb_after": round(resource.getrusage(
                    resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
            }
        except Exception as ex:
            results[name] = {
                "sec": round(time.perf_counter() - t0, 1),
                "error": f"{type(ex).__name__}: {str(ex)[:200]}",
            }
        print(json.dumps({name: results[name]}), flush=True)
    ray.shutdown()
    print(json.dumps({"metric": "sweep10x", "results": results}))


if __name__ == "__main__":
    main()
