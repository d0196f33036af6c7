"""File-exchange merge metadata-plane tests: a merge task must open
only the footers of exchange files that own its partition (VERDICT r2
#5 — every task used to probe every file's footer, O(P × files))."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from maestro_ray.ops.merge import (
    CANDIDATE,
    make_exchange_merge_fn,
    write_exchange,
)

T0 = 1_700_000_000_000_000  # µs


def _cand_batch(urls, partitions, offset0):
    n = len(urls)
    t = pa.Table.from_arrays(
        [
            pa.array(range(offset0, offset0 + n), pa.int64()),
            pa.array(["insert"] * n, pa.string()),
            pa.array(urls, pa.string()),
            pa.array([T0 + i for i in range(n)], pa.timestamp("us")),
            pa.array([b"<html><body>x</body></html>"] * n, pa.binary()),
            pa.array([None] * n, pa.string()),
            pa.array([None] * n, pa.string()),
        ],
        schema=CANDIDATE,
    )
    return t.append_column("p", pa.array(partitions, pa.int32()))


def test_merge_task_opens_only_owning_files(tmp_path, monkeypatch):
    ex_dir = str(tmp_path / "ex")
    lake_dir = str(tmp_path / "lake")
    os.makedirs(lake_dir)
    # two exchange files with DISJOINT partition sets
    a1 = write_exchange(
        _cand_batch(["https://a/0", "https://a/1"], [0, 1], 0), ex_dir, 4
    )
    a2 = write_exchange(
        _cand_batch(["https://b/2", "https://b/3"], [2, 3], 100), ex_dir, 4
    )
    assert sorted(a1.column("p").to_pylist()) == [0, 1]
    assert set(a1.column("file").to_pylist()) != set(a2.column("file").to_pylist())
    assert len(os.listdir(ex_dir)) == 2

    opens: list[str] = []
    real_mm = pa.memory_map

    def counting_mm(path, *a, **kw):
        # the IPC exchange reader opens files via pa.memory_map (r5
        # format change); count basenames under ex_dir only
        if str(path).startswith(ex_dir):
            opens.append(os.path.basename(str(path)))
        return real_mm(path, *a, **kw)

    import maestro_ray.ops.merge as merge_mod

    monkeypatch.setattr(merge_mod.pa, "memory_map", counting_mm)
    fn = make_exchange_merge_fn(lake_dir, ex_dir, epoch=1,
                                prev_files_ref=None, epoch_watermark=1)
    own = a1.column("file")[0].as_py()
    batch = pa.table({
        "p": pa.array([0], pa.int32()),
        "files": pa.array([[own]], pa.list_(pa.string())),
    })
    out = fn(batch)
    # exactly ONE footer opened — the owning file; never the other
    assert opens == [own]
    assert out.column("partition").to_pylist() == [0]
    assert out.column("row_count").to_pylist() == [1]
    staged = os.path.join(lake_dir, "_staging", f"epoch-{1:012d}", "p=0.parquet")
    got = pq.read_table(staged)
    assert got.column("url").to_pylist() == ["https://a/0"]


def test_merge_without_file_lists_falls_back_to_listing(tmp_path):
    """Legacy/resume batches without a `files` column still merge
    correctly by probing the whole directory."""
    ex_dir = str(tmp_path / "ex")
    lake_dir = str(tmp_path / "lake")
    os.makedirs(lake_dir)
    write_exchange(_cand_batch(["https://a/0"], [0], 0), ex_dir, 2)
    write_exchange(_cand_batch(["https://b/1"], [1], 50), ex_dir, 2)
    fn = make_exchange_merge_fn(lake_dir, ex_dir, epoch=1,
                                prev_files_ref=None, epoch_watermark=1)
    out = fn(pa.table({"p": pa.array([0, 1], pa.int32())}))
    assert sorted(out.column("partition").to_pylist()) == [0, 1]
    assert out.column("row_count").to_pylist() == [1, 1]
