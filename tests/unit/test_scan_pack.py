"""ordered_cumsum (distributed prefix sum) and pack_sequences — edge
cases the DuckDB twin doesn't reach: duplicate/null keys, null values,
clustered key spaces, float sums, empty input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.corpus import pack_sequences
from maestro_ray.ops.scan import ordered_cumsum


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _ds(rd, ks, vs, parts=4, vtype=pa.int64()):
    t = pa.table({"k": pa.array(ks, pa.int64()), "v": pa.array(vs, vtype)})
    return rd.from_arrow(t).repartition(parts)


def test_ordered_cumsum_exact_and_invariant(rd):
    rng = np.random.default_rng(3)
    ks = rng.permutation(1000)
    vs = rng.integers(0, 50, 1000)
    outs = []
    for parts in (1, 7):
        o = ordered_cumsum(_ds(rd, ks, vs, parts), "k", "v") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    srt = np.argsort(ks)
    exp = np.concatenate(([0], np.cumsum(vs[srt])[:-1]))
    assert (outs[0]["cum_prev"].to_numpy() == exp).all()
    assert outs[0]["cum_prev"].dtype == np.int64


def test_ordered_cumsum_clustered_keys_one_bucket(rd):
    # all keys inside one equal-width bucket (tight cluster + outlier):
    # correctness must not depend on spread
    ks = np.array([10**9] + list(range(100)))
    vs = np.ones(101, dtype=np.int64)
    o = ordered_cumsum(_ds(rd, ks, vs, 5), "k", "v", n_buckets=8) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(o["cum_prev"]) == list(range(101))


def test_ordered_cumsum_null_value_counts_zero(rd):
    o = ordered_cumsum(_ds(rd, [3, 1, 2], [5, None, 7], 2), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(o["cum_prev"]) == [0, 0, 7]  # null at k=1 adds nothing


def test_ordered_cumsum_float_values(rd):
    o = ordered_cumsum(_ds(rd, [2, 1], [0.5, 1.25], 1,
                           vtype=pa.float64()), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(o["cum_prev"]) == [0.0, 1.25]


def test_ordered_cumsum_rejects_duplicate_and_null_keys(rd):
    with pytest.raises(Exception, match="duplicate"):
        ordered_cumsum(_ds(rd, [1, 1, 2], [1, 1, 1], 1), "k", "v") \
            .materialize()
    with pytest.raises(Exception, match="null"):
        ordered_cumsum(_ds(rd, [1, None, 2], [1, 1, 1], 1), "k", "v") \
            .materialize()
    with pytest.raises(ValueError):
        ordered_cumsum(_ds(rd, [1], [1], 1), "k", "v", n_buckets=0)


def test_pack_sequences_layout(rd):
    # 3 docs of 3/4/2 tokens, seq_len=4: doc0 [0,0..2], doc1 spans
    # seqs 0-1 (offset 3), doc2 starts seq 1 offset 3 spanning into 2
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c", "d e f g", "h i"]),
    })).repartition(3)
    o = pack_sequences(ds, seq_len=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(o["n_tokens"]) == [3, 4, 2]
    assert list(o["seq_id"]) == [0, 0, 1]
    assert list(o["seq_offset"]) == [0, 3, 3]
    assert list(o["n_seqs"]) == [1, 2, 2]
    with pytest.raises(ValueError):
        pack_sequences(ds, seq_len=0)


def test_pack_sequences_skips_null_text(rd):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", None, "c"]),
    }))
    o = pack_sequences(ds, seq_len=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(o["doc_id"]) == [0, 2]
    assert list(o["seq_offset"]) == [0, 2]  # null doc occupies nothing


def test_global_row_number(rd):
    from maestro_ray.ops.scan import global_row_number

    rng = np.random.default_rng(9)
    ks = rng.permutation(400) * 3 + 5  # sparse, shuffled, unique
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "x": pa.array(ks * 2.0, pa.float64())})
    for parts in (1, 6):
        o = global_row_number(rd.from_arrow(t).repartition(parts), "k") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert list(o["rn"]) == list(range(1, 401))
        assert list(o.columns) == ["k", "x", "rn"]


def test_write_packed_shards_roundtrip_boundary_resume(rd, tmp_path):
    import os
    import pyarrow.parquet as pq
    from maestro_ray.ops.corpus import write_packed_shards

    # 6 docs x 5 tokens, seq_len=4, seqs_per_shard=2 (8 tokens/shard):
    # 30 tokens -> seqs 0..7 -> shards 0..3; several docs straddle
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["t%d a b c d" % i for i in range(6)]),
    })
    out_dir = str(tmp_path / "shards")
    ds = rd.from_arrow(docs).repartition(3)
    man = write_packed_shards(ds, out_dir, seq_len=4, seqs_per_shard=2)
    assert man["written"].all()
    # every doc recovered exactly once after dedup; boundary docs
    # appear in BOTH touched shards
    seen = []
    total_rows = 0
    for p in sorted(os.listdir(out_dir)):
        t = pq.read_table(os.path.join(out_dir, p))
        seen.extend(t.column("doc_id").to_pylist())
        total_rows += t.num_rows
    assert sorted(set(seen)) == list(range(6))
    assert total_rows > 6  # straddlers duplicated into both shards
    # doc 1: cum_prev=5 -> seq 1 off 1, spans seqs 1-2, shard 0 and 1
    s0 = pq.read_table(os.path.join(out_dir, "shard-000000.parquet"))
    s1 = pq.read_table(os.path.join(out_dir, "shard-000001.parquet"))
    assert 1 in s0.column("doc_id").to_pylist()
    assert 1 in s1.column("doc_id").to_pylist()
    # resume: second run rewrites nothing
    mtimes = {p: os.path.getmtime(os.path.join(out_dir, p))
              for p in os.listdir(out_dir)}
    man2 = write_packed_shards(ds, out_dir, seq_len=4, seqs_per_shard=2)
    assert not man2["written"].any()
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, p)) == m
    # kill-and-resume: delete one shard, only it is rewritten
    victim = sorted(mtimes)[1]
    os.remove(os.path.join(out_dir, victim))
    man3 = write_packed_shards(ds, out_dir, seq_len=4, seqs_per_shard=2)
    assert man3["written"].sum() == 1
    assert os.path.exists(os.path.join(out_dir, victim))
    with pytest.raises(ValueError):
        write_packed_shards(ds, out_dir, seqs_per_shard=0)
