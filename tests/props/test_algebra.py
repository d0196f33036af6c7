"""Property tests (hypothesis) for the algebraic claims the engine's
correctness rests on: LWW-reduce associativity (justifies the combiner
and salting), checksum mergeability, evolution idempotence/composition.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from maestro_ray.core.schema import CHANGELOG_V1, CHANGELOG_V3, evolve_table
from maestro_ray.ops.hashing import checksum
from maestro_ray.ops.partition import lww_reduce

_events = st.lists(
    st.tuples(
        st.integers(0, 9),        # url id
        st.integers(0, 5),        # warc_ts
        st.integers(0, 1000),     # offset (may collide: dup delivery)
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=0, max_size=60,
)


def _tbl(rows):
    return pa.table({
        "offset": pa.array([r[2] for r in rows], pa.int64()),
        "op": pa.array([r[3] for r in rows], pa.string()),
        "url": pa.array([f"u{r[0]}" for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([f"h{r[2]}".encode() for r in rows], pa.binary()),
    })


def _canon(t: pa.Table):
    return sorted(
        zip(
            t.column("url").to_pylist(),
            t.column("warc_ts").to_pylist(),
            t.column("offset").to_pylist(),
            t.column("op").to_pylist(),
        )
    )


@settings(max_examples=150, deadline=None)
@given(_events, st.integers(0, 59))
def test_lww_reduce_associative(rows, split):
    """reduce(reduce(A) ∪ reduce(B)) == reduce(A ∪ B) for any split —
    the exact property the per-batch combiner and salted pre-merge
    rely on (SURVEY.md U1/U6)."""
    t = _tbl(rows)
    split = min(split, t.num_rows)
    a, b = t.slice(0, split), t.slice(split)
    two_phase = lww_reduce(
        pa.concat_tables([lww_reduce(a), lww_reduce(b)])
    )
    one_phase = lww_reduce(t)
    assert _canon(two_phase) == _canon(one_phase)


@settings(max_examples=100, deadline=None)
@given(_events)
def test_lww_reduce_idempotent(rows):
    t = lww_reduce(_tbl(rows))
    assert _canon(lww_reduce(t)) == _canon(t)


@settings(max_examples=100, deadline=None)
@given(_events, st.integers(0, 59))
def test_checksum_partition_invariant(rows, split):
    """checksum(A) + checksum(B) ≡ checksum(A ∪ B) mod 2^64 for any
    row partition — why per-partition checksums sum to a global one."""
    t = _tbl(rows)
    split = min(split, t.num_rows)
    a, b = t.slice(0, split), t.slice(split)
    assert (checksum(a) + checksum(b)) % (1 << 64) == checksum(t)


@settings(max_examples=60, deadline=None)
@given(_events)
def test_evolution_composes(rows):
    """evolve(evolve(t, vN), vN) == evolve(t, vN): evolution to the head
    schema is idempotent, and evolving v1 data through the head schema
    null-fills exactly the added columns."""
    t1 = _tbl(rows)  # CHANGELOG_V1-shaped
    e1 = evolve_table(t1, CHANGELOG_V3)
    e2 = evolve_table(e1, CHANGELOG_V3)
    assert e1.equals(e2)
    assert e1.column("lang").null_count == t1.num_rows
    assert e1.schema.equals(CHANGELOG_V3)
    # column order/type fidelity of the untouched columns
    for name in CHANGELOG_V1.names:
        assert e1.column(name).cast(t1.column(name).type).equals(t1.column(name))


def test_lww_reduce_null_keys_keep_other_winners():
    """Regression (r2 self-review): the Arrow boundary detection must
    treat null-vs-value adjacency as a boundary — a single null-url row
    used to swallow the last non-null key's winner entirely."""
    import pyarrow as pa

    t = pa.table({
        "url": pa.array(["a", "a", None, None], pa.string()),
        "warc_ts": pa.array([1, 2, 5, 9], pa.int64()),
        "offset": pa.array([0, 1, 2, 3], pa.int64()),
    })
    out = lww_reduce(t)
    by_url = {r["url"]: r for r in out.to_pylist()}
    assert "a" in by_url and by_url["a"]["warc_ts"] == 2
    assert None in by_url and by_url[None]["warc_ts"] == 9
    assert out.num_rows == 2


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3, 4]),
    st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    """decode(encode(x)) == x for every shape/channel combination."""
    import numpy as np

    from maestro_ray.ops.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 300), st.integers(1, 3),
    st.sampled_from(["uint8", "int16", "int32"]),
    st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, dtype, seed):
    import numpy as np

    from maestro_ray.ops.wav import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    info = np.iinfo(np.dtype(dtype))
    samples = rng.integers(info.min, int(info.max) + 1, size=(n, ch),
                           dtype=np.int64).astype(dtype)
    out, rate = decode_wav(encode_wav(samples, sample_rate=22050))
    assert rate == 22050 and np.array_equal(out, samples)
