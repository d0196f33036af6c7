"""Deterministic text featurizer — the embedding-model STAND-IN.

Real embedding models aren't in this container, so the vector plumbing
(encode pass, index maintenance, ADC search) runs on a deterministic
hashed character-n-gram projection: every char 3-gram hashes to one of
``dim`` signed buckets, the bucket sums are L2-normalized. This is the
classic feature-hashing trick (Weinberger et al.) — a REAL, if crude,
text representation: near-identical texts land near-identically, and
it is bit-reproducible across processes, which the incremental-index
oracles (incremental ≡ rebuild) rely on. Swapping in a learned model
is a one-function change (`embed_batch`), the actor-pool / index
plumbing is the part this repo owns.

Vectorized: ONE substring explode per batch via the same flat-buffer
trick the shinglers use — no per-document Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from maestro_ray.ops.hashing import hash_array


def embed_batch(texts: pa.ChunkedArray | pa.Array, dim: int = 64
                ) -> np.ndarray:
    """(n,) string column → (n, dim) float32 unit vectors. Nulls and
    empty strings embed to the zero vector (callers decide whether to
    keep them). Deterministic for a given (text, dim)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return np.zeros((0, dim), np.float32)
    t = pc.fill_null(texts, "")
    # flat UTF-8 buffer + per-string offsets: 3-byte windows that stay
    # inside one string (multibyte chars contribute byte-3-grams —
    # deterministic and just as discriminative for hashing purposes)
    arr = pc.cast(t, pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    # offsets are ABSOLUTE positions into the values buffer; slice by
    # arr.offset so a sliced/offset array reads its own window
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset: arr.offset + n + 1]
    out = np.zeros((n, dim), np.float32)
    if int(offs[-1]) - int(offs[0]) >= 3:
        starts = np.arange(int(offs[0]), int(offs[-1]) - 2,
                           dtype=np.int64)
        doc = np.searchsorted(offs, starts, side="right") - 1
        keep = starts + 3 <= offs[doc + 1]
        starts, doc = starts[keep], doc[keep]
        if len(starts):
            # pack each 3-byte window into one int, hash, bucket, sign
            g = (flat[starts].astype(np.int64) << 16) \
                | (flat[starts + 1].astype(np.int64) << 8) \
                | flat[starts + 2].astype(np.int64)
            h = hash_array(pa.array(g, pa.int64()))
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)).astype(bool),
                            np.float32(-1), np.float32(1))
            np.add.at(out, (doc, bucket), sign)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out
