"""Bloom-filter semi-join pruning — the middle regime between broadcast
and shuffle joins.

:func:`relational.key_semi_join` has two plans: broadcast the distinct
right keys when they fit a worker heap, else co-group-shuffle BOTH
sides.  At 100 TB there is a wide middle band where the key set is far
too large to ship raw (billions of 8-byte+ keys) but the probe side is
the expensive thing to shuffle.  A Bloom filter compresses the key set
to ~10 bits/key at ~1% false-positive rate, ships ONCE via ``ray.put``,
and prunes the probe side MAP-SIDE — so only bloom survivors (true
matches + the small false-positive band) enter the exact verification
join.  Net effect: the probe-side shuffle volume drops from |probe| to
~|semi-join result|, at the cost of one cheap build pass over the keys.

This mirrors the runtime-filter pushdown of modern MPP engines (public
design: e.g. Impala/Spark runtime bloom filters); the reference engine
has no equivalent — it is part of this repo's scale surface.

Exactness: the bloom pass alone admits false positives, so
:func:`bloom_semi_join` defaults to ``exact=True`` and re-verifies the
survivors with :func:`relational.key_semi_join` (no false negatives are
possible: every inserted key probes positive by construction, and the
verify join removes the false positives).  The composition is therefore
bit-equal to a plain semi-join — asserted in tests even with a
deliberately undersized, high-fpp filter.

Build reduction: per-BLOCK partial filters (one ``num_bits/8``-byte row
per block) are OR-folded in two ``map_batches`` passes (``fold_batch``×
reduction each — 4096× total at the default 64), so the driver only
ORs the handful of fold survivors; no driver-side collect of keys or of
one-partial-per-block at raw block count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SEED_A = 0x9E3779B9
_SEED_B = 0x85EBCA6B


def _hash_pair(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independently-seeded 64-bit hashes of a key column (polars
    native xxhash — same kernel family as ``stages.base.hash_column``).
    Double hashing h_i = h1 + i*h2 gives ``num_hashes`` probe positions
    from two passes (Kirsch-Mitzenmacher construction)."""
    import polars as pl

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pl.from_arrow(col)
    return (s.hash(seed=_SEED_A).to_numpy().astype(np.uint64),
            s.hash(seed=_SEED_B).to_numpy().astype(np.uint64))


def _set_bits(words: np.ndarray, h1: np.ndarray, h2: np.ndarray,
              num_bits: int, num_hashes: int) -> None:
    mask = np.uint64(num_bits - 1)
    for i in range(num_hashes):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _probe_bits(words: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                num_bits: int, num_hashes: int) -> np.ndarray:
    mask = np.uint64(num_bits - 1)
    out = np.ones(len(h1), dtype=bool)
    for i in range(num_hashes):
        idx = (h1 + np.uint64(i) * h2) & mask
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out


def build_bloom(ds, key: str, num_bits: int = 1 << 23, num_hashes: int = 4,
                fold_batch: int = 64) -> np.ndarray:
    """Distributed Bloom-filter build over ``ds[key]`` (nulls skipped —
    semi-join null semantics: a null key matches nothing).

    Returns the packed filter as a ``num_bits/64``-long uint64 array.
    ``num_bits`` must be a power of two (mask instead of modulo).
    Sizing rule of thumb: ~10 bits per distinct key ≈ 1% fpp at
    ``num_hashes=4``; at 1e9 keys that is a 1.25 GB filter — still a
    single ``ray.put`` object, vs 8+ GB of raw keys.
    """
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of 2"
    words_len = num_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(words_len, dtype=np.uint64)
        col = t[key].combine_chunks() if t.num_rows else None
        if col is not None:
            col = col.filter(pc.is_valid(col))
            if len(col):
                h1, h2 = _hash_pair(col)
                _set_bits(words, h1, h2, num_bits, num_hashes)
        return pa.table({"words": pa.array([words.tobytes()],
                                           pa.large_binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(words_len, dtype=np.uint64)
        for buf in t["words"].combine_chunks():
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table({"words": pa.array([acc.tobytes()],
                                           pa.large_binary())})

    parts = ds.map_batches(partial, batch_size=None, batch_format="pyarrow")
    # two fold passes: fold_batch× reduction each; the driver only ORs
    # the (blocks / fold_batch²) survivors.
    for _ in range(2):
        parts = parts.map_batches(fold, batch_size=fold_batch,
                                  batch_format="pyarrow")
    acc = np.zeros(words_len, dtype=np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b["words"].combine_chunks():
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return acc


def bloom_prune(ds, key: str, words: np.ndarray, num_bits: int,
                num_hashes: int = 4):
    """Map-side filter of ``ds`` to rows whose ``key`` probes positive.
    The filter ships ONCE (``ray.put``); each batch tests membership
    with pure-numpy bit arithmetic (no shuffle, no Python loop over
    rows).  Admits bloom false positives; drops null keys."""
    import ray

    ref = ray.put(words)

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        w = ray.get(ref)           # zero-copy view from the object store
        col = t[key].combine_chunks()
        h1, h2 = _hash_pair(col)
        m = _probe_bits(w, h1, h2, num_bits, num_hashes)
        m &= pc.is_valid(col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(m))

    return ds.map_batches(prune, batch_format="pyarrow")


def bloom_semi_join(ds, right, left_key: str, right_key: str,
                    num_bits: int = 1 << 23, num_hashes: int = 4,
                    exact: bool = True, num_buckets: int = 64):
    """Semi-join with Bloom runtime-filter pruning.

    1. build a Bloom filter over ``right[right_key]`` (distributed,
       OR-folded partials),
    2. prune ``ds`` map-side to bloom survivors (no shuffle),
    3. ``exact=True`` (default): verify survivors with
       :func:`relational.key_semi_join` — output is exactly the SQL
       ``WHERE left_key IN (SELECT right_key …)`` row set.

    ``exact=False`` returns the pruned stream directly (false positives
    possible) — the right mode when the consumer re-verifies anyway,
    e.g. a downstream inner join that the filter merely pre-prunes.
    """
    filt = build_bloom(right.select_columns([right_key]), right_key,
                       num_bits=num_bits, num_hashes=num_hashes)
    pruned = bloom_prune(ds, left_key, filt, num_bits, num_hashes)
    if not exact:
        return pruned
    from .relational import key_semi_join

    return key_semi_join(pruned, right, left_key, right_key,
                         num_buckets=num_buckets)
