"""SimHash near-duplicate detection (engine-first addition).

64-bit SimHash over token hashes: each token hash votes ±1 on each of 64
bit positions; the signature is the sign vector.  Near-dups differ in
few bits (Hamming distance ≤ k).  Candidate generation uses the
pigeonhole trick: split the 64 bits into ``k+1`` bands — any pair within
Hamming distance k agrees exactly on ≥1 band — and groupby each band
value (the single shuffle).  Per-bucket pairs are verified by exact
Hamming distance on the full signature.

Everything is numpy-vectorized; signatures are 8 bytes/doc so the
shuffle is tiny relative to the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..text.analysis import hash_tokens_batch


def simhash_batch(texts: pa.Array) -> np.ndarray:
    """texts → uint64 simhash per doc (vectorized bit-vote)."""
    offsets, tok_h = hash_tokens_batch(texts)
    offsets = offsets.astype(np.int64)
    n_docs = len(offsets) - 1
    if len(tok_h) == 0:
        return np.zeros(n_docs, np.uint64)
    # bits matrix: (total_tokens, 64) in {0,1} → votes in {-1,+1}
    bits = (tok_h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bits.astype(np.int32) * 2 - 1
    csum = np.vstack([np.zeros((1, 64), np.int64),
                      np.cumsum(votes, axis=0, dtype=np.int64)])
    seg = csum[offsets[1:]] - csum[offsets[:-1]]      # (n_docs, 64) vote sums
    sig_bits = (seg > 0).astype(np.uint64)
    return (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64)


def simhash_stage(id_col: str = "doc_id", text_col: str = "text"):
    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sig = simhash_batch(pc.fill_null(text, ""))
        return pa.table({id_col: batch[id_col],
                         "simhash": pa.array(sig, pa.uint64())})
    return fn


def _hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(x.shape, np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt[nz] += 1
        x = x & (x - np.uint64(1))
    return cnt


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, max_bucket: int = 512):
    """documents → (a, b, hamming) pairs with distance ≤ max_hamming.

    Skew cap: a band bucket with more than ``max_bucket`` members emits
    only STAR pairs against the bucket's min-id member instead of the
    full O(m²) set — i.e. for such buckets the output is a connectivity-
    preserving SUBSET of the documented pairs (adequate when pairs feed
    transitive clustering; NOT the complete pair list).  Every capped
    bucket is logged with its size; raise ``max_bucket`` for exhaustive
    output on skewed corpora."""
    import logging

    logger = logging.getLogger(__name__)
    bands = max_hamming + 1
    width = 64 // bands
    masks = []
    for b in range(bands):
        lo = b * width
        hi = 64 if b == bands - 1 else lo + width
        masks.append((lo, hi))

    def flat(t: pa.Table) -> pa.Table:
        sig = t["simhash"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t[id_col].combine_chunks()
        keys, out_ids, out_sig = [], [], []
        for bi, (lo, hi) in enumerate(masks):
            seg = (sig >> np.uint64(lo)) & ((np.uint64(1) << np.uint64(hi - lo)) - np.uint64(1))
            keys.append(seg * np.uint64(len(masks)) + np.uint64(bi))
            out_ids.append(ids)
            out_sig.append(sig)
        return pa.table({
            "band_key": pa.array(np.concatenate(keys), pa.uint64()),
            id_col: pa.concat_arrays(out_ids),
            "simhash": pa.array(np.concatenate(out_sig), pa.uint64()),
        })

    def pairs(t: pa.Table) -> pa.Table:
        # one call per hash BUCKET of band keys (grouping on the raw
        # band key would mean one Python call per distinct band —
        # billions at corpus scale); bands are contiguous runs after an
        # in-bucket sort, each scored with vectorized popcount hamming
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        t = t.take(pc.sort_indices(
            t, sort_keys=[("band_key", "ascending"), (id_col, "ascending")]))
        bands = t["band_key"].to_numpy(zero_copy_only=False)
        ids_all = t[id_col].to_numpy(zero_copy_only=False)
        sig_all = t["simhash"].to_numpy(zero_copy_only=False)
        cuts = np.flatnonzero(bands[1:] != bands[:-1]) + 1
        bounds = [0, *cuts.tolist(), len(bands)]
        out_a, out_b, out_d = [], [], []
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            ids, sig = ids_all[s:e], sig_all[s:e]
            uniq, first = np.unique(ids, return_index=True)
            ids, sig = uniq, sig[first]
            m = len(ids)
            if m < 2:
                continue
            if m > max_bucket:
                logger.warning(
                    "simhash band bucket capped: %d members > max_bucket=%d;"
                    " emitting star pairs only (subset of the ≤max_hamming "
                    "contract for this bucket)", m, max_bucket)
                a_i = np.zeros(m - 1, np.int64)
                b_i = np.arange(1, m, dtype=np.int64)
            else:
                iu = np.triu_indices(m, k=1)
                a_i, b_i = iu[0], iu[1]
            d = _hamming(sig[a_i], sig[b_i])
            keep = d <= max_hamming
            out_a.append(ids[a_i[keep]])
            out_b.append(ids[b_i[keep]])
            out_d.append(d[keep])
        if not out_a:
            return empty
        return pa.table({"a": pa.array(np.concatenate(out_a), pa.int64()),
                         "b": pa.array(np.concatenate(out_b), pa.int64()),
                         "hamming": pa.array(np.concatenate(out_d),
                                             pa.int64())})

    from .exact import dedup_exact

    from ..stages.base import _auto_buckets, bucketed_map_groups

    nb = _auto_buckets(None)

    def flat_b(t: pa.Table) -> pa.Table:
        out = flat(t)
        b = pc.cast(pc.bit_wise_and(out["band_key"],
                                    pa.scalar(nb - 1, pa.uint64())),
                    pa.int32())
        return out.append_column("__b", b)

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        simhash_stage(id_col, text_col), batch_format="pyarrow")
    cand = bucketed_map_groups(
        sigs.map_batches(flat_b, batch_format="pyarrow"), "__b", pairs)
    return dedup_exact(
        cand.map_batches(lambda t: t.append_column("__o", t["a"]),
                         batch_format="pyarrow"),
        keys=["a", "b"], order_by="__o").drop_columns(["__o"])
