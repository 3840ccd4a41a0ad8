"""Chemical-fingerprint similarity (SURVEY F3 applied as a join).

The reference computes ``tanimoto`` on PubChem fingerprints one pair at
a time (``tera/utils.py:206-225``, with a latent str/int bug).  Engine
form: the fingerprint table is small (one int per chemical), so it is
broadcast once and every batch computes its rows against ALL candidates
with vectorized popcounts — the exact-similarity analog of the
broadcast-join pattern.  For dump-scale fingerprint stores, block by a
coarse key (e.g. popcount band: |a|·t ≤ |b| ≤ |a|/t bounds Tanimoto ≥ t)
before the pairwise step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LUT = np.array([bin(i).count("1") for i in range(1 << 16)], np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table."""
    x = x.astype(np.uint64)
    return (_LUT[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
            + _LUT[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _LUT[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _LUT[((x >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)])


def tanimoto_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Tanimoto over uint64 fingerprints: |x∧y| / (|x|+|y|-|x∧y|)."""
    inter = popcount64(a[:, None] & b[None, :])
    pa_, pb = popcount64(a), popcount64(b)
    union = pa_[:, None] + pb[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = inter / np.maximum(union, 1)
    return sim


def tanimoto_pairs(ds, id_col: str = "cas_number", fp_col: str = "fp",
                   threshold: float = 0.7, mode: str = "banded",
                   num_buckets: int = 64):
    """fingerprints → (a, b, tanimoto) pairs with similarity ≥ threshold
    (a < b by id; exact similarity, no approximation in either mode).

    ``mode="banded"`` (default, the scale path): popcount-band blocking.
    Tanimoto ≥ t implies ``t·|b| ≤ |a| ≤ |b|/t``, so a pair can only
    score if the two popcounts are within a factor ``t`` of each other.
    Each fingerprint is emitted once as HOME in its own popcount band
    and probes every band in ``[ceil(t·p), p-1]``; a qualifying pair is
    generated exactly once, in the band of its smaller popcount.  The
    shuffle volume is O(rows · p·(1-t)) 16-byte rows — bounded
    replication instead of the broadcast's O(N·M) all-pairs scoring.

    ``mode="broadcast"``: the original small-store path — collect the
    whole fingerprint table, ``ray.put`` once, every batch scores
    against all rows.  Only valid when the store fits a worker heap.
    """
    if mode == "broadcast":
        return _tanimoto_pairs_broadcast(ds, id_col, fp_col, threshold)

    def expand(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist())
        fps = np.asarray(t[fp_col].to_pylist(), np.uint64)
        p = popcount64(fps)
        lo = np.ceil(threshold * p).astype(np.int64)
        # home rows: one per fingerprint, band = own popcount
        h_band, h_ids, h_fps = p.astype(np.int64), ids, fps
        h_kind = np.zeros(len(ids), np.int8)
        # probe rows: bands [lo, p-1], vectorized range expansion
        counts = np.maximum(p.astype(np.int64) - lo, 0)
        total = int(counts.sum())
        row_of = np.repeat(np.arange(len(ids)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        pr_band = lo[row_of] + within
        band = np.concatenate([h_band, pr_band])
        out = pa.table({
            "band": pa.array(band, pa.int64()),
            id_col: pa.array(np.concatenate([h_ids, ids[row_of]])),
            fp_col: pa.array(np.concatenate([h_fps, fps[row_of]]),
                             pa.uint64()),
            "kind": pa.array(np.concatenate([h_kind,
                                             np.ones(total, np.int8)])),
        })
        return out.append_column(
            "__b", pa.array((band % num_buckets).astype(np.int32)))

    def score_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "tanimoto": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        t = t.take(pc.sort_indices(t, sort_keys=[("band", "ascending")]))
        bands = t["band"].to_numpy(zero_copy_only=False)
        ids = np.asarray(t[id_col].to_pylist())
        fps = t[fp_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        cuts = np.flatnonzero(bands[1:] != bands[:-1]) + 1
        bounds = [0, *cuts.tolist(), len(bands)]
        a_out, b_out, s_out = [], [], []
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            hm = kind[s:e] == 0
            h_ids, h_fps = ids[s:e][hm], fps[s:e][hm]
            p_ids, p_fps = ids[s:e][~hm], fps[s:e][~hm]
            if len(h_fps) > 1:          # home×home: equal popcounts
                sim = tanimoto_matrix(h_fps, h_fps)
                ri, ci = np.nonzero(sim >= threshold)
                keep = h_ids[ri] < h_ids[ci]
                ri, ci = ri[keep], ci[keep]
                a_out.append(h_ids[ri]); b_out.append(h_ids[ci])
                s_out.append(np.round(sim[ri, ci], 6))
            if len(h_fps) and len(p_fps):   # home×probe: smaller side home
                sim = tanimoto_matrix(h_fps, p_fps)
                ri, ci = np.nonzero(sim >= threshold)
                hs, ps = h_ids[ri], p_ids[ci]
                lt = hs < ps          # np.minimum lacks a str ufunc loop
                lo_ids = np.where(lt, hs, ps)
                hi_ids = np.where(lt, ps, hs)
                neq = lo_ids != hi_ids
                a_out.append(lo_ids[neq]); b_out.append(hi_ids[neq])
                s_out.append(np.round(sim[ri, ci][neq], 6))
        if not a_out:
            return empty
        return pa.table({
            "a": pa.array(np.concatenate(a_out)),
            "b": pa.array(np.concatenate(b_out)),
            "tanimoto": pa.array(np.concatenate(s_out), pa.float64()),
        })

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.select_columns([id_col, fp_col]).map_batches(
            expand, batch_format="pyarrow"),
        "__b", score_bucket)


def _tanimoto_pairs_broadcast(ds, id_col: str, fp_col: str,
                              threshold: float):
    import ray

    full = pa.concat_tables(
        list(ds.select_columns([id_col, fp_col]).iter_batches(
            batch_format="pyarrow", batch_size=None)))
    all_ids = np.asarray(full[id_col].to_pylist())
    all_fps = np.asarray(full[fp_col].to_pylist(), np.uint64)
    ref = ray.put({"ids": all_ids, "fps": all_fps})

    def score(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        ids = np.asarray(t[id_col].to_pylist())
        fps = np.asarray(t[fp_col].to_pylist(), np.uint64)
        sim = tanimoto_matrix(fps, st["fps"])
        ri, ci = np.nonzero(sim >= threshold)
        keep = ids[ri] < st["ids"][ci]          # a < b, no self/dup pairs
        ri, ci = ri[keep], ci[keep]
        return pa.table({
            "a": pa.array(ids[ri]),
            "b": pa.array(st["ids"][ci]),
            "tanimoto": pa.array(np.round(sim[ri, ci], 6)),
        })

    return ds.select_columns([id_col, fp_col]).map_batches(
        score, batch_format="pyarrow")
