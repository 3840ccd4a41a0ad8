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
                   threshold: float = 0.7):
    """fingerprints → (a, b, tanimoto) pairs with similarity ≥ threshold
    (a < b).  The full (small) fingerprint table broadcasts via
    ``ray.put``; each batch scores only its own rows against it."""
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
