"""Embedding-cosine near-duplicate detection (engine-first addition).

Random-hyperplane LSH (Charikar): sign of ``V @ H`` over ``b``
deterministic hyperplanes buckets vectors so that near-identical
directions collide; per-bucket exact cosine verifies.  To keep recall,
we probe ``n_tables`` independent hyperplane sets (each its own bucket
key) — a pair is a candidate if it collides in ANY table.

Shuffle profile: one groupby on (table, bucket) over (id, vector) rows —
vectors ship once per table.  For 100 TB-scale embedding stores, drop
``n_tables`` to 1-2 and raise ``bits``; or switch to the IVF path in
``tera_ray.ann``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _planes(dim: int, bits: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed + 7919 * table)
    return rng.standard_normal((dim, bits)).astype(np.float32)


def _vecs(t: pa.Table, vec_col: str, dtype=np.float32) -> np.ndarray:
    col = t[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, -1).astype(dtype)
    return col.values.to_numpy(zero_copy_only=False).reshape(
        len(col), -1).astype(dtype)


def cosine_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                     threshold: float = 0.95, bits: int = 16,
                     n_tables: int = 4, max_bucket: int = 1024,
                     dtype=np.float32):
    """embeddings → (a, b, cosine) pairs with cosine ≥ threshold.

    ``bits=0, n_tables=1`` degrades to ONE bucket = exact all-pairs
    (bounded by ``max_bucket``) — the small-scale / oracle-parity mode;
    ``dtype=np.float64`` bit-matches a float64 SQL oracle."""

    def bucketize(t: pa.Table) -> pa.Table:
        v = _vecs(t, vec_col).astype(dtype)
        norm = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.maximum(norm, 1e-12)
        ids = t[id_col].combine_chunks()
        keys, out_ids, out_vec = [], [], []
        for tb in range(n_tables):
            h = _planes(v.shape[1], bits, tb)
            signs = (v @ h) > 0
            key = np.zeros(len(v), np.uint64)
            for c in range(bits):
                key = (key << np.uint64(1)) | signs[:, c].astype(np.uint64)
            keys.append(key * np.uint64(n_tables) + np.uint64(tb))
            out_ids.append(ids)
            out_vec.append(v)
        flat = np.concatenate(out_vec)
        return pa.table({
            "bucket": pa.array(np.concatenate(keys), pa.uint64()),
            id_col: pa.concat_arrays(out_ids),
            "__v": pa.FixedSizeListArray.from_arrays(
                pa.array(flat.reshape(-1)), flat.shape[1]),
        })

    def pairs(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        v = _vecs(t, "__v", dtype=dtype)
        order = np.argsort(ids, kind="stable")
        ids, v = ids[order], v[order]
        uniq, first = np.unique(ids, return_index=True)
        ids, v = uniq, v[first]
        m = len(ids)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if m < 2:
            return empty
        if m > max_bucket:
            sims = v[:1] @ v[1:].T
            a_i = np.zeros(m - 1, np.int64)
            b_i = np.arange(1, m, dtype=np.int64)
            cs = sims[0]
        else:
            sims = v @ v.T
            iu = np.triu_indices(m, k=1)
            a_i, b_i = iu[0], iu[1]
            cs = sims[iu]
        keep = cs >= threshold
        return pa.table({"a": pa.array(ids[a_i[keep]], pa.int64()),
                         "b": pa.array(ids[b_i[keep]], pa.int64()),
                         "cosine": pa.array(cs[keep].astype(np.float64))})

    from .exact import dedup_exact

    from ..stages.base import bucketed_map_groups

    cand = bucketed_map_groups(
        ds.select_columns([id_col, vec_col])
        .map_batches(bucketize, batch_format="pyarrow"),
        "bucket", pairs)
    return dedup_exact(
        cand.map_batches(lambda t: t.append_column("__o", t["a"]),
                         batch_format="pyarrow"),
        keys=["a", "b"], order_by="__o").drop_columns(["__o"])
