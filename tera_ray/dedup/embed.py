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
    if len(col) == 0:
        # reshape(0, -1) is invalid; recover the width from the type
        # (fixed-size lists carry it; plain lists default to 0 — callers
        # never index shape[1] when there are no rows to bucket/pair)
        width = getattr(col.type, "list_size", 0) or 0
        return np.zeros((0, width), dtype=dtype)
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


def semdedup(ds, cids=None, C=None, k: int = 8, threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             block: int = 2048):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embedding space, then prune WITHIN-cluster semantic duplicates —
    rows whose cosine similarity to an earlier row of the same cluster
    is ≥ ``threshold``.  Returns the kept rows as ``(id, cluster)``.

    Drop rule (deterministic, SQL-expressible): row *i* is dropped iff
    SOME row *j* with ``j.id < i.id`` in the SAME cluster has
    ``cosine(i, j) ≥ threshold``.  The paper keeps a random /
    farthest-from-centroid representative per duplicate neighborhood;
    min-id is this engine's standard deterministic keeper (cf.
    ``dedup/exact.py``) with the same reduction rate.

    Scale shape: the centroid matrix is tiny and broadcast once
    (``kmeans_assign`` — zero shuffle); the ONLY shuffle is one
    groupby(cluster) moving ``(id, vector)`` rows once; per-cluster
    similarity is a block-chunked float64 Gram product, so memory stays
    ``O(block × m_c)`` while compute is the unavoidable ``O(m_c²·d)``
    bounded by the cluster size — pick ``k`` so clusters stay ≲10⁵ rows
    at 100 TB (SemDeDup's own regime).  Pass precomputed ``(cids, C)``
    (e.g. from ``kmeans_lloyd``) to skip the deterministic head-row
    seeding used for oracle parity.
    """
    from ..ann.kmeans import kmeans_assign, seed_centroids
    from ..stages.base import bucketed_map_groups

    if C is None:
        cids, C = seed_centroids(ds, k, id_col=id_col, vec_col=vec_col)
    assigned = kmeans_assign(ds, cids, C, id_col=id_col, vec_col=vec_col,
                             keep_vec=True)

    def prune(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        v = _vecs(t, vec_col, dtype=np.float64)[order]
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        m = len(ids)
        dropped = np.zeros(m, dtype=bool)
        # block²-chunked lower-triangular scan: rows [s, e) against
        # ALL earlier rows (dropped or not — the rule is "exists
        # earlier neighbor", not "exists kept neighbor"); both Gram
        # dimensions are chunked so peak temp memory is O(block²)
        # regardless of cluster size
        for s in range(0, m, block):
            e = min(s + block, m)
            acc = dropped[s:e]
            for cs in range(0, e, block):
                ce = min(cs + block, e)
                sims = v[s:e] @ v[cs:ce].T             # (e-s, ce-cs)
                hit = sims >= threshold
                if ce > s:          # overlap: mask cols j ≥ row i
                    hit &= np.tril(np.ones((e - s, ce - cs), dtype=bool),
                                   k=s - cs - 1)
                acc |= hit.any(axis=1)
            dropped[s:e] = acc
        keep = ~dropped
        cl = t["cluster"].to_numpy(zero_copy_only=False)[order]
        return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                         "cluster": pa.array(cl[keep], pa.int64())})

    return bucketed_map_groups(assigned, "cluster", prune)
