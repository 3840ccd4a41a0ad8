"""Distributed k-means over an embedding column (engine-first addition).

The reference has no vector columns; this is the clustering counterpart
of ``ann/search.py`` (which k-means-trains IVF centroids on a DRIVER
sample only).  Here the full dataset participates:

- :func:`kmeans_assign` — one broadcast-centroid pass: every batch
  computes exact L2 distances to the (tiny, ``ray.put``-broadcast)
  centroid matrix and emits ``(id, cluster)``.  No shuffle at all.
- :func:`kmeans_lloyd` — Lloyd iterations: assign → per-batch partial
  (sum, count) scatter per (cluster, dim) → combiner-first
  ``grouped_agg`` shuffle over ``k × dims`` rows (kilobytes, never the
  vectors) → driver updates the k×d centroid matrix (small by
  construction) → re-broadcast.  Per-iteration data motion is one read
  of the embedding table plus an O(k·d·blocks) partial shuffle — the
  standard scalable Lloyd decomposition.

Distances are computed elementwise in float64 — ``sum((x - c)^2)`` —
matching SQL ``list_distance(x::DOUBLE[], c::DOUBLE[])`` arithmetic
(the ``‖x‖² − 2x·c`` matmul form is faster but rounds differently;
with k ≤ a few hundred the elementwise form is still one vectorized
kernel per batch).  Ties (exact-duplicate distances) break to the
smallest centroid id, mirroring a ``min(cid) ... QUALIFY dist =
min(dist) OVER (PARTITION BY id)`` oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .aggregate import _flat_f64


class _AssignStage:
    """Actor-pool stage: nearest-centroid assignment against the
    broadcast centroid matrix (fetched once per actor in ``__init__``)."""

    def __init__(self, cent_ref, id_col: str, vec_col: str,
                 keep_vec: bool = False):
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.cids = np.asarray(c["cids"], np.int64)
        self.C = np.asarray(c["C"], np.float64)          # (k, d)
        self.id_col = id_col
        self.vec_col = vec_col
        self.keep_vec = keep_vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat, d = _flat_f64(batch[self.vec_col])
        n = mat.shape[0]
        if n == 0:
            cols = {self.id_col: batch[self.id_col],
                    "cluster": pa.array([], pa.int64())}
            if self.keep_vec:
                cols[self.vec_col] = batch[self.vec_col]
            return pa.table(cols)
        # (n, k, d) elementwise — float64, ordered like the SQL oracle.
        # Chunked so the temp stays ≤ ~32M doubles regardless of k·d
        # (a 4096-row batch at k=256, d=1024 would otherwise be 8 GiB).
        k, d = self.C.shape
        step = max(1, (32 << 20) // max(1, k * d))
        big = np.iinfo(np.int64).max
        pick = np.empty(n, np.int64)
        for s in range(0, n, step):
            diff = mat[s:s + step, None, :] - self.C[None, :, :]
            d2 = np.einsum("nkd,nkd->nk", diff, diff)
            dmin = d2.min(axis=1)
            # smallest centroid id among exact-min ties
            tie = d2 == dmin[:, None]
            pick[s:s + step] = np.where(tie, self.cids[None, :],
                                        big).min(axis=1)
        cols = {self.id_col: batch[self.id_col],
                "cluster": pa.array(pick, pa.int64())}
        if self.keep_vec:
            cols[self.vec_col] = batch[self.vec_col]
        return pa.table(cols)


def make_centroid_ref(cids, C) -> "ray.ObjectRef":
    return ray.put({"cids": np.asarray(cids, np.int64),
                    "C": np.asarray(C, np.float64)})


def kmeans_assign(ds, cids, C, id_col: str = "vec_id",
                  vec_col: str = "embedding", keep_vec: bool = False,
                  concurrency=None):
    """Assign every row to its nearest (L2) centroid → ``(id, cluster)``
    (plus the vector column when ``keep_vec`` — the Lloyd-update input)."""
    ref = make_centroid_ref(cids, C)
    cols = [id_col, vec_col]
    return ds.select_columns(cols).map_batches(
        _AssignStage,
        fn_constructor_kwargs={"cent_ref": ref, "id_col": id_col,
                               "vec_col": vec_col, "keep_vec": keep_vec},
        batch_format="pyarrow",
        concurrency=concurrency if concurrency is not None else (1, 8))


def _means_from_rows(rows: list[dict], k_expected: int, d: int,
                     prev: np.ndarray, prev_ids: np.ndarray):
    """(cluster, dim, mean) rows → (k, d) matrix; clusters that lost all
    members keep their previous centroid (standard Lloyd empty-cluster
    policy, deterministic)."""
    C = prev.copy()
    pos = {int(c): i for i, c in enumerate(prev_ids)}
    for r in rows:
        C[pos[int(r["cluster"])], int(r["dim"])] = r["mean"]
    return C


def kmeans_lloyd(ds, cids, C0, iters: int = 3, id_col: str = "vec_id",
                 vec_col: str = "embedding", round_digits: int | None = None):
    """``iters`` Lloyd rounds from centroids ``C0``; returns
    ``(final_centroid_matrix, assignment_dataset)`` where the assignment
    is one extra pass with the final centroids.

    Each round re-reads ``ds`` once (streaming; at 100 TB pin the input
    with ``ds = ds.materialize()`` upstream if object-store capacity
    allows, else rely on Parquet re-reads) and shuffles only
    ``k × dims × blocks`` partial sums.  The k×d centroid update is the
    only driver-side state — small by construction.
    """
    from .aggregate import vector_group_mean

    cids = np.asarray(cids, np.int64)
    C = np.asarray(C0, np.float64)
    d = C.shape[1]
    for _ in range(iters):
        assigned = kmeans_assign(ds, cids, C, id_col=id_col,
                                 vec_col=vec_col, keep_vec=True)
        mean_rows = vector_group_mean(
            assigned, key="cluster", vec_col=vec_col,
            round_digits=round_digits).take_all()     # k×d rows — tiny
        C = _means_from_rows(mean_rows, len(cids), d, C, cids)
    return C, kmeans_assign(ds, cids, C, id_col=id_col, vec_col=vec_col)


def seed_centroids(ds, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Deterministic seeds: the rows with ids ``0..k-1`` (a filtered
    point read — no sort; the id predicate prunes at the scan when ids
    correlate with file order, else it is one cheap filter pass)."""
    rows = (ds.select_columns([id_col, vec_col])
            .filter(expr=f"{id_col} < {k}")
            .take_all())
    rows.sort(key=lambda r: r[id_col])
    cids = np.array([r[id_col] for r in rows], np.int64)
    C = np.array([r[vec_col] for r in rows], np.float64)
    return cids, C
