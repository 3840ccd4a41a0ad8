"""Distributed PCA over an embedding column (engine-first addition).

The reference has no vector columns; this completes the embedding
toolbox (search / k-means / quantize / semdedup) with the standard
dimensionality-reduction pass a 100 TB embedding table needs before
IVF training or visualization.

Decomposition (the classic one-pass moments plan):

- **fit** — each batch emits ONE mergeable partial ``(n, Σx, ΣxᵀX)``
  (count, per-dim sum, d×d Gram in float64: fixed size, independent of
  batch rows); the driver sums the tiny partial rows — O(blocks · d²)
  floats, never the vectors — forms the sample covariance
  ``(Σxᵀx − n·μμᵀ)/(n−1)`` and eigendecomposes the d×d matrix
  locally (``numpy.linalg.eigh``; d is small by construction).
  Component signs are canonicalized (largest-|entry| coordinate made
  positive) so results are deterministic across runs and block orders.
- **transform** — the (k×d) component matrix broadcasts via
  ``ray.put``; each batch is one float64 matmul in an actor-pool
  stage.  No shuffle anywhere in fit or transform.

The per-dimension moments the same partials produce are exposed as
:func:`vector_dim_stats` — SQL-checkable (``avg`` / ``var_samp`` per
dimension), giving the oracled evidence that the distributed moment
pass is correct while the eigendecomposition itself stays a
rows-only surface (no SQL eigensolver).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .aggregate import _flat_f64

__all__ = ["pca_fit", "pca_transform", "vector_dim_stats"]


def _moment_partials(ds, vec_col: str):
    """Dataset of one-row batches ``(n, s list<double>, g list<double>)``
    — count, per-dim sum, flattened d×d Gram — one row per input batch."""

    def partial(t: pa.Table) -> pa.Table:
        X, d = _flat_f64(t[vec_col])
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "g": pa.array([(X.T @ X).reshape(-1).tolist()],
                          pa.list_(pa.float64())),
        })

    return ds.map_batches(partial, batch_format="pyarrow")


def _reduce_moments(ds, vec_col: str):
    """Driver-sum of the moment partials → (n, sum vec, Gram matrix)."""
    n, s, g = 0, None, None
    for b in _moment_partials(ds, vec_col).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for row in b.to_pylist():
            if row["n"] == 0:
                continue
            n += row["n"]
            sv = np.asarray(row["s"], np.float64)
            gv = np.asarray(row["g"], np.float64)
            s = sv if s is None else s + sv
            g = gv if g is None else g + gv
    if n == 0:
        raise ValueError("PCA over an empty dataset")
    d = s.shape[0]
    return n, s, g.reshape(d, d)


def pca_fit(ds, vec_col: str = "embedding", k: int = 8):
    """Fit PCA on ``vec_col``; returns ``(mean (d,), components (k,d),
    explained_variance (k,))`` as float64 numpy arrays, components in
    descending-eigenvalue order with canonical signs."""
    n, s, g = _reduce_moments(ds, vec_col)
    d = s.shape[0]
    k = min(k, d)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    w, v = np.linalg.eigh(cov)              # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T                   # (k, d)
    evar = w[order]
    # canonical sign: the largest-|entry| coordinate is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, evar


class _ProjectStage:
    """Actor-pool stage: center + project against the broadcast
    (mean, components) — fetched once per actor."""

    def __init__(self, ref, id_col: str, vec_col: str, out_col: str,
                 round_digits: int | None):
        m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.mu = np.asarray(m["mu"], np.float64)
        self.C = np.asarray(m["C"], np.float64)          # (k, d)
        self.id_col, self.vec_col = id_col, vec_col
        self.out_col, self.round_digits = out_col, round_digits

    def __call__(self, t: pa.Table) -> pa.Table:
        X, _ = _flat_f64(t[self.vec_col])
        Y = (X - self.mu) @ self.C.T
        if self.round_digits is not None:
            Y = np.round(Y, self.round_digits)
        return pa.table({
            self.id_col: t[self.id_col],
            self.out_col: pa.array(Y.tolist(), pa.list_(pa.float64())),
        })


def pca_transform(ds, mean, components, id_col: str = "vec_id",
                  vec_col: str = "embedding", out_col: str = "pca",
                  round_digits: int | None = 6,
                  concurrency: int | None = None):
    """Project ``vec_col`` onto fitted components →
    ``(id_col, out_col list<double>)``.  ``round_digits`` stabilizes
    float64 summation order differences across block layouts."""
    ref = ray.put({"mu": np.asarray(mean, np.float64),
                   "C": np.asarray(components, np.float64)})
    return ds.map_batches(
        _ProjectStage,
        fn_constructor_kwargs={"ref": ref, "id_col": id_col,
                               "vec_col": vec_col, "out_col": out_col,
                               "round_digits": round_digits},
        batch_format="pyarrow",
        concurrency=(1, concurrency) if concurrency else (1, 8))


def vector_dim_stats(ds, vec_col: str = "embedding",
                     round_digits: int = 6):
    """Per-dimension ``(dim, mean, var)`` (sample variance) from the
    SAME mergeable moment partials PCA consumes — the SQL-checkable
    face of the distributed moment pass.  Returns a driver-small
    ``pyarrow.Table`` (d rows)."""
    n, s, g = _reduce_moments(ds, vec_col)
    mu = s / n
    var = (np.diag(g) - n * mu * mu) / max(n - 1, 1)

    def r(x):
        return np.round(x, round_digits)

    d = s.shape[0]
    return pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "mean": pa.array(r(mu), pa.float64()),
        "var": pa.array(r(var), pa.float64()),
    })
