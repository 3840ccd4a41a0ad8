"""Scalar int8 embedding quantization (engine-first addition).

The memory lever for 100 TB vector search: a float32 embedding column
is 4 bytes/dim; per-vector symmetric int8 quantization stores 1
byte/dim plus one float scale — 4× less object-store/shuffle volume
for ANN candidate generation, with exact re-scoring reserved for the
final top-k (the standard two-stage IVF/SQ design).

Quantization is a pure per-row kernel (zero shuffle) and deterministic:

    scale = max(|x|) / 127          (0 → scale 0, all-zero codes)
    q_i   = floor(x_i / scale + 0.5)   computed in float64

``floor(x + 0.5)`` is used instead of banker's/away rounding so the
SQL oracle reproduces every code bit-for-bit with the same formula.
Dequantized search: cosine on ``q * scale`` — recall vs exact search
is asserted in tests (fixture recall@10 ≥ 0.9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregate import _flat_f64


def quantize_batch(t: pa.Table, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pa.Table:
    """→ ``(id, q list<int8>, scale double)`` per row."""
    vc = t[vec_col]
    vtype = vc.type if not isinstance(vc, pa.ChunkedArray) else vc.type
    if t.num_rows == 0:
        # type the empty block from the input schema so concat with
        # non-empty blocks stays schema-stable (fixed-size input keeps
        # its dim; variable-size lists stay variable)
        d0 = vtype.list_size if pa.types.is_fixed_size_list(vtype) else None
        qt = pa.list_(pa.int8(), d0) if d0 else pa.list_(pa.int8())
        return pa.table({id_col: t[id_col],
                         "q": pa.array([], qt),
                         "scale": pa.array([], pa.float64())})
    mat, d = _flat_f64(t[vec_col])
    n = mat.shape[0]
    amax = np.abs(mat).max(axis=1)
    scale = amax / 127.0
    safe = np.where(scale > 0, scale, 1.0)
    q = np.floor(mat / safe[:, None] + 0.5)
    q = np.where(scale[:, None] > 0, q, 0.0)
    # |x| <= amax ⇒ |x/scale| <= 127 ⇒ codes fit int8 exactly
    q8 = q.astype(np.int8)
    return pa.table({
        id_col: t[id_col],
        "q": pa.array(list(q8), pa.list_(pa.int8(), d)),
        "scale": pa.array(scale, pa.float64()),
    })


def scalar_quantize(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Dataset of per-row int8 codes + scales (map-side only)."""
    return ds.select_columns([id_col, vec_col]).map_batches(
        lambda t: quantize_batch(t, id_col, vec_col),
        batch_format="pyarrow")


def dequantized_topk(ds, qids, Q, k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding", concurrency=None):
    """Brute-force cosine top-k over the QUANTIZED representation:
    quantize per batch, dequantize (``q * scale``), score against the
    broadcast float64 query matrix — the candidate-generation stage of
    a two-stage search (re-score survivors on exact floats upstream).

    Same plan shape as :func:`..ann.search.brute_topk` (local top-k per
    block, tiny merge shuffle); the quantization halves nothing here on
    a single box but is the 4× shuffle/memory saver once codes are the
    PERSISTED representation.
    """
    from .search import BruteScorer, _merge_topk, make_query_ref

    import ray  # noqa: F401  (ray.put inside make_query_ref)

    ref = make_query_ref(qids, Q, dtype=np.float64)

    class _QuantScorer(BruteScorer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64())})
            qt = quantize_batch(batch, self.id_col, self.vec_col)
            codes = qt["q"]
            if isinstance(codes, pa.ChunkedArray):
                codes = codes.combine_chunks()
            n = len(codes)
            d = codes.type.list_size
            deq = (codes.values.to_numpy(zero_copy_only=False)
                   .reshape(n, d).astype(np.float64)
                   * qt["scale"].to_numpy(zero_copy_only=False)[:, None])
            return super().__call__(pa.table({
                self.id_col: qt[self.id_col],
                self.vec_col: pa.array(list(deq.astype(np.float32)),
                                       pa.list_(pa.float32(), d)),
            }))

    kwargs = dict(batch_format="pyarrow",
                  concurrency=concurrency if concurrency is not None
                  else (1, 8))
    local = ds.select_columns([id_col, vec_col]).map_batches(
        _QuantScorer,
        fn_constructor_kwargs={"queries_ref": ref, "k": k,
                               "id_col": id_col, "vec_col": vec_col},
        **kwargs)
    return _merge_topk(local, k, id_col)
