"""Vector-column aggregation: per-group embedding centroids.

Engine-first addition (the reference has no vector columns at all):
the building block for IVF coarse re-training, per-source embedding
drift monitoring, and class prototypes.

Plan: per-batch partial (one ``np.add.at`` scatter over the batch's
unique keys — vectorized, no per-row loop) emits ``dims`` rows per
(batch, key); the merge is the standard combiner-first
``grouped_agg`` shuffle on (key, dim).  Shuffle volume is
``O(batches × keys × dims)`` — 8-byte sums, never the vectors
themselves, so a 100 TB embedding table moves only kilobytes per
block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_f64(vec_col) -> tuple[np.ndarray, int]:
    """list<float> column → (n, d) float64 matrix; asserts fixed dims."""
    if isinstance(vec_col, pa.ChunkedArray):
        vec_col = vec_col.combine_chunks()
    lens = pc.list_value_length(vec_col).to_numpy(zero_copy_only=False)
    assert len(lens) == 0 or (lens == lens[0]).all(), \
        "ragged embedding lengths"
    d = int(lens[0]) if len(lens) else 0
    flat = vec_col.flatten().cast(pa.float64()).to_numpy(
        zero_copy_only=False)
    # explicit (rows, d) shape: reshape(-1, 0) on an EMPTY batch raises,
    # so empty blocks (empty fragments / post-filter) must not crash
    return flat.reshape(len(lens), d), d


def vector_group_mean(ds, key: str, vec_col: str,
                      round_digits: int | None = 6):
    """Per-``key`` elementwise mean of ``vec_col`` → rows
    ``(key, dim int64, mean double)``.

    ``round_digits`` applies the engine's standard scale → round-half-
    even → unscale sequence so a SQL ``round_even(avg(..)*1e6)/1e6``
    oracle agrees to the bit; pass ``None`` for raw doubles.
    """
    from ..query.relational import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        mat, d = _flat_f64(t[vec_col])
        kv = t[key]
        if isinstance(kv, pa.ChunkedArray):
            kv = kv.combine_chunks()
        k_np = kv.to_numpy(zero_copy_only=False)
        if t.num_rows == 0 or d == 0:
            return pa.table({key: kv.slice(0, 0),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        uniq_idx = np.unique(k_np, return_inverse=True)[1]
        g = int(uniq_idx.max()) + 1
        sums = np.zeros((g, d), np.float64)
        np.add.at(sums, uniq_idx, mat)
        cnt = np.bincount(uniq_idx, minlength=g)
        # one representative row index per group, to carry the key value
        rep = np.zeros(g, np.int64)
        rep[uniq_idx[::-1]] = np.arange(len(k_np) - 1, -1, -1)
        return pa.table({
            key: kv.take(pa.array(np.repeat(rep, d))),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), g)),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(cnt, d).astype(np.int64)),
        })

    merged = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         [key, "dim"], [("s", "sum", "s"),
                                        ("n", "sum", "n")])

    def finish(t: pa.Table) -> pa.Table:
        mean = pc.divide(t["s"], pc.cast(t["n"], pa.float64()))
        if round_digits is not None:
            scale = pa.scalar(float(10 ** round_digits))
            mean = pc.divide(pc.round(pc.multiply(mean, scale), ndigits=0),
                             scale)
        return pa.table({key: t[key], "dim": t["dim"], "mean": mean})

    return merged.map_batches(finish, batch_format="pyarrow")
