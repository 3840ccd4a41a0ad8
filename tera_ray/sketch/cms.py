"""Count-Min Sketch (Cormode & Muthukrishnan 2005): fixed-size mergeable
frequency summary — point-frequency estimates over a 100 TB stream with
d×w counters instead of a per-key shuffle.

Deterministic like the HLL sketch (salted FNV row hashes, no RNG): the
whole pipeline — counters AND estimates — is reproducible in DuckDB SQL
(see the ``events_cms_counts`` oracle).

Plan: per-batch (row, col, cnt) partials over the batch's value counts
(combiner — ≤ d × distinct-in-batch rows) → grouped sum by (row, col)
(≤ d·w rows total cross the shuffle) → estimates for probe keys from
the driver-resident sketch (min over rows; always an over-estimate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _row_hash(strs: np.ndarray, row: int) -> np.ndarray:
    """Salted FNV-1a + finalizer for one sketch row: hashes the string
    ``value|row`` so rows are independent; same construction in SQL."""
    from ..text.analysis import _fnv1a_u64
    from .hll import _mix64

    salted = np.array([f"{s}|{row}" for s in strs], dtype=object)
    return _mix64(_fnv1a_u64(salted))


def cms_counters(ds, col: str, depth: int = 4, width: int = 2048):
    """Merged CMS counter Dataset ``(row, col, cnt)`` for ``col``."""
    from ..query.relational import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[col], pa.string())
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        v = v.drop_null()
        if len(v) == 0:
            return pa.table({"row": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(v)
        uniq = vc.field("values").to_numpy(zero_copy_only=False)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        rows, cols, cs = [], [], []
        for j in range(depth):
            h = _row_hash(uniq, j)
            c = (h % np.uint64(width)).astype(np.int64)
            # fold per-batch collisions within a row (combiner)
            cset, inv = np.unique(c, return_inverse=True)
            summed = np.zeros(len(cset), np.int64)
            np.add.at(summed, inv, cnts)
            rows.append(np.full(len(cset), j, np.int64))
            cols.append(cset)
            cs.append(summed)
        return pa.table({"row": pa.array(np.concatenate(rows)),
                         "col": pa.array(np.concatenate(cols)),
                         "cnt": pa.array(np.concatenate(cs))})

    return grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["row", "col"], [("cnt", "sum", "cnt")])


def cms_point_estimates(ds, col: str, probes: list,
                        depth: int = 4, width: int = 2048):
    """One row per probe key: ``(key, est_cnt)`` — min over the sketch
    rows (the classic over-estimate bound: err ≤ εN w.p. 1-δ,
    ε = e/width, δ = e^-depth).  Only the ≤ d·w counter rows reach the
    driver."""
    import ray.data

    sk = pa.concat_tables(list(cms_counters(ds, col, depth, width)
                               .iter_batches(batch_format="pyarrow",
                                             batch_size=None)))
    counters = {}
    for r, c, n in zip(sk["row"].to_pylist(), sk["col"].to_pylist(),
                       sk["cnt"].to_pylist()):
        counters[(r, c)] = n
    keys = np.array([str(k) for k in probes], dtype=object)
    ests = []
    for j in range(depth):
        h = _row_hash(keys, j)
        cols = (h % np.uint64(width)).astype(np.int64)
        ests.append(np.array([counters.get((j, int(c)), 0) for c in cols],
                             np.int64))
    est = np.min(np.stack(ests), axis=0)
    return ray.data.from_arrow(pa.table({
        "key": pa.array([str(k) for k in probes], pa.string()),
        "est_cnt": pa.array(est)}))
