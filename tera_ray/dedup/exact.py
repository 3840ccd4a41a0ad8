"""Exact deduplication over arbitrary key columns.

Generalizes the triple-dedup machinery (``stages/base.dedup_triples``,
mirroring the reference's rdflib set semantics, ``tera/DataAggregation.py:32``)
to any table: hash-partition on the key, keep the first row per key by a
deterministic order column (min ``order_by`` wins — NOT arrival order,
which is nondeterministic under parallel execution).

Scale notes: the only shuffle is the ``groupby(bucket)`` — bucket count
bounds per-task memory (dataset_bytes / num_buckets per task); a local
per-batch combiner dedups before the shuffle, so shuffle volume is the
distinct-key volume, not the raw input.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.base import hash_column


def dedup_exact(ds, keys: list[str], order_by: str,
                num_buckets: int | None = None):
    """Keep exactly one row per distinct ``keys`` combination — the row
    with the minimal ``order_by`` value (deterministic tie-break)."""
    from ..stages.base import _auto_buckets

    num_buckets = _auto_buckets(num_buckets)
    assert num_buckets & (num_buckets - 1) == 0, "power of 2"

    def first_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        import numpy as np

        idx = pc.sort_indices(
            t, sort_keys=[(k, "ascending") for k in list(keys) + [order_by]])
        t = t.take(idx)
        # sorted by (keys, order_by) ⇒ the first row of each key run is
        # the keeper.  Boundaries are detected PER KEY COLUMN and OR-ed:
        # a joined-string comparison would (a) nullify the whole tuple
        # when any key is null, merging distinct tuples like (null,'a')
        # vs (null,'b'), and (b) merge distinct keys containing the
        # separator byte (round-1 advisor finding).  Object-array
        # compare treats None == None as equal, matching SQL GROUP BY.
        starts = np.zeros(t.num_rows, dtype=bool)
        starts[0] = True
        for k in keys:
            v = t[k].combine_chunks().to_numpy(zero_copy_only=False)
            starts[1:] |= v[1:] != v[:-1]
        return t.filter(pa.array(starts))

    def local(t: pa.Table) -> pa.Table:
        t = first_per_key(t)
        h = hash_column(t, keys)
        b = pc.cast(pc.bit_wise_and(h, pa.scalar(num_buckets - 1, pa.uint64())),
                    pa.int32())
        return t.append_column("__b", b)

    def per_bucket(t: pa.Table) -> pa.Table:
        return first_per_key(t).drop_columns(["__b"])

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(local, batch_format="pyarrow"), "__b", per_bucket)
