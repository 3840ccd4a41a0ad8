"""Mapping tables: (src, dst, score) Datasets (SURVEY T1, J1, J6, A3).

The reference holds alignments as driver dicts with a ``'no mapping'``
sentinel and a *destructive* ``pop(0)`` per lookup
(``tera/DataIntegration.py:45-86``); the engine's mapping is a Dataset
(or small broadcast dict) of ``(src, dst, score)`` rows with nulls for
misses and a deterministic best-by-(score desc, dst asc) instead of the
destructive quirk (SURVEY §7.4 — documented, not reproduced).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

DEFAULT_JOIN_PARTITIONS = 32


def join_partitions(requested: int | None = None) -> int:
    """Join-partition count sized to the cluster.

    Ray's hash-shuffle join schedules ``num_partitions`` aggregator
    actors; requesting more partitions than schedulable CPUs deadlocks
    the streaming executor on a small cluster (observed at 32 partitions
    / 4 CPUs).  Default: one partition per CPU, capped at
    ``DEFAULT_JOIN_PARTITIONS`` — callers with 100 TB inputs should pass
    an explicit larger value on a correspondingly larger cluster.
    """
    if requested is not None:
        return requested
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(DEFAULT_JOIN_PARTITIONS, cpus))


def _bucket(col, num_buckets: int) -> pa.Array:
    from ..stages.base import bucket_column

    return bucket_column(col, num_buckets)


def first_per_key(t: pa.Table, key: str, order: list[tuple[str, str]]) -> pa.Table:
    """Vectorized top-1 per key: sort by (key, *order), keep first row of
    each key run (A3 argmax with deterministic tie-break)."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(t, sort_keys=[(key, "ascending")] + order)
    t = t.take(idx)
    k = t[key].combine_chunks()
    if len(k) == 1:
        return t
    first = pa.concat_arrays(
        [pa.array([True]), pc.not_equal(k.slice(1), k.slice(0, len(k) - 1))]
    )
    return t.filter(first)


def best_per_src(ds, key: str = "src", num_buckets: int = 64):
    """Distributed A3: hash-bucket by key, vectorized top-1 per bucket.

    Keeps max score; ties break on lexically-smallest dst — the
    deterministic replacement for the reference's order-dependent
    ``extractOne`` + ``pop(0)`` (``DataIntegration.py:82,266-271``).
    """

    def add_b(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket(t[key], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        return first_per_key(
            t, key, [("score", "descending"), ("dst", "ascending")]
        ).drop_columns(["__b"])

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)


def threshold(ds, min_score: float):
    """Score filter (SURVEY K3; ``DataIntegration.py:206-207,228-229``)."""
    return ds.filter(expr=f"score >= {min_score!r}")


def invert(ds):
    """Reverse mapping (``DataIntegration.py:66-70``)."""

    def flip(t: pa.Table) -> pa.Table:
        cols = {"src": t["dst"], "dst": t["src"]}
        for c in t.schema.names:
            if c not in ("src", "dst"):
                cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(flip, batch_format="pyarrow")


def compose(a, b, num_partitions: int | None = None):
    """Multi-hop id conversion (J1, ``tera/DataAccess.py:262-308``):
    ``a: x→y`` ∘ ``b: y→z`` ⇒ ``x→z`` with combined (min) score."""
    a2 = a.map_batches(
        lambda t: pa.table({"src": t["src"], "mid": t["dst"], "score_a": t["score"]}),
        batch_format="pyarrow",
    )
    b2 = b.map_batches(
        lambda t: pa.table({"mid": t["src"], "dst": t["dst"], "score_b": t["score"]}),
        batch_format="pyarrow",
    )
    j = a2.join(b2, join_type="inner",
                num_partitions=join_partitions(num_partitions), on=("mid",))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "score": pc.min_element_wise(t["score_a"], t["score_b"]),
            }
        )

    return j.map_batches(fin, batch_format="pyarrow")


def to_dict(ds) -> dict[str, str]:
    """Materialize a (small) best-mapping to a broadcastable dict."""
    out = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        for s, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            out.setdefault(s, d)
    return out


def apply_dict_column(
    ds, mapping_ref, columns: list[str], only_when=None
):
    """Broadcast join: rewrite ``columns`` through a ``ray.put`` dict —
    the small-side path of the M19/J1 rewrite (no shuffle; the dict is
    fetched once per task from the local object store)."""

    def rewrite(t: pa.Table) -> pa.Table:
        m = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        out = {}
        for name in t.schema.names:
            col = t[name]
            if name in columns:
                # Pure-Arrow rewrite: dictionary-encode the column, map
                # only the DISTINCT values through the dict (Python cost
                # = cardinality, not rows), then take back out — no
                # object-dtype pandas round-trip.
                arr = col.combine_chunks().cast(pa.string())
                enc = arr.dictionary_encode()
                vals = enc.dictionary.to_pylist()
                repl = [m.get(v) for v in vals]
                repl_arr = pa.array(
                    [r if r is not None else v for v, r in zip(vals, repl)],
                    type=pa.string())
                hit = pa.array([r is not None for r in repl], type=pa.bool_())
                mapped = pc.take(repl_arr, enc.indices)
                hit_full = pc.fill_null(pc.take(hit, enc.indices), False)
                if only_when is not None:
                    gate = only_when(t)
                    if isinstance(gate, np.ndarray):
                        gate = pa.array(gate)
                    hit_full = pc.and_(hit_full, pc.fill_null(gate, False))
                col = pc.if_else(hit_full, mapped, arr)
            out[name] = col
        return pa.table(out)

    return ds.map_batches(rewrite, batch_format="pyarrow")
