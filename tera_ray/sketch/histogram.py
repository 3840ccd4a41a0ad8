"""Fixed-width binned histogram: a mergeable quantile sketch.

The exact per-group quantiles in ``query/relational`` shuffle every row;
at 100 TB that is the whole corpus through the object store.  This
sketch crosses the shuffle with at most ``num_bins`` rows per input
block (per-batch combiner) and at most ``num_bins`` rows total after the
merge — quantile estimates with error bounded by one bin width for the
cost of a metadata-sized exchange.

Deterministic by construction (no RNG, pure float64 arithmetic shared
with SQL): the estimate for quantile ``q`` is the LOWER EDGE of the
first bin whose cumulative count reaches ``ceil(q * n)``, so the whole
pipeline is bit-reproducible in DuckDB (see the
``lineitem_hist_quantiles`` oracle in ``__ray_entry__.py``).

Values below ``lo`` clamp into bin 0 and values at/above
``lo + width * num_bins`` clamp into the last bin — the sketch never
drops rows, it only loses resolution at the tails (same contract both
sides of the oracle).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def histogram_counts(ds, col: str, lo: float, width: float,
                     num_bins: int):
    """Merged bin-count Dataset ``(bin, c)`` for numeric ``col``.

    Per-batch ``np.bincount`` combiner (≤ ``num_bins`` rows per block
    cross the shuffle) → grouped sum by bin.  Nulls are dropped;
    out-of-range values clamp to the edge bins.
    """
    from ..query.relational import grouped_agg

    lo_f, w_f = float(lo), float(width)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bin": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        x = pc.cast(t[col], pa.float64())
        x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
        x = x.drop_null()
        if len(x) == 0:
            return empty
        xs = x.to_numpy(zero_copy_only=False)
        bins = np.clip(np.floor((xs - lo_f) / w_f), 0,
                       num_bins - 1).astype(np.int64)
        counts = np.bincount(bins, minlength=0)
        nz = np.nonzero(counts)[0]
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "c": pa.array(counts[nz].astype(np.int64))})

    return grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["bin"], [("c", "sum", "c")])


def histogram_quantiles(ds, col: str, qs: list[float], lo: float,
                        width: float, num_bins: int):
    """One row per requested quantile: ``(q, est)``.

    Only the ≤ ``num_bins`` merged counter rows reach the driver; the
    cumulative scan over them is O(num_bins).  ``est`` is the lower
    edge ``lo + width * bin`` of the first bin whose cumulative count
    reaches ``ceil(q * n)`` (n = non-null row count).
    """
    import ray.data

    hist = pa.concat_tables(
        list(histogram_counts(ds, col, lo, width, num_bins)
             .iter_batches(batch_format="pyarrow", batch_size=None)))
    hist = hist.sort_by("bin")
    bins = hist["bin"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(hist["c"].to_numpy(zero_copy_only=False))
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_est = [], []
    for q in qs:
        target = math.ceil(q * n)
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, len(bins) - 1) if len(bins) else 0
        out_q.append(float(q))
        out_est.append(float(lo) + float(width) * float(bins[i])
                       if len(bins) else float("nan"))
    return ray.data.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "est": pa.array(out_est, pa.float64())}))


def grouped_histogram_quantiles(ds, key: str, col: str, qs: list[float],
                                lo: float, width: float, num_bins: int,
                                num_buckets: int = 64):
    """Per-key approximate quantiles from per-key histogram sketches:
    one row per ``(key, q)`` with the bin-lower-edge estimate — the
    grouped analog of :func:`histogram_quantiles`.

    The exact ``grouped_quantiles`` (query/relational) shuffles every
    row of every group; this sketch's shuffle carries at most
    ``keys × bins-touched`` counter rows (per-batch combiner), so
    per-domain percentiles over 100 TB cost a metadata-sized exchange.
    Same deterministic bin-space contract as the global sketch, so the
    whole pipeline is SQL-bit-reproducible (window cumsum per key).
    """
    from ..query.relational import grouped_agg
    from ..stages.base import bucketed_map_groups

    lo_f, w_f = float(lo), float(width)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          "bin": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        x = pc.cast(t[col], pa.float64())
        x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
        valid = pc.is_valid(x)
        t2 = t.filter(valid)
        if t2.num_rows == 0:
            return empty
        xs = pc.cast(t2[col], pa.float64()).to_numpy(zero_copy_only=False)
        bins = np.clip(np.floor((xs - lo_f) / w_f), 0,
                       num_bins - 1).astype(np.int64)
        # combiner: fold (key, bin) within the batch via Arrow group_by
        g = (pa.table({key: t2[key], "bin": pa.array(bins)})
             .group_by([key, "bin"], use_threads=False)
             .aggregate([([], "count_all")]))
        return pa.table({key: g[key], "bin": g["bin"],
                         "c": g["count_all"].cast(pa.int64())})

    counts = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         [key, "bin"], [("c", "sum", "c")])

    def add_b(t: pa.Table) -> pa.Table:
        from ..query.relational import _bucket_of

        return t.append_column("__b", _bucket_of(t[key], num_buckets))

    def per_key_quantiles(t: pa.Table) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          "q": pa.array([], pa.float64()),
                          "est": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([(key, "ascending"), ("bin", "ascending")])
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        bins = t["bin"].to_numpy(zero_copy_only=False)
        cs = t["c"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate([[True], kv[1:] != kv[:-1]]))
        bounds = np.concatenate([starts, [len(kv)]])
        out_k, out_q, out_e = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            cum = np.cumsum(cs[s:e])
            n = int(cum[-1])
            for q in qs:
                i = int(np.searchsorted(cum, math.ceil(q * n), "left"))
                i = min(i, e - s - 1)
                out_k.append(kv[s])
                out_q.append(float(q))
                out_e.append(lo_f + w_f * float(bins[s + i]))
        return pa.table({key: pa.array(out_k, t.schema.field(key).type),
                         "q": pa.array(out_q, pa.float64()),
                         "est": pa.array(out_e, pa.float64())})

    return bucketed_map_groups(
        counts.map_batches(add_b, batch_format="pyarrow"),
        "__b", lambda t: per_key_quantiles(
            t.drop_columns(["__b"]) if "__b" in t.schema.names else t))


def quantile_band_filter(ds, col: str, q_lo: float, q_hi: float,
                         lo: float, width: float, num_bins: int):
    """Sketch-driven tail trimming: keep rows whose ``col`` falls in the
    corpus's [q_lo, q_hi] quantile band — the adaptive version of a
    hard-coded "drop docs shorter than X / longer than Y" curation rule
    (thresholds follow the corpus instead of a magic constant).

    Two passes, both streaming: the histogram sketch (≤ ``num_bins``
    rows to the driver) fixes the band's covering bins, then a map-side
    filter keeps rows whose clamped bin lies between them — no second
    shuffle, and the kept set is deterministic because the band is
    defined in bin space (same contract as the SQL oracle).
    """
    qs = histogram_quantiles(ds, col, [q_lo, q_hi], lo, width, num_bins)
    edges = {r["q"]: r["est"] for r in qs.take_all()}
    b_lo = int(round((edges[q_lo] - lo) / width))
    b_hi = int(round((edges[q_hi] - lo) / width))
    lo_f, w_f = float(lo), float(width)

    def keep(t: pa.Table) -> pa.Table:
        x = pc.cast(t[col], pa.float64())
        x = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
        xs = x.to_numpy(zero_copy_only=False)
        bins = np.clip(np.floor((xs - lo_f) / w_f), 0, num_bins - 1)
        m = (bins >= b_lo) & (bins <= b_hi) & ~np.isnan(xs)
        return t.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")
