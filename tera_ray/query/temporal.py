"""Temporal join and window operators the Dataset API lacks.

The reference engine is strictly batch-relational (SURVEY §2.10); a
training-data pipeline over event/transcript streams additionally needs
*time-aware* joins — as-of (latest-prior match), interval/band joins
(attribution windows) — and overlapping (sliding) window aggregates.
Ray Data has no native non-equi join, so each operator here is built
from the engine's standard shuffle primitive: ONE hash-bucket shuffle
on the join key, then a fully vectorized numpy merge inside each
bucket.  No per-row (or per-key) Python in any hot path.

Partitioning assumption (documented per the custom-operator contract):
all rows of one key hash to one bucket, so per-key time order is
resolvable bucket-locally.  ``num_buckets`` bounds per-task memory —
size it so (total join input / num_buckets) fits a worker heap; hot
keys skew a bucket but never break correctness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_i64(col) -> np.ndarray:
    """Timestamp/int column → int64 numpy (µs for timestamps)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    elif not pa.types.is_int64(col.type):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False)


def _typed_nulls(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def _side_schemas(left, right, left_types=None, right_types=None):
    """(name → pa type) maps for both Datasets.

    Pass ``left_types``/``right_types`` (dicts) when the caller knows
    them: ``Dataset.schema()`` on a LAZY pipeline executes a
    ``limit=1`` probe whose task cancellation can trip a Ray-core race
    (``task_manager.cc`` CHECK, observed on 2.49) — known-schema inputs
    (parquet reads, materialized datasets) are metadata-only and safe."""
    from ..stages.base import schema_of

    def types(ds, given):
        if given is not None:
            return dict(given)
        s = schema_of(ds)
        return dict(zip(s.names, s.types))

    return types(left, left_types), types(right, right_types)


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str],
              strict: bool = False, tolerance_us: int | None = None,
              how: str = "inner", right_tiebreak: list[str] | None = None,
              num_buckets: int = 64,
              left_types: dict | None = None,
              right_types: dict | None = None):
    """Backward as-of join: each left row matches the LAST right row of
    the same ``key`` with ``right_ts <= left_ts`` (``<`` when
    ``strict``), optionally within ``tolerance_us`` microseconds.

    Among right rows tied on the maximal admissible timestamp the match
    is the greatest under ``right_tiebreak`` (include a unique column
    for determinism; with per-key-unique timestamps ties cannot occur).

    Output columns: ``key, left_ts, left_cols…, right_ts, right_cols…``
    (``how="left"`` keeps unmatched left rows with null right columns).

    Mechanics: both sides are padded to a common schema, tagged and
    unioned; one hash-bucket shuffle on ``key`` co-locates each key;
    inside a bucket a single sort + cumulative-count numpy pass assigns
    every left row its predecessor right row — O((n+m) log(n+m)) per
    bucket, no per-key loop.  The reference has no temporal join at all
    (its joins are rdflib graph lookups, ``tera/DataAccess.py``); this
    operator is engine-first.
    """
    assert how in ("inner", "left")
    assert not (set(left_cols) & set(right_cols)), (
        "left_cols and right_cols must be disjoint (pre-rename one side)")
    right_tiebreak = right_tiebreak or []
    ltypes, rtypes = _side_schemas(left, right, left_types, right_types)
    lval = [c for c in left_cols if c != key and c != left_ts]
    rval = [c for c in right_cols if c != key and c != right_ts]
    rtb = [c for c in right_tiebreak if c in rval]

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], "__ts": t[left_ts].cast(pa.int64()),
                "__lts": t[left_ts]}
        for c in lval:
            cols[c] = t[c]
        cols["__rts"] = _typed_nulls(n, rtypes[right_ts])
        for c in rval:
            cols[c] = _typed_nulls(n, rtypes[c])
        cols["__src"] = pa.array(np.zeros(n, np.int8))
        tt = pa.table(cols)
        from ..stages.base import bucket_column
        return tt.append_column("__b", bucket_column(tt[key], num_buckets))

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], "__ts": t[right_ts].cast(pa.int64()),
                "__lts": _typed_nulls(n, ltypes[left_ts])}
        for c in lval:
            cols[c] = _typed_nulls(n, ltypes[c])
        cols["__rts"] = t[right_ts]
        for c in rval:
            cols[c] = t[c]
        cols["__src"] = pa.array(np.ones(n, np.int8))
        tt = pa.table(cols)
        from ..stages.base import bucket_column
        return tt.append_column("__b", bucket_column(tt[key], num_buckets))

    unioned = left.select_columns([key, left_ts] + lval).map_batches(
        tag_left, batch_format="pyarrow").union(
        right.select_columns([key, right_ts] + rval).map_batches(
            tag_right, batch_format="pyarrow"))

    out_schema = pa.schema(
        [(key, ltypes[key]), (left_ts, ltypes[left_ts])]
        + [(c, ltypes[c]) for c in lval]
        + [(right_ts, rtypes[right_ts])]
        + [(c, rtypes[c]) for c in rval])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        # ties on (key, ts): strict → left BEFORE right (equal-ts right
        # rows not counted as predecessors); inclusive → right first.
        src_dir = "ascending" if strict else "descending"
        sort_keys = ([(key, "ascending"), ("__ts", "ascending"),
                      ("__src", src_dir)]
                     + [(c, "ascending") for c in rtb])
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        src = t["__src"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        ts = _ts_i64(t["__ts"])
        is_r = src == 1
        cum = np.cumsum(is_r)
        li = np.flatnonzero(~is_r)
        r_pos = np.flatnonzero(is_r)
        cnt = cum[li]                      # right rows at or before each left
        valid = cnt > 0
        mp = r_pos[np.maximum(cnt - 1, 0)]
        same = valid & (k[mp] == k[li])
        if tolerance_us is not None:
            same = same & ((ts[li] - ts[mp]) <= tolerance_us)
        if how == "inner":
            li, mp = li[same], mp[same]
            same = np.ones(len(li), bool)
        lt = t.take(pa.array(li, pa.int64()))
        midx = pa.array(np.where(same, mp, -1), pa.int64()).cast(pa.int64())
        midx = pc.if_else(pc.greater_equal(midx, 0), midx, pa.scalar(None, pa.int64()))
        cols = {key: lt[key], left_ts: lt["__lts"]}
        for c in lval:
            cols[c] = lt[c]
        cols[right_ts] = pc.take(t["__rts"].combine_chunks(), midx)
        for c in rval:
            cols[c] = pc.take(t[c].combine_chunks(), midx)
        return pa.table(cols, schema=out_schema)

    from ..stages.base import bucketed_map_groups
    return bucketed_map_groups(unioned, "__b", merge)


def _count_lt(sorted_c: np.ndarray, sorted_v: np.ndarray,
              qc: np.ndarray, qv: np.ndarray, inclusive: bool) -> np.ndarray:
    """For each query pair (qc[i], qv[i]): count of sorted pairs
    (c, v) < query (``<=`` when inclusive).  ``sorted_*`` must be
    lex-sorted by (c, v).  Vectorized composite-key searchsorted via a
    merged lexsort — O((n+m) log(n+m)), no per-key loop."""
    n, m = len(sorted_c), len(qc)
    allc = np.concatenate([sorted_c, qc])
    allv = np.concatenate([sorted_v, qv])
    # tie order: exclusive → queries sort BEFORE equal data rows (equal
    # rows not counted); inclusive → after.
    tie = np.empty(n + m, np.int8)
    tie[:n], tie[n:] = (1, 0) if not inclusive else (0, 1)
    order = np.lexsort((tie, allv, allc))
    pos = np.empty(n + m, np.int64)
    pos[order] = np.arange(n + m)
    qpos = pos[n:]
    isq = np.zeros(n + m, bool)
    isq[pos[n:]] = True
    cq = np.cumsum(isq)
    return qpos - (cq[qpos] - 1)


def interval_join(points, intervals, key: str, ts: str,
                  start: str, end: str, max_width_us: int,
                  point_cols: list[str], interval_cols: list[str],
                  num_buckets: int = 64,
                  point_types: dict | None = None,
                  interval_types: dict | None = None):
    """Interval (band) join: every (point, interval) pair of the same
    ``key`` with ``start <= ts < end``.  ``max_width_us`` is the
    caller-guaranteed upper bound on interval width (``end - start``) —
    it bounds the candidate window so pair emission is linear in output
    size, the same contract DuckDB's IEJoin and Spark's range-join hint
    require.

    One hash-bucket shuffle on ``key``; per bucket the candidate range
    for each point is found with a composite-key merged searchsorted
    (``_count_lt``) over (key, start) and expanded with ``np.repeat`` —
    fully vectorized, then filtered by ``end > ts``.  Engine-first
    (the reference has no non-equi join).
    """
    assert not (set(point_cols) & set(interval_cols)), (
        "point_cols and interval_cols must be disjoint")
    ptypes, itypes = _side_schemas(points, intervals, point_types, interval_types)
    pval = [c for c in point_cols if c not in (key, ts)]
    ival = [c for c in interval_cols if c not in (key, start, end)]

    def tag_p(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], "__pts": t[ts],
                "__start": _typed_nulls(n, itypes[start]),
                "__end": _typed_nulls(n, itypes[end])}
        for c in pval:
            cols[c] = t[c]
        for c in ival:
            cols[c] = _typed_nulls(n, itypes[c])
        cols["__src"] = pa.array(np.zeros(n, np.int8))
        tt = pa.table(cols)
        from ..stages.base import bucket_column
        return tt.append_column("__b", bucket_column(tt[key], num_buckets))

    def tag_i(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {key: t[key], "__pts": _typed_nulls(n, ptypes[ts]),
                "__start": t[start], "__end": t[end]}
        for c in pval:
            cols[c] = _typed_nulls(n, ptypes[c])
        for c in ival:
            cols[c] = t[c]
        cols["__src"] = pa.array(np.ones(n, np.int8))
        tt = pa.table(cols)
        from ..stages.base import bucket_column
        return tt.append_column("__b", bucket_column(tt[key], num_buckets))

    unioned = points.select_columns([key, ts] + pval).map_batches(
        tag_p, batch_format="pyarrow").union(
        intervals.select_columns([key, start, end] + ival).map_batches(
            tag_i, batch_format="pyarrow"))

    out_schema = pa.schema(
        [(key, ptypes[key]), (ts, ptypes[ts])]
        + [(c, ptypes[c]) for c in pval]
        + [(start, itypes[start]), (end, itypes[end])]
        + [(c, itypes[c]) for c in ival])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        src = t["__src"].combine_chunks().to_numpy(zero_copy_only=False)
        pi = np.flatnonzero(src == 0)
        ii = np.flatnonzero(src == 1)
        if len(pi) == 0 or len(ii) == 0:
            return out_schema.empty_table()
        k = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        # factorize keys within the bucket so composite compares are int
        _, codes = np.unique(k, return_inverse=True)
        pts = _ts_i64(t["__pts"].combine_chunks().take(
            pa.array(pi, pa.int64())))
        ist = _ts_i64(t["__start"].combine_chunks().take(
            pa.array(ii, pa.int64())))
        ien = _ts_i64(t["__end"].combine_chunks().take(
            pa.array(ii, pa.int64())))
        pc_codes, ic_codes = codes[pi], codes[ii]
        iorder = np.lexsort((ist, ic_codes))
        ic_s, ist_s = ic_codes[iorder], ist[iorder]
        # candidates: intervals with start ∈ (ts - max_width, ts]
        lo = _count_lt(ic_s, ist_s, pc_codes, pts - max_width_us,
                       inclusive=True)
        hi = _count_lt(ic_s, ist_s, pc_codes, pts, inclusive=True)
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        prep = np.repeat(np.arange(len(pi)), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        cand = np.repeat(lo, counts) + offs
        keep = ien[iorder][cand] > pts[prep]
        prep, cand = prep[keep], cand[keep]
        pidx = pa.array(pi[prep], pa.int64())
        iidx = pa.array(ii[iorder[cand]], pa.int64())
        cols = {key: pc.take(t[key].combine_chunks(), pidx),
                ts: pc.take(t["__pts"].combine_chunks(), pidx)}
        for c in pval:
            cols[c] = pc.take(t[c].combine_chunks(), pidx)
        cols[start] = pc.take(t["__start"].combine_chunks(), iidx)
        cols[end] = pc.take(t["__end"].combine_chunks(), iidx)
        for c in ival:
            cols[c] = pc.take(t[c].combine_chunks(), iidx)
        return pa.table(cols, schema=out_schema)

    from ..stages.base import bucketed_map_groups
    return bucketed_map_groups(unioned, "__b", merge)


def sliding_window_agg(ds, ts_col: str, window_us: int, hop_us: int,
                       keys: list[str] | None = None,
                       aggs: list[tuple[str, str, str]] | None = None,
                       window_name: str = "window_start"):
    """Overlapping (hopping) time-window aggregation: windows start at
    every multiple of ``hop_us`` and span ``window_us`` (which must be a
    multiple of ``hop_us``); a row with timestamp ``ts`` lands in the
    ``window_us/hop_us`` windows covering it.  Same ``aggs`` spec as
    ``grouped_agg``; only non-empty windows are emitted.

    Scale shape: the per-batch combiner FIRST aggregates to hop
    granularity, THEN replicates the (small) partial states into their
    windows — the shuffle moves ``r×`` partials, never ``r×`` raw rows.
    """
    from .relational import grouped_agg
    assert window_us % hop_us == 0, "window must be a multiple of hop"
    r = window_us // hop_us
    keys = list(keys or [])
    aggs = list(aggs or [("*", "count", "n_events")])

    # hop-level partial: count→a count col, others pass through raw —
    # reuse grouped_agg's partial shape by pre-aggregating per batch.
    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type) or not pa.types.is_int64(ts.type):
            ts = ts.cast(pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False)
        hop = tsv - tsv % hop_us
        cols = {k: t[k] for k in keys}
        cols["__hop"] = pa.array(hop, pa.int64())
        for c, f, o in aggs:
            cols[o] = (pa.array(np.ones(t.num_rows, np.int64))
                       if f == "count" else t[c])
        tt = pa.table(cols)
        fns = [(o, "sum" if f == "count" else f) for _, f, o in aggs]
        g = tt.group_by(keys + ["__hop"], use_threads=False).aggregate(fns)
        ren = {f"{o}_{'sum' if f == 'count' else f}": o for _, f, o in aggs}
        g = g.rename_columns([ren.get(n, n) for n in g.schema.names])
        # replicate each hop partial into its r windows
        n = g.num_rows
        idx = pa.array(np.repeat(np.arange(n), r), pa.int64())
        g = g.take(idx)
        shift = np.tile(np.arange(r, dtype=np.int64) * hop_us, n)
        win = g["__hop"].combine_chunks().to_numpy(zero_copy_only=False) - shift
        return g.drop_columns(["__hop"]).append_column(
            window_name, pa.array(win, pa.int64()))

    merged = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys + [window_name],
        [(o, "sum" if f in ("count", "sum") else f, o) for _, f, o in aggs])
    return merged
