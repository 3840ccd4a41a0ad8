"""Partitioned analytic (window) functions over Ray Datasets.

SQL ``fn() OVER (PARTITION BY keys ORDER BY order)`` for the sequence
functions a transcript/event pipeline needs: ``row_number``, ``rank``,
``dense_rank``, ``lag``, ``lead``, and running ``cumsum``.  The
reference has no analytic functions (its only ordering is rdflib set
iteration); this operator generalizes the engine's K4
ordered-reconstruction machinery (SURVEY §2.7) to arbitrary
per-partition sequences.

Shape: ONE hash-bucket shuffle on the partition keys (all rows of one
key land in one bucket), then a single sort + vectorized numpy
run-boundary pass per bucket computes every requested function for ALL
partitions in the bucket at once — no per-key loop, no per-row Python.

Partitioning assumption (custom-operator contract): per-key row count
fits a worker heap; ``num_buckets`` bounds per-task memory.  A globally
hot key skews its bucket but never breaks correctness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KINDS = ("row_number", "rank", "dense_rank", "lag", "lead", "cumsum",
          "percent_rank", "ntile", "rolling_sum", "rolling_mean",
          "rolling_std", "fill_forward")


def _run_starts(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Boolean mask: row i starts a new run of ``cols`` values (row 0
    always True).  Null-safe: null == null within a column counts as
    equal (SQL PARTITION BY groups nulls together)."""
    n = t.num_rows
    starts = np.zeros(n, dtype=bool)
    starts[0] = True
    for c in cols:
        col = t[c].combine_chunks()
        eq = pc.equal(col.slice(1), col.slice(0, n - 1))
        both_null = pc.and_(pc.is_null(col.slice(1)),
                            pc.is_null(col.slice(0, n - 1)))
        same = pc.fill_null(pc.or_kleene(eq, both_null), False)
        starts[1:] |= ~same.to_numpy(zero_copy_only=False)
    return starts


def window_funcs(ds, keys: list[str], order: list[tuple[str, str]],
                 specs: list[tuple], num_buckets: int = 64):
    """Append analytic columns to ``ds``.

    ``specs``: list of ``(kind, col, out)`` or ``(kind, col, out, off)``:

    - ``("row_number", None, out)`` — 1-based position in partition
    - ``("rank", None, out)`` / ``("dense_rank", None, out)`` — ties
      determined by the ``order`` columns
    - ``("lag", col, out[, off])`` / ``("lead", col, out[, off])`` —
      value ``off`` rows back/ahead (default 1), null past the edge
    - ``("cumsum", col, out)`` — running sum over ``rows unbounded
      preceding → current row``; nulls are ignored (SQL
      aggregate-over-window semantics), output null until the first
      non-null; output type float64
    - ``("percent_rank", None, out)`` — ``(rank − 1) / (n_part − 1)``,
      0.0 for 1-row partitions (SQL PERCENT_RANK)
    - ``("ntile", None, out, b)`` — SQL NTILE(b): b groups per
      partition, sizes differing by ≤ 1, larger groups first
    - ``("rolling_sum", col, out, w)`` / ``("rolling_mean", col, out,
      w)`` / ``("rolling_std", col, out, w)`` — aggregate over ``ROWS
      BETWEEN w−1 PRECEDING AND CURRENT ROW`` clamped at the partition
      start; nulls ignored, null when the window holds no non-null
      value (std: fewer than two — SQL STDDEV_SAMP); w bounded
      (vectorized as w shifted adds)
    - ``("fill_forward", col, out)`` — last-observation-carried-forward
      (LOCF) gap fill: SQL ``last_value(col IGNORE NULLS) OVER (…ROWS
      UNBOUNDED PRECEDING AND CURRENT ROW)``; null until the
      partition's first non-null

    Output: the input columns plus the ``out`` columns.  Row order is
    per-bucket sorted (order across buckets unspecified — the driver
    contract compares sorted multisets).
    """
    for s in specs:
        assert s[0] in _KINDS, f"unknown window fn {s[0]!r}"
    keys = list(keys)
    sort_keys = [(k, "ascending") for k in keys] + list(order)
    order_cols = [c for c, _ in order]

    from ..stages.base import bucketed_map_groups, hash_column

    def add_b(t: pa.Table) -> pa.Table:
        h = hash_column(t, keys=tuple(keys)).to_numpy(zero_copy_only=False)
        return t.append_column(
            "__b", pa.array((h % num_buckets).astype(np.int32)))

    def _out_type(t: pa.Table, kind: str, col: str | None) -> pa.DataType:
        if kind in ("row_number", "rank", "dense_rank", "ntile"):
            return pa.int64()
        if kind in ("percent_rank", "rolling_sum", "rolling_mean",
                    "rolling_std"):
            return pa.float64()
        if kind in ("lag", "lead", "fill_forward"):
            return t.schema.field(col).type
        return pa.float64()

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__b"])
        if t.num_rows == 0:
            out = t
            for s in specs:
                out = out.append_column(
                    s[2], pa.nulls(0, _out_type(t, s[0], s[1])))
            return out
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = t.num_rows
        kstart = _run_starts(t, keys)                   # partition starts
        idx_arange = np.arange(n)
        # index of the partition start for every row
        start_idx = np.maximum.accumulate(np.where(kstart, idx_arange, 0))
        rn = idx_arange - start_idx                     # 0-based row_number
        out = t
        if any(s[0] in ("rank", "dense_rank", "percent_rank")
               for s in specs):
            tstart = _run_starts(t, keys + order_cols)  # tie-run starts
        if any(s[0] in ("percent_rank", "ntile", "rolling_sum",
                        "rolling_mean", "rolling_std") for s in specs):
            starts_pos = np.flatnonzero(kstart)
            seg_len = np.diff(np.append(starts_pos, n))
            part_n = np.repeat(seg_len, seg_len)        # partition size/row
        for s in specs:
            kind, col, name = s[0], s[1], s[2]
            if kind == "row_number":
                out = out.append_column(name, pa.array(rn + 1, pa.int64()))
            elif kind == "rank":
                tie_idx = np.maximum.accumulate(
                    np.where(tstart, idx_arange, 0))
                out = out.append_column(
                    name, pa.array(rn[tie_idx] + 1, pa.int64()))
            elif kind == "dense_rank":
                d = np.cumsum(tstart)                   # distinct-run count
                out = out.append_column(
                    name, pa.array(d - d[start_idx] + 1, pa.int64()))
            elif kind in ("lag", "lead"):
                off = s[3] if len(s) > 3 else 1
                vals = t[col].combine_chunks()
                if kind == "lag":
                    src = idx_arange - off
                    ok = src >= start_idx
                else:
                    src = idx_arange + off
                    # next partition's start bounds each row's lookahead
                    starts_pos = np.flatnonzero(kstart)
                    seg_ends = np.append(starts_pos[1:], n)
                    nps = np.repeat(
                        seg_ends, np.diff(np.append(starts_pos, n)))
                    ok = src < nps
                idx = pa.array(np.where(ok, src, 0), pa.int64())
                shifted = pc.if_else(pa.array(ok), pc.take(vals, idx),
                                     pa.scalar(None, vals.type))
                out = out.append_column(name, shifted)
            elif kind == "fill_forward":
                vals = t[col].combine_chunks()
                nonnull = ~pc.is_null(vals).to_numpy(zero_copy_only=False)
                # index of the last non-null at-or-before each row; a
                # pointer landing before the partition start means the
                # partition has seen no value yet → stays null
                last_nn = np.maximum.accumulate(
                    np.where(nonnull, idx_arange, -1))
                ok = last_nn >= start_idx
                src = pa.array(np.where(ok, last_nn, 0), pa.int64())
                filled = pc.if_else(pa.array(ok), pc.take(vals, src),
                                    pa.scalar(None, vals.type))
                out = out.append_column(name, filled)
            elif kind == "percent_rank":
                tie_idx = np.maximum.accumulate(
                    np.where(tstart, idx_arange, 0))
                rk = rn[tie_idx].astype(np.float64)     # 0-based rank
                denom = (part_n - 1).astype(np.float64)
                pr = np.where(denom > 0, rk / np.maximum(denom, 1), 0.0)
                out = out.append_column(name, pa.array(pr, pa.float64()))
            elif kind == "ntile":
                b = s[3]
                q, r = part_n // b, part_n % b
                big = r * (q + 1)                       # rows in big tiles
                in_big = rn < big
                tile = np.where(
                    in_big,
                    rn // np.maximum(q + 1, 1),
                    r + (rn - big) // np.maximum(q, 1))
                out = out.append_column(
                    name, pa.array(tile + 1, pa.int64()))
            elif kind in ("rolling_sum", "rolling_mean", "rolling_std"):
                w = s[3]
                assert 1 <= w <= 1024, "rolling window bounded"
                vals = t[col].combine_chunks().cast(pa.float64())
                v0 = pc.fill_null(vals, 0.0).to_numpy(zero_copy_only=False)
                nv = (~pc.is_null(vals).to_numpy(zero_copy_only=False)
                      ).astype(np.float64)
                ssum = np.zeros(n, np.float64)
                ssq = np.zeros(n, np.float64)
                scnt = np.zeros(n, np.float64)
                need_sq = kind == "rolling_std"
                if need_sq:
                    # shifted-data trick: center valid values on the
                    # batch mean before squaring — variance is shift-
                    # invariant, and the naive Σx² − (Σx)²/n form
                    # catastrophically cancels when |mean| ≫ std
                    # (round-2 review finding); squares hoisted out of
                    # the shift loop
                    nvalid = float(nv.sum())
                    k_shift = float((v0 * nv).sum() / nvalid) \
                        if nvalid > 0 else 0.0
                    vc_ = np.where(nv > 0, v0 - k_shift, 0.0)
                    v2 = vc_ * vc_
                for j in range(w):
                    okj = idx_arange - j >= start_idx
                    if not okj.any():
                        break
                    sv = np.zeros(n, np.float64)
                    sv[j:] = (vc_ if need_sq else v0)[: n - j]
                    sc = np.zeros(n, np.float64)
                    sc[j:] = nv[: n - j]
                    ssum += np.where(okj, sv, 0.0)
                    scnt += np.where(okj, sc, 0.0)
                    if need_sq:
                        sq = np.zeros(n, np.float64)
                        sq[j:] = v2[: n - j]
                        ssq += np.where(okj, sq, 0.0)
                if kind == "rolling_mean":
                    res = np.divide(ssum, scnt,
                                    out=np.zeros(n, np.float64),
                                    where=scnt > 0)
                    valid = scnt > 0
                elif kind == "rolling_std":
                    c = np.maximum(scnt, 1.0)
                    var = (ssq - ssum * ssum / c) / np.maximum(c - 1, 1.0)
                    res = np.sqrt(np.maximum(var, 0.0))
                    valid = scnt > 1          # SQL STDDEV_SAMP: n ≥ 2
                else:
                    res = ssum
                    valid = scnt > 0
                arr = pc.if_else(pa.array(valid),
                                 pa.array(res, pa.float64()),
                                 pa.scalar(None, pa.float64()))
                out = out.append_column(name, arr)
            else:  # cumsum
                # polars group-wise cum_sum: fresh sequential accumulation
                # per partition (a whole-bucket cumsum minus partition
                # base would leak float error across partitions)
                import polars as pl

                vals = t[col].combine_chunks().cast(pa.float64())
                data = {f"__k{i}": pl.from_arrow(t[k].combine_chunks())
                        for i, k in enumerate(keys)}
                knames = list(data)
                data["__v"] = pl.from_arrow(pc.fill_null(vals, 0.0))
                run = (pl.DataFrame(data)
                       .with_columns(__r=pl.col("__v").cum_sum().over(knames))
                       ["__r"].to_numpy())
                # null until the partition's first non-null value
                isnull = pc.is_null(vals).to_numpy(zero_copy_only=False)
                nn = np.cumsum(~isnull)
                had = (nn - np.where(start_idx > 0,
                                     nn[start_idx - 1], 0)) > 0
                arr = pc.if_else(pa.array(had),
                                 pa.array(run, pa.float64()),
                                 pa.scalar(None, pa.float64()))
                out = out.append_column(name, arr)
        return out

    return bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)
