"""Generic distributed relational operators over Ray Datasets.

These back the engine's SQL-comparable query surface (driver contract /
``__ray_entry__.py``) and generalize patterns used across the KG
pipelines: hash-bucketed top-1 per key (SURVEY A3), deterministic
grouped aggregation with explicit output names, and ordered per-group
sequence reconstruction (K4 over arbitrary tables).

Design: aggregations pre-combine inside ``map_batches`` where possible;
the groupby shuffle then moves only partial states.  Output column names
are explicit so oracle-SQL comparisons are name-stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_of(col, num_buckets: int) -> pa.Array:
    from ..stages.base import bucket_column

    return bucket_column(col, num_buckets)


def top1_per_key(ds, key: str, order: list[tuple[str, str]],
                 num_buckets: int = 64):
    """One row per ``key``: first under ``order`` (list of
    (column, 'ascending'|'descending')).  Deterministic: include a
    unique tie-break column in ``order``.

    Two-phase: per-batch local top-1 (combiner) → hash-bucket shuffle →
    per-bucket top-1.  Shuffle volume = one row per (batch, key)."""

    def local_top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending")] + order)
        t = t.take(idx)
        k = t[key].combine_chunks().cast(pa.string())
        v = k.to_numpy(zero_copy_only=False)
        starts = np.ones(len(v), dtype=bool)
        starts[1:] = v[1:] != v[:-1]
        return t.filter(pa.array(starts))

    def add_b(t: pa.Table) -> pa.Table:
        t = local_top1(t)
        return t.append_column("__b", _bucket_of(t[key], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        return local_top1(t).drop_columns(["__b"])

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)


def grouped_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]]):
    """groupby(keys) with explicit output names.

    ``aggs``: (input_col, fn, output_name), fn ∈ {count, sum, min, max,
    avg, var, std}.  Implemented as per-batch partial aggregation
    (vectorized Arrow ``group_by``) + a final merge groupby — the
    combiner halves shuffle volume vs a naive groupby and mirrors how
    the 100 TB path must run.

    ``avg``/``var``/``std`` decompose into mergeable moments (valid
    count, sum, sum of squares in float64); ``var``/``std`` are SAMPLE
    statistics (DuckDB ``var_samp``/``stddev_samp``: NULL for n<2).
    The sum-of-squares form trades a little numerical head-room for a
    single shuffle; values up to ~1e7 keep ~9 significant digits.
    """
    spec = [(c, f, o) for c, f, o in aggs]
    num_buckets = 64
    # physical partial columns: (phys_name, source, partial_fn) where
    # source is an input column name, "__ones", or ("sq", col).
    phys: list[tuple[str, object, str]] = []
    for c, f, o in spec:
        if f == "count":
            phys.append((o, "__ones", "sum"))
        elif f in ("sum", "min", "max"):
            phys.append((o, c, f))
        elif f in ("avg", "var", "std"):
            phys.append((f"__{o}__n", c, "count"))
            phys.append((f"__{o}__s", ("f64", c), "sum"))
            if f in ("var", "std"):
                phys.append((f"__{o}__ss", ("sq", c), "sum"))
        else:
            raise ValueError(f"unsupported agg fn {f!r}")

    def _src(t: pa.Table, src):
        if src == "__ones":
            return pa.array(np.ones(t.num_rows, np.int64))
        if isinstance(src, tuple):
            v = pc.cast(t[src[1]], pa.float64())
            return pc.multiply(v, v) if src[0] == "sq" else v
        return t[src]

    def partial(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        for name, src, _ in phys:
            cols[name] = _src(t, src)
        tt = pa.table(cols)
        g = tt.group_by(keys, use_threads=False).aggregate(
            [(name, fn) for name, _, fn in phys])
        ren = {f"{name}_{fn}": name for name, _, fn in phys}
        g = g.rename_columns([ren.get(n, n) for n in g.schema.names])
        # shuffle key = hash bucket of the group keys, never the raw keys
        # (per-distinct-key map_groups calls don't scale; merge is an
        # Arrow group_by, so a bucket of many keys folds vectorized)
        from ..stages.base import hash_column

        h = hash_column(g, keys=tuple(keys)).to_numpy(zero_copy_only=False)
        return g.append_column(
            "__b", pa.array((h % num_buckets).astype(np.int32)))

    def merge(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__b"])
        merge_fns = [(name, "sum" if fn in ("count", "sum") else fn)
                     for name, _, fn in phys]
        g = t.group_by(keys, use_threads=False).aggregate(merge_fns)
        ren = {f"{name}_{fn}": name for (name, _, _), (_, fn)
               in zip(phys, merge_fns)}
        g = g.rename_columns([ren.get(n, n) for n in g.schema.names])
        out = {k: g[k] for k in keys}
        for c, f, o in spec:
            if f in ("count", "sum", "min", "max"):
                out[o] = g[o]
                continue
            n = pc.cast(g[f"__{o}__n"], pa.float64())
            s = g[f"__{o}__s"]
            mean = pc.if_else(pc.greater(n, 0), pc.divide(s, n),
                              pa.scalar(None, pa.float64()))
            if f == "avg":
                out[o] = mean
                continue
            ss = g[f"__{o}__ss"]
            # sample variance: (ss - s²/n) / (n-1); clamp tiny negative
            # rounding residue to 0; NULL when n < 2.
            num = pc.subtract(ss, pc.multiply(mean, s))
            v = pc.max_element_wise(
                pc.divide(num, pc.subtract(n, 1)), pa.scalar(0.0))
            v = pc.if_else(pc.greater(n, 1), v, pa.scalar(None, pa.float64()))
            out[o] = pc.sqrt_checked(v) if f == "std" else v
        return pa.table(out)

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), "__b", merge)


def _grouping_sets(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                   level_sets: list[tuple[str, ...]]):
    """Shared GROUPING SETS engine behind :func:`rollup_agg` /
    :func:`cube_agg`.

    ONE data-wide shuffle computes the finest level (all ``keys``) with
    :func:`grouped_agg`; every other grouping set re-aggregates the
    finest RESULT (cardinality = distinct key combos, not raw rows), so
    N grouping sets cost one real shuffle + N tiny ones — the only
    scale-correct plan at 100 TB.  Restricted to the decomposable fns
    {count, sum, min, max} (count folds into sum on re-aggregation;
    avg/var moments are not preserved in finalized outputs — compute
    those with :func:`grouped_agg` per level if needed).

    Rolled-up key columns are typed NULLs, exactly like SQL; if a key
    column itself contains NULLs the two are indistinguishable without
    a GROUPING() marker (same caveat as plain SQL).
    """
    for _, f, _ in aggs:
        assert f in ("count", "sum", "min", "max"), \
            f"grouping sets support decomposable fns only, got {f!r}"
    # materialize the finest level ONCE (it is the post-aggregation
    # result — distinct key combos, small); without this every coarser
    # level would lazily re-run the full input shuffle.
    finest = grouped_agg(ds, keys, aggs).materialize()
    # finalized outputs re-aggregate: count columns are already counts,
    # so they fold by SUM; sum/min/max fold by themselves.
    reagg = [(o, "sum" if f in ("count", "sum") else f, o)
             for _, f, o in aggs]
    outs = [o for _, _, o in aggs]

    from ..stages.base import schema_of

    sch = schema_of(finest)
    key_types = {k: sch.field(k).type for k in keys}

    def pad(level_keys):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (t[k] if k in level_keys
                           else pa.nulls(t.num_rows, key_types[k]))
            for o in outs:
                cols[o] = t[o]
            return pa.table(cols)
        return f

    levels = []
    for sub in level_sets:
        sub = tuple(sub)
        if sub == tuple(keys):
            levels.append(finest.map_batches(pad(sub),
                                             batch_format="pyarrow"))
        elif sub:
            levels.append(grouped_agg(finest, list(sub), reagg).map_batches(
                pad(sub), batch_format="pyarrow"))
        else:
            # grand total: constant grouping key, dropped after the fold
            withc = finest.map_batches(
                lambda t: t.append_column("__all", pa.array(
                    np.zeros(t.num_rows, np.int8))), batch_format="pyarrow")
            levels.append(grouped_agg(withc, ["__all"], reagg).map_batches(
                lambda t: pad(())(t.drop_columns(["__all"])),
                batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def rollup_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]]):
    """``GROUP BY ROLLUP(keys)``: subtotals at every key prefix plus
    the grand total (see :func:`_grouping_sets` for plan and caveats)."""
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return _grouping_sets(ds, keys, aggs, sets)


def cube_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]]):
    """``GROUP BY CUBE(keys)``: subtotals at every key subset (2^k
    grouping sets; see :func:`_grouping_sets` for plan and caveats)."""
    from itertools import combinations

    sets = [s for r in range(len(keys), -1, -1)
            for s in combinations(keys, r)]
    return _grouping_sets(ds, keys, aggs, sets)


def set_op(left, right, op: str, num_buckets: int = 64):
    """SQL set operations with DISTINCT semantics: ``op`` ∈
    {"intersect", "except"} over two Datasets with identical schemas.

    Both sides get a side flag, union, and ONE hash-bucket shuffle on
    the full row (per-batch distinct-per-side combiner first, so the
    shuffle moves distinct rows, not raw rows).  Inside a bucket a
    single Arrow ``group_by(all cols)`` folds the side flags —
    ``max(__l)``/``max(__r)`` — and a filter keeps rows present in both
    (intersect) or left-only (except).  NULLs compare equal, exactly
    like SQL set ops (Arrow group_by groups nulls together), which a
    join-based plan would get wrong.
    """
    assert op in ("intersect", "except"), op

    from ..stages.base import schema_of

    cols = list(schema_of(left).names)
    assert cols == list(schema_of(right).names), \
        "set_op requires identical schemas"

    from ..stages.base import hash_column

    def tag(is_left):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            # per-side distinct combiner: shuffle distinct rows only
            g = t.group_by(cols, use_threads=False).aggregate([])
            n = g.num_rows
            g = g.append_column("__l", pa.array(
                np.full(n, 1 if is_left else 0, np.int8)))
            g = g.append_column("__r", pa.array(
                np.full(n, 0 if is_left else 1, np.int8)))
            h = hash_column(g, keys=tuple(cols)).to_numpy(
                zero_copy_only=False)
            return g.append_column(
                "__b", pa.array((h % num_buckets).astype(np.int32)))
        return f

    unioned = left.map_batches(tag(True), batch_format="pyarrow").union(
        right.map_batches(tag(False), batch_format="pyarrow"))

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["__b"]).group_by(
            cols, use_threads=False).aggregate([("__l", "max"),
                                                ("__r", "max")])
        inl = pc.equal(g["__l_max"], 1)
        inr = pc.equal(g["__r_max"], 1)
        keep = (pc.and_(inl, inr) if op == "intersect"
                else pc.and_(inl, pc.invert(inr)))
        return g.filter(keep).select(cols)

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(unioned, "__b", per_bucket)


def grouped_count_distinct(ds, key: str, col: str,
                           out_name: str = "n_distinct",
                           num_buckets: int | None = None):
    """Exact per-key COUNT(DISTINCT col): global exact dedup of
    ``(key, col)`` pairs (combiner + one bucket shuffle — volume =
    distinct pairs) followed by a tiny grouped count.  NULL ``col``
    values are ignored, SQL COUNT(DISTINCT) semantics."""
    from ..stages.base import dedup_triples

    pairs = ds.map_batches(
        lambda t: t.select([key, col]).filter(pc.is_valid(t[col])),
        batch_format="pyarrow")
    d = dedup_triples(pairs, keys=(key, col), num_buckets=num_buckets)
    return grouped_agg(d, [key], [(col, "count", out_name)])


def grouped_array_agg(ds, key: str, value_col: str,
                      out_name: str = "values", num_buckets: int = 64):
    """Per-key SORTED list of values — ``list_sort(array_agg(v))`` —
    as a genuine Arrow list column (nested output type).

    One bucket shuffle on the key; inside a bucket a single sort by
    (key, value) + run-boundary offsets slice the flat value array into
    a ListArray directly from the offsets — no per-group Python.  A
    single key's values must fit a worker (same contract as any
    per-key aggregation)."""
    def add_b(t: pa.Table) -> pa.Table:
        t = t.select([key, value_col])
        return t.append_column("__b", _bucket_of(t[key], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        kt = t.schema.field(key).type
        vt = t.schema.field(value_col).type
        if t.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             out_name: pa.array([], pa.list_(vt))})
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            (value_col, "ascending")])
        t = t.take(idx)
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.ones(len(kv), dtype=bool)
        starts[1:] = kv[1:] != kv[:-1]
        offs = np.flatnonzero(starts)
        offsets = pa.array(np.concatenate([offs, [len(kv)]]).astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets,
                                         t[value_col].combine_chunks())
        return pa.table({key: t[key].take(pa.array(offs.astype(np.int64))),
                         out_name: lists})

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)


def sanitize_col(v) -> str:
    """Deterministic pivot column name for a value: non-alnum → ``_``,
    lowered."""
    import re as _re

    return _re.sub(r"[^0-9a-zA-Z]+", "_", str(v)).strip("_").lower()


def pivot_agg(ds, key: str, pivot_col: str, values: list,
              value_col: str | None = None, prefix: str = "n_"):
    """PIVOT: one output column per declared ``values`` entry, holding
    count(*) (``value_col=None``) or sum(value_col) where
    ``pivot_col == value``.

    The pivot values must be declared up front (same contract as SQL
    PIVOT — static output schema).  Wide indicator columns are built
    per batch with vectorized ``pc.equal``/``if_else`` and folded by
    the :func:`grouped_agg` combiner, so the shuffle moves one row per
    (key × batch), already wide — never a tall intermediate.
    """
    names = [prefix + sanitize_col(v) for v in values]
    assert len(set(names)) == len(names), "pivot values collide after sanitize"

    def widen(t: pa.Table) -> pa.Table:
        cols = {key: t[key]}
        p = t[pivot_col]
        for v, name in zip(values, names):
            m = pc.equal(p, v)
            if value_col is None:
                cols[name] = pc.if_else(
                    pc.fill_null(m, False),
                    pa.scalar(1, pa.int64()), pa.scalar(0, pa.int64()))
            else:
                cols[name] = pc.if_else(
                    pc.fill_null(m, False), t[value_col],
                    pa.scalar(0, t.schema.field(value_col).type))
        return pa.table(cols)

    return grouped_agg(ds.map_batches(widen, batch_format="pyarrow"),
                       [key], [(n, "sum", n) for n in names])


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            name_col: str = "name", value_name: str = "value"):
    """UNPIVOT / melt: each row fans out to one row per ``value_cols``
    entry, ``(id_cols..., name, value)``; values cast to float64 (the
    SQL UNION ALL type-unification).  Pure per-batch transform — no
    shuffle."""
    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {i: t[i] for i in id_cols}
            cols[name_col] = pa.array(np.repeat(c, t.num_rows))
            cols[value_name] = pc.cast(t[c], pa.float64())
            parts.append(pa.table(cols))
        return (pa.concat_tables(parts) if parts
                else pa.table({i: t[i] for i in id_cols}))

    return ds.map_batches(melt, batch_format="pyarrow")


def ordered_group_concat(ds, key: str, order: list[tuple[str, str]],
                         value_col: str, sep: str = "|",
                         out_names: tuple[str, str, str] = ("key", "n", "seq")):
    """K4 over arbitrary tables: per key, count + order-stable
    concatenation of ``value_col`` (conversation/session reconstruction).
    Mirrors SQL ``string_agg(value, sep ORDER BY ...) GROUP BY key``."""
    kname, nname, sname = out_names
    num_buckets = 64

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_of(t[key], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        # one call per BUCKET (hash of key), not per distinct key; the
        # in-bucket group-concat is polars' native str.join after the
        # order-stable sort — fully vectorized, no per-row Python
        import polars as pl

        idx = pc.sort_indices(t, sort_keys=[(key, "ascending")] + order)
        t = t.take(idx)
        vals = t[value_col].combine_chunks()
        if not pa.types.is_string(vals.type) and not pa.types.is_large_string(vals.type):
            vals = vals.cast(pa.string())
        df = pl.DataFrame({
            "k": pl.from_arrow(t[key].combine_chunks()),
            "v": pl.from_arrow(pc.fill_null(vals, "")),
        })
        g = (df.group_by("k", maintain_order=True)
             .agg(n=pl.len(), s=pl.col("v").str.join(sep)))
        out = g.to_arrow()
        return pa.table({
            kname: out["k"].combine_chunks().cast(t[key].type),
            nname: out["n"].combine_chunks().cast(pa.int64()),
            sname: out["s"].combine_chunks().cast(pa.string()),
        })

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(bucketed, batch_format="pyarrow"), "__b", per_bucket)


def broadcast_join(ds, small: pa.Table, left_key: str, right_key: str,
                   how: str = "inner", max_small_bytes: int = 1 << 28):
    """Map-side hash join against a broadcast small side.

    The small table ships ONCE via ``ray.put``; every batch joins with
    Arrow's in-memory kernel — no shuffle of the big side at all.  This
    is the right plan whenever one side fits a worker heap (dimension
    tables, mapping tables, lexicons); the shuffle ``Dataset.join`` is
    reserved for genuinely large×large joins (SURVEY §7.3).
    """
    import ray

    assert small.nbytes <= max_small_bytes, (
        f"small side is {small.nbytes}B > {max_small_bytes}B; "
        "use Dataset.join for large×large")
    ref = ray.put(small)

    def j(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        return t.join(s, keys=[left_key], right_keys=[right_key],
                      join_type=how)

    return ds.map_batches(j, batch_format="pyarrow")


def bucket_multijoin(parts, key: str, num_buckets: int = 64):
    """Hash-bucket shuffle join of several keyed Datasets in ONE shuffle.

    ``parts``: list of ``(ds, value_cols, how)`` — every ``ds`` carries a
    ``key`` column plus its ``value_cols``; the first entry is the base,
    each later one is folded in with ``how`` ∈ {"inner", "left"}.

    Mechanics: every part is padded to the superset schema, tagged, and
    unioned; one ``groupby(hash(key) % num_buckets)`` shuffle co-locates
    all rows of a key; inside each bucket the parts are split back out
    and joined with Arrow's vectorized ``Table.join``.

    This is the engine's scale-join for DEEP join trees: unlike chained
    ``Dataset.join`` operators (each of which pins ``num_partitions``
    aggregator actors — a topology that deadlocks once concurrent joins
    outnumber CPUs; observed with 7 joins × 4 partitions on 4 CPUs),
    groupby shuffles hold no long-lived actors, so any number of stages
    composes safely.  ``num_buckets`` bounds per-task memory: size it so
    (total join input / num_buckets) fits a worker heap.

    Missing columns are padded with STRING nulls purely to align the
    union schema (merge reads only each part's real columns) — parts
    sharing a column name must agree on its type.
    """
    all_cols: list[str] = []
    for _, cols, _ in parts:
        for c in cols:
            if c not in all_cols:
                all_cols.append(c)

    def tag(i, cols):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            out = {key: t[key]}
            for c in all_cols:
                out[c] = t[c] if c in cols else pa.nulls(n, pa.string())
            out["__src"] = pa.array(np.full(n, i, np.int8))
            tt = pa.table(out)
            return tt.append_column("__b", _bucket_of(tt[key], num_buckets))

        return f

    unioned = None
    for i, (ds, cols, _) in enumerate(parts):
        tagged = ds.map_batches(tag(i, cols), batch_format="pyarrow")
        unioned = tagged if unioned is None else unioned.union(tagged)

    hows = [how for _, _, how in parts]
    part_cols = [cols for _, cols, _ in parts]

    def merge(t: pa.Table) -> pa.Table:
        src = t["__src"]
        base = None
        for i, (cols, how) in enumerate(zip(part_cols, hows)):
            sub = t.filter(pc.equal(src, i)).select([key] + cols)
            base = sub if base is None else base.join(
                sub, keys=[key],
                join_type="inner" if how == "inner" else "left outer")
        return base.select([key] + all_cols)

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(unioned, "__b", merge)


def sessionize(ds, key: str, ts_col: str, gap_us: int,
               tiebreak: list[str] | None = None, num_buckets: int = 64):
    """Gap-based session windows (engine-first streaming-window analog;
    the reference is strictly batch, SURVEY §2.10).

    Rows of one ``key`` are ordered by ``(ts_col, *tiebreak)``; a new
    session opens when the gap to the previous row exceeds ``gap_us``
    microseconds.  Returns one row per session:
    ``(key, session_id, n_events, ts_start, ts_end)`` with per-key
    1-based session ids.

    One ``groupby(hash(key) % num_buckets)`` shuffle; the window runs
    vectorized inside each bucket (numpy cumsum over the sorted array —
    never a per-row or per-key Python call).
    """
    tiebreak = tiebreak or []

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket_of(t[key], num_buckets))

    def win(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                key: pa.array([], t[key].type),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "ts_start": pa.array([], t[ts_col].type),
                "ts_end": pa.array([], t[ts_col].type),
            })
        sort_keys = [(key, "ascending"), (ts_col, "ascending")] + [
            (c, "ascending") for c in tiebreak]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        k = t[key].to_numpy(zero_copy_only=False)
        ts = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(k)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        gap = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        new_s = new_key | gap
        sid_global = np.cumsum(new_s)
        key_start = np.maximum.accumulate(np.where(new_key, sid_global, 0))
        sid = (sid_global - key_start + 1).astype(np.int64)
        tt = pa.table({key: t[key], "session_id": pa.array(sid),
                       ts_col: t[ts_col]})
        g = tt.group_by([key, "session_id"], use_threads=False).aggregate(
            [(ts_col, "count"), (ts_col, "min"), (ts_col, "max")])
        ren = {f"{ts_col}_count": "n_events", f"{ts_col}_min": "ts_start",
               f"{ts_col}_max": "ts_end"}
        g = g.rename_columns([ren.get(c, c) for c in g.schema.names])
        return g.select([key, "session_id", "n_events", "ts_start", "ts_end"])

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(bucketed, batch_format="pyarrow"), "__b", win)


def tumbling_window_agg(ds, ts_col: str, window_us: int,
                        keys: list[str] | None = None,
                        aggs: list[tuple[str, str, str]] | None = None,
                        window_name: str = "window_start"):
    """Fixed-width (tumbling) time-window aggregation — the batch analog
    of a streaming windowed aggregate (SURVEY §2.10; the reference is
    strictly batch, so this is an engine-first operator like
    :func:`sessionize`).

    Each row lands in the window starting at
    ``ts - (ts mod window_us)`` (exact int64 µs arithmetic — no float
    rounding); the result is one row per (``keys``…, window) with the
    requested ``aggs`` (same spec as :func:`grouped_agg`).  The window
    assignment is a pure per-batch map; the only shuffle is
    ``grouped_agg``'s combiner-then-bucket merge.
    """
    keys = list(keys or [])
    aggs = list(aggs or [("*", "count", "n_events")])
    w = window_us

    def add_win(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        win = ts - ts % w
        return t.append_column(window_name, pa.array(win, pa.int64()))

    return grouped_agg(ds.map_batches(add_win, batch_format="pyarrow"),
                       keys + [window_name], aggs)


def exact_quantiles(ds, col: str, qs: list[float], num_bins: int = 2048,
                    collect_cap: int = 2_000_000, max_rounds: int = 6):
    """EXACT continuous quantiles (SQL ``quantile_cont`` semantics:
    linear interpolation at rank ``q*(n-1)``) without sorting the
    dataset.

    Multi-pass histogram selection — the scalable exact algorithm:

    1. one pass for global ``(n, min, max)`` (per-batch partials, tiny
       reduce);
    2. iterative passes histogramming only the still-open value
       brackets (``num_bins`` uniform bins per bracket) to narrow each
       target order-statistic's bracket until it holds ≤
       ``collect_cap`` rows (one pass narrows each bracket ~num_bins×,
       so 100 TB needs ~3 rounds);
    3. one final pass collecting just the bracketed values (bounded by
       ``collect_cap`` per bracket) — the order statistics are read off
       a driver-side sort of that small set.

    Every pass is a full-stream ``map_batches`` with small outputs —
    nothing large ever lands on the driver.  Pathological inputs (mass
    concentrated within float-epsilon ranges) stop narrowing after
    ``max_rounds`` and collect whatever the bracket holds.

    Returns a pyarrow Table ``(q double, value double)`` sorted by q
    (a small result — materialized, like every scalar aggregate here).
    """
    # multi-pass algorithm → pin the (single-column) projection in the
    # object store once instead of re-running the upstream per pass
    ds = ds.map_batches(lambda t: t.select([col]),
                        batch_format="pyarrow").materialize()

    def stats(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().cast(pa.float64())
        v = pc.drop_null(v)
        if len(v) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([None], pa.float64()),
                             "hi": pa.array([None], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([pc.min(v).as_py()], pa.float64()),
                         "hi": pa.array([pc.max(v).as_py()], pa.float64())})

    rows = ds.map_batches(stats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    assert n > 0, "exact_quantiles on an empty column"
    glo = min(r["lo"] for r in rows if r["lo"] is not None)
    ghi = max(r["hi"] for r in rows if r["hi"] is not None)

    # target 0-based integer ranks (floor and ceil of each q*(n-1))
    want: dict[int, None] = {}
    for q in qs:
        h = q * (n - 1)
        want[int(np.floor(h))] = None
        want[int(np.ceil(h))] = None
    ranks = sorted(want)
    # per-rank bracket: [lo, hi] inclusive + count of values strictly < lo
    brk = {k: [glo, ghi, 0, n] for k in ranks}  # lo, hi, below, size

    for _ in range(max_rounds):
        open_ranks = [k for k in ranks if brk[k][3] > collect_cap
                      and brk[k][1] > brk[k][0]]
        if not open_ranks:
            break
        # merge duplicate brackets so one histogram serves equal ranges
        uniq: list[tuple[float, float]] = []
        for k in open_ranks:
            rng = (brk[k][0], brk[k][1])
            if rng not in uniq:
                uniq.append(rng)
        B = len(uniq)

        def hist(t: pa.Table, _uniq=tuple(uniq)) -> pa.Table:
            v = pc.drop_null(t[col].combine_chunks().cast(pa.float64()))
            x = v.to_numpy(zero_copy_only=False)
            bids, bins_, cnts = [], [], []
            for bi, (lo, hi) in enumerate(_uniq):
                m = x[(x >= lo) & (x <= hi)]
                if len(m) == 0:
                    continue
                # bin edges assigned by EXACT comparisons (searchsorted),
                # never float division — the narrowing below-count must
                # agree bit-exactly with the collect pass's `x >= nlo`
                edges = lo + (hi - lo) / num_bins * np.arange(1, num_bins)
                j = np.searchsorted(edges, m, side="right")
                c = np.bincount(j, minlength=num_bins)
                nz = np.flatnonzero(c)
                bids.append(np.full(len(nz), bi, np.int64))
                bins_.append(nz.astype(np.int64))
                cnts.append(c[nz].astype(np.int64))
            if not bids:
                return pa.table({"bid": pa.array([], pa.int64()),
                                 "bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({"bid": pa.array(np.concatenate(bids)),
                             "bin": pa.array(np.concatenate(bins_)),
                             "cnt": pa.array(np.concatenate(cnts))})

        hrows = ds.map_batches(hist, batch_format="pyarrow").take_all()
        acc = np.zeros((B, num_bins), np.int64)
        for r in hrows:
            acc[r["bid"], r["bin"]] += r["cnt"]
        for k in open_ranks:
            lo, hi, below, _sz = brk[k]
            bi = uniq.index((lo, hi))
            cum = np.cumsum(acc[bi])
            local = k - below  # 0-based rank within bracket
            j = int(np.searchsorted(cum, local + 1))
            w = (hi - lo) / num_bins
            nlo = lo if j == 0 else lo + j * w
            nhi = hi if j == num_bins - 1 else lo + (j + 1) * w
            nbelow = below + (0 if j == 0 else int(cum[j - 1]))
            nsz = int(acc[bi][j])
            if nhi <= nlo or (nlo == lo and nhi == hi):
                brk[k] = [lo, hi, below, 0]  # cannot narrow; force collect
            else:
                brk[k] = [nlo, nhi, nbelow, nsz]

    final = [(brk[k][0], brk[k][1]) for k in ranks]
    uniq_f: list[tuple[float, float]] = []
    for rng in final:
        if rng not in uniq_f:
            uniq_f.append(rng)

    def collect(t: pa.Table, _uniq=tuple(uniq_f)) -> pa.Table:
        v = pc.drop_null(t[col].combine_chunks().cast(pa.float64()))
        x = v.to_numpy(zero_copy_only=False)
        bids, vals = [], []
        for bi, (lo, hi) in enumerate(_uniq):
            m = x[(x >= lo) & (x <= hi)]
            if len(m):
                bids.append(np.full(len(m), bi, np.int64))
                vals.append(m)
        if not bids:
            return pa.table({"bid": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64())})
        return pa.table({"bid": pa.array(np.concatenate(bids)),
                         "val": pa.array(np.concatenate(vals), pa.float64())})

    crows = ds.map_batches(collect, batch_format="pyarrow").take_all()
    byb: dict[int, list] = {i: [] for i in range(len(uniq_f))}
    for r in crows:
        byb[r["bid"]].append(r["val"])
    sorted_vals = {i: np.sort(np.asarray(v, np.float64))
                   for i, v in byb.items()}
    at_rank: dict[int, float] = {}
    for k in ranks:
        lo, hi, below, _ = brk[k]
        bi = uniq_f.index((lo, hi))
        at_rank[k] = float(sorted_vals[bi][k - below])
    out_q, out_v = [], []
    for q in qs:
        h = q * (n - 1)
        kf, kc = int(np.floor(h)), int(np.ceil(h))
        frac = h - kf
        vlo, vhi = at_rank[kf], at_rank[kc]
        out_q.append(float(q))
        out_v.append(vlo + frac * (vhi - vlo))
    order = np.argsort(out_q, kind="stable")
    return pa.table({"q": pa.array(np.asarray(out_q)[order], pa.float64()),
                     "value": pa.array(np.asarray(out_v)[order],
                                       pa.float64())})


def distinct_values(ds, col: str, out_name: str | None = None,
                    num_buckets: int = 64):
    """Distinct values of one column (A5) via local-unique → bucket
    shuffle → unique; never collects the full column on the driver."""
    out = out_name or col

    def local(t: pa.Table) -> pa.Table:
        u = pc.unique(t[col].combine_chunks())
        tt = pa.table({out: u})
        return tt.append_column("__b", _bucket_of(tt[out], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        return pa.table({out: pc.unique(t[out].combine_chunks())})

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(local, batch_format="pyarrow"), "__b", per_bucket)

def topk_per_key(ds, key: str, order: list[tuple[str, str]], k: int,
                 num_buckets: int = 64):
    """Top ``k`` rows per ``key`` under ``order`` (generalizes
    ``top1_per_key``).  Deterministic: include a unique tie-break column
    in ``order``.

    Two-phase: per-batch local top-k (combiner — a batch can contribute
    at most k rows per key to the shuffle) → hash-bucket shuffle →
    per-bucket top-k.  Shuffle volume ≤ k rows per (batch, key)."""

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending")] + order)
        t = t.take(idx)
        kv = t[key].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.ones(len(kv), dtype=bool)
        starts[1:] = kv[1:] != kv[:-1]
        start_idx = np.maximum.accumulate(
            np.where(starts, np.arange(len(kv)), 0))
        rn = np.arange(len(kv)) - start_idx
        return t.filter(pa.array(rn < k))

    def add_b(t: pa.Table) -> pa.Table:
        t = local_topk(t)
        return t.append_column("__b", _bucket_of(t[key], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        return local_topk(t).drop_columns(["__b"])

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)


def key_semi_join(ds, right, left_key: str, right_key: str,
                  anti: bool = False, num_buckets: int = 64,
                  broadcast_limit: int = 2_000_000):
    """Semi / anti join: rows of ``ds`` whose ``left_key`` appears
    (``anti=False``) or does not appear (``anti=True``) in ``right``'s
    ``right_key`` column.  Null semantics are EXISTS / NOT EXISTS (the
    sane ones), not NOT-IN's: null right keys are ignored, and a null
    left key matches nothing (excluded from semi, kept by anti).

    Plan: distinct right keys (local-unique combiner + bucket shuffle);
    if the distinct-key count fits ``broadcast_limit`` the key set
    ships once via ``ray.put`` and every batch filters map-side with
    ``pc.is_in`` — no shuffle of the big side (the common shape:
    filtering a fact table by a dimension selection).  Larger key sets
    fall back to a bucketed co-group shuffle of both sides.
    """
    import ray

    # Materialize the (combined-and-deduped, hence small-relative-to-raw)
    # key set in the OBJECT STORE and count from block metadata — the
    # driver only ever collects it when it is under broadcast_limit.
    # (An unconditional driver collect here would cap the operator at
    # driver heap size; at 100 TB distinct keys can be billions.)
    keys_ds = distinct_values(right, right_key, out_name="__k",
                              num_buckets=num_buckets).materialize()
    if keys_ds.count() <= broadcast_limit:
        kt = pa.concat_tables(
            list(keys_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=None)))
        kt = kt.filter(pc.is_valid(kt["__k"]))
        vs = kt["__k"].combine_chunks()
        ref = ray.put(vs)

        def flt(t: pa.Table) -> pa.Table:
            mem = pc.is_in(t[left_key].combine_chunks(),
                           value_set=ray.get(ref))
            mem = pc.fill_null(mem, False)
            return t.filter(pc.invert(mem) if anti else mem)

        return ds.map_batches(flt, batch_format="pyarrow")

    # large key set: bucketed co-group (one shuffle of both sides)
    from ..stages.base import schema_of

    sch = schema_of(ds)
    names, types = list(sch.names), list(sch.types)
    ltype = dict(zip(names, types))[left_key]

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__isk", pa.array(np.zeros(t.num_rows, np.int8)))
        return t.append_column("__b", _bucket_of(t[left_key], num_buckets))

    def tag_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["__k"]))   # null right keys ignored
        cols = {n: pa.nulls(t.num_rows, ty)
                for n, ty in zip(names, types)}
        cols[left_key] = t["__k"].cast(ltype)
        cols["__isk"] = pa.array(np.ones(t.num_rows, np.int8))
        tt = pa.table(cols)
        return tt.append_column("__b", _bucket_of(tt[left_key], num_buckets))

    unioned = ds.map_batches(tag_left, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_keys, batch_format="pyarrow"))

    def per_bucket(t: pa.Table) -> pa.Table:
        isk = t["__isk"].combine_chunks().to_numpy(zero_copy_only=False)
        left = t.filter(pa.array(isk == 0))
        kset = pc.unique(t.filter(pa.array(isk == 1))[left_key]
                         .combine_chunks())
        mem = pc.fill_null(
            pc.is_in(left[left_key].combine_chunks(), value_set=kset),
            False)
        out = left.filter(pc.invert(mem) if anti else mem)
        return out.drop_columns(["__isk", "__b"])

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(unioned, "__b", per_bucket)


def heavy_hitters(ds, col: str, threshold: float, num_buckets: int = 64,
                  max_candidates: int = 5_000_000):
    """EXACT frequent items: values of ``col`` with global count ≥
    ``threshold × total_rows`` — two full passes, no global groupby of
    the raw column.

    Pass 1 (candidate pruning): each batch keeps only values that are
    locally frequent (batch count ≥ threshold × batch rows).  Any
    globally-heavy value must be locally frequent in ≥1 batch (if
    c_i < θ·m_i in every batch then Σc_i < θ·n), so the union of batch
    survivors is a SUPERSET of the answer — at most ⌈1/θ⌉ values per
    batch enter the shuffle.  Survivors are distinct-reduced
    distributedly and broadcast (``max_candidates`` guards the
    pathological all-batches-disjoint case — the candidate table, not
    the data, must fit the driver).

    Pass 2 (exact verify): per batch, exact counts of candidate values
    + the batch row count; one tiny grouped merge; filter ≥ θ·n.

    Returns a pa.Table ``(col, cnt)`` (small by construction — the
    answer has ≤ 1/θ rows).
    """
    import ray

    assert 0.0 < threshold <= 1.0

    def local_frequent(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__v": pa.nulls(0, t.schema.field(col).type)})
        g = (t.select([col]).group_by([col], use_threads=False)
             .aggregate([([], "count_all")]))
        keep = pc.greater_equal(
            g["count_all"].combine_chunks().cast(pa.float64()),
            pa.scalar(threshold * t.num_rows, pa.float64()))
        return pa.table({"__v": g.filter(keep)[col].combine_chunks()})

    cand_ds = distinct_values(
        ds.map_batches(local_frequent, batch_format="pyarrow"), "__v",
        num_buckets=num_buckets)
    cand = pa.concat_tables(
        list(cand_ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert cand.num_rows <= max_candidates, (
        f"{cand.num_rows} candidates exceed max_candidates; raise the "
        "threshold or max_candidates")
    ref = ray.put(cand["__v"].combine_chunks())

    def count_cands(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        c = t[col].combine_chunks()
        hit = t.select([col]).filter(
            pc.fill_null(pc.is_in(c, value_set=vs), False))
        g = (hit.group_by([col], use_threads=False)
             .aggregate([([], "count_all")]))
        vals = g[col].combine_chunks()
        # one sentinel row (__v=null) carries the batch row count so the
        # global total survives batches with zero candidate hits
        v_out = pa.concat_arrays([vals, pa.nulls(1, vals.type)])
        cnt = pa.concat_arrays([
            g["count_all"].combine_chunks().cast(pa.int64()),
            pa.array([0], pa.int64())])
        tot = np.zeros(len(v_out), np.int64)
        tot[-1] = t.num_rows
        return pa.table({"__v": v_out, "cnt": cnt,
                         "total": pa.array(tot, pa.int64())})

    parts = ds.map_batches(count_cands, batch_format="pyarrow")
    # distributed reduce of the partials (≤1/θ + 1 rows per batch) —
    # only the per-candidate result table ever reaches the driver
    merged = grouped_agg(parts, ["__v"], [("cnt", "sum", "cnt"),
                                          ("total", "sum", "total")])
    agg = pa.concat_tables(
        list(merged.iter_batches(batch_format="pyarrow", batch_size=None)))
    total = pc.sum(agg["total"]).as_py() or 0
    agg = agg.filter(pc.is_valid(agg["__v"]))
    g = agg.group_by(["__v"], use_threads=False).aggregate([("cnt", "sum")])
    keep = pc.greater_equal(g["cnt_sum"].combine_chunks().cast(pa.float64()),
                            pa.scalar(threshold * total, pa.float64()))
    out = g.filter(keep)
    return pa.table({col: out["__v"].combine_chunks(),
                     "cnt": out["cnt_sum"].combine_chunks()})


def hash_join(left, right, on: str, right_on: str | None = None,
              how: str = "inner", num_buckets: int = 64,
              rsuffix: str = "_r", hot_keys=None, salt: int = 8,
              hot_min_count: int = 1_000_000,
              left_schema: "pa.Schema | None" = None,
              right_schema: "pa.Schema | None" = None):
    """General large×large equi-join: ONE hash-bucket co-group shuffle.

    Both sides are tagged and unioned (padded to the superset schema
    with TYPED nulls), co-located by ``hash(key) % num_buckets``, and
    joined per bucket with Arrow's vectorized ``Table.join``.  ``how``
    ∈ {"inner", "left", "right", "full"}; null keys never match (SQL
    semantics), and the join-key column keeps the LEFT name.  Right
    columns colliding with a left name get ``rsuffix``.

    **Skew (salted) mode** — ``hot_keys`` is a driver-small list of key
    values whose row count would overwhelm a single bucket (find them
    with :func:`detect_hot_keys`, or pass ``hot_keys="auto"`` to run
    that census over the left side at ``hot_min_count`` — one extra
    combiner-first counting pass, worth it exactly when the key is
    power-law).  A hot LEFT row scatters to one of
    ``salt`` consecutive buckets ``(hash(k)+j) % num_buckets`` (j from
    a per-batch row counter — output is invariant to the choice); each
    hot RIGHT row is replicated to ALL ``salt`` of those buckets, so
    every (left, right) pair of a hot key co-locates in EXACTLY one
    bucket.  This caps per-bucket left volume at ~|hot|/salt at the
    price of salt× replication of the hot right rows — the standard
    salted-join trade, correct for ``inner``/``left`` (an unmatched
    right REPLICA just matches nothing and is dropped).  ``right``/
    ``full`` would emit unmatched hot right rows once per replica, so
    salting those raises instead of silently double-counting.

    This is the symmetric-shuffle path for two genuinely large sides —
    use :func:`broadcast_join` when one side is driver-small, and
    :func:`bucket_multijoin` for deep star trees on one key.  Unlike a
    chained ``Dataset.join`` it pins no aggregator actors (see the
    deadlock note on :func:`bucket_multijoin`); ``num_buckets`` bounds
    per-task memory: size it so (join input / num_buckets) fits a
    worker heap.
    """
    right_on = right_on or on
    how_map = {"inner": "inner", "left": "left outer",
               "right": "right outer", "full": "full outer"}
    assert how in how_map, f"unsupported how={how!r}"
    if isinstance(hot_keys, str):
        assert hot_keys == "auto", f"unknown hot_keys={hot_keys!r}"
        # one extra combiner-count pass over the LEFT lineage; the
        # returned list is ≤ |left| / hot_min_count keys by construction
        hot_keys = detect_hot_keys(left, on, min_count=hot_min_count)
    hot = list(hot_keys) if hot_keys else []
    if hot:
        assert how in ("inner", "left"), (
            "salted skew mode replicates hot right rows; an unmatched "
            "hot right row would surface once per replica under "
            f"how={how!r} — only inner/left are exact")
        salt = max(1, min(int(salt), num_buckets))

    from ..stages.base import schema_of

    # Pass left_schema/right_schema when the caller knows them: on a
    # lazy side the probe re-executes upstream lineage, and on an EMPTY
    # lazy side Ray drops all blocks and the probe returns None.
    lsch = schema_of(left, static=left_schema)
    rsch = schema_of(right, static=right_schema)
    assert lsch is not None and rsch is not None, (
        "join side has no schema (empty lazy relation) — pass "
        "left_schema/right_schema")
    key_type = lsch.field(on).type
    assert key_type == rsch.field(right_on).type, (
        f"join key types differ: {key_type} vs {rsch.field(right_on).type}")
    lvals = [n for n in lsch.names if n != on]
    rvals = [n for n in rsch.names if n != right_on]
    rename = {c: (c + rsuffix if c in [on] + lvals else c) for c in rvals}
    out_cols = [on] + lvals + [rename[c] for c in rvals]
    types = {on: key_type}
    for c in lvals:
        types[c] = lsch.field(c).type
    for c in rvals:
        types[rename[c]] = rsch.field(c).type

    hot_arr = pa.array(hot, type=key_type) if hot else None

    def tag(src, key_name, own_cols, ren):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {on: t[key_name]}
            for c in out_cols[1:]:
                cols[c] = pa.nulls(n, types[c])
            for c in own_cols:
                cols[ren.get(c, c)] = t[c]
            tt = pa.table({c: cols[c] for c in out_cols})
            tt = tt.append_column("__src", pa.array(np.full(n, src, np.int8)))
            b = _bucket_of(tt[on], num_buckets)
            if hot_arr is None or salt <= 1 or n == 0:
                return tt.append_column("__b", b)
            bh = b.to_numpy(zero_copy_only=False).astype(np.int64)
            is_hot = pc.is_in(tt[on], value_set=hot_arr)\
                .to_numpy(zero_copy_only=False).astype(bool)
            if src == 0:
                # scatter hot left rows round-robin over salt buckets
                j = np.zeros(n, np.int64)
                j[is_hot] = np.arange(int(is_hot.sum()), dtype=np.int64) % salt
                bh = (bh + j) % num_buckets
                return tt.append_column(
                    "__b", pa.array(bh.astype(np.int32), pa.int32()))
            # right side: cold rows once, hot rows replicated salt×
            mask = pa.array(is_hot)
            cold = tt.filter(pc.invert(mask)).append_column(
                "__b", pa.array(bh[~is_hot].astype(np.int32), pa.int32()))
            hot_t = tt.filter(mask)
            hb = bh[is_hot]
            parts = [cold]
            for jj in range(salt):
                parts.append(hot_t.append_column(
                    "__b",
                    pa.array(((hb + jj) % num_buckets).astype(np.int32),
                             pa.int32())))
            return pa.concat_tables(parts)
        return f

    unioned = left.map_batches(tag(0, on, lvals, {}),
                               batch_format="pyarrow").union(
        right.map_batches(tag(1, right_on, rvals, rename),
                          batch_format="pyarrow"))

    lside = [on] + lvals
    rside = [on] + [rename[c] for c in rvals]

    def merge(t: pa.Table) -> pa.Table:
        src = t["__src"]
        lt = t.filter(pc.equal(src, 0)).select(lside)
        rt = t.filter(pc.equal(src, 1)).select(rside)
        # Arrow drops null-key rows from outer results only on the
        # opposite side; SQL keeps a left row with a null key in LEFT
        # joins (it just matches nothing) — Table.join already does.
        return lt.join(rt, keys=[on], join_type=how_map[how]).select(out_cols)

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(unioned, "__b", merge)


def detect_hot_keys(ds, key: str, min_count: int) -> list:
    """Driver-small list of ``key`` values with ≥ ``min_count`` rows —
    the hot side of a skewed join, fed to :func:`hash_join`'s
    ``hot_keys``.

    Combiner-first: each batch emits one (key, partial count) row, the
    grouped-sum shuffle then moves only partials — a hot key costs one
    row per batch, never its row volume.  Only keys passing the
    threshold reach the driver, so the result is bounded by
    |input| / min_count regardless of skew.
    """

    def partial(t: pa.Table) -> pa.Table:
        # null keys never equi-join-match, so salting them buys
        # nothing — and a null in the hot list breaks sorted() below
        t = t.filter(pc.is_valid(t[key]))
        g = t.select([key]).group_by([key], use_threads=False)\
            .aggregate([([], "count_all")])
        return pa.table({key: g[key],
                         "cnt": g["count_all"].cast(pa.int64())})

    sums = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       [key], [("cnt", "sum", "cnt")])
    out = []
    for b in sums.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b.filter(pc.greater_equal(b["cnt"], pa.scalar(min_count,
                                                          pa.int64())))
        out.extend(t[key].to_pylist())
    return sorted(out)


def grouped_quantiles(ds, key: str, col: str, qs: list[float],
                      num_buckets: int = 64):
    """Per-key EXACT continuous quantiles (``quantile_cont`` semantics:
    linear interpolation at rank ``q*(n-1)``, nulls ignored).

    One bucket shuffle co-locates each key's values; inside a bucket
    ONE sort by (key, value) + run-boundary offsets give every group's
    order statistics, gathered for all groups × all qs in a handful of
    numpy takes — no per-group Python loop.  A single KEY's values must
    fit a worker (the per-key analogue of a sort); for quantiles over
    an unbounded single column use :func:`exact_quantiles`' histogram
    passes instead.

    Returns rows ``(key, q double, value double)``.
    """
    qarr = np.asarray(list(qs), np.float64)

    def add_b(t: pa.Table) -> pa.Table:
        t = t.select([key, col]).filter(pc.is_valid(t[col]))
        return t.append_column("__b", _bucket_of(t[key], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        kt = t[key].type
        if t.num_rows == 0:
            return pa.table({key: pa.nulls(0, kt),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            (col, "ascending")])
        t = t.take(idx)
        kv = t[key].combine_chunks()
        k_np = kv.to_numpy(zero_copy_only=False)
        v = t[col].combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        starts = np.ones(len(k_np), dtype=bool)
        starts[1:] = k_np[1:] != k_np[:-1]
        s_idx = np.flatnonzero(starts)
        lens = np.diff(np.append(s_idx, len(k_np)))
        # (G, Q) rank grid → floor/ceil gathers + linear interpolation
        h = np.outer(lens - 1, qarr)
        kf = np.floor(h).astype(np.int64)
        frac = h - kf
        kc = np.ceil(h).astype(np.int64)
        base = s_idx[:, None]
        vlo = v[base + kf]
        vhi = v[base + kc]
        vals = vlo + frac * (vhi - vlo)
        g = len(s_idx)
        return pa.table({
            key: kv.take(pa.array(np.repeat(s_idx, len(qarr)))),
            "q": pa.array(np.tile(qarr, g), pa.float64()),
            "value": pa.array(vals.ravel(), pa.float64()),
        })

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)


def ordered_prefix_sum(ds, order_col: str, val_col: str,
                       num_buckets: int = 64, out_col: str = "prefix"):
    """EXCLUSIVE running sum of ``val_col`` in ``order_col`` order — the
    distributed scan primitive (sequence packing, offset assignment,
    cumulative budgets).

    Three passes over a materialized 2-column projection:

    1. global (min, max) of ``order_col`` (per-batch partials, tiny
       reduce);
    2. per-range-bucket sums (uniform buckets over [min, max]; one
       ``grouped_agg`` whose output is ``num_buckets`` scalars) —
       the driver turns these into exclusive bucket offsets;
    3. bucket co-group shuffle; inside a bucket: sort by ``order_col``,
       local exclusive cumsum + that bucket's offset.

    Nothing larger than ``num_buckets`` scalars ever reaches the
    driver, and the only shuffle is the range-bucket co-group — the
    same cost profile as a sort.  ``order_col`` must be numeric and
    UNIQUE (ties would make "exclusive" ambiguous); values need not be
    dense — skewed ranges just imbalance buckets, they don't break
    correctness.
    """
    proj = ds.map_batches(lambda t: t.select([order_col, val_col]),
                          batch_format="pyarrow").materialize()

    def minmax(t: pa.Table) -> pa.Table:
        v = pc.drop_null(t[order_col].combine_chunks().cast(pa.float64()))
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array([pc.min(v).as_py()], pa.float64()),
                         "hi": pa.array([pc.max(v).as_py()], pa.float64())})

    mm = pa.concat_tables(list(
        proj.map_batches(minmax, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert mm.num_rows > 0, "ordered_prefix_sum on an empty dataset"
    lo = pc.min(mm["lo"]).as_py()
    hi = pc.max(mm["hi"]).as_py()
    span = (hi - lo) or 1.0

    def bucket_of(x: np.ndarray) -> np.ndarray:
        b = ((x - lo) / span * num_buckets).astype(np.int64)
        return np.clip(b, 0, num_buckets - 1)

    def bucket_sums(t: pa.Table) -> pa.Table:
        x = t[order_col].combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        v = t[val_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = bucket_of(x)
        present = np.unique(b)
        sums = np.bincount(b, weights=v, minlength=num_buckets)
        return pa.table({"__pb": pa.array(present),
                         "s": pa.array(sums[present].astype(np.int64))})

    sums = pa.concat_tables(list(
        grouped_agg(proj.map_batches(bucket_sums, batch_format="pyarrow"),
                    ["__pb"], [("s", "sum", "s")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    per_bucket_sum = np.zeros(num_buckets, np.int64)
    for r in sums.to_pylist():
        per_bucket_sum[r["__pb"]] = r["s"]
    offsets = np.concatenate([[0], np.cumsum(per_bucket_sum)[:-1]])

    def add_b(t: pa.Table) -> pa.Table:
        x = t[order_col].combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        return t.append_column(
            "__pb", pa.array(bucket_of(x).astype(np.int32)))

    def scan_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["__pb"]).append_column(
                out_col, pa.array([], pa.int64()))
        b = int(t["__pb"][0].as_py())
        idx = pc.sort_indices(t, sort_keys=[(order_col, "ascending")])
        t = t.take(idx)
        v = t[val_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        run = offsets[b] + np.concatenate([[0], np.cumsum(v)[:-1]])
        return t.drop_columns(["__pb"]).append_column(
            out_col, pa.array(run.astype(np.int64)))

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        proj.map_batches(add_b, batch_format="pyarrow"), "__pb", scan_bucket)


def funnel_stages(ds, key: str, ts_col: str, type_col: str,
                  steps: list[str], num_buckets: int = 64):
    """Strict sequential funnel: how far each ``key`` (user) progressed
    through ``steps`` — step *i+1* counts only if it happens STRICTLY
    AFTER the key's first qualifying step *i* (first-touch semantics,
    the standard product-analytics conversion funnel).

    Returns one row per distinct key: ``(key, stage)`` with ``stage`` ∈
    [0, len(steps)].  One ``hash(key) % num_buckets`` shuffle; inside a
    bucket the whole chain is a vectorized polars pass — one
    filter+group_by min per step, joined forward on the previous step's
    timestamp — so cost is O(steps) scans of the bucket, never a
    per-user Python loop.
    """
    import polars as pl

    def add_b(t: pa.Table) -> pa.Table:
        cols = [key, ts_col, type_col]
        return t.select(cols).append_column(
            "__b", _bucket_of(t[key], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, ts_col, type_col]))
        users = df.select(pl.col(key)).unique()
        stage = users.with_columns(pl.lit(0, pl.Int32).alias("stage"))
        prev = None  # (user, t_prev) frame of keys still in the funnel
        for i, ev in enumerate(steps):
            cand = df.filter(pl.col(type_col) == ev)
            if prev is not None:
                cand = cand.join(prev, on=key).filter(
                    pl.col(ts_col) > pl.col("__t"))
            hit = (cand.group_by(key)
                   .agg(pl.col(ts_col).min().alias("__t")))
            stage = stage.with_columns(
                pl.when(pl.col(key).is_in(hit.get_column(key)))
                .then(pl.lit(i + 1, pl.Int32))
                .otherwise(pl.col("stage")).alias("stage"))
            prev = hit
        out = stage.to_arrow()
        return out.cast(pa.schema([(key, t.schema.field(key).type),
                                   ("stage", pa.int32())]))

    from ..stages.base import bucketed_map_groups

    return bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)


def _collect_table(d, empty: "pa.Table | None" = None) -> pa.Table:
    """Materialize a (small, by contract) Dataset to one Arrow table —
    the broadcast-side collect used by the standardize / MAD /
    winsorize family.  ``empty`` supplies a TYPED fallback when the
    dataset yields no blocks."""
    parts = [b for b in d.iter_batches(batch_format="pyarrow",
                                       batch_size=None)]
    if parts:
        return pa.concat_tables(parts)
    assert empty is not None, "empty result with no typed fallback"
    return empty


def _null_safe_left_join(t: pa.Table, small: pa.Table, key: str) -> pa.Table:
    """Broadcast-side left join that matches NULL keys to each other —
    SQL window functions treat nulls as one partition, but Arrow's
    ``Table.join`` never matches null keys, which would silently null
    out the null group's stats."""
    import polars as pl

    out = (pl.from_arrow(t)
           .join(pl.from_arrow(small), on=key, how="left",
                 nulls_equal=True)
           .to_arrow())
    # polars round-trips string → large_string; cast every surviving
    # column back to its source arrow type so downstream output dtypes
    # (and the driver's value hash) match the un-joined path
    orig = {f.name: f.type for f in small.schema}
    orig.update({f.name: f.type for f in t.schema})
    for i, f in enumerate(out.schema):
        want = orig.get(f.name)
        if want is not None and f.type != want:
            out = out.set_column(i, f.name, out[f.name].cast(want))
    return out


def grouped_standardize(ds, key: str, col: str, out_col: str = "z",
                        round_digits: int = 6, keep_cols: list[str] | None = None):
    """Per-group z-score standardization: ``z = (x − mean_g) / std_g``
    (sample std), the feature-normalization primitive.

    Two passes, zero big-side shuffle: one combiner-first
    :func:`grouped_agg` produces the per-group (mean, std) table —
    num_groups rows, small by construction — which is broadcast back
    into a second map pass.  Mirrors SQL ``(x − AVG(x) OVER (PARTITION
    BY g)) / STDDEV_SAMP(x) OVER (PARTITION BY g)``.  Groups with
    n < 2 or zero variance yield null z (SQL division by NULL/0 → the
    oracle's NULLIF convention).
    """
    import ray

    stats = _collect_table(
        grouped_agg(ds, [key], [(col, "avg", "__mean"),
                                (col, "std", "__std")]),
        empty=pa.table({key: pa.array([], pa.string()),
                        "__mean": pa.array([], pa.float64()),
                        "__std": pa.array([], pa.float64())}))
    # std == 0 → null (match SQL NULLIF(std, 0))
    std = pc.if_else(pc.equal(stats["__std"], pa.scalar(0.0)),
                     pa.nulls(stats.num_rows, pa.float64()), stats["__std"])
    stats = stats.set_column(stats.schema.get_field_index("__std"),
                             "__std", std)
    ref = ray.put(stats)
    keep = list(keep_cols or [])
    scale = float(10 ** round_digits)

    def z(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        j = _null_safe_left_join(t.select([key, col] + keep), s, key)
        x = pc.cast(j[col], pa.float64())
        raw = pc.divide(pc.subtract(x, j["__mean"]), j["__std"])
        zc = pc.divide(pc.round(pc.multiply(raw, pa.scalar(scale)),
                                ndigits=0), pa.scalar(scale))
        return pa.table({key: j[key],
                         **{c: j[c] for c in keep},
                         out_col: zc})

    return ds.map_batches(z, batch_format="pyarrow")


def mad_outliers(ds, key: str, col: str, k: float = 3.0,
                 keep_cols: list[str] | None = None,
                 round_digits: int = 9):
    """Robust per-group outlier filter: keep rows with
    ``round(|x − median_g| / MAD_g, round_digits) > k`` where ``MAD_g``
    is the median absolute deviation (both medians exact,
    ``quantile_cont(0.5)`` semantics via :func:`grouped_quantiles`).

    Three streaming passes; the only driver-side state is two
    num_groups-row median tables (broadcast back).  The ratio is
    rounded identically in engine and SQL oracle before the comparison
    so boundary rows agree bit-for-bit.  Groups with MAD == 0 keep no
    rows (SQL NULLIF(mad, 0) → null ratio → filtered).
    """
    import ray

    _collect = _collect_table

    med = _collect(grouped_quantiles(ds, key, col, [0.5]))
    med = pa.table({key: med[key], "__med": med["value"]})
    med_ref = ray.put(med)

    def absdev(t: pa.Table) -> pa.Table:
        j = _null_safe_left_join(t.select([key, col]), ray.get(med_ref),
                                 key)
        x = pc.cast(j[col], pa.float64())
        return pa.table({key: j[key],
                         "__ad": pc.abs(pc.subtract(x, j["__med"]))})

    mad = _collect(grouped_quantiles(
        ds.map_batches(absdev, batch_format="pyarrow"), key, "__ad", [0.5]))
    mad_v = pc.if_else(pc.equal(mad["value"], pa.scalar(0.0)),
                       pa.nulls(mad.num_rows, pa.float64()), mad["value"])
    both = _null_safe_left_join(med, pa.table({key: mad[key],
                                               "__mad": mad_v}), key)
    both_ref = ray.put(both)
    keep = list(keep_cols or [])
    scale = float(10 ** round_digits)

    def flag(t: pa.Table) -> pa.Table:
        j = _null_safe_left_join(t.select([key, col] + keep),
                                 ray.get(both_ref), key)
        x = pc.cast(j[col], pa.float64())
        ratio = pc.divide(pc.abs(pc.subtract(x, j["__med"])), j["__mad"])
        ratio = pc.divide(pc.round(pc.multiply(ratio, pa.scalar(scale)),
                                   ndigits=0), pa.scalar(scale))
        m = pc.fill_null(pc.greater(ratio, pa.scalar(float(k))), False)
        return j.filter(m).select([key, col] + keep)

    return ds.map_batches(flag, batch_format="pyarrow")


def grouped_winsorize(ds, key: str, col: str, lo_q: float = 0.05,
                      hi_q: float = 0.95, out_col: str = "clipped",
                      keep_cols: list[str] | None = None):
    """Per-group winsorization: clip ``col`` to its group's
    [``lo_q``, ``hi_q``] exact quantiles (``quantile_cont`` semantics —
    the same interpolation :func:`grouped_quantiles` already proves
    bit-identical to DuckDB).  One quantile pass produces a
    2·num_groups-row table, broadcast back into a clip map — the big
    side never shuffles."""
    import ray

    q = _collect_table(grouped_quantiles(ds, key, col, [lo_q, hi_q]))
    lo = q.filter(pc.equal(q["q"], pa.scalar(lo_q)))
    hi = q.filter(pc.equal(q["q"], pa.scalar(hi_q)))
    bounds = _null_safe_left_join(
        pa.table({key: lo[key], "__lo": lo["value"]}),
        pa.table({key: hi[key], "__hi": hi["value"]}), key)
    ref = ray.put(bounds)
    keep = list(keep_cols or [])

    def clip(t: pa.Table) -> pa.Table:
        j = _null_safe_left_join(t.select([key, col] + keep),
                                 ray.get(ref), key)
        x = pc.cast(j[col], pa.float64())
        c = pc.min_element_wise(pc.max_element_wise(x, j["__lo"]), j["__hi"])
        return pa.table({key: j[key], **{c_: j[c_] for c_ in keep},
                         out_col: c})

    return ds.map_batches(clip, batch_format="pyarrow")


def key_skew_stats(ds, key: str, round_digits: int = 6):
    """One-row skew diagnostic for a prospective partition key — run
    this BEFORE choosing a groupby/shuffle key at scale:

      ``(n, n_keys, top1_share, entropy_bits)``

    top1_share = share of rows held by the hottest key; entropy_bits =
    Shannon entropy of the key distribution (log2(n_keys) when
    uniform).  Plan: one combiner-first :func:`grouped_agg` count (the
    only shuffle, distinct-key volume), then per-batch partials of
    (Σc, max c, Σ c·log2 c, #keys) — four scalars per batch — finalized
    on the driver via  H = log2(n) − (Σ c·log2 c)/n.
    """
    counts = grouped_agg(ds, [key], [(key, "count", "c")])

    def partial(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([float(c.sum())], pa.float64()),
            "mx": pa.array([float(c.max()) if len(c) else 0.0],
                           pa.float64()),
            "clogc": pa.array([float((c * np.log2(c)).sum())], pa.float64()),
            "k": pa.array([int(len(c))], pa.int64()),
        })

    parts = pa.concat_tables(
        [b for b in counts.map_batches(partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)])
    n = float(pc.sum(parts["n"]).as_py() or 0.0)
    mx = float(pc.max(parts["mx"]).as_py() or 0.0)
    clogc = float(pc.sum(parts["clogc"]).as_py() or 0.0)
    k = int(pc.sum(parts["k"]).as_py() or 0)
    ent = (np.log2(n) - clogc / n) if n > 0 else 0.0
    return pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "n_keys": pa.array([k], pa.int64()),
        "top1_share": pa.array([round(mx / n, round_digits) if n else None],
                               pa.float64()),
        "entropy_bits": pa.array([round(float(ent), round_digits)],
                                 pa.float64()),
    })


def column_profile(ds, cols: list[str]):
    """Dataset profiling: one row per column with ``(column, n, n_null,
    n_distinct)`` — the pre-flight diagnostic for schema/key choices
    (exact distinct via the dedup shuffle, null-excluding like SQL
    COUNT(DISTINCT); row/null counts from per-batch partials).

    All per-column pipelines are TAGGED and UNIONED into one streaming
    execution — N independent ``count()`` calls would each pay a full
    session's fixed scheduling cost (measured 3× slower at 3 columns);
    the union executes them concurrently and only per-column scalar
    partials reach the driver."""
    from ..dedup.exact import dedup_exact

    legs = []
    for c in cols:
        proj = ds.select_columns([c])

        def meta(t: pa.Table, _c=c) -> pa.Table:
            v = t[_c]
            return pa.table({
                "column": pa.array([_c, _c], pa.string()),
                "stat": pa.array(["n", "n_null"], pa.string()),
                "v": pa.array([t.num_rows, v.null_count], pa.int64()),
            })

        legs.append(proj.map_batches(meta, batch_format="pyarrow"))
        nn = proj.map_batches(lambda t, _c=c: t.filter(pc.is_valid(t[_c])),
                              batch_format="pyarrow")

        def dcount(t: pa.Table, _c=c) -> pa.Table:
            return pa.table({
                "column": pa.array([_c], pa.string()),
                "stat": pa.array(["n_distinct"], pa.string()),
                "v": pa.array([t.num_rows], pa.int64()),
            })

        legs.append(dedup_exact(nn, keys=[c], order_by=c)
                    .map_batches(dcount, batch_format="pyarrow"))
    unioned = legs[0]
    for leg in legs[1:]:
        unioned = unioned.union(leg)
    parts = pa.concat_tables(
        [b for b in unioned.iter_batches(batch_format="pyarrow",
                                         batch_size=None)])
    agg = {}
    for r in parts.to_pylist():
        agg[(r["column"], r["stat"])] = \
            agg.get((r["column"], r["stat"]), 0) + r["v"]
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "n": pa.array([agg.get((c, "n"), 0) for c in cols], pa.int64()),
        "n_null": pa.array([agg.get((c, "n_null"), 0) for c in cols],
                           pa.int64()),
        "n_distinct": pa.array([agg.get((c, "n_distinct"), 0)
                                for c in cols], pa.int64()),
    })


def multi_key_anti_join(left, right, keys: list[str],
                        num_buckets: int = 64,
                        left_schema: "pa.Schema | None" = None):
    """Rows of ``left`` whose ``keys`` TUPLE does not appear in
    ``right`` (NOT EXISTS over a composite key) — exact, no hashing of
    the tuple into a single collision-prone column.  One side-tagged
    union + one hash-bucket co-group; inside a bucket a vectorized
    polars anti-join.  ``right`` contributes only its key columns.

    Pass ``left_schema`` when you know it: ``left.schema()`` on a lazy
    pipeline may execute part of it just for metadata, paying the
    upstream stages twice."""
    import polars as pl

    from ..stages.base import bucketed_map_groups, hash_column

    def tag(side: int, schema_cols):
        def f(t: pa.Table) -> pa.Table:
            if side == 1:
                t = t.select(keys)
                # pad to the left schema with typed nulls
                cols = {}
                for name, typ in schema_cols:
                    cols[name] = (t[name] if name in keys
                                  else pa.nulls(t.num_rows, typ))
                t = pa.table(cols)
            b = pc.cast(pc.bit_wise_and(hash_column(t, keys=tuple(keys)),
                                        pa.scalar(num_buckets - 1,
                                                  pa.uint64())),
                        pa.int32())
            return (t.append_column("__side",
                                    pa.array(np.full(t.num_rows, side,
                                                     np.int8)))
                    .append_column("__b", b))

        return f

    from ..stages.base import schema_of

    lschema = schema_of(left, static=left_schema)
    schema_cols = [(f.name, f.type) for f in lschema]
    assert num_buckets & (num_buckets - 1) == 0
    tagged = left.map_batches(tag(0, schema_cols),
                              batch_format="pyarrow").union(
        right.map_batches(tag(1, schema_cols), batch_format="pyarrow"))

    out_names = [n for n, _ in schema_cols]

    def per_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        l = df.filter(pl.col("__side") == 0).drop(["__side", "__b"])
        r = (df.filter(pl.col("__side") == 1)
             .select(keys).unique())
        if r.height == 0:
            out = l
        else:
            out = l.join(r, on=keys, how="anti", nulls_equal=True)
        res = out.to_arrow().select(out_names)
        return res.cast(pa.schema(schema_cols))

    return bucketed_map_groups(tagged, "__b", per_bucket)


def grouped_corr(ds, keys: list[str], x: str, y: str,
                 round_digits: int = 6):
    """Per-group Pearson correlation and sample covariance of two
    columns — the two-column member of the mergeable-moment family
    (:func:`grouped_agg` covers the one-column moments).

    Per-batch partials ``(n, Σx, Σy, Σxx, Σyy, Σxy)`` over PAIRWISE
    COMPLETE rows (either value null → row ignored, SQL corr/covar_samp
    semantics) shuffle as six float64 scalars per (batch, group); the
    driver never sees data rows.  Finalize:
    ``cov = (Σxy − ΣxΣy/n) / (n−1)``,
    ``corr = cov_pop / (σx σy)`` — both rounded so the SQL oracle
    agrees bit-for-bit.  n < 2 or zero variance → null (SQL).
    """
    phys = ["__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"]

    def partial(t: pa.Table) -> pa.Table:
        # rows are NOT filtered: a group whose rows are all pairwise-
        # incomplete must still surface (SQL emits it with n=0 and null
        # covar/corr) — invalid rows contribute zeros and n counts only
        # pairwise-complete rows.
        xv = pc.cast(t[x], pa.float64())
        yv = pc.cast(t[y], pa.float64())
        ok = pc.and_(pc.is_valid(xv), pc.is_valid(yv)).combine_chunks() \
            if isinstance(xv, pa.ChunkedArray) else \
            pc.and_(pc.is_valid(xv), pc.is_valid(yv))
        okn = pc.fill_null(ok, False).to_numpy(zero_copy_only=False)
        xn = np.where(okn, pc.fill_null(xv, 0.0).to_numpy(
            zero_copy_only=False), 0.0)
        yn = np.where(okn, pc.fill_null(yv, 0.0).to_numpy(
            zero_copy_only=False), 0.0)
        cols = {k: t[k] for k in keys}
        cols["__n"] = pa.array(okn.astype(np.int64))
        cols["__sx"] = pa.array(xn)
        cols["__sy"] = pa.array(yn)
        cols["__sxx"] = pa.array(xn * xn)
        cols["__syy"] = pa.array(yn * yn)
        cols["__sxy"] = pa.array(xn * yn)
        g = pa.table(cols).group_by(keys, use_threads=False).aggregate(
            [(c, "sum") for c in phys])
        return g.rename_columns(keys + phys)

    merged = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         keys, [(c, "sum", c) for c in phys])

    def finish(t: pa.Table) -> pa.Table:
        n = t["__n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["__sx"].to_numpy(zero_copy_only=False)
        sy = t["__sy"].to_numpy(zero_copy_only=False)
        sxx = t["__sxx"].to_numpy(zero_copy_only=False)
        syy = t["__syy"].to_numpy(zero_copy_only=False)
        sxy = t["__sxy"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = np.where(n > 1, (sxy - sx * sy / np.maximum(n, 1))
                           / np.maximum(n - 1, 1), np.nan)
            vx = sxx - sx * sx / np.maximum(n, 1)
            vy = syy - sy * sy / np.maximum(n, 1)
            denom = np.sqrt(vx * vy)
            corr = np.where((n > 1) & (denom > 0),
                            (sxy - sx * sy / np.maximum(n, 1)) / denom,
                            np.nan)
        cov = np.round(cov, round_digits)
        corr = np.round(corr, round_digits)
        out = {k: t[k] for k in keys}
        out["n"] = t["__n"]
        out["covar"] = pa.array(
            [None if np.isnan(v) else float(v) for v in cov],
            pa.float64())
        out["corr"] = pa.array(
            [None if np.isnan(v) else float(v) for v in corr],
            pa.float64())
        return pa.table(out)

    return merged.map_batches(finish, batch_format="pyarrow")


def union_by_name(datasets, schemas=None):
    """SQL ``UNION ALL BY NAME`` over Datasets with differing schemas
    (schema evolution: a new source shard gains/loses columns): columns
    match by NAME, missing ones null-pad, order = first appearance.
    A column present in several inputs must have one type (no silent
    casts — schema drift should fail loudly).  Stream-union, no
    shuffle.

    ``schemas`` optionally supplies static schemas (same order as
    ``datasets``) so lazy inputs are never schema-probed."""
    assert datasets, "union_by_name of nothing"
    schemas = list(schemas) if schemas else [None] * len(datasets)
    cols: dict[str, pa.DataType] = {}
    resolved = []
    from ..stages.base import schema_of

    for ds, st in zip(datasets, schemas):
        sch = schema_of(ds, static=st)
        resolved.append(sch)
        for f in sch:
            if f.name in cols and cols[f.name] != f.type:
                raise TypeError(
                    f"column {f.name!r} has conflicting types "
                    f"{cols[f.name]} vs {f.type}")
            cols.setdefault(f.name, f.type)

    def pad(have: set):
        def f(t: pa.Table) -> pa.Table:
            out = {}
            for name, typ in cols.items():
                out[name] = (t[name] if name in have
                             else pa.nulls(t.num_rows, typ))
            return pa.table(out)

        return f

    out = None
    for ds, sch in zip(datasets, resolved):
        part = ds.map_batches(pad({f.name for f in sch}),
                              batch_format="pyarrow")
        out = part if out is None else out.union(part)
    return out


def upsert(base, updates, keys: list[str], num_buckets: int = 64,
           base_schema=None):
    """SCD-1 merge (SQL ``MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT`` with whole-row updates): every ``updates`` row
    wins on its key tuple; ``base`` rows without a matching key pass
    through.  One composite-key anti-join co-group shuffle — the same
    plan the incremental-KG update uses for its store merge.

    Both sides must share the base schema (column order is
    re-projected).  Duplicate keys WITHIN ``updates`` are kept as-is
    (bag semantics) — dedup first if updates may self-conflict."""
    from ..stages.base import schema_of

    sch = schema_of(base, static=base_schema)
    names = [f.name for f in sch]

    def proj(t: pa.Table) -> pa.Table:
        return t.select(names)

    survivors = multi_key_anti_join(base, updates, keys=list(keys),
                                    num_buckets=num_buckets,
                                    left_schema=sch)
    return updates.map_batches(proj, batch_format="pyarrow").union(
        survivors.map_batches(proj, batch_format="pyarrow"))
