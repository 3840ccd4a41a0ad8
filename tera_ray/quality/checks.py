"""Declarative data-quality constraint validation + distribution drift.

The reference has no data-quality component; these are engine-first
operators a 100 TB training-data pipeline needs before anything else
touches the data (the Deequ shape: declared constraints → one
distributed pass → a small pass/fail report; arXiv:1812.06372 describes
the mergeable-state design this follows).

Scale design (the ``column_profile`` pattern, ``query/relational.py``):

- batch-local checks (``not_null`` / ``in_range`` / ``in_set`` /
  ``matches``) all ride ONE ``map_batches`` pass that emits a fixed
  number of ``(chk, col, stat, v)`` partial rows per batch — counters,
  never values;
- ``unique`` rides the exact-dedup shuffle (``dedup/exact.py`` — the A1
  machinery), contributing one distinct-count partial per output batch;
- ``foreign_key`` rides the bucketed composite-key anti-join
  (``relational.multi_key_anti_join``), contributing orphan-count
  partials;
- every leg is UNIONED into one streaming execution; only scalar
  partials reach the driver, which folds them into the report table.

``histogram_psi`` is the drift monitor: per-(split, bin) count partials
through the grouped combiner, then the Population Stability Index per
bin driver-side over ≤ ``n_bins × n_splits`` scalars — vectors/rows
never leave the workers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Check:
    """One declared constraint.

    ``kind``: not_null | in_range | in_set | matches | unique |
    foreign_key.  ``col``: display name (comma-joined for multi-column
    keys).  ``params``: kind-specific.
    """

    kind: str
    col: str
    params: tuple = field(default_factory=tuple)


def not_null(col: str) -> Check:
    return Check("not_null", col)


def in_range(col: str, lo=None, hi=None) -> Check:
    """Non-null values must satisfy ``lo <= v <= hi`` (either bound
    optional).  Nulls are ``not_null``'s job, as in SQL ``FILTER
    (WHERE v < lo OR v > hi)``."""
    return Check("in_range", col, (lo, hi))


def in_set(col: str, values) -> Check:
    return Check("in_set", col, (tuple(values),))


def matches(col: str, pattern: str) -> Check:
    """Non-null values must match ``pattern`` (RE2, unanchored — anchor
    explicitly with ``^…$`` when you mean the whole value)."""
    return Check("matches", col, (pattern,))


def unique(*cols: str) -> Check:
    """The column tuple must be a key: violations = rows beyond the
    first per distinct tuple (null tuples group together, like SQL
    ``SELECT DISTINCT``)."""
    return Check("unique", ",".join(cols), (tuple(cols),))


def approx_unique(*cols: str, tol: float = 0.03, p: int = 14) -> Check:
    """Sketch-backed uniqueness check for 100 TB keys: the engine's
    deterministic HLL (:mod:`tera_ray.sketch.hll` — FNV-1a + xorshift
    mix, SQL-bit-reproducible; std-err ≈ ``1.04/sqrt(2^p)``) replaces
    the exact-dedup shuffle — NOTHING shuffles, each batch contributes
    at most ``2^p`` scalar register partials that fold by max inside
    the one streaming union.  Violations = ``max(0, n -
    floor(estimate + 0.5))``; the check passes when the violation
    fraction is within ``max_frac + tol`` (the tolerance absorbs the
    sketch's error band — size it ≥ ~3 std-errs).  Null key tuples are
    dropped from the sketch (unlike ``unique``, which groups them)."""
    return Check("approx_unique", ",".join(cols), (tuple(cols), tol, p))


def _hll_key_array(t: pa.Table, cols, drop_null: bool = True) -> pa.Array:
    """Joined string key array for the sketch checks (``\\x1f``
    separator; a null in any column nulls the tuple)."""
    arrs = []
    for col in cols:
        v = pc.cast(t[col], pa.string())
        arrs.append(v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                    else v)
    v = arrs[0] if len(arrs) == 1 \
        else pc.binary_join_element_wise(*arrs, "\x1f")
    return v.drop_null() if drop_null else v


def approx_distinct(ds, cols, p: int = 14) -> float:
    """Estimated ``COUNT(DISTINCT cols)`` over a Dataset via the
    deterministic HLL sketch (:func:`tera_ray.sketch.hll.hll_registers`
    over the joined key column): per-batch register partials → grouped
    max (≤ ``2^p`` rows cross the exchange TOTAL) → driver estimate."""
    from ..sketch.hll import hll_estimate, hll_registers

    cols = [cols] if isinstance(cols, str) else list(cols)

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({"__k": _hll_key_array(t, cols, drop_null=False)})

    regs = pa.concat_tables(list(
        hll_registers(ds.select_columns(cols)
                      .map_batches(keyed, batch_format="pyarrow"),
                      "__k", p)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return hll_estimate(regs, p)


def foreign_key(cols, ref, ref_cols) -> Check:
    """Every non-matching key tuple is a violation (``NOT EXISTS``
    semantics — a NULL key never matches, so it counts as an orphan).
    ``ref`` is the referenced Dataset; ``ref_cols`` its key columns."""
    cols = tuple(cols) if not isinstance(cols, str) else (cols,)
    ref_cols = tuple(ref_cols) if not isinstance(ref_cols, str) else (ref_cols,)
    assert len(cols) == len(ref_cols)
    return Check("foreign_key", ",".join(cols), (cols, ref, ref_cols))


def approx_foreign_key(cols, ref, ref_cols, *, num_bits: int = 1 << 20,
                       num_hashes: int = 4) -> Check:
    """Sketch-backed referential integrity for 100 TB keys: the exact
    ``foreign_key`` anti-join shuffles both sides; this check instead
    folds the referenced keys into a Bloom filter (~``num_bits`` bits
    TOTAL, OR-merged per batch) and counts DEFINITE orphans — rows
    whose key misses the filter (plus NULL keys, which match nothing).
    A member key always probes positive, so violations here are a
    LOWER BOUND on the exact count, under it by at most the filter's
    false-positive rate ``(1 - e^(-k·n/m))^k``.  Nothing shuffles;
    ``ds`` is probed map-side against the broadcast filter.

    Hashing is the deterministic FNV-1a + xorshift mix
    (:mod:`tera_ray.sketch.hll`) with Kirsch-Mitzenmacher double
    hashing, so filter contents and violation counts are
    SQL-bit-reproducible.  ``num_bits`` must be a power of two.
    """
    cols = tuple(cols) if not isinstance(cols, str) else (cols,)
    ref_cols = tuple(ref_cols) if not isinstance(ref_cols, str) else (ref_cols,)
    assert len(cols) == len(ref_cols)
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of 2"
    return Check("approx_foreign_key", ",".join(cols),
                 (cols, ref, ref_cols, num_bits, num_hashes))


def _bloom_hash_pair(v: pa.Array) -> tuple:
    """Deterministic (h1, h2) u64 hash pair over a string key array —
    FNV-1a + mix for h1, the same over the ``"|b"``-salted key for h2
    (both reproducible in DuckDB SQL, see the ``dq_approx_fk``
    oracle)."""
    from ..sketch.hll import _mix64
    from ..text.analysis import _fnv1a_u64

    vals = v.to_numpy(zero_copy_only=False).astype(object)
    h1 = _mix64(_fnv1a_u64(vals))
    salted = np.array([s + "|b" for s in vals], object)
    h2 = _mix64(_fnv1a_u64(salted))
    return h1, h2


def _bloom_positions(h1, h2, num_bits: int, num_hashes: int):
    """(n, k) int64 position matrix via double hashing — power-of-two
    ``num_bits`` makes ``(h1 + i·h2) mod 2^64 mod m == (h1 + i·h2)
    mod m``, which is what keeps the SQL oracle exact."""
    mask = np.uint64(num_bits - 1)
    with np.errstate(over="ignore"):
        return np.stack(
            [((h1 + np.uint64(i) * h2) & mask).astype(np.int64)
             for i in range(num_hashes)], axis=1)


def _build_ref_bloom(ref, ref_cols, num_bits: int, num_hashes: int,
                     fold_batch: int = 64):
    """Distributed OR-fold of per-batch partial filters: two
    ``fold_batch``× reduction passes (the ``query/bloom.build_bloom``
    pattern) so the driver only ORs the blocks/fold_batch² survivors —
    never one ``num_bits/8``-byte row per raw block."""
    def partial(t: pa.Table) -> pa.Table:
        v = _hll_key_array(t, list(ref_cols))
        words = np.zeros(num_bits // 64, np.uint64)
        if len(v):
            h1, h2 = _bloom_hash_pair(v)
            pos = _bloom_positions(h1, h2, num_bits, num_hashes).ravel()
            np.bitwise_or.at(
                words, (pos >> 6),
                np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        return pa.table({"w": pa.array([words.tobytes()],
                                       pa.large_binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(num_bits // 64, np.uint64)
        for cell in t["w"].to_pylist():
            acc |= np.frombuffer(cell, np.uint64)
        return pa.table({"w": pa.array([acc.tobytes()],
                                       pa.large_binary())})

    parts = ref.select_columns(list(ref_cols)).map_batches(
        partial, batch_size=None, batch_format="pyarrow")
    for _ in range(2):
        parts = parts.map_batches(fold, batch_size=fold_batch,
                                  batch_format="pyarrow")
    words = np.zeros(num_bits // 64, np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for cell in b["w"].to_pylist():
            words |= np.frombuffer(cell, np.uint64)
    return words


_PARTIAL_SCHEMA = pa.schema([
    ("chk", pa.string()),
    ("col", pa.string()),
    ("stat", pa.string()),
    ("v", pa.int64()),
])


def _local_partials(batch: pa.Table,
                    local_checks: list[tuple[int, Check]]) -> pa.Table:
    """All batch-local checks in one pass → fixed-size partial rows.

    Partials are keyed by the check's position in the declared list
    (``chk = "<kind>#<idx>"``) so two checks of the same kind on the
    same column (e.g. two ``in_range`` bounds) fold separately.
    """
    chks, cols, stats, vs = ["__rows"], [""], ["n"], [batch.num_rows]
    for idx, c in local_checks:
        v = batch[c.col]
        if c.kind == "not_null":
            viol = v.null_count
        elif c.kind == "in_range":
            lo, hi = c.params
            bad = None
            if lo is not None:
                bad = pc.less(v, lo)
            if hi is not None:
                gt = pc.greater(v, hi)
                bad = gt if bad is None else pc.or_(bad, gt)
            viol = 0 if bad is None else pc.sum(bad).as_py() or 0
        elif c.kind == "in_set":
            ok = pc.is_in(v, value_set=pa.array(list(c.params[0])))
            viol = pc.sum(pc.and_(pc.is_valid(v),
                                  pc.invert(ok))).as_py() or 0
        elif c.kind == "matches":
            ok = pc.match_substring_regex(
                v if pa.types.is_string(v.type) else v.cast(pa.string()),
                c.params[0])
            viol = pc.sum(pc.and_(pc.is_valid(v),
                                  pc.invert(ok))).as_py() or 0
        else:  # pragma: no cover
            raise ValueError(c.kind)
        chks.append(f"{c.kind}#{idx}")
        cols.append(c.col)
        stats.append("viol")
        vs.append(int(viol))
    return pa.table({"chk": chks, "col": cols, "stat": stats,
                     "v": pa.array(vs, pa.int64())},
                    schema=_PARTIAL_SCHEMA)


def _count_partial(chk: str, col: str, stat: str):
    def f(t: pa.Table) -> pa.Table:
        return pa.table({"chk": [chk], "col": [col], "stat": [stat],
                         "v": pa.array([t.num_rows], pa.int64())},
                        schema=_PARTIAL_SCHEMA)
    return f


def run_checks(ds, checks: list[Check], max_frac: float = 0.0) -> pa.Table:
    """Evaluate ``checks`` over ``ds`` in ONE streaming execution.

    Returns the report table ``(chk, col, n, violations, frac,
    passed)`` sorted by (chk, col); ``passed`` is ``frac <= max_frac``.
    ``frac`` is rounded to 6 digits (the driver-compare convention).
    """
    from ..dedup.exact import dedup_exact
    from ..query.relational import multi_key_anti_join

    local = [(i, c) for i, c in enumerate(checks)
             if c.kind in ("not_null", "in_range", "in_set", "matches")]
    legs = [ds.map_batches(lambda t, _l=local: _local_partials(t, _l),
                           batch_format="pyarrow")]
    # ref-side Bloom builds are separate (blocking) dataset executions;
    # with several approx_foreign_key checks they run CONCURRENTLY via
    # threads so total wall is the slowest ref scan, not the sum
    bloom_checks = [(i, c) for i, c in enumerate(checks)
                    if c.kind == "approx_foreign_key"]
    blooms: dict[int, np.ndarray] = {}
    if len(bloom_checks) == 1:
        i, c = bloom_checks[0]
        cols, ref, ref_cols, num_bits, num_hashes = c.params
        blooms[i] = _build_ref_bloom(ref, ref_cols, num_bits, num_hashes)
    elif bloom_checks:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(bloom_checks)) as ex:
            futs = {i: ex.submit(_build_ref_bloom, c.params[1],
                                 c.params[2], c.params[3], c.params[4])
                    for i, c in bloom_checks}
        blooms = {i: f.result() for i, f in futs.items()}
    for i, c in enumerate(checks):
        if c.kind == "approx_unique":
            cols, _tol, p = c.params

            def _hll_leg(t: pa.Table, _i=i, _c=c, _cols=list(cols),
                         _p=p) -> pa.Table:
                from ..sketch.hll import _registers_batch

                v = _hll_key_array(t, _cols)
                if len(v) == 0:
                    return _PARTIAL_SCHEMA.empty_table()
                idx, rho = _registers_batch(
                    v.to_numpy(zero_copy_only=False), _p)
                n = len(idx)
                return pa.table({
                    "chk": pa.array([f"approx_unique#{_i}"] * n),
                    "col": pa.array([_c.col] * n),
                    "stat": pa.array([str(j) for j in idx]),
                    "v": pa.array(rho, pa.int64()),
                }, schema=_PARTIAL_SCHEMA)

            legs.append(ds.select_columns(list(cols)).map_batches(
                _hll_leg, batch_format="pyarrow"))
        elif c.kind == "approx_foreign_key":
            cols, ref, ref_cols, num_bits, num_hashes = c.params
            import ray as _ray

            wref = _ray.put(blooms[i])

            def _bloom_leg(t: pa.Table, _i=i, _c=c, _cols=list(cols),
                           _m=num_bits, _k=num_hashes,
                           _wref=wref) -> pa.Table:
                import ray as _ray

                w = _ray.get(_wref)
                v = _hll_key_array(t, _cols, drop_null=False)
                null_mask = pc.is_null(v).to_numpy(zero_copy_only=False)
                orphans = int(null_mask.sum())  # NULL matches nothing
                vv = v.drop_null()
                if len(vv):
                    h1, h2 = _bloom_hash_pair(vv)
                    pos = _bloom_positions(h1, h2, _m, _k)
                    bit = (w[pos >> 6]
                           >> (pos.astype(np.uint64) & np.uint64(63))) \
                        & np.uint64(1)
                    member = bit.astype(bool).all(axis=1)
                    orphans += int((~member).sum())
                return pa.table({
                    "chk": [f"approx_foreign_key#{_i}"], "col": [_c.col],
                    "stat": ["orphan"],
                    "v": pa.array([orphans], pa.int64()),
                }, schema=_PARTIAL_SCHEMA)

            legs.append(ds.select_columns(list(cols)).map_batches(
                _bloom_leg, batch_format="pyarrow"))
        elif c.kind == "unique":
            cols = list(c.params[0])
            legs.append(
                dedup_exact(ds.select_columns(cols), keys=cols,
                            order_by=cols[0])
                .map_batches(
                    _count_partial(f"unique#{i}", c.col, "distinct"),
                    batch_format="pyarrow"))
        elif c.kind == "foreign_key":
            cols, ref, ref_cols = c.params
            rk = ref.select_columns(list(ref_cols))

            def _prep_ref(t: pa.Table, _rc=list(ref_cols),
                          _c=list(cols)) -> pa.Table:
                # NOT EXISTS semantics: a NULL ref key matches nothing,
                # so drop null-keyed ref rows before the anti-join
                # (polars' anti-join treats nulls as equal otherwise).
                keep = pc.is_valid(t[_rc[0]])
                for rc in _rc[1:]:
                    keep = pc.and_(keep, pc.is_valid(t[rc]))
                return t.filter(keep).rename_columns(_c)

            rk = rk.map_batches(_prep_ref, batch_format="pyarrow")
            orphans = multi_key_anti_join(
                ds.select_columns(list(cols)), rk, list(cols))
            legs.append(orphans.map_batches(
                _count_partial(f"foreign_key#{i}", c.col, "orphan"),
                batch_format="pyarrow"))
    unioned = legs[0]
    for leg in legs[1:]:
        unioned = unioned.union(leg)

    def _fold(t: pa.Table) -> pa.Table:
        # combiner over the partial stream (sum, except HLL register
        # rows which fold by max) so the driver sees blocks/batch_size
        # survivors, not one row-set per raw block
        if t.num_rows == 0:
            return t
        is_max = pc.starts_with(t["chk"], "approx_unique#")
        outs = []
        for part, aggfn in ((t.filter(pc.invert(is_max)), "sum"),
                            (t.filter(is_max), "max")):
            if part.num_rows == 0:
                continue
            g = part.group_by(["chk", "col", "stat"],
                              use_threads=False).aggregate([("v", aggfn)])
            outs.append(pa.table({"chk": g["chk"], "col": g["col"],
                                  "stat": g["stat"],
                                  "v": g[f"v_{aggfn}"].cast(pa.int64())},
                                 schema=_PARTIAL_SCHEMA))
        return pa.concat_tables(outs) if outs \
            else _PARTIAL_SCHEMA.empty_table()

    unioned = unioned.map_batches(_fold, batch_size=8192,
                                  batch_format="pyarrow")
    agg: dict[tuple, int] = {}
    for b in unioned.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            k = (r["chk"], r["col"], r["stat"])
            if r["chk"].startswith("approx_unique#"):
                # HLL register partials merge by MAX, not sum
                agg[k] = max(agg.get(k, 0), r["v"])
            else:
                agg[k] = agg.get(k, 0) + r["v"]
    n_rows = agg.get(("__rows", "", "n"), 0)
    out = []
    for i, c in enumerate(checks):
        tol = 0.0
        if c.kind == "unique":
            viol = n_rows - agg.get((f"unique#{i}", c.col, "distinct"), 0)
        elif c.kind == "approx_unique":
            from ..sketch.hll import hll_estimate

            _cols, tol, p = c.params
            pairs = [(int(stat), v) for (chk, col, stat), v in agg.items()
                     if chk == f"approx_unique#{i}"]
            est = hll_estimate(pa.table({
                "reg": pa.array([r for r, _ in pairs], pa.int64()),
                "rho": pa.array([v for _, v in pairs], pa.int64()),
            }), p)
            # floor(e + 0.5): identical half-rounding in numpy and SQL
            viol = max(0, n_rows - int(np.floor(est + 0.5)))
        elif c.kind in ("foreign_key", "approx_foreign_key"):
            viol = agg.get((f"{c.kind}#{i}", c.col, "orphan"), 0)
        else:
            viol = agg.get((f"{c.kind}#{i}", c.col, "viol"), 0)
        frac = round(viol / n_rows, 6) if n_rows else 0.0
        out.append((c.kind, c.col, n_rows, viol, frac,
                    frac <= max_frac + tol))
    out.sort(key=lambda r: (r[0], r[1]))
    return pa.table({
        "chk": pa.array([r[0] for r in out], pa.string()),
        "col": pa.array([r[1] for r in out], pa.string()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "violations": pa.array([r[3] for r in out], pa.int64()),
        "frac": pa.array([r[4] for r in out], pa.float64()),
        "passed": pa.array([r[5] for r in out], pa.bool_()),
    })


def histogram_psi(ds, split_col: str, value_col: str, edges,
                  base: str, cmp: str) -> pa.Table:
    """Population Stability Index between two splits' distributions of
    ``value_col``, over fixed ``edges`` (bin b = count of edges <= v,
    so bin 0 is ``(-inf, edges[0])`` and bin ``len(edges)`` is
    ``[edges[-1], inf)``; nulls are dropped).

    One combiner pass emits per-batch (split, bin) counts; the grouped
    merge shuffles ≤ ``n_splits × n_bins`` rows; the driver computes
    Laplace-smoothed proportions ``p = (cnt + 0.5) / (N + 0.5·k)`` and
    the per-bin term ``(p - q) · ln(p / q)`` — smoothing keeps empty
    bins finite and deterministic.  Returns ``(bin, n_base, n_cmp,
    psi_term)`` for every bin; total PSI = sum of ``psi_term``.
    """
    from ..query.relational import grouped_agg

    e = np.asarray(list(edges), np.float64)
    k = len(e) + 1

    def partial(t: pa.Table) -> pa.Table:
        s = t[split_col]
        keep = pc.and_(pc.is_valid(s), pc.is_valid(t[value_col]))
        t = t.filter(keep)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(e, v, side="right")
        g = pa.table({"split": t[split_col],
                      "bin": pa.array(b, pa.int32())}) \
            .group_by(["split", "bin"], use_threads=False) \
            .aggregate([("bin", "count")])
        # Select by name: pyarrow's keys-vs-aggregates column order has
        # differed across versions, so a positional rename is fragile.
        return pa.table({"split": g["split"], "bin": g["bin"],
                         "cnt": g["bin_count"]})

    counts = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["split", "bin"], [("cnt", "sum", "cnt")])
    nb = np.zeros(k, np.int64)
    nc = np.zeros(k, np.int64)
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            if r["split"] == base:
                nb[r["bin"]] = r["cnt"]
            elif r["split"] == cmp:
                nc[r["bin"]] = r["cnt"]
    p = (nb + 0.5) / (nb.sum() + 0.5 * k)
    q = (nc + 0.5) / (nc.sum() + 0.5 * k)
    term = np.round((p - q) * np.log(p / q), 6)
    return pa.table({
        "bin": pa.array(np.arange(k, dtype=np.int32)),
        "n_base": pa.array(nb),
        "n_cmp": pa.array(nc),
        "psi_term": pa.array(term, pa.float64()),
    })
