"""Vectorized Arrow cleaning kernels.

Mirrors the reference's per-loader pandas cleanup sequence —
``read_csv(na_values=nan_values)`` → ``dropna`` → ``str.strip`` (e.g.
``tera/DataAggregation.py:399-408``) — as zero-copy-friendly
``pyarrow.compute`` kernels usable inside ``map_batches``.

Order is load-bearing and matches the reference: the sentinel match is
applied to the *raw* values (pre-strip), then rows are dropped / filled,
then whitespace is trimmed.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .schema import NAN_VALUES

_SENTINELS = pa.array(NAN_VALUES, type=pa.string())


def nullify_sentinels(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Replace reference NA-sentinel values ('NR', 'NC', '--', …) with null.

    Chunks are combined first: ``pc.if_else`` over a multi-chunk
    ChunkedArray produced arrays with out-of-bounds binary offsets
    (observed on >1-row-group parquet reads), so the kernel must see one
    contiguous chunk."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mask = pc.is_in(col, value_set=_SENTINELS)
    return pc.if_else(mask, pa.scalar(None, type=pa.string()), col)


_INT64_MAX = (1 << 63) - 1
_INT64_MIN = -(1 << 63)
# DuckDB VARCHAR→BIGINT grammar pieces (trimmed input): plain/underscored
# integers, decimal forms (exact integer part + first-fraction-digit
# rounding), exponent forms (parsed via double), and 0x hex.
_RE_INT = r"^[-+]?\d(?:_?\d)*$"
_RE_DEC = r"^[-+]?(?:\d(?:_?\d)*)?\.(?:\d(?:_?\d)*)?$"
_RE_EXP = (r"^[-+]?(?:\d(?:_?\d)*(?:\.(?:\d(?:_?\d)*)?)?"
           r"|\.\d(?:_?\d)*)[eE][-+]?\d(?:_?\d)*$")
_RE_HEX = r"^[-+]?0[xX][0-9a-fA-F](?:_?[0-9a-fA-F])*$"


def sql_try_cast_int64(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """``TRY_CAST(varchar AS BIGINT)`` with DuckDB's exact semantics.

    The driver's correctness oracle compares against DuckDB, whose
    VARCHAR→BIGINT cast is far more permissive than Arrow/polars strict
    integer parsing: it trims whitespace, accepts ``+`` signs, digit
    separators (``5_0`` → 50), hex (``0x10`` → 16), decimal strings with
    an *exact* integer part and round-half-away-from-zero on the first
    fractional digit (``'1.5'`` → 2, ``'-0.5'`` → -1,
    ``'9223372036854775807.0'`` → max int64 — NOT double-mediated), and
    exponent forms via double (``'1e3'`` → 1000).  Anything unparseable
    or out of int64 range yields null (TRY semantics).

    All common shapes stay vectorized (one regex pass per grammar class,
    Arrow casts on the matched subsets); only oversized/hex/underscored
    stragglers fall back to per-value Python, bounded by their rarity.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = pc.utf8_trim_whitespace(col)
    n = len(t)
    out = np.zeros(n, dtype=np.int64)
    ok = np.zeros(n, dtype=bool)
    if n == 0:
        return pa.array(out, mask=~ok)
    present = pc.is_valid(t).to_numpy(zero_copy_only=False)

    def _match(regex: str) -> np.ndarray:
        m = pc.match_substring_regex(t, regex).to_numpy(zero_copy_only=False)
        return np.asarray(m, dtype=bool) & present

    # Fast path: plain ints that provably fit int64 (≤18 digits, no '_';
    # Arrow's int64 parser rejects a leading '+', so those go slow-path).
    ints = _match(_RE_INT)
    fast = ints & _match(r"^-?\d{1,18}$")
    if fast.any():
        idx = np.flatnonzero(fast)
        out[idx] = pc.cast(t.take(pa.array(idx)), pa.int64()).to_numpy(
            zero_copy_only=False)
        ok[idx] = True

    def _store(i: int, v: int) -> None:
        if _INT64_MIN <= v <= _INT64_MAX:
            out[i] = v
            ok[i] = True

    for i in np.flatnonzero(ints & ~fast):
        _store(i, int(t[i].as_py().replace("_", "")))

    decs = _match(_RE_DEC) & ~ints
    for i in np.flatnonzero(decs):
        s = t[i].as_py().replace("_", "")
        sign = -1 if s.lstrip("+-") != s and s[0] == "-" else 1
        body = s.lstrip("+-")
        ip, _, fp = body.partition(".")
        if not ip and not fp:        # bare '.' / '+.' — not a number
            continue
        v = int(ip) if ip else 0
        if fp and fp[0] >= "5":      # round half away from zero
            v += 1
        _store(i, sign * v)

    # Exponent forms replicate DuckDB's digit-wise algorithm (empirically
    # pinned; NOT float math).  The integer part must fit int64 or the
    # cast fails outright.  A non-negative exponent shifts the decimal
    # point right digit-by-digit (consuming fraction digits, padding
    # zeros, failing on overflow) and then rounds away from zero iff the
    # first LEFTOVER fraction digit ≥ 5.  A negative exponent IGNORES
    # the fraction digits entirely and runs res //= 10 per step, EXITING
    # EARLY once res == 0, rounding away from zero iff the last
    # remainder ≥ 5 — which is why '5e-1000' → 1 but '.735e-9' → 0.
    # Known divergence (accepted): exponent forms with >19 fraction
    # digits hit DuckDB-internal uint64 accumulator quirks that are
    # mutually inconsistent ('4.870558704802181896315e0' → 3 but
    # '1.844674407370955161599e0' → 2 on DuckDB 1.x); we round those
    # half-away-from-zero on the cut digit instead.
    for i in np.flatnonzero(_match(_RE_EXP) & ~ints & ~decs):
        s = t[i].as_py().replace("_", "")
        neg = s[0] == "-"
        mant, _, es = s.lstrip("+-").partition("e" if "e" in s else "E")
        ip, _, fp = mant.partition(".")
        bound = _INT64_MAX + (1 if neg else 0)
        res = int(ip) if ip else 0
        if res > bound:
            continue
        e = int(es)
        if e >= 0:
            overflow = False
            for k in range(e):
                if k >= len(fp) and res == 0:
                    break
                res = res * 10 + (int(fp[k]) if k < len(fp) else 0)
                if res > bound:
                    overflow = True
                    break
            if e < len(fp) and fp[e] >= "5":
                res += 1
            if overflow or res > bound:
                continue
        else:
            rem = 0
            while e < 0 and res != 0:
                res, rem = divmod(res, 10)
                e += 1
            if rem >= 5:
                res += 1
        out[i] = -res if neg else res
        ok[i] = True

    for i in np.flatnonzero(_match(_RE_HEX)):
        s = t[i].as_py().replace("_", "")
        sign = -1 if s[0] == "-" else 1
        _store(i, sign * int(s.lstrip("+-"), 16))

    return pa.array(out, mask=~ok)


def clean_table(
    table: pa.Table,
    dropna_subset: Sequence[str] | None = None,
    fill_missing: bool = False,
    strip: bool = True,
    scrub_nonword: Sequence[str] = (),
) -> pa.Table:
    """Apply the reference cleanup sequence to a batch.

    Parameters
    ----------
    dropna_subset : columns whose null forces a row drop; ``None`` means
        *all* string columns (pandas ``dropna()`` default).
    fill_missing : fill remaining nulls with the literal ``'missing'``
        (``DataAggregation.py:403,407``).
    scrub_nonword : columns to ``\\W``-scrub (``DataAggregation.py:721``).
    """
    string_cols = [f.name for f in table.schema if pa.types.is_string(f.type) or pa.types.is_large_string(f.type)]
    cols = {}
    for name in table.schema.names:
        col = table[name]
        if name in string_cols:
            col = nullify_sentinels(col)
        cols[name] = col

    subset = list(dropna_subset) if dropna_subset is not None else string_cols
    keep = None
    for name in subset:
        valid = pc.is_valid(cols[name])
        keep = valid if keep is None else pc.and_(keep, valid)

    out = pa.table(cols, schema=table.schema)
    if keep is not None:
        out = out.filter(keep)

    new_cols = []
    for name in out.schema.names:
        col = out[name]
        if name in string_cols:
            if fill_missing:
                col = pc.fill_null(col, "missing")
            if strip:
                col = pc.utf8_trim_whitespace(col)
            if name in scrub_nonword:
                col = pc.replace_substring_regex(col, r"\W", "")
        new_cols.append(col)
    return pa.table(dict(zip(out.schema.names, new_cols)))
