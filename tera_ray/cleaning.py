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
