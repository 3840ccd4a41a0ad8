"""Exact word-n-gram Jaccard near-duplicate pairs (set-similarity join).

Engine-first addition alongside MinHash/SimHash (the reference's only
near-dup machinery is fuzzy entity alignment, ``tera/DataIntegration.py:
261-329``; documents need a set-similarity treatment).  Unlike
``minhash_dedup`` this computes the EXACT Jaccard over distinct word
n-gram shingles — the oracle-checkable ground truth the LSH variants
approximate.

Pipeline (one shuffle on the shingle hash):

  documents ──map_batches(shingle)──▶ (doc_id, shingle_u64, set_size)
            ──groupby(bucket=sh%B).map_groups(local pair counts)──▶
              (a, b, sa, sb, inter_partial)                       SHUFFLE
            ──grouped_agg((a,b,sa,sb), sum(inter))──▶             SHUFFLE (small)
            ──jaccard = inter/(sa+sb-inter), filter ≥ threshold

Scale notes: the shuffle moves one row per (doc, distinct shingle) —
8-byte hashes, never text.  Set sizes ride along with each shingle row
so no sizes join is needed (a doc's rows live in one input batch, so the
size is exact at emit time).  Pair blowup is bounded by per-bucket local
aggregation before the global sum; a stop-shingle cap (``max_df``) drops
shingles shared by more than ``max_df`` docs — a standard prefix-filter
relaxation that must be OFF (None) for exact-parity runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..query.relational import grouped_agg
from ..text.analysis import _fnv1a_u64

_B = np.uint64(1099511628211)


def doc_shingles(texts: pa.Array, n: int = 3):
    """texts → (doc_index array, distinct shingle-hash array, per-doc set
    sizes).  Tokens are ``[a-z0-9]+`` runs of the lowercased text (the
    ``regexp_extract_all`` oracle tokenization); docs with fewer than
    ``n`` tokens contribute no shingles.  Shingle hash = rolling FNV
    combine of token hashes (order-sensitive, injective modulo 2^-64
    collisions)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), r"[^a-z0-9]+")
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(offsets) - 1
    # split (unlike extract_all) yields empty tokens at punctuation edges
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    seg_len = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), seg_len)[nonempty]
    vals = flat.to_numpy(zero_copy_only=False).astype(object)[nonempty]
    if len(vals) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64),
                np.zeros(n_docs, np.int64))
    uniq, inv = np.unique(vals, return_inverse=True)
    tok_h = _fnv1a_u64(uniq)[inv]
    # rolling n-gram combine, masked at doc boundaries
    total = len(tok_h)
    with np.errstate(over="ignore"):
        sh = np.zeros(total, np.uint64)
        for j in range(n):
            shifted = np.zeros(total, np.uint64)
            if total - j > 0:
                shifted[: total - j] = tok_h[j:]
            sh += shifted * (_B ** np.uint64(n - 1 - j))
    counts = np.bincount(doc_of, minlength=n_docs)
    new_offsets = np.concatenate([[0], np.cumsum(counts)])
    within = np.arange(total) - np.repeat(new_offsets[:-1], counts)
    valid = within <= np.repeat(counts, counts) - n
    pair = np.stack([doc_of[valid].astype(np.uint64), sh[valid]], axis=1)
    pair = np.unique(pair, axis=0)           # distinct shingles per doc
    doc_idx = pair[:, 0].astype(np.int64)
    sizes = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    return doc_idx, pair[:, 1], sizes


def _shingle_batch(n: int, id_col: str, text_col: str, num_buckets: int):
    def f(t: pa.Table) -> pa.Table:
        doc_idx, sh, sizes = doc_shingles(t[text_col], n)
        ids = t[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table({
            "bucket": pa.array((sh % np.uint64(num_buckets)).astype(np.int64)),
            "sh": pa.array(sh),
            "doc": pa.array(ids, pa.int64()),
            "size": pa.array(sizes[doc_idx]),
        })

    return f


def _bucket_pairs(max_df: int | None):
    import polars as pl

    def f(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["sh", "doc", "size"]))
        if max_df is not None:
            df = df.filter(pl.len().over("sh") <= max_df)
        j = df.join(df, on="sh", suffix="_r").filter(
            pl.col("doc") < pl.col("doc_r"))
        out = (j.group_by(["doc", "doc_r", "size", "size_r"])
               .agg(pl.len().alias("inter"))
               .rename({"doc": "a", "doc_r": "b",
                        "size": "sa", "size_r": "sb"}))
        return out.to_arrow().cast(pa.schema([
            ("a", pa.int64()), ("b", pa.int64()), ("sa", pa.int64()),
            ("sb", pa.int64()), ("inter", pa.int64())]))

    return f


def ngram_jaccard_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, threshold: float = 0.5,
                        num_buckets: int = 64, max_df: int | None = None):
    """All pairs with exact word-``n``-gram Jaccard ≥ ``threshold``.

    Returns a Dataset ``(a, b, jaccard)`` with ``a < b``.  ``max_df``
    (stop-shingle cap) trades exactness for bounded hot-key pair blowup
    at scale; leave ``None`` when oracle parity is required.
    """
    shingled = ds.map_batches(
        _shingle_batch(n, id_col, text_col, num_buckets),
        batch_format="pyarrow")
    from ..stages.base import bucketed_map_groups

    local = bucketed_map_groups(shingled, "bucket", _bucket_pairs(max_df))
    summed = grouped_agg(local, ["a", "b", "sa", "sb"],
                         [("inter", "sum", "inter")])

    def fin(t: pa.Table) -> pa.Table:
        inter = t["inter"].combine_chunks().cast(pa.float64())
        union = pc.subtract(
            pc.add(t["sa"].combine_chunks(), t["sb"].combine_chunks()).cast(
                pa.float64()),
            inter)
        jac = pc.divide(inter, union)
        out = pa.table({"a": t["a"], "b": t["b"], "jaccard": jac})
        return out.filter(pc.greater_equal(jac, threshold))

    return summed.map_batches(fin, batch_format="pyarrow")


def dup_spans(ds, n: int = 8, id_col: str = "doc_id",
              text_col: str = "text", num_buckets: int | None = None):
    """Substring-level duplication report: for every document, how many
    of its distinct ``n``-token spans also occur in ANOTHER document —
    the span-granular signal behind "dedup the repeated 50-token
    passages" training-data hygiene (boilerplate, licence blocks,
    templated text), which document-level dedup cannot see.

    Output rows: ``(doc_id, n_spans, n_dup_spans)`` — one per document
    with ≥ ``n`` tokens.

    Plan (two shuffles, both on 8-byte payloads):

    1. each batch emits distinct ``(span_hash u64, doc_id)`` pairs via
       :func:`doc_shingles` (rolling FNV over token hashes, masked at
       doc boundaries) — span TEXT never leaves the task;
    2. hash-bucket groupby on ``span_hash % B``: a span is duplicated
       iff ≥ 2 distinct docs carry it; every row comes back out with a
       ``dup`` flag (vectorized polars window);
    3. ``grouped_agg(doc_id)`` counts spans and dup spans per doc —
       combiner-first, so the second shuffle moves one partial row per
       (batch, doc).

    Skew: a boilerplate span shared by millions of docs concentrates in
    one bucket row-group but the per-bucket work is a single vectorized
    ``n_unique`` window — no pair blowup (contrast ``ngram_jaccard``,
    which enumerates pairs and needs ``max_df``).
    """
    from ..stages.base import _auto_buckets, bucketed_map_groups, hash_column

    nb = _auto_buckets(num_buckets)
    assert nb & (nb - 1) == 0, "num_buckets must be a power of two"

    def emit(t: pa.Table) -> pa.Table:
        doc_idx, sh, _sizes = doc_shingles(t[text_col], n)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out = pa.table({
            "h": pa.array(sh, pa.uint64()),
            id_col: ids.take(pa.array(doc_idx)),
        })
        b = pc.cast(pc.bit_wise_and(hash_column(out, keys=("h",)),
                                    pa.scalar(nb - 1, pa.uint64())),
                    pa.int32())
        return out.append_column("__b", b)

    def flag_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                "dup": pa.array([], pa.int64()),
            })
        df = (pl.from_arrow(t.select(["h", id_col]))
              .with_columns(
                  (pl.col(id_col).n_unique().over("h") >= 2)
                  .cast(pl.Int64).alias("dup"))
              .select([id_col, "dup"]))
        return df.to_arrow().cast(pa.schema([
            (id_col, t.schema.field(id_col).type), ("dup", pa.int64())]))

    src = ds.select_columns([id_col, text_col])
    flags = bucketed_map_groups(
        src.map_batches(emit, batch_format="pyarrow"), "__b", flag_bucket)
    return grouped_agg(flags, [id_col],
                       [("dup", "count", "n_spans"),
                        ("dup", "sum", "n_dup_spans")])
