"""Corpus indexing operators: inverted index and broadcast keyword tagging.

Engine-first additions (the reference has no full-text surface).  Both
are classic training-data-pipeline primitives: the inverted index is
the retrieval/decontamination artifact (token → posting list), keyword
tagging is the broadcast-side "scan the corpus for these N needles"
primitive (policy filters, topic routing).

Scale notes:

- ``inverted_index``: per-batch (token, doc) pairs are pre-distincted
  locally, then ONE hash-bucket shuffle on ``hash(token) % B`` groups
  postings; per-bucket aggregation is a vectorized polars pass.  The
  shuffle moves (token, doc_id) pairs — O(total tokens) — and posting
  lists are built only inside their bucket, so no single task ever sees
  more than one bucket's tokens.  A pathological stop-word still
  concentrates one token's postings in one task: cap it with ``max_df``
  (dropped tokens are LOGGED, mirroring the dedup family's skew caps).
- ``keyword_tags``: the keyword list ships once via the closure (tiny);
  each batch runs one vectorized ``match_substring`` per keyword —
  O(keywords × batch) with zero shuffle.  For large automata swap the
  per-keyword scan for the lexicon trie (``state/lexicon.py``), same
  stage shape.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_TOKEN_SPLIT = "[^a-z0-9]+"


def _token_doc_pairs(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Batch → distinct (token, doc) pairs, tokenized exactly like the
    SQL oracle: ``string_split_regex(lower(text), '[^a-z0-9]+')``,
    empties dropped."""
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(text, "")), _TOKEN_SPLIT)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    flat = pa.table({
        "token": toks.flatten(),
        "doc_id": ids.take(pa.array(np.repeat(np.arange(len(lens)), lens))),
    })
    flat = flat.filter(pc.not_equal(flat["token"], pa.scalar("")))
    return flat.group_by(["token", "doc_id"], use_threads=False).aggregate([])


def inverted_index(ds, id_col: str = "doc_id", text_col: str = "text",
                   min_df: int = 1, max_df: int | None = None,
                   num_buckets: int | None = None):
    """documents → ``(token, df, postings list<int64> ascending)``.

    ``min_df`` prunes the long hapax tail (most of a real corpus's
    distinct tokens); ``max_df`` caps stop-word postings (dropped
    tokens logged).  Document ids are cast to int64 postings.
    """
    from ..stages.base import _auto_buckets, bucketed_map_groups

    nb = _auto_buckets(num_buckets)
    assert nb & (nb - 1) == 0, "num_buckets must be a power of two"

    def local(t: pa.Table) -> pa.Table:
        from ..stages.base import hash_column

        flat = _token_doc_pairs(t, id_col, text_col)
        b = pc.cast(pc.bit_wise_and(hash_column(flat, keys=("token",)),
                                    pa.scalar(nb - 1, pa.uint64())),
                    pa.int32())
        return flat.append_column("__b", b)

    def per_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        empty = pa.table({
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "postings": pa.array([], pa.list_(pa.int64())),
        })
        if t.num_rows == 0:
            return empty
        df = (pl.from_arrow(t.select(["token", "doc_id"]))
              .with_columns(pl.col("doc_id").cast(pl.Int64))
              .unique()
              .sort(["token", "doc_id"])
              .group_by("token", maintain_order=True)
              .agg(df=pl.len().cast(pl.Int64), postings=pl.col("doc_id")))
        df = df.filter(pl.col("df") >= min_df)
        if max_df is not None:
            hot = df.filter(pl.col("df") > max_df)
            if hot.height:
                logger.warning(
                    "inverted_index: %d tokens with df > max_df=%d dropped "
                    "(stop-word cap)", hot.height, max_df)
            df = df.filter(pl.col("df") <= max_df)
        if df.height == 0:
            return empty
        out = df.to_arrow()
        return out.cast(pa.schema([("token", pa.string()),
                                   ("df", pa.int64()),
                                   ("postings", pa.list_(pa.int64()))]))

    return bucketed_map_groups(
        ds.select_columns([id_col, text_col])
          .map_batches(local, batch_format="pyarrow"),
        "__b", per_bucket)


def keyword_tags(ds, keywords: list[str], id_col: str = "doc_id",
                 text_col: str = "text"):
    """documents × keywords → ``(id, keyword)`` for every document whose
    text CONTAINS the keyword (raw substring — SQL ``contains(text, kw)``
    semantics; case-sensitive).  Zero shuffle."""
    kws = sorted(set(keywords))

    def scan(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_ids, out_kw = [], []
        for kw in kws:
            m = pc.match_substring(text, kw)
            hit = ids.filter(m)
            if len(hit):
                out_ids.append(hit)
                out_kw.append(pa.array([kw] * len(hit), pa.string()))
        if not out_ids:
            return pa.table({id_col: ids.slice(0, 0),
                             "keyword": pa.array([], pa.string())})
        return pa.table({id_col: pa.concat_arrays(out_ids),
                         "keyword": pa.concat_arrays(out_kw)})

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow")


def boolean_search(ds, all_of: list[str], id_col: str = "doc_id",
                   text_col: str = "text"):
    """Token-level AND search: ids of documents whose TOKEN SET (same
    tokenizer as :func:`inverted_index`) contains every needle in
    ``all_of``.  Fully map-side — each batch tokenizes, keeps only
    needle tokens, and counts distinct needles per doc; no shuffle.
    (The inverted-index probe is the right plan when the needle list is
    issued repeatedly against a PERSISTED index; this is the one-shot
    scan.)"""
    needles = sorted(set(all_of))
    need = pa.array(needles, pa.string())
    k = len(needles)

    def scan(t: pa.Table) -> pa.Table:
        import polars as pl

        flat = _token_doc_pairs(t, id_col, text_col)
        flat = flat.filter(pc.is_in(flat["token"], value_set=need))
        if flat.num_rows == 0:
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type)})
        hits = (pl.from_arrow(flat)
                .group_by("doc_id")
                .agg(pl.col("token").n_unique().alias("__k"))
                .filter(pl.col("__k") == k)
                .select("doc_id"))
        out = hits.to_arrow().rename_columns([id_col])
        return out.cast(pa.schema([(id_col, t.schema.field(id_col).type)]))

    return ds.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow")
