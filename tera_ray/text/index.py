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


def _term_tf_dl(t: pa.Table, terms: list[str], id_col: str,
                text_col: str):
    """Batch → (ids Array, dl int64[n], tf int64[|terms|, n]) with the
    oracle tokenizer.  All Arrow/numpy kernels — the per-term loop runs
    once per QUERY term (a handful), never per row."""
    text = t[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(text, "")), _TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    n = len(lens)
    flat = toks.flatten()
    doc_idx = np.repeat(np.arange(n), lens)
    nonempty = pc.not_equal(flat, pa.scalar("")).to_numpy(
        zero_copy_only=False)
    dl = np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64)
    tf = np.zeros((len(terms), n), np.int64)
    for i, term in enumerate(terms):
        eq = pc.equal(flat, pa.scalar(term)).to_numpy(zero_copy_only=False)
        if eq.any():
            tf[i] = np.bincount(doc_idx[eq], minlength=n)
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return ids, dl, tf


def bm25_topk(ds, terms: list[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text"):
    """Scored retrieval: global BM25 top-``k`` documents for a bag of
    query terms (Robertson idf ``ln((N-df+0.5)/(df+0.5)+1)``).

    Two streaming passes, no index required:

    1. corpus statistics — each batch emits ``|terms|+1`` partial rows
       (per-term df, plus N / Σdl for avgdl); a tiny ``groupby(term)``
       sum reduces them (shuffle volume O(batches × terms)).
    2. scoring — each batch computes tf/dl vectorized and keeps its
       LOCAL top-k positive scores, so the merge sees only
       O(blocks × k) rows; one bucketed group sorts them with the
       deterministic ``(−score, doc_id)`` tie-break.

    Scores are emitted as ``score_micro = floor(score·1e6 + 0.5)``
    int64 so a float64 SQL oracle hash-matches exactly (same convention
    as the engine's other fixed-point surfaces).  At 100 TB both passes
    are single sweeps with broadcast-scale reductions — nothing
    materializes beyond ``blocks × k`` candidate rows.
    """
    from ..stages.base import bucketed_map_groups

    terms = sorted(set(tm.lower() for tm in terms))
    src = ds.select_columns([id_col, text_col])

    def stats_partial(t: pa.Table) -> pa.Table:
        _, dl, tf = _term_tf_dl(t, terms, id_col, text_col)
        return pa.table({
            "term": pa.array(terms + ["\x00corpus"], pa.string()),
            "df": pa.array([int((row > 0).sum()) for row in tf]
                           + [t.num_rows], pa.int64()),
            "dl": pa.array([0] * len(terms) + [int(dl.sum())], pa.int64()),
        })

    agg = (src.map_batches(stats_partial, batch_format="pyarrow")
           .groupby("term")
           .sum(["df", "dl"]))
    stats = {r["term"]: (r["sum(df)"], r["sum(dl)"])
             for r in agg.take_all()}
    n_docs, total_len = stats.pop("\x00corpus", (0, 0))
    if n_docs == 0:
        return ds.limit(0).map_batches(
            lambda t: pa.table({id_col: pa.array([], pa.int64()),
                                "score_micro": pa.array([], pa.int64()),
                                "rank": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    avgdl = total_len / n_docs
    idf = np.array([
        np.log((n_docs - stats.get(tm, (0, 0))[0] + 0.5)
               / (stats.get(tm, (0, 0))[0] + 0.5) + 1.0)
        for tm in terms])

    def score_local(t: pa.Table) -> pa.Table:
        ids, dl, tf = _term_tf_dl(t, terms, id_col, text_col)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(dl), np.float64)
        for i in range(len(terms)):
            tfi = tf[i].astype(np.float64)
            s += idf[i] * (tfi * (k1 + 1.0)) / (tfi + norm)
        micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        pos = np.flatnonzero(micro > 0)
        ids_np = np.asarray(ids.to_numpy(zero_copy_only=False))[pos]
        micro = micro[pos]
        order = np.lexsort((ids_np, -micro))[:k]
        return pa.table({
            id_col: pa.array(ids_np[order]).cast(
                t.schema.field(id_col).type),
            "score_micro": pa.array(micro[order]),
            "__q": pa.array(np.zeros(len(order), np.int32)),
        })

    cand = src.map_batches(score_local, batch_format="pyarrow")

    def top(t: pa.Table) -> pa.Table:
        ids_np = t[id_col].to_numpy(zero_copy_only=False)
        micro = t["score_micro"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_np, -micro))[:k]
        return pa.table({
            id_col: t[id_col].take(pa.array(order)),
            "score_micro": pa.array(micro[order]),
            "rank": pa.array(np.arange(1, len(order) + 1,
                                       dtype=np.int64)),
        })

    return bucketed_map_groups(cand, "__q", top)
