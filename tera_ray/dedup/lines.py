"""Corpus-level exact line deduplication (boilerplate scrub).

The training-data hygiene step document-level dedup cannot do: a line
(nav bar, licence header, cookie banner) that appears in ``min_docs``
or more DISTINCT documents is removed from EVERY document, preserving
the order of the surviving lines.  This is the RefinedWeb/Falcon-style
"remove duplicated lines across the corpus" pass; the reference engine
has no corpus-wide analogue (its dedup is whole-triple set semantics,
``tera/DataAggregation.py:32``), so this is an engine extension.

Plan (one shuffle + one broadcast-filtered scan):

1. **Census** — each batch explodes texts into ``(line, doc)`` pairs,
   dedups them locally (a doc's repeated line counts once), and ships
   them through ONE hash-bucket groupby on ``hash(line) % B``; a
   per-bucket vectorized ``n_unique(doc)`` marks the hot lines.
2. **Broadcast scrub** — the hot-line set (small: boilerplate, not
   corpus text) is ``ray.put`` once; an actor-pool stage splits each
   text, drops member lines with one ``is_in`` mask, and rebuilds the
   document (vectorized polars explode → filter → join, no per-row
   Python).

Scale note: the census shuffle volume is the DISTINCT (line, doc) pair
volume — the same order as any exact-key dedup.  The hot set rides the
object store once per node, not per task; its size is bounded by the
corpus' boilerplate diversity, and ``max_hot`` fails fast (with the
measured count) instead of silently broadcasting an unbounded set.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

__all__ = ["hot_lines", "dedup_lines"]


def hot_lines(ds, id_col: str = "doc_id", text_col: str = "text",
              sep: str = "\n", min_docs: int = 2,
              num_buckets: int | None = None):
    """Dataset of lines occurring in ≥ ``min_docs`` DISTINCT documents
    (one ``line`` column) — the census half of :func:`dedup_lines`."""
    from ..stages.base import _auto_buckets, bucketed_map_groups, hash_column

    num_buckets = _auto_buckets(num_buckets)

    def pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame({
            "d": pl.from_arrow(t[id_col].combine_chunks()),
            "line": pl.from_arrow(pc.split_pattern(
                t[text_col].combine_chunks(), sep)),
        })
        out = df.explode("line").unique().to_arrow()
        out = pa.table({"d": out["d"], "line": out["line"].cast(pa.string())})
        h = hash_column(out, keys=("line",))
        b = pc.cast(pc.bit_wise_and(h, pa.scalar(num_buckets - 1,
                                                 pa.uint64())), pa.int32())
        return out.append_column("__b", b)

    def per_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["d", "line"]))
        g = (df.group_by("line")
             .agg(pl.col("d").n_unique().alias("n"))
             .filter(pl.col("n") >= min_docs)
             .select("line"))
        out = g.to_arrow()
        return pa.table({"line": out["line"].cast(pa.string())})

    return bucketed_map_groups(
        ds.map_batches(pairs, batch_format="pyarrow"), "__b", per_bucket)


class _LineScrub:
    """Actor-pool stage: drop the broadcast hot lines from each text.

    The hot set is fetched from the object store ONCE per actor
    (zero-copy within a node), not per batch."""

    def __init__(self, hot_ref, id_col: str, text_col: str, sep: str):
        import ray

        hot = ray.get(hot_ref)
        import polars as pl

        self.hot = pl.from_arrow(hot)
        self.id_col, self.text_col, self.sep = id_col, text_col, sep

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        n = t.num_rows
        df = pl.DataFrame({
            "i": pl.from_arrow(pa.array(np.arange(n), pa.int64())),
            "line": pl.from_arrow(pc.split_pattern(
                t[self.text_col].combine_chunks(), self.sep)),
        })
        kept = (df.explode("line")
                .filter(~pl.col("line").is_in(self.hot))
                .group_by("i", maintain_order=False)
                .agg(pl.col("line").str.join(self.sep)))
        base = pl.DataFrame({"i": pl.from_arrow(
            pa.array(np.arange(n), pa.int64()))})
        joined = base.join(kept, on="i", how="left").sort("i")
        text = joined["line"].fill_null("").to_arrow().cast(pa.string())
        out = {c: t[c] for c in t.schema.names if c != self.text_col}
        out[self.text_col] = text
        return pa.table(out)


def dedup_lines(ds, id_col: str = "doc_id", text_col: str = "text",
                sep: str = "\n", min_docs: int = 2,
                num_buckets: int | None = None, max_hot: int = 5_000_000,
                concurrency: int | None = None):
    """Remove every line that occurs in ≥ ``min_docs`` distinct
    documents from ALL documents; other columns pass through, documents
    whose lines are all removed keep an empty ``text_col``.

    ``polars explode`` preserves list order, so surviving lines keep
    their original in-document order.  Raises if the hot set exceeds
    ``max_hot`` lines (the broadcast-set bound — lower ``min_docs``
    selectivity, or scrub in key-range passes)."""
    import ray

    parts = list(hot_lines(
        ds, id_col=id_col, text_col=text_col, sep=sep, min_docs=min_docs,
        num_buckets=num_buckets).iter_batches(batch_format="pyarrow",
                                              batch_size=None))
    if not parts:                           # no hot lines: nothing to scrub
        logger.info("dedup_lines: hot-line set empty, pass-through")
        return ds
    hot = pa.concat_tables(parts)
    if hot.num_rows > max_hot:
        raise ValueError(
            f"hot-line set ({hot.num_rows}) exceeds max_hot ({max_hot}); "
            "raise min_docs or scrub in key-range passes")
    logger.info("dedup_lines: broadcasting %d hot lines", hot.num_rows)
    hot_ref = ray.put(hot["line"].combine_chunks())
    return ds.map_batches(
        _LineScrub, fn_constructor_kwargs={
            "hot_ref": hot_ref, "id_col": id_col,
            "text_col": text_col, "sep": sep},
        batch_format="pyarrow",
        concurrency=(1, concurrency) if concurrency else (1, 8))
