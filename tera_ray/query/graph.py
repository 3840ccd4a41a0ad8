"""Distributed graph analytics over edge Datasets.

The reference's graph surface is query-side traversal (SURVEY §2.9);
this module adds the analytics a web-scale corpus graph needs (co-occurrence
/ similarity-graph structure): undirected triangle enumeration via the
classic two-shuffle wedge plan, and grouped pair (co-occurrence edge)
generation.

Scale notes: the wedge join is the textbook bottleneck on skewed graphs
(a degree-d hub makes d² wedges).  The canonical mitigation — orient
every edge from the lower-degree endpoint — keeps wedge counts bounded
by arboricity; here edges are oriented by id (``u < v``), which is the
same plan DuckDB's triple-join oracle uses, keeping engine and oracle
bit-identical.  For production-scale skew, feed :func:`triangles` a
degree-oriented edge list instead (same code path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_pairs(ds, group_col: str, item_col: str,
                  num_buckets: int = 64):
    """Distinct co-occurrence edges ``(u, v)`` with ``u < v``: every
    unordered pair of distinct ``item_col`` values sharing a
    ``group_col`` value.

    One bucket shuffle on ``group_col``; inside a bucket a single
    polars self-join per bucket (not per group) emits pairs vectorized,
    then a global exact dedup folds pairs seen in many groups.  The
    per-group pair count is quadratic in group size — cap pathological
    groups upstream if a group can exceed worker memory.
    """
    from ..stages.base import bucket_column, bucketed_map_groups, dedup_triples

    def add_b(t: pa.Table) -> pa.Table:
        t = t.select([group_col, item_col])
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[item_col])))
        return t.append_column("__b", bucket_column(t[group_col],
                                                    num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        ityp = t.schema.field(item_col).type
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], ityp),
                             "v": pa.array([], ityp)})
        df = pl.from_arrow(t.select([group_col, item_col])).unique()
        j = df.join(df, on=group_col)
        j = j.filter(pl.col(item_col) < pl.col(item_col + "_right"))
        out = j.select([pl.col(item_col).alias("u"),
                        pl.col(item_col + "_right").alias("v")]).unique()
        return out.to_arrow().cast(pa.schema([("u", ityp), ("v", ityp)]))

    pairs = bucketed_map_groups(
        ds.map_batches(add_b, batch_format="pyarrow"), "__b", per_bucket)
    return dedup_triples(pairs, keys=("u", "v"))


def triangles(edges, num_buckets: int = 64):
    """Enumerate distinct triangles ``(a, b, c)`` with ``a < b < c`` in
    an undirected graph given as distinct oriented edges ``(u, v)``,
    ``u < v``.

    Two shuffles, both bucketed co-groups:

    1. wedge join — ``edges ⋈ edges`` on the lower endpoint
       (:func:`..relational.hash_join` self-join) + ``b < c`` filter
       gives each open wedge ``(a, b, c)`` exactly once;
    2. closing check — semi-join of the wedge's ``(b, c)`` leg against
       the edge list on an exact composite key.

    Shuffle volume = Σ deg(a)² over lower endpoints (see module note on
    degree orientation for skewed graphs).
    """
    from .relational import hash_join, key_semi_join

    wedges = hash_join(edges, edges, on="u", num_buckets=num_buckets)
    # cols: (u, v, v_r); keep b < c
    wedges = wedges.map_batches(
        lambda t: (lambda f: pa.table({
            "a": f["u"], "b": f["v"], "c": f["v_r"]}))(
                t.filter(pc.less(t["v"], t["v_r"]))),
        batch_format="pyarrow")

    def ckey(t: pa.Table, x: str, y: str) -> pa.Array:
        return pc.binary_join_element_wise(
            pc.cast(t[x], pa.string()), pc.cast(t[y], pa.string()), ":")

    withk = wedges.map_batches(
        lambda t: t.append_column("__bc", ckey(t, "b", "c")),
        batch_format="pyarrow")
    ewithk = edges.map_batches(
        lambda t: pa.table({"__uv": ckey(t, "u", "v")}),
        batch_format="pyarrow")
    closed = key_semi_join(withk, ewithk, "__bc", "__uv",
                           num_buckets=num_buckets)
    return closed.map_batches(lambda t: t.select(["a", "b", "c"]),
                              batch_format="pyarrow")


def pagerank(edges, iters: int = 3, damping: float = 0.85,
             num_buckets: int = 64):
    """PageRank over an undirected graph given as distinct edges
    ``(u, v)`` — the canonical iterative-fixpoint benchmark for a
    distributed engine.  Fixed ``iters`` power iterations (deterministic,
    oracle-checkable); returns ``(node, rank)``.

    State is a ``(node, degree, rank)`` Dataset re-materialized per
    iteration (one row per node — the unavoidable working set; carrying
    the degree in-row saves a per-iteration join).  Each iteration is
    one hash-join (ranks → edge sources) + one grouped sum (combiner)
    + one left join back onto the node list so zero-in-degree nodes
    keep the teleport term.  No driver-side per-node state.
    """
    import ray.data  # noqa: F401  (ensures Dataset machinery loaded)

    from .relational import grouped_agg, hash_join

    both = edges.map_batches(
        lambda t: pa.concat_tables([
            pa.table({"src": t["u"], "dst": t["v"]}),
            pa.table({"src": t["v"], "dst": t["u"]})]),
        batch_format="pyarrow").materialize()
    deg = grouped_agg(both, ["src"],
                      [("src", "count", "d")]).materialize()
    n = deg.count()
    base = (1.0 - damping) / n

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "d": t["d"],
                         "r": pa.array(np.full(t.num_rows, 1.0 / n))})

    rank = deg.map_batches(init, batch_format="pyarrow").materialize()
    for _ in range(iters):
        contrib = hash_join(rank, both, on="node", right_on="src",
                            num_buckets=num_buckets).map_batches(
            lambda t: pa.table({
                "dst": t["dst"],
                "c": pc.divide(t["r"], pc.cast(t["d"], pa.float64()))}),
            batch_format="pyarrow")
        sums = grouped_agg(contrib, ["dst"], [("c", "sum", "s")])
        j = hash_join(deg, sums, on="src", right_on="dst", how="left",
                      num_buckets=num_buckets)
        rank = j.map_batches(
            lambda t: pa.table({
                "node": t["src"], "d": t["d"],
                "r": pc.add(pa.scalar(base), pc.multiply(
                    pa.scalar(damping),
                    pc.coalesce(t["s"], pa.scalar(0.0))))}),
            batch_format="pyarrow").materialize()
    return rank.map_batches(
        lambda t: pa.table({"node": t["node"], "rank": t["r"]}),
        batch_format="pyarrow")
