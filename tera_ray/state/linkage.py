"""Distributed union-find and triple canonicalization (SURVEY A6, M19).

The reference applies pairwise ``replace`` once
(``tera/DataObject.replace``, ``DataAggregation.py:64-88``); transitive
alias clusters need connected components.  The north rule mandates a
distributed union-find over groupby-aggregate shuffles keyed on
normalized surface forms: here ``connected_components`` iterates
hash-to-min rounds (neighbor-min propagation via hash join + vectorized
``groupby().min()``) until a checksum fixpoint — O(component diameter)
rounds; alias clusters are shallow (a↔b↔c chains), so this converges in
2-4 rounds.  Canonical id = min member id (deterministic).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from .mapping import join_partitions


def _sym_edges(edges):
    """(src,dst) → symmetric (node, nbr) with self-loops dropped."""

    def sym(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().cast(pa.string())
        dst = t["dst"].combine_chunks().cast(pa.string())
        node = pa.concat_arrays([src, dst])
        nbr = pa.concat_arrays([dst, src])
        keep = pc.not_equal(node, nbr)
        return pa.table({"node": node, "nbr": nbr}).filter(keep)

    return edges.map_batches(sym, batch_format="pyarrow")


def connected_components(
    edges,
    max_rounds: int = 16,
    num_partitions: int | None = None,
    small_threshold: int = 2_000_000,
):
    """Edges ``(src, dst)`` → component table ``(node, comp)`` with
    ``comp`` = min member id of the node's connected component.

    Each round: every node proposes its current comp to its neighbors
    (hash join on ``node``), then ``groupby(node).min()`` folds proposals
    with the node's own comp.  Early-exit on an order-insensitive
    checksum of ``(node, comp)`` — one cheap aggregate pass per round.
    """
    num_buckets = join_partitions(num_partitions)
    sym = _sym_edges(edges).materialize()

    # Small-graph fast path: alias-cluster edge sets are typically tiny
    # relative to the triple store, and each distributed round costs
    # several fixed-overhead shuffles.  Below the threshold, run exact
    # union-find driver-side (same min-member semantics) and return the
    # result as a single-block Dataset; the shuffle path below is the
    # 100 TB route.
    if sym.count() <= small_threshold:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        allnodes: set[str] = set()
        for b in sym.iter_batches(batch_format="pyarrow", batch_size=None):
            for a, c in zip(b["node"].to_pylist(), b["nbr"].to_pylist()):
                allnodes.add(a)
                ra, rc = find(a), find(c)
                if ra != rc:
                    # union by min id ⇒ canonical id = min member
                    lo, hi = (ra, rc) if ra < rc else (rc, ra)
                    parent[hi] = lo
        nodes = sorted(allnodes)
        comp_tbl = pa.table({
            "node": pa.array(nodes, pa.string()),
            "comp": pa.array([find(n) for n in nodes], pa.string()),
        })
        return ray.data.from_arrow(comp_tbl)

    # comp0 = min(node, min neighbor) — first propagation round for free
    comp = (
        sym.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "comp": pc.min_element_wise(t["node"], t["nbr"])}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .min("comp")
        .map_batches(
            lambda t: pa.table({"node": t["node"], "comp": t["min(comp)"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def checksum(ds) -> int:
        def h(t: pa.Table) -> pa.Table:
            from ..stages.base import hash_column

            # mod 2^31 per batch so the cross-batch int64 sum cannot overflow
            s = (pc.sum(hash_column(t, keys=("node", "comp"))).as_py() or 0) % (1 << 31)
            return pa.table({"h": pa.array([s], pa.int64())})

        return ds.map_batches(h, batch_format="pyarrow").sum("h")

    # Per-round propagation is a pure groupby-aggregate shuffle (the
    # north rule's union-find shape; also robust where Ray's hash join
    # loses schema on empty partitions): tag edge rows (node, nbr, ∅)
    # and comp rows (node, ∅, comp), bucket by hash(node) so every row
    # of a node co-locates, join within the bucket with the in-memory
    # Arrow kernel, emit (nbr, comp) messages, then a vectorized
    # groupby(node).min(comp) folds messages with current comps.
    def _node_bucket(t: pa.Table) -> pa.Array:
        import numpy as np

        from ..stages.base import hash_column

        h = hash_column(t, keys=("node",)).to_numpy(zero_copy_only=False)
        return pa.array((h % num_buckets).astype(np.int32), pa.int32())

    def _tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "nbr": t["nbr"],
             "comp": pa.nulls(t.num_rows, pa.string()), "__b": _node_bucket(t)}
        )

    def _tag_comp(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "nbr": pa.nulls(t.num_rows, pa.string()),
             "comp": t["comp"], "__b": _node_bucket(t)}
        )

    def _bucket_msgs(t: pa.Table) -> pa.Table:
        has_comp = pc.is_valid(t["comp"].combine_chunks())
        ctbl = t.filter(has_comp).select(["node", "comp"])
        etbl = t.filter(pc.invert(has_comp)).select(["node", "nbr"])
        out = [ctbl]
        if etbl.num_rows and ctbl.num_rows:
            j = etbl.join(ctbl, keys=["node"], join_type="inner")
            out.append(pa.table({"node": j["nbr"], "comp": j["comp"]}))
        return pa.concat_tables(out, promote_options="none")

    tagged_sym = sym.map_batches(_tag_edges, batch_format="pyarrow").materialize()

    prev_sum = checksum(comp)
    for _ in range(max_rounds):
        from ..stages.base import bucketed_map_groups

        msgs = bucketed_map_groups(
            tagged_sym.union(
                comp.map_batches(_tag_comp, batch_format="pyarrow")),
            "__b", _bucket_msgs)
        comp = (
            msgs.groupby("node")
            .min("comp")
            .map_batches(
                lambda t: pa.table({"node": t["node"], "comp": t["min(comp)"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur = checksum(comp)
        if cur == prev_sum:
            break
        prev_sum = cur
    return comp


def canonical_mapping(comp):
    """Component table → rewrite mapping (node ≠ comp rows only)."""
    return comp.filter(expr="node != comp").map_batches(
        lambda t: pa.table(
            {
                "src": t["node"],
                "dst": t["comp"],
                "score": pa.array([1.0] * t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


def rewrite_triples(
    triples,
    mapping,
    broadcast: bool = True,
    num_partitions: int | None = None,
):
    """M19 join-based canonicalization: rewrite ``subj`` and (non-literal)
    ``obj`` through ``mapping`` (src→dst), then the caller dedups (A1).

    ``broadcast=True`` ships the mapping once via ``ray.put`` and
    rewrites inside ``map_batches`` (the small-side path, SURVEY T1);
    ``broadcast=False`` uses two shuffle hash joins with coalesce —
    the 100 TB path when the mapping itself is huge.
    """
    num_partitions = join_partitions(num_partitions)
    if broadcast:
        from .mapping import to_dict

        m = to_dict(mapping) if not isinstance(mapping, dict) else mapping
        ref = ray.put(m)

        def _rewrite_arr(arr: pa.Array, d: dict, gate=None) -> pa.Array:
            # pure-Arrow rewrite: map only the DISTINCT values through
            # the dict (Python cost = cardinality), take back out — no
            # object-dtype pandas round-trip on the hot triple columns
            enc = arr.dictionary_encode()
            vals = enc.dictionary.to_pylist()
            repl = [d.get(v) for v in vals]
            repl_arr = pa.array(
                [r if r is not None else v for v, r in zip(vals, repl)],
                type=pa.string())
            hit = pa.array([r is not None for r in repl], type=pa.bool_())
            mapped = pc.take(repl_arr, enc.indices)
            hit_full = pc.fill_null(pc.take(hit, enc.indices), False)
            if gate is not None:
                hit_full = pc.and_(hit_full, gate)
            return pc.if_else(hit_full, mapped, arr)

        def rw(t: pa.Table) -> pa.Table:
            d = ray.get(ref)
            subj = t["subj"].combine_chunks()
            obj = t["obj"].combine_chunks()
            not_lit = pc.invert(pc.fill_null(
                t["obj_is_literal"].combine_chunks(), False))
            out = {c: t[c] for c in t.schema.names}
            out["subj"] = _rewrite_arr(subj, d)
            out["obj"] = _rewrite_arr(obj, d, gate=not_lit)
            return pa.table(out)

        return triples.map_batches(rw, batch_format="pyarrow")

    m = mapping.map_batches(
        lambda t: pa.table({"__mk": t["src"], "__mv": t["dst"]}),
        batch_format="pyarrow",
    )

    def coalesce_col(t: pa.Table, col: str, gate=None) -> pa.Table:
        new = t["__mv"].combine_chunks()
        cur = t[col].combine_chunks()
        val = pc.coalesce(new, cur)
        if gate is not None:
            val = pc.if_else(gate(t), val, cur)
        out = {c: t[c] for c in t.schema.names if not c.startswith("__m")}
        out[col] = val
        return pa.table(out)

    t1 = triples.join(
        m, join_type="left_outer", num_partitions=num_partitions,
        on=("subj",), right_on=("__mk",),
    ).map_batches(lambda t: coalesce_col(t, "subj"), batch_format="pyarrow")
    t2 = t1.join(
        m, join_type="left_outer", num_partitions=num_partitions,
        on=("obj",), right_on=("__mk",),
    ).map_batches(
        lambda t: coalesce_col(
            t, "obj", gate=lambda x: pc.invert(x["obj_is_literal"].combine_chunks())
        ),
        batch_format="pyarrow",
    )
    return t2
