"""Query-layer unit tests (SURVEY G1-G5, J2, J3) + relational operators."""

import pyarrow as pa
import pytest

import ray

from tera_ray.schema import ECOTOX_NS as NS
from tera_ray.schema import RDF_VALUE, TRIPLE_SCHEMA, UNIT_UNITS
from tera_ray.query.relational import grouped_quantiles, hash_join


def T(rows):
    s, p, o, lit = zip(*rows)
    return pa.table({
        "subj": pa.array(s, pa.string()), "pred": pa.array(p, pa.string()),
        "obj": pa.array(o, pa.string()),
        "obj_is_literal": pa.array(lit, pa.bool_()),
        "graph": pa.array(["g"] * len(s), pa.string()),
    }, schema=TRIPLE_SCHEMA)


def _kg():
    rows = []
    # two tests: t1 (sp1, ch1) with 2 results; t2 (sp2, ch2) with 1
    for tid, sp, ch in [("t1", "sp1", "ch1"), ("t2", "sp2", "ch2")]:
        rows += [(NS + "test/" + tid, NS + "species", NS + "taxon/" + sp, False),
                 (NS + "test/" + tid, NS + "chemical", NS + "cas/" + ch, False)]
    for tid, rid, ep, ef, cv in [("t1", "r1", "LC50", "MOR", "10"),
                                 ("t1", "r2", "NOEC", "GRO", "5"),
                                 ("t2", "r3", "EC50", "REP", "7")]:
        rows += [(NS + "test/" + tid, NS + "hasResult", "_:" + rid, False),
                 ("_:" + rid, NS + "endpoint", NS + "endpoint/" + ep, False),
                 ("_:" + rid, NS + "effect", NS + "effect/" + ef, False),
                 ("_:" + rid, NS + "concentration", "_:c" + rid, False),
                 ("_:c" + rid, RDF_VALUE, cv, True),
                 ("_:c" + rid, UNIT_UNITS, "http://qudt.org/vocab/unit#MilligramPerLitre", False)]
    # studyDuration: t1 has the full BNode pattern (value+unit) → sd
    # bound; t2 has value only → the OPTIONAL tuple fails → sd/sdu null
    rows += [(NS + "test/t1", NS + "studyDuration", "_:m1", False),
             ("_:m1", RDF_VALUE, "96", True),
             ("_:m1", UNIT_UNITS, "http://qudt.org/vocab/unit#Hour", False),
             (NS + "test/t2", NS + "studyDuration", "_:m2", False),
             ("_:m2", RDF_VALUE, "48", True)]
    # small hierarchy for BFS/khop: sp1,sp2 subClassOf gen1; sp3 under gen2
    sub = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    rows += [(NS + "taxon/sp1", sub, NS + "taxon/gen1", False),
             (NS + "taxon/sp2", sub, NS + "taxon/gen1", False),
             (NS + "taxon/sp3", sub, NS + "taxon/gen2", False)]
    return ray.data.from_arrow(T(rows))


@pytest.mark.usefixtures("ray_session")
class TestKGQueries:
    def test_star_join(self):
        from tera_ray.query.kg import endpoint_star_join

        star = endpoint_star_join(_kg())
        hour = "http://qudt.org/vocab/unit#Hour"
        got = sorted(map(tuple, star.to_pylist()[0].keys() and [
            (r["chemical"], r["species"], r["conc_value"], r["endpoint"],
             r["effect"], r["sd"], r["sd_unit"]) for r in star.to_pylist()]),
            key=lambda x: tuple("" if v is None else v for v in x))
        assert got == sorted([
            (NS + "cas/ch1", NS + "taxon/sp1", "10", NS + "endpoint/LC50",
             NS + "effect/MOR", "96", hour),
            (NS + "cas/ch1", NS + "taxon/sp1", "5", NS + "endpoint/NOEC",
             NS + "effect/GRO", "96", hour),
            (NS + "cas/ch2", NS + "taxon/sp2", "7", NS + "endpoint/EC50",
             NS + "effect/REP", None, None),
        ], key=lambda x: tuple("" if v is None else v for v in x))

    def test_star_join_filters(self):
        from tera_ray.query.kg import endpoint_star_join

        star = endpoint_star_join(_kg(), chemicals=[NS + "cas/ch2"])
        assert star.num_rows == 1
        assert star["species"][0].as_py() == NS + "taxon/sp2"

    def test_semi_joins(self):
        from tera_ray.query.kg import chemicals_from_species, species_from_chemicals

        kg = _kg()
        c = chemicals_from_species(kg, [NS + "taxon/sp1"])
        assert c["chemical"].to_pylist() == [NS + "cas/ch1"]
        s = species_from_chemicals(kg, [NS + "cas/ch1", NS + "cas/ch2"])
        assert s["species"].to_pylist() == [NS + "taxon/sp1", NS + "taxon/sp2"]

    def test_bfs_subgraph(self):
        from tera_ray.query.kg import construct_subgraph

        sub = construct_subgraph(_kg(), [NS + "test/t1"])
        rows = sub.take_all()
        subjects = {r["subj"] for r in rows}
        # reaches the test, its results, concentrations, and species chain
        assert NS + "test/t1" in subjects
        assert "_:r1" in subjects and "_:cr1" in subjects
        assert NS + "taxon/sp1" in subjects
        # does NOT reach t2's branch
        assert "_:r3" not in subjects

    def test_bfs_subgraph_escalates_on_wide_hub(self):
        """A hub whose fan-out exceeds driver_max_nodes must route the
        BFS to the distributed frontier (node-id Datasets, driver holds
        counts only) and return the same closure as the driver path."""
        import ray.data

        from tera_ray.query.kg import construct_subgraph

        rows = [("root", "p", f"hub{h}", False) for h in range(4)]
        for h in range(4):
            rows += [(f"hub{h}", "p", f"leaf{h}_{i}", False)
                     for i in range(100)]
        rows += [(f"leaf0_{i}", "p", f"deep{i}", False) for i in range(20)]
        store = ray.data.from_arrow(pa.table({
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
            "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
        }))

        def closure(ds):
            out = ds.take_all()
            return sorted((r["subj"], r["pred"], r["obj"]) for r in out)

        driver = closure(construct_subgraph(store, ["root"]))
        escalated = construct_subgraph(store, ["root"],
                                       driver_max_nodes=10)
        assert closure(escalated) == driver
        assert len(driver) == 4 + 400 + 20

    def test_khop_siblings(self):
        from tera_ray.query.kg import khop_related

        sub = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
        sib = khop_related(_kg(), NS + "taxon/sp1", sub, 1, 1)
        assert sib["entity"].to_pylist() == [NS + "taxon/sp2"]

    def test_dedup_idempotent(self):
        from tera_ray.stages.base import dedup_triples

        kg = _kg().union(_kg())  # duplicate every triple
        once = dedup_triples(kg)
        base = sorted((r["subj"], r["pred"], r["obj"])
                      for r in _kg().take_all())
        got1 = sorted((r["subj"], r["pred"], r["obj"]) for r in once.take_all())
        assert got1 == base
        twice = dedup_triples(dedup_triples(_kg().union(_kg())))
        got2 = sorted((r["subj"], r["pred"], r["obj"]) for r in twice.take_all())
        assert got2 == base


@pytest.mark.usefixtures("ray_session")
class TestRelational:
    def test_union_by_name(self):
        from tera_ray.query.relational import union_by_name

        a = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "x": pa.array(["a", "b"], pa.string())}))
        b = ray.data.from_arrow(pa.table({
            "k": pa.array([3], pa.int64()),
            "y": pa.array([9.5], pa.float64())}))
        out = union_by_name([a, b]).take_all()
        got = sorted((r["k"], r["x"], r["y"]) for r in out)
        assert got == [(1, "a", None), (2, "b", None), (3, None, 9.5)]
        # conflicting types fail loudly, no silent cast
        c = ray.data.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
        with pytest.raises(TypeError):
            union_by_name([a, c])

    def test_upsert(self):
        from tera_ray.query.relational import upsert

        base = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array(["old1", "old2", "old3"], pa.string())}))
        ups = ray.data.from_arrow(pa.table({
            "k": pa.array([2, 9], pa.int64()),
            "v": pa.array(["new2", "new9"], pa.string())}))
        got = sorted((r["k"], r["v"])
                     for r in upsert(base, ups, keys=["k"]).take_all())
        assert got == [(1, "old1"), (2, "new2"), (3, "old3"), (9, "new9")]

    def test_top1_per_key(self):
        from tera_ray.query.relational import top1_per_key

        t = pa.table({"k": ["a", "a", "b", "b", "b"],
                      "v": [3.0, 5.0, 1.0, 1.0, 0.5],
                      "id": [1, 2, 3, 4, 5]})
        out = top1_per_key(ray.data.from_arrow(t), "k",
                           [("v", "descending"), ("id", "ascending")])
        got = {r["k"]: (r["v"], r["id"]) for r in out.take_all()}
        assert got == {"a": (5.0, 2), "b": (1.0, 3)}

    def test_grouped_agg(self):
        from tera_ray.query.relational import grouped_agg

        t = pa.table({"k": ["x", "y", "x", "x"], "v": [1, 2, 3, 4]})
        out = grouped_agg(ray.data.from_arrow(t).repartition(3), ["k"],
                          [("v", "count", "n"), ("v", "sum", "s"),
                           ("v", "min", "lo"), ("v", "max", "hi")])
        got = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in out.take_all()}
        assert got == {"x": (3, 8, 1, 4), "y": (1, 2, 2, 2)}

    def test_grouped_agg_moments(self):
        import numpy as np

        from tera_ray.query.relational import grouped_agg

        rng = np.random.default_rng(7)
        k = np.repeat(["a", "b", "c"], [50, 7, 1])
        v = np.round(rng.normal(1000.0, 250.0, size=58), 3)
        t = pa.table({"k": k, "v": v})
        out = grouped_agg(ray.data.from_arrow(t).repartition(4), ["k"],
                          [("v", "avg", "m"), ("v", "std", "sd"),
                           ("v", "var", "vr"), ("v", "count", "n")])
        got = {r["k"]: r for r in out.take_all()}
        for key in ("a", "b"):
            seg = v[k == key]
            assert got[key]["n"] == len(seg)
            assert abs(got[key]["m"] - seg.mean()) < 1e-9
            assert abs(got[key]["sd"] - seg.std(ddof=1)) < 1e-7
            assert abs(got[key]["vr"] - seg.var(ddof=1)) < 1e-6
        # sample variance of a single value is NULL (var_samp semantics)
        assert got["c"]["sd"] is None and got["c"]["vr"] is None
        assert abs(got["c"]["m"] - v[k == "c"][0]) < 1e-12

    def test_grouped_agg_moments_nulls(self):
        from tera_ray.query.relational import grouped_agg

        t = pa.table({"k": ["x", "x", "x", "y"],
                      "v": [1.0, None, 3.0, None]})
        out = grouped_agg(ray.data.from_arrow(t).repartition(2), ["k"],
                          [("v", "avg", "m"), ("v", "std", "sd"),
                           ("v", "count", "n")])
        got = {r["k"]: r for r in out.take_all()}
        # avg/std ignore nulls; count counts rows (count(*))
        assert got["x"]["n"] == 3 and abs(got["x"]["m"] - 2.0) < 1e-12
        assert abs(got["x"]["sd"] - 2 ** 0.5) < 1e-12
        assert got["y"]["n"] == 1 and got["y"]["m"] is None
        assert got["y"]["sd"] is None

    def test_rollup_agg(self):
        from tera_ray.query.relational import rollup_agg

        t = pa.table({"a": ["x", "x", "y", "y", "y"],
                      "b": ["p", "q", "p", "p", "q"],
                      "v": [1, 2, 4, 8, 16]})
        out = rollup_agg(ray.data.from_arrow(t).repartition(3),
                         ["a", "b"], [("v", "count", "n"),
                                      ("v", "sum", "s")])
        got = {(r["a"], r["b"]): (r["n"], r["s"]) for r in out.take_all()}
        assert got == {
            ("x", "p"): (1, 1), ("x", "q"): (1, 2),
            ("y", "p"): (2, 12), ("y", "q"): (1, 16),
            ("x", None): (2, 3), ("y", None): (3, 28),
            (None, None): (5, 31)}

    def test_transitive_closure_dag(self):
        from tera_ray.query.kg import transitive_closure

        # diamond a→{b,c}→d plus tail d→e: (a,d,2) must appear ONCE
        # (two distinct paths, same length) and (a,e,3) once.
        edges = ray.data.from_arrow(pa.table({
            "src": ["a", "a", "b", "c", "d"],
            "dst": ["b", "c", "d", "d", "e"]}))
        rows = sorted((r["src"], r["anc"], r["depth"])
                      for r in transitive_closure(edges).take_all())
        assert rows == [
            ("a", "b", 1), ("a", "c", 1), ("a", "d", 2), ("a", "e", 3),
            ("b", "d", 1), ("b", "e", 2), ("c", "d", 1), ("c", "e", 2),
            ("d", "e", 1)]

    def test_grouped_pairs_and_triangles(self):
        from tera_ray.query.graph import grouped_pairs, triangles

        # groups: {1,2,3} and {2,3,4} → K3 on {1,2,3}, K3 on {2,3,4};
        # edge (2,3) shared.  Triangles: (1,2,3) and (2,3,4).
        t = pa.table({"g": ["x", "x", "x", "y", "y", "y"],
                      "i": [1, 2, 3, 2, 3, 4]})
        edges = grouped_pairs(ray.data.from_arrow(t).repartition(2),
                              "g", "i")
        es = sorted((r["u"], r["v"]) for r in edges.take_all())
        assert es == [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        tri = sorted((r["a"], r["b"], r["c"])
                     for r in triangles(edges).take_all())
        assert tri == [(1, 2, 3), (2, 3, 4)]

    def test_cube_and_count_distinct(self):
        from tera_ray.query.relational import (cube_agg,
                                               grouped_count_distinct)

        t = pa.table({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                      "v": [1, 2, 4]})
        d = ray.data.from_arrow(t).repartition(2)
        got = {(r["a"], r["b"]): r["s"] for r in
               cube_agg(d, ["a", "b"], [("v", "sum", "s")]).take_all()}
        assert got == {
            ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,
            ("x", None): 3, ("y", None): 4,
            (None, "p"): 5, (None, "q"): 2, (None, None): 7}
        t2 = pa.table({"k": ["a", "a", "a", "b"],
                       "v": [1, 1, 2, None]})
        cd = {r["k"]: r["n_distinct"] for r in grouped_count_distinct(
            ray.data.from_arrow(t2).repartition(2), "k", "v").take_all()}
        # nulls ignored: b has no countable values → no row (SQL GROUP
        # BY would keep b with 0; callers outer-join if they need it)
        assert cd == {"a": 2}

    def test_grouped_array_agg(self):
        from tera_ray.query.relational import grouped_array_agg

        t = pa.table({"k": ["b", "a", "b", "a", "b"],
                      "v": [3, 2, 1, 9, 2]})
        out = grouped_array_agg(ray.data.from_arrow(t).repartition(3),
                                "k", "v", out_name="vs")
        got = {r["k"]: r["vs"] for r in out.take_all()}
        assert got == {"a": [2, 9], "b": [1, 2, 3]}

    def test_pagerank_regular_graph(self):
        from tera_ray.query.graph import pagerank

        # 4-cycle: regular graph → stationary uniform rank 1/4 at any
        # iteration count.
        edges = ray.data.from_arrow(pa.table({
            "u": [1, 2, 3, 1], "v": [2, 3, 4, 4]}))
        got = {r["node"]: r["rank"]
               for r in pagerank(edges, iters=4).take_all()}
        assert set(got) == {1, 2, 3, 4}
        for v in got.values():
            assert abs(v - 0.25) < 1e-12

    def test_set_op_null_safe(self):
        from tera_ray.query.relational import set_op

        l = ray.data.from_arrow(pa.table(
            {"a": [1, 1, 2, None, 3], "b": ["x", "x", "y", None, "z"]}))
        r = ray.data.from_arrow(pa.table(
            {"a": [1, None, 4], "b": ["x", None, "w"]}))
        inter = sorted(((r_["a"], r_["b"]) for r_ in
                        set_op(l, r, "intersect").take_all()), key=str)
        # SQL set ops: NULL row matches NULL row (unlike joins)
        assert inter == sorted([(1, "x"), (None, None)], key=str)
        exc = sorted(((r_["a"], r_["b"]) for r_ in
                      set_op(l, r, "except").take_all()), key=str)
        assert exc == [(2, "y"), (3, "z")]

    def test_pivot_unpivot(self):
        from tera_ray.query.relational import pivot_agg, unpivot

        t = pa.table({"k": ["a", "a", "b"], "p": ["x", "y", "x"],
                      "v": [10, 20, 5]})
        d = ray.data.from_arrow(t).repartition(2)
        wide = {r["k"]: (r["n_x"], r["n_y"])
                for r in pivot_agg(d, "k", "p", ["x", "y"]).take_all()}
        assert wide == {"a": (1, 1), "b": (1, 0)}
        sums = {r["k"]: (r["s_x"], r["s_y"])
                for r in pivot_agg(d, "k", "p", ["x", "y"],
                                   value_col="v", prefix="s_").take_all()}
        assert sums == {"a": (10, 20), "b": (5, 0)}
        tall = sorted((r["k"], r["name"], r["value"]) for r in
                      unpivot(d, ["k"], ["v"]).take_all())
        assert tall == [("a", "v", 10.0), ("a", "v", 20.0), ("b", "v", 5.0)]

    def test_broadcast_join(self):
        from tera_ray.query.relational import broadcast_join

        big = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 2], "v": list("abcd")}))
        small = pa.table({"kk": [1, 2], "w": ["X", "Y"]})
        out = broadcast_join(big, small, "k", "kk").take_all()
        got = sorted((r["k"], r["v"], r["w"]) for r in out)
        assert got == [(1, "a", "X"), (2, "b", "Y"), (2, "d", "Y")]

    def test_ordered_group_concat(self):
        from tera_ray.query.relational import ordered_group_concat

        t = pa.table({"k": ["u", "u", "u", "w"], "ord": [2, 0, 1, 5],
                      "txt": ["c", "a", "b", "z"]})
        out = ordered_group_concat(ray.data.from_arrow(t), "k",
                                   [("ord", "ascending")], "txt",
                                   out_names=("k", "n", "seq"))
        got = {r["k"]: (r["n"], r["seq"]) for r in out.take_all()}
        assert got == {"u": (3, "a|b|c"), "w": (1, "z")}

    def test_distinct_values(self):
        from tera_ray.query.relational import distinct_values

        t = pa.table({"x": [3, 1, 3, 2, 1]})
        out = distinct_values(ray.data.from_arrow(t).repartition(2), "x")
        assert sorted(r["x"] for r in out.take_all()) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestDistributedStarJoin:
    def test_matches_driver_side_star(self, fixtures_t1):
        import os

        import pyarrow as pa

        import ray.data

        from tera_ray.query.kg import (
            endpoint_star_join,
            endpoint_star_join_distributed,
        )
        from tera_ray.stages.base import dedup_triples
        from tera_ray.stages.ecotox import emit_results, emit_tests

        tests = ray.data.read_parquet(
            os.path.join(fixtures_t1, "tests.parquet")).map_batches(
            emit_tests, batch_format="pyarrow")
        results = ray.data.read_parquet(
            os.path.join(fixtures_t1, "results.parquet")).map_batches(
            emit_results, batch_format="pyarrow")
        # materialize once: 8 downstream projections would otherwise
        # re-execute the emit+dedup lineage per projection
        triples = dedup_triples(tests.union(results)).materialize()

        want = endpoint_star_join(triples)
        got_parts = list(endpoint_star_join_distributed(triples).iter_batches(
            batch_format="pyarrow", batch_size=None))
        got = pa.concat_tables(got_parts, promote_options="permissive")

        def rows(t):
            return sorted(
                tuple("" if v is None else v for v in row)
                for row in zip(*[t[c].to_pylist()
                                 for c in sorted(t.schema.names)]))

        assert got.num_rows == want.num_rows > 0
        assert rows(got) == rows(want)


@pytest.mark.usefixtures("ray_session")
class TestListHelpers:
    def test_list_species_and_chemicals(self):
        from tera_ray.query.kg import list_chemicals, list_species
        from tera_ray.schema import RDF_TYPE

        # _kg() has species/chemical edges but no rdf:type Test rows —
        # add the type triple for t1 only; t2's edges must NOT count
        base = _kg()
        extra = T([(NS + "test/t1", RDF_TYPE, NS + "Test", False)])
        kg = base.union(ray.data.from_arrow(extra))
        sp = sorted(r["species"] for r in list_species(kg).take_all())
        ch = sorted(r["chemical"] for r in list_chemicals(kg).take_all())
        assert sp == [NS + "taxon/sp1"]
        assert ch == [NS + "cas/ch1"]


@pytest.mark.usefixtures("ray_session")
class TestTumblingWindow:
    def test_hour_windows_per_key(self):
        from tera_ray.query.relational import tumbling_window_agg

        h = 3_600_000_000  # 1h in us
        t = pa.table({
            "k": ["a", "a", "a", "b"],
            "ts": pa.array([10, h - 1, h + 5, 20], pa.int64()),
            "v": [1.0, 5.0, 2.0, 9.0],
        })
        out = tumbling_window_agg(
            ray.data.from_arrow(t).repartition(2), "ts", h, keys=["k"],
            aggs=[("ts", "count", "n"), ("v", "min", "vmin"),
                  ("v", "max", "vmax")])
        got = {(r["k"], r["window_start"]): (r["n"], r["vmin"], r["vmax"])
               for r in out.take_all()}
        assert got == {("a", 0): (2, 1.0, 5.0), ("a", h): (1, 2.0, 2.0),
                       ("b", 0): (1, 9.0, 9.0)}


@pytest.mark.usefixtures("ray_session")
class TestEndpointStarRouting:
    def test_routes_by_size_hint(self):
        import ray.data

        from tera_ray.query.kg import endpoint_star

        kg = _kg()
        small = endpoint_star(kg, size_hint_bytes=1)  # below threshold
        assert isinstance(small, pa.Table)
        big = endpoint_star(kg, size_hint_bytes=1 << 40)  # above threshold
        assert isinstance(big, ray.data.Dataset)
        rows_small = sorted(
            tuple("" if r[c] is None else r[c]
                  for c in sorted(small.schema.names))
            for r in small.to_pylist())
        rows_big = sorted(
            tuple("" if r[c] is None else r[c]
                  for c in sorted(big.schema().names))
            for r in big.take_all())
        assert rows_small == rows_big and len(rows_small) == 3

    def test_unhinted_in_memory_store_routes_distributed(self):
        """No size hint + no input-file metadata (in-memory store) must
        NEVER pick the driver-materializing star (r2 verdict item #3)."""
        import ray.data

        from tera_ray.query.kg import endpoint_star

        out = endpoint_star(_kg())
        assert isinstance(out, ray.data.Dataset)
        assert len(out.take_all()) == 3

    def test_unhinted_small_file_store_routes_driver(self, tmp_path):
        """Input-file metadata (parquet sizes, no execution) supplies
        the size for unhinted file-backed stores, keeping the fast
        driver star on interactive-scale inputs."""
        import pyarrow.parquet as pq

        import ray.data

        from tera_ray.query.kg import endpoint_star

        tbl = pa.concat_tables(list(
            _kg().iter_batches(batch_format="pyarrow", batch_size=None)))
        pq.write_table(tbl, tmp_path / "kg.parquet")
        out = endpoint_star(
            ray.data.read_parquet(str(tmp_path / "kg.parquet")))
        assert isinstance(out, pa.Table)
        assert out.num_rows == 3


class TestHashJoin:
    """hash_join: symmetric co-group shuffle equi-join."""


    def _sides(self):
        import ray.data

        left = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, None, 2], pa.int64()),
            "lv": ["a", "b", "c", "d", "e"],
        }))
        right = ray.data.from_arrow(pa.table({
            "rk": pa.array([2, 2, 4, None], pa.int64()),
            "rv": ["x", "y", "z", "w"],
        }))
        return left, right

    def _rows(self, ds):
        t = pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
        return sorted(
            (tuple(r.values()) for r in t.to_pylist()),
            key=lambda x: tuple(str(v) for v in x))

    def test_inner_ignores_null_keys(self, ray_session):
        left, right = self._sides()
        out = self._rows(hash_join(left, right, on="k", right_on="rk"))
        assert out == sorted([(2, "b", "x"), (2, "b", "y"),
                              (2, "e", "x"), (2, "e", "y")],
                             key=lambda x: tuple(str(v) for v in x))

    def test_left_keeps_unmatched_and_null_key_rows(self, ray_session):
        left, right = self._sides()
        out = self._rows(hash_join(left, right, on="k", right_on="rk",
                                   how="left"))
        assert len(out) == 7          # 4 matches + rows 1, 3, null
        assert (1, "a", None) in out
        assert (None, "d", None) in out

    def test_full_outer(self, ray_session):
        left, right = self._sides()
        out = self._rows(hash_join(left, right, on="k", right_on="rk",
                                   how="full"))
        # 4 matches + left-only {1, 3, None} + right-only {4, None}
        assert len(out) == 9
        assert (4, None, "z") in out

    def test_detect_hot_keys_skips_nulls(self, ray_session):
        """A hot NULL key never reaches the hot list (nulls can't
        equi-join-match, and None would break the sorted() contract)."""
        import ray.data

        from tera_ray.query.relational import detect_hot_keys

        t = pa.table({"k": pa.array([None, None, None, 7, 7, 8],
                                    pa.int64())})
        assert detect_hot_keys(ray.data.from_arrow(t), "k",
                               min_count=2) == [7]

    def test_auto_hot_keys(self, ray_session):
        """hot_keys='auto' runs the census itself and matches the
        plain join; a threshold higher than any key count degrades to
        the unsalted path."""
        import ray.data

        left_t = pa.table({"k": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
                           "lv": pa.array(range(6), pa.int64())})
        right_t = pa.table({"k": pa.array([1, 2, 4], pa.int64()),
                            "rv": pa.array([10, 20, 40], pa.int64())})
        expect = sorted([(1, lv, 10) for lv in range(4)] + [(2, 4, 20)])
        for thresh in (2, 100):
            out = hash_join(ray.data.from_arrow(left_t),
                            ray.data.from_arrow(right_t), on="k",
                            hot_keys="auto", hot_min_count=thresh,
                            salt=3, num_buckets=8).take_all()
            got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
            assert got == expect

    def test_salted_skew_matches_plain(self, ray_session):
        """Salted mode is an execution strategy, not a semantics change:
        inner and left results are multiset-equal to the plain shuffle
        on a genuinely skewed input (one key = 86% of left rows)."""
        import numpy as np
        import polars as pl
        import ray.data

        from tera_ray.query.relational import detect_hot_keys

        rng = np.random.default_rng(7)
        keys = np.concatenate([np.full(5000, 5),
                               rng.integers(0, 50, 800)])
        left_t = pa.table({"k": pa.array(keys, pa.int64()),
                           "lv": pa.array(np.arange(len(keys)), pa.int64())})
        rk = np.concatenate([np.full(3, 5), np.arange(0, 40)])
        right_t = pa.table({"rk": pa.array(rk, pa.int64()),
                            "rv": pa.array(np.arange(len(rk)) * 10,
                                           pa.int64())})

        hot = detect_hot_keys(
            ray.data.from_arrow(left_t).repartition(6), "k", min_count=1000)
        assert hot == [5]

        for how in ("inner", "left"):
            salted = self._rows(hash_join(
                ray.data.from_arrow(left_t).repartition(6),
                ray.data.from_arrow(right_t).repartition(3),
                on="k", right_on="rk", how=how, num_buckets=16,
                hot_keys=hot, salt=8))
            ref = pl.from_arrow(left_t).join(
                pl.from_arrow(right_t), left_on="k", right_on="rk",
                how=how, coalesce=True)
            refrows = sorted(
                (tuple(r) for r in ref.select(["k", "lv", "rv"]).rows()),
                key=lambda x: tuple(str(v) for v in x))
            assert salted == refrows

    def test_salted_rejects_right_and_full(self, ray_session):
        left, right = self._sides()
        for how in ("right", "full"):
            with pytest.raises(AssertionError):
                hash_join(left, right, on="k", right_on="rk", how=how,
                          hot_keys=[2])

    def test_collision_gets_suffix(self, ray_session):
        import ray.data

        left = ray.data.from_arrow(pa.table({"k": [1], "v": ["l"]}))
        right = ray.data.from_arrow(pa.table({"k": [1], "v": ["r"]}))
        out = hash_join(left, right, on="k")
        t = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
        assert sorted(t.schema.names) == ["k", "v", "v_r"]
        assert t.to_pylist() == [{"k": 1, "v": "l", "v_r": "r"}]


class TestGroupedQuantiles:
    def test_matches_numpy_per_group(self, ray_session):
        import numpy as np
        import ray.data

        rng = np.random.default_rng(7)
        ks = rng.integers(0, 5, 500)
        vs = rng.normal(size=500)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(ks, pa.int64()),
            "v": pa.array(vs, pa.float64()),
        })).repartition(4)
        qs = [0.0, 0.25, 0.5, 0.9, 1.0]
        out = pa.concat_tables(list(
            grouped_quantiles(ds, "k", "v", qs)
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        got = {(r["k"], r["q"]): r["value"] for r in out.to_pylist()}
        assert len(got) == 5 * len(qs)
        for k in range(5):
            grp = np.sort(vs[ks == k])
            for q in qs:
                h = q * (len(grp) - 1)
                lo, hi = int(np.floor(h)), int(np.ceil(h))
                want = grp[lo] + (h - lo) * (grp[hi] - grp[lo])
                assert got[(k, q)] == pytest.approx(want, abs=1e-12)

    def test_nulls_ignored(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(pa.table({
            "k": ["a", "a", "a"],
            "v": pa.array([1.0, None, 3.0], pa.float64()),
        }))
        out = pa.concat_tables(list(
            grouped_quantiles(ds, "k", "v", [0.5])
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        assert out.to_pylist() == [{"k": "a", "q": 0.5, "value": 2.0}]


class TestVectorGroupMean:
    def test_matches_numpy_across_batches(self, ray_session):
        import numpy as np
        import ray.data

        from tera_ray.ann.aggregate import vector_group_mean

        rng = np.random.default_rng(3)
        labels = rng.integers(0, 4, 200)
        mat = rng.normal(size=(200, 8)).astype(np.float32)
        t = pa.table({
            "label": pa.array(labels, pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat],
                                  pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(t).repartition(5)
        out = pa.concat_tables(list(
            vector_group_mean(ds, "label", "embedding", round_digits=None)
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        got = {(r["label"], r["dim"]): r["mean"] for r in out.to_pylist()}
        assert len(got) == 4 * 8
        for lb in range(4):
            want = mat[labels == lb].astype(np.float64).mean(axis=0)
            for d in range(8):
                assert got[(lb, d)] == pytest.approx(want[d], abs=1e-9)

    def test_string_keys(self, ray_session):
        import ray.data

        from tera_ray.ann.aggregate import vector_group_mean

        t = pa.table({
            "src": ["a", "b", "a"],
            "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], [3.0, 6.0]],
                                  pa.list_(pa.float32())),
        })
        out = pa.concat_tables(list(
            vector_group_mean(ray.data.from_arrow(t), "src", "embedding")
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        got = {(r["src"], r["dim"]): r["mean"] for r in out.to_pylist()}
        assert got == {("a", 0): 2.0, ("a", 1): 4.0,
                       ("b", 0): 3.0, ("b", 1): 4.0}


class TestOrderedPrefixSum:
    def test_exclusive_scan_non_dense_keys(self, ray_session):
        import numpy as np
        import ray.data

        from tera_ray.query.relational import ordered_prefix_sum

        rng = np.random.default_rng(11)
        # sparse, shuffled, negative-to-positive order keys
        order = rng.permutation(np.arange(-500, 1500, 7))
        vals = rng.integers(0, 50, len(order))
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(order, pa.int64()),
            "v": pa.array(vals, pa.int64()),
        })).repartition(6)
        out = pa.concat_tables(list(
            ordered_prefix_sum(ds, "k", "v", num_buckets=8)
            .iter_batches(batch_format="pyarrow", batch_size=None)))
        got = dict(zip(out["k"].to_pylist(), out["prefix"].to_pylist()))
        srt = np.argsort(order)
        want = np.concatenate([[0], np.cumsum(vals[srt])[:-1]])
        for k, w in zip(order[srt], want):
            assert got[k] == w


@pytest.mark.usefixtures("ray_session")
class TestGroupedCorr:
    def test_pairwise_nulls_and_degenerate_groups(self):
        import ray.data

        from tera_ray.query.relational import grouped_corr

        tbl = pa.table({
            "g": pa.array(["a"] * 4 + ["b"] * 2 + ["c"], pa.string()),
            "x": pa.array([1.0, 2.0, 3.0, None, 1.0, 1.0, 5.0],
                          pa.float64()),
            "y": pa.array([2.0, 4.0, 6.0, 8.0, 3.0, 7.0, 9.0],
                          pa.float64()),
        })
        out = {r["g"]: r for b in grouped_corr(
            ray.data.from_arrow(tbl), ["g"], "x", "y")
            .iter_batches(batch_format="pyarrow", batch_size=None)
            for r in b.to_pylist()}
        # group a: null x row ignored -> perfect linear y=2x
        assert out["a"]["n"] == 3
        assert out["a"]["corr"] == pytest.approx(1.0)
        assert out["a"]["covar"] == pytest.approx(2.0)
        # group b: zero x variance -> corr null, covar 0
        assert out["b"]["corr"] is None
        assert out["b"]["covar"] == pytest.approx(0.0)
        # group c: single row -> both null (sample statistics)
        assert out["c"]["corr"] is None and out["c"]["covar"] is None


@pytest.mark.usefixtures("ray_session")
class TestBGPMatch:
    def _store(self):
        rows = [
            ("c1", "hasTurn", "t1"), ("c1", "hasTurn", "t2"),
            ("c2", "hasTurn", "t3"),
            ("t2", "precededBy", "t1"),
            ("t1", "type", "Turn"), ("t2", "type", "Turn"),
            ("t3", "type", "Turn"),
            ("t1", "mentions", "x"), ("t2", "mentions", "x"),
            ("t3", "mentions", "y"),
            ("x", "sameAs", "x"),           # reflexive row
        ]
        return ray.data.from_arrow(pa.table({
            "subj": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "obj": pa.array([r[2] for r in rows], pa.string()),
        }))

    def _rows(self, ds):
        return sorted((tuple(sorted(r.items())) for b in ds.iter_batches(
            batch_format="pyarrow", batch_size=None)
            for r in b.to_pylist()), key=repr)

    def test_chain_join(self):
        from tera_ray.query.kg import bgp_match

        out = self._rows(bgp_match(self._store(), [
            ("?c", "hasTurn", "?t"), ("?t", "precededBy", "?p")]))
        assert out == [tuple(sorted({"c": "c1", "t": "t2", "p": "t1"}.items()))]

    def test_multi_shared_variable_join(self):
        from tera_ray.query.kg import bgp_match

        # both ?a and ?b shared between the two patterns: composite key
        out = self._rows(bgp_match(self._store(), [
            ("?a", "hasTurn", "?b"), ("?a", "hasTurn", "?b")]))
        assert len(out) == 3        # self-join on both vars is identity

    def test_repeated_var_in_one_pattern(self):
        from tera_ray.query.kg import bgp_match

        out = self._rows(bgp_match(self._store(), [("?x", "sameAs", "?x")]))
        assert out == [(("x", "x"),)]

    def test_constant_object_filters(self):
        from tera_ray.query.kg import bgp_match

        out = self._rows(bgp_match(self._store(), [
            ("?t", "mentions", "x"), ("?c", "hasTurn", "?t")]))
        got = {dict(r)["t"] for r in out}
        assert got == {"t1", "t2"}

    def test_cartesian_rejected(self):
        from tera_ray.query.kg import bgp_match

        with pytest.raises(AssertionError):
            bgp_match(self._store(), [("?a", "hasTurn", "?b"),
                                      ("?c", "mentions", "?d")])

    def test_optional_left_join(self):
        from tera_ray.query.kg import bgp_match

        # every turn, optionally its predecessor: t1/t3 have none → null p
        out = self._rows(bgp_match(self._store(),
                                   [("?t", "type", "Turn")],
                                   optional=[("?t", "precededBy", "?p")]))
        got = {dict(r)["t"]: dict(r)["p"] for r in out}
        assert got == {"t1": None, "t2": "t1", "t3": None}

    def test_optional_multi_shared(self):
        from tera_ray.query.kg import bgp_match

        out = self._rows(bgp_match(
            self._store(),
            [("?c", "hasTurn", "?t")],
            optional=[("?c", "hasTurn", "?t"), ("?t", "precededBy", "?p")]))
        # first optional shares BOTH vars (composite key, identity);
        # second adds p where present
        got = {(dict(r)["c"], dict(r)["t"]): dict(r)["p"] for r in out}
        assert got == {("c1", "t1"): None, ("c1", "t2"): "t1",
                       ("c2", "t3"): None}


@pytest.mark.usefixtures("ray_session")
class TestHashDedup:
    """mode="hash" exact dedup: only row hashes cross the exchange."""

    def _dupes(self):
        # two identical blocks → every triple duplicated ACROSS batches
        # (exercises the verification shuffle, not just the combiner)
        t = pa.table({
            "subj": pa.array([f"s{i}" for i in range(500)], pa.string()),
            "pred": pa.array(["p"] * 500, pa.string()),
            "obj": pa.array([f"o{i % 50}" for i in range(500)], pa.string()),
            "obj_is_literal": pa.array([False] * 500, pa.bool_()),
            "graph": pa.array(["g"] * 500, pa.string()),
        })
        return ray.data.from_arrow(t).union(ray.data.from_arrow(t))

    def _spo(self, ds):
        from collections import Counter

        c = Counter()
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            c.update(zip(b["subj"].to_pylist(), b["pred"].to_pylist(),
                         b["obj"].to_pylist()))
        return c

    def test_cross_batch_duplicates_verified(self):
        from tera_ray.stages.base import dedup_triples

        out = self._spo(dedup_triples(self._dupes(), mode="hash"))
        assert len(out) == 500
        assert all(c == 1 for c in out.values())

    def test_matches_sort_mode(self):
        from tera_ray.stages.base import dedup_triples

        ds = self._dupes()
        a = self._spo(dedup_triples(ds, mode="sort"))
        b = self._spo(dedup_triples(ds, mode="hash"))
        assert set(a) == set(b) and all(c == 1 for c in b.values())

    def test_no_duplicates_fast_path(self):
        from tera_ray.stages.base import dedup_triples

        t = pa.table({
            "subj": pa.array([f"s{i}" for i in range(100)], pa.string()),
            "pred": pa.array(["p"] * 100, pa.string()),
            "obj": pa.array(["o"] * 100, pa.string()),
            "obj_is_literal": pa.array([False] * 100, pa.bool_()),
            "graph": pa.array(["g"] * 100, pa.string()),
        })
        out = self._spo(dedup_triples(ray.data.from_arrow(t), mode="hash"))
        assert len(out) == 100 and all(c == 1 for c in out.values())

    def test_fallback_above_dup_threshold(self):
        from tera_ray.stages.base import dedup_triples_hash

        out = self._spo(dedup_triples_hash(self._dupes(), max_dup_hashes=10))
        assert len(out) == 500 and all(c == 1 for c in out.values())

    def test_distributed_discovery_matches_driver(self):
        """driver_discover_limit=0 forces the distributed duplicate
        discovery (the 100 TB path / the scaling legs' subject); its
        output multiset must equal the driver-side default's."""
        from tera_ray.stages.base import dedup_triples_hash

        ds = self._dupes()
        a = self._spo(dedup_triples_hash(ds))
        b = self._spo(dedup_triples_hash(ds, driver_discover_limit=0))
        assert a == b and len(a) == 500 and all(c == 1 for c in a.values())

    def test_schema_preserved_with_lineage_cols(self):
        from tera_ray.stages.base import dedup_triples

        t = pa.table({
            "subj": pa.array(["a", "a", "b"], pa.string()),
            "pred": pa.array(["p", "p", "p"], pa.string()),
            "obj": pa.array(["o", "o", "o"], pa.string()),
            "obj_is_literal": pa.array([False] * 3, pa.bool_()),
            "graph": pa.array(["g"] * 3, pa.string()),
            "conv_id": pa.array(["c", "c", None], pa.string()),
            "turn_idx": pa.array([1, 1, None], pa.int32()),
        })
        got = pa.concat_tables(list(dedup_triples(
            ray.data.from_arrow(t), mode="hash").iter_batches(
            batch_format="pyarrow", batch_size=None)),
            promote_options="none")
        assert set(got.schema.names) == set(t.schema.names)
        assert got.num_rows == 2


@pytest.mark.usefixtures("ray_session")
class TestDataAccessTail:
    """Round-5 thin point-API closures (SURVEY §2 tail): the reference's
    get_rank/get_ranks/get_ssd/which_features/query_chemical_names all
    call helpers that do not exist in the reference (broken there);
    these tests pin the documented-intent semantics."""

    def _store(self):
        sub = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
        lbl = "http://www.w3.org/2000/01/rdf-schema#label"
        typ = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        rows = [
            (NS + "rank/genus", typ, NS + "Rank", False),
            (NS + "rank/species", typ, NS + "Rank", False),
            (NS + "taxon/a", NS + "rank", NS + "rank/species", False),
            (NS + "taxon/b", NS + "rank", NS + "rank/species", False),
            (NS + "taxon/g", NS + "rank", NS + "rank/genus", False),
            (NS + "taxon/a", sub, NS + "taxon/g", False),
            (NS + "taxon/b", sub, NS + "taxon/g", False),
            (NS + "cas/1", typ, NS + "Chemical", False),
            (NS + "cas/1", lbl, "alpha", True),
            (NS + "cas/1", lbl, "alpha technical", True),
            (NS + "cas/2", typ, NS + "Chemical", False),
            (NS + "cas/2", lbl, "beta", True),
            (NS + "group/x", lbl, "GroupX", True),  # labeled non-Chemical
            (NS + "cas/1", sub, NS + "group/x", False),
        ]
        return ray.data.from_arrow(T(rows))

    def _col(self, ds, col):
        return sorted(r[col] for r in ds.take_all())

    def test_entities_of_type_and_ranks(self):
        from tera_ray.query.kg import entities_of_type

        got = self._col(entities_of_type(self._store(), NS + "Rank"), "subj")
        assert got == [NS + "rank/genus", NS + "rank/species"]

    def test_subjects_with_rank_and_ssd(self):
        from tera_ray.query.kg import subjects_with

        st = self._store()
        taxa = self._col(subjects_with(st, NS + "rank",
                                       NS + "rank/species"), "subj")
        assert taxa == [NS + "taxon/a", NS + "taxon/b"]
        sub = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
        kids = self._col(subjects_with(st, sub, NS + "taxon/g"), "subj")
        assert kids == [NS + "taxon/a", NS + "taxon/b"]

    def test_which_features(self):
        from tera_ray.query.kg import which_features

        got = self._col(which_features(self._store(), NS + "cas/1"), "pred")
        assert got == sorted([
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://www.w3.org/2000/01/rdf-schema#label",
            "http://www.w3.org/2000/01/rdf-schema#subClassOf"])

    def test_chemical_names_all_and_subset(self):
        from tera_ray.query.kg import chemical_names

        st = self._store()
        allp = sorted((r["chemical"], r["name"])
                      for r in chemical_names(st, ns=NS).take_all())
        # group/x's label must NOT appear (not typed ns:Chemical)
        assert allp == [(NS + "cas/1", "alpha"),
                        (NS + "cas/1", "alpha technical"),
                        (NS + "cas/2", "beta")]
        one = sorted((r["chemical"], r["name"]) for r in chemical_names(
            st, ns=NS, entities=[NS + "cas/2"]).take_all())
        assert one == [(NS + "cas/2", "beta")]

    def test_class_hierarchy_two_seed_union(self):
        from tera_ray.query.kg import class_hierarchy, construct_subgraph

        st = self._store()
        seeds = [NS + "taxon/a", NS + "cas/1"]
        both = {tuple(r.values())
                for r in class_hierarchy(st, seeds).take_all()}
        single = set()
        for s in seeds:
            single |= {tuple(r.values())
                       for r in construct_subgraph(st, [s]).take_all()}
        assert both == single and both
