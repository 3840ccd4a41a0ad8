"""Alignment / mapping / canonicalization tests (SURVEY J4-J7, A3, A6, M19)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from tera_ray.stages.align import blocked_fuzzy_align, label_bags, ratio


def triple_tbl(rows):
    s, p, o, lit = zip(*rows)
    return pa.table({
        "subj": list(s), "pred": list(p), "obj": list(o),
        "obj_is_literal": pa.array(list(lit), pa.bool_()),
        "graph": ["g"] * len(rows),
    })


class TestRatio:
    def test_values(self):
        assert ratio("abc", "abc") == 100.0
        assert ratio("abcd", "abce") == 75.0
        assert ratio("", "") == 100.0
        assert ratio("ab", "cd") == 0.0


@pytest.mark.usefixtures("ray_session")
class TestFuzzyAlign:
    def test_label_bags_filters_literal_labels(self):
        t = triple_tbl([
            ("e1", "http://www.w3.org/2000/01/rdf-schema#label", "Foo", True),
            ("e1", "x/rank", "x/species", False),
            ("e2", "https://cfpub.epa.gov/ecotox/latinName", "Bar baz", True),
        ])
        out = label_bags(ray.data.from_arrow(t)).take_all()
        assert sorted((r["entity"], r["label"]) for r in out) == [
            ("e1", "Foo"), ("e2", "Bar baz")]

    def test_blocked_align_exact_fuzzy_threshold(self):
        left = ray.data.from_items([
            {"entity": "L1", "label": "Danio rerio"},
            {"entity": "L2", "label": "Daphnia magna"},
            {"entity": "L3", "label": "Zzz unique"},
        ])
        right = ray.data.from_items([
            {"entity": "R1", "label": "danio rerio"},      # exact (case-insens)
            {"entity": "R2", "label": "Dapnhia magna"},    # transposition
            {"entity": "R3", "label": "totally different"},
        ])
        out = {r["src"]: (r["dst"], r["score"])
               for r in blocked_fuzzy_align(left, right, threshold=80.0).take_all()}
        assert out["L1"] == ("R1", 100.0)
        assert out["L2"][0] == "R2" and 80 <= out["L2"][1] < 100
        assert "L3" not in out

    def test_best_per_src_deterministic_tiebreak(self):
        from tera_ray.state.mapping import best_per_src

        ds = ray.data.from_items([
            {"src": "a", "dst": "z", "score": 90.0},
            {"src": "a", "dst": "b", "score": 90.0},
            {"src": "a", "dst": "c", "score": 80.0},
        ])
        out = best_per_src(ds).take_all()
        assert len(out) == 1 and out[0]["dst"] == "b"  # max score, lexical min dst


@pytest.mark.usefixtures("ray_session")
class TestMappingOps:
    def test_compose_and_invert(self):
        from tera_ray.state.mapping import compose, invert, to_dict

        a = ray.data.from_items([{"src": "x", "dst": "y", "score": 1.0}])
        b = ray.data.from_items([{"src": "y", "dst": "z", "score": 0.5}])
        c = compose(a, b, num_partitions=2).take_all()
        assert c == [{"src": "x", "dst": "z", "score": 0.5}]
        assert to_dict(invert(a)) == {"y": "x"}


@pytest.mark.usefixtures("ray_session")
class TestUnionFind:
    def edges(self, pairs):
        return ray.data.from_items(
            [{"src": a, "dst": b, "score": 1.0} for a, b in pairs])

    def test_chain_and_two_components(self):
        from tera_ray.state.linkage import connected_components

        comp = connected_components(
            self.edges([("A1", "B1"), ("B1", "C1"), ("C1", "D1"), ("D1", "E1"),
                        ("A2", "B2"), ("B2", "C2")]),
            num_partitions=2,
            small_threshold=0,  # force the distributed shuffle path
        ).take_all()
        got = {r["node"]: r["comp"] for r in comp}
        assert got == {"B1": "A1", "C1": "A1", "D1": "A1", "E1": "A1", "A1": "A1",
                       "A2": "A2", "B2": "A2", "C2": "A2"}

    def test_small_fast_path_matches_distributed(self):
        from tera_ray.state.linkage import connected_components

        pairs = [("A1", "B1"), ("B1", "C1"), ("C1", "D1"), ("D1", "E1"),
                 ("A2", "B2"), ("B2", "C2")]
        fast = {r["node"]: r["comp"] for r in
                connected_components(self.edges(pairs)).take_all()}
        dist = {r["node"]: r["comp"] for r in
                connected_components(self.edges(pairs), num_partitions=2,
                                     small_threshold=0).take_all()}
        assert fast == dist

    def test_fixture_sameas_with_threshold(self, fixtures_t1):
        from tera_ray.state.linkage import canonical_mapping, connected_components
        from tera_ray.state.mapping import threshold, to_dict

        ds = ray.data.read_parquet(os.path.join(fixtures_t1, "sameas_pairs.parquet"))
        comp = connected_components(threshold(ds, 0.9), num_partitions=2)
        m = to_dict(canonical_mapping(comp))
        # chain A1-B1-C1-D1-E1 all canonicalize to A1; B2-C2 dropped (<0.9)
        assert m["E1"] == "A1" and m["B1"] == "A1" and m["D1"] == "A1"
        assert m.get("A2", None) != "A1"

    def test_rewrite_broadcast_matches_shuffle(self):
        from tera_ray.state.linkage import rewrite_triples

        t = triple_tbl([
            ("B1", "p", "C1", False),
            ("X", "p", "B1", False),
            ("X", "label", "B1", True),   # literal obj NOT rewritten
        ])
        mapping = ray.data.from_items(
            [{"src": "B1", "dst": "A1", "score": 1.0},
             {"src": "C1", "dst": "A1", "score": 1.0}])
        ds = ray.data.from_arrow(t)
        key = lambda rows: sorted(
            (r["subj"], r["pred"], r["obj"], r["obj_is_literal"]) for r in rows)
        b = key(rewrite_triples(ds, mapping, broadcast=True).take_all())
        s = key(rewrite_triples(ds, mapping, broadcast=False,
                                num_partitions=2).take_all())
        assert b == s
        assert ("A1", "p", "A1", False) in b
        assert ("X", "label", "B1", True) in b  # literal untouched


@pytest.mark.usefixtures("ray_session")
class TestGraphAlignEndToEnd:
    def test_ncbi_to_ecotox_alignment_accuracy(self, fixtures_t1):
        """J5 on the t1 fixtures: NCBI name labels vs ECOTOX latin names.
        Ground truth: ncbi taxon 900000+i ↔ ecotox taxon 100000+i."""
        from tera_ray.stages.align import align_label_graphs
        from tera_ray.stages.ecotox import emit_taxa
        from tera_ray.stages.taxonomy import emit_names

        ncbi = ray.data.read_parquet(
            os.path.join(fixtures_t1, "taxonomy_names.parquet")
        ).map_batches(emit_names, batch_format="pyarrow")
        eco = ray.data.read_parquet(
            os.path.join(fixtures_t1, "species.parquet")
        ).map_batches(emit_taxa, batch_format="pyarrow")

        ncbi_preds = (
            "https://www.ncbi.nlm.nih.gov/taxonomy/scientific_name",
            "https://www.ncbi.nlm.nih.gov/taxonomy/common_name",
            "https://www.ncbi.nlm.nih.gov/taxonomy/uniqueName",
        )
        eco_preds = ("https://cfpub.epa.gov/ecotox/latinName",)
        from tera_ray.stages.align import label_bags

        m = blocked_fuzzy_align(
            label_bags(ncbi, ncbi_preds), label_bags(eco, eco_preds),
            threshold=90.0,
        ).take_all()
        # eligible taxa: names rows that survive the reference's whole-row
        # dropna (30% of fixture rows carry a '' unique_name sentinel and
        # are dropped — matching tera/DataAggregation.py:163)
        from tera_ray.schema import NAN_VALUES

        names = pq.read_table(os.path.join(fixtures_t1, "taxonomy_names.parquet"))
        eligible = {
            int(t) - 900000
            for t, u in zip(names["taxon"].to_pylist(),
                            names["unique_name"].to_pylist())
            if u not in NAN_VALUES
        }
        correct = 0
        for r in m:
            i = int(r["src"].rsplit("/", 1)[1]) - 900000
            j = int(r["dst"].rsplit("/", 1)[1]) - 100000
            correct += i == j
        assert m, "no alignments produced"
        precision = correct / len(m)
        recall = sum(
            1 for r in m
            if int(r["src"].rsplit("/", 1)[1]) - 900000 in eligible
            and int(r["src"].rsplit("/", 1)[1]) - 900000
            == int(r["dst"].rsplit("/", 1)[1]) - 100000
        ) / len(eligible)
        assert precision >= 0.95, precision
        assert recall >= 0.95, (recall, len(m), len(eligible))


@pytest.mark.usefixtures("ray_session")
class TestHierarchyConsensus:
    def test_parent_agreement_boosts_and_wins(self):
        """J7: the candidate whose parents also align must win top-1."""
        import pyarrow as pa

        from tera_ray.stages.align import hierarchy_consensus_align

        cand = ray.data.from_arrow(pa.table({
            "src": ["a1", "a1", "a2", "g1"],
            "dst": ["b1", "b2", "b9", "h1"],
            "score": [90.0, 92.0, 88.0, 95.0],
        }))
        parents_a = pa.table({"child": ["a1", "a2"], "parent": ["g1", "g1"]})
        parents_b = pa.table({"child": ["b1", "b2", "b9"],
                              "parent": ["h1", "h2", "h9"]})
        out = {r["src"]: (r["dst"], r["score"])
               for r in hierarchy_consensus_align(cand, parents_a, parents_b,
                                                  boost=10.0).take_all()}
        # a1→b1 (90) is boosted to 100 because (g1,h1) is a candidate;
        # a1→b2 (92) is not — so b1 wins despite the lower raw score
        assert out["a1"] == ("b1", 100.0)
        # a2→b9: parents known but (g1,h9) not aligned → unboosted score
        assert out["a2"] == ("b9", 88.0)
        # g1→h1 has no parents in the maps → score unchanged
        assert out["g1"] == ("h1", 95.0)
