"""Golden-output conformance for the triple emitters (SURVEY §5.2).

Each vectorized Ray-side emitter must produce EXACTLY the triple set of
the single-threaded oracle transliteration on the synthetic fixtures
(exact stages target P/R = 1.0 per FIXTURES.md §6.2).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import oracle
from tera_ray.stages import ecotox, taxonomy, traits


def _engine_set(table: pa.Table) -> set:
    return set(
        zip(
            table["subj"].to_pylist(),
            table["pred"].to_pylist(),
            table["obj"].to_pylist(),
            table["obj_is_literal"].to_pylist(),
        )
    )


def _check(fixture_path, emit_fn, oracle_fn):
    t = pq.read_table(fixture_path)
    got = _engine_set(emit_fn(t))
    want = oracle_fn(t.to_pandas())
    missing = want - got
    extra = got - want
    assert not missing and not extra, (
        f"missing={list(missing)[:5]} extra={list(extra)[:5]} "
        f"(|missing|={len(missing)}, |extra|={len(extra)})"
    )
    assert len(got) > 0


CASES = [
    ("taxonomy_nodes", taxonomy.emit_hierarchy, oracle.hierarchy),
    ("taxonomy_names", taxonomy.emit_names, oracle.names),
    ("divisions", taxonomy.emit_divisions, oracle.divisions),
    ("tests", ecotox.emit_tests, oracle.tests_emitter),
    ("results", ecotox.emit_results, oracle.results_emitter),
    ("species", ecotox.emit_taxa, oracle.taxa),
    ("species_synonyms", ecotox.emit_synonyms, oracle.synonyms),
    ("species", ecotox.emit_ecotox_hierarchy, oracle.ecotox_hierarchy),
    ("chemicals", ecotox.emit_chemicals, oracle.chemicals),
]


@pytest.mark.parametrize("name,emit,orc", CASES, ids=[f"{c[0]}:{c[1].__name__}" for c in CASES])
def test_emitter_conformance(fixtures_t1, name, emit, orc):
    _check(os.path.join(fixtures_t1, name + ".parquet"), emit, orc)


def test_traits_conformance():
    t = pa.table({
        "page_id": ["1", "2", "3", None, "bad page"],
        "predicate": [
            "http://eol.org/schema/terms/Habitat",
            "not a url",
            "http://eol.org/schema/terms/Habitat",
            "http://x.org/p",
            "http://x.org/p",
        ],
        "value_uri": [
            "http://purl.obolibrary.org/obo/ENVO_00000873",
            "http://x.org/o",
            "plain text",
            "http://x.org/o",
            "http://x.org/o",
        ],
    })
    got = _engine_set(traits.emit_traits(t))
    want = oracle.traits(t.to_pandas())
    assert got == want
    assert len(got) == 1


def test_eol_subclasses_conformance():
    t = pa.table({
        "child": ["http://a.org/1", "nope", "http://a.org/2"],
        "parent": ["http://a.org/0", "http://a.org/0", None],
    })
    got = _engine_set(traits.emit_subclasses(t))
    want = oracle.eol_subclasses(t.to_pandas())
    assert got == want
    assert len(got) == 1


def test_static_axiom_counts():
    # DataAggregation.py:205-271 — 7+6+3+5+4+1+1+7 = 34 disjoint + 2 domain/range
    ax = taxonomy.static_axioms()
    assert ax.num_rows == 36
    eax = ecotox.ecotox_taxonomy_axioms()
    # 3 subproperty + 2 domain/range + sum of group disjoint block sizes
    expected = 5 + sum(len(bs) for _, bs in ecotox._GROUP_DISJOINT)
    assert eax.num_rows == expected


def test_permutation_invariance(fixtures_t1):
    """Shuffled input rows ⇒ identical triple set (FIXTURES.md §6.3)."""
    t = pq.read_table(os.path.join(fixtures_t1, "tests.parquet"))
    perm = pa.array(list(reversed(range(t.num_rows))))
    assert _engine_set(ecotox.emit_tests(t)) == _engine_set(
        ecotox.emit_tests(t.take(perm))
    )
