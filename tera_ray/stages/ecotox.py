"""ECOTOX-style triple emitters (SURVEY M13-M18 + axiom blocks).

Vectorized re-expression of the reference's ``Effects`` /
``EcotoxTaxonomy`` / ``EcotoxChemicals`` loader closures
(``tera/DataAggregation.py:380-796``).  Blank nodes are minted
deterministically from their identifying attributes (SURVEY §7.4) so
distributed re-execution and dedup are stable; the comparator
canonicalizes reference BNodes by attribute multiset for parity checks.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..cleaning import clean_table
from ..schema import (
    ECOTOX_NS,
    OWL_DISJOINWITH,
    OWL_SUBPROPERTYOF,
    RDF_TYPE,
    RDF_VALUE,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    SKOS_PREFLABEL,
    UNIT,
    UNIT_UNITS,
)
from ..units import unit_parser
from .base import cat, concat_triples, static_triples, triples

EFFECTS_GRAPH = "ecotox_effects"
TAXO_GRAPH = "ecotox_taxonomy"
CHEM_GRAPH = "ecotox_chemicals"

TESTS_COLUMNS = [
    "test_id", "test_cas", "species_number",
    "study_duration_mean", "study_duration_unit",
    "organism_habitat", "organism_lifestage",
    "organism_age_mean", "organism_age_unit",
    "organism_init_wt_mean", "organism_init_wt_unit",
]
RESULTS_COLUMNS = ["test_id", "endpoint", "conc1_mean", "conc1_unit", "effect"]


def parse_units(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized ``unit_parser`` application: factorize to distinct unit
    strings (tiny cardinality), parse each once (lru-cached), take back.
    Implements the distinct-then-join treatment of SURVEY F1.
    """
    import numpy as np

    s = col.to_pandas()
    codes, uniques = pd.factorize(s, use_na_sentinel=True)
    parsed = ["" if u is None else unit_parser(str(u)) for u in uniques]
    parsed.append("")  # na sentinel (-1) slot wraps to last element
    out = np.array(parsed, dtype=object)[codes]
    return pa.array(out, type=pa.string())


def _measurement_triples(t_uri, test_id, value, unit, prop, ns, graph):
    """One (value, unit, property) BNode block of ``test_func``
    (``DataAggregation.py:421-429``): gated on value != 'missing'; the
    unit triple additionally on a parseable unit != 'missing'.
    """
    has_v = pc.not_equal(value, "missing")
    parsed = parse_units(unit)
    has_u = pc.and_(
        pc.and_(has_v, pc.not_equal(unit, "missing")),
        pc.greater(pc.utf8_length(parsed), 0),
    )
    b = cat("_:m|", test_id, "|", prop, "|", value, "|", unit)
    return [
        triples(b, RDF_VALUE, value, True, graph, mask=has_v),
        triples(b, UNIT_UNITS, cat(UNIT, parsed), False, graph, mask=has_u),
        triples(t_uri, ns + prop, b, False, graph, mask=has_v),
    ]


def emit_tests(batch: pa.Table, ns: str = ECOTOX_NS, graph: str = EFFECTS_GRAPH) -> pa.Table:
    """tests.txt rows → Test node + species/chemical edges + measurement
    BNodes + habitat/lifestage edges (``DataAggregation.py:410-434``).
    """
    b = clean_table(
        batch.select(TESTS_COLUMNS),
        dropna_subset=["test_id", "test_cas", "species_number"],
        fill_missing=True,
    )
    if b.num_rows == 0:
        return concat_triples([])
    t_uri = cat(ns, "test/", b["test_id"])
    s_uri = cat(ns, "taxon/", b["species_number"])
    c_uri = cat(ns, "cas/", b["test_cas"])

    parts = [
        triples(t_uri, RDF_TYPE, ns + "Test", False, graph),
        triples(t_uri, ns + "species", s_uri, False, graph),
        triples(t_uri, ns + "chemical", c_uri, False, graph),
    ]
    for v, u, p in [
        ("study_duration_mean", "study_duration_unit", "studyDuration"),
        ("organism_age_mean", "organism_age_unit", "organismAge"),
        ("organism_init_wt_mean", "organism_init_wt_unit", "organismWeight"),
    ]:
        parts.extend(
            _measurement_triples(t_uri, b["test_id"], b[v], b[u], p, ns, graph)
        )
    has_h = pc.not_equal(b["organism_habitat"], "missing")
    has_l = pc.not_equal(b["organism_lifestage"], "missing")
    parts.append(
        triples(t_uri, ns + "organismHabitat",
                cat(ns, "habitat/", b["organism_habitat"]), False, graph, mask=has_h)
    )
    parts.append(
        triples(t_uri, ns + "organismLifestage",
                cat(ns, "lifestage/", b["organism_lifestage"]), False, graph, mask=has_l)
    )
    return concat_triples(parts)


def emit_results(batch: pa.Table, ns: str = ECOTOX_NS, graph: str = EFFECTS_GRAPH) -> pa.Table:
    """results.txt rows → result BNode with endpoint/effect edges and a
    concentration BNode with digit-filtered value + parsed unit
    (``DataAggregation.py:436-456``).  The ``concentration`` and
    ``hasResult`` edges are unconditional, as in the reference.
    """
    b = clean_table(
        batch.select(RESULTS_COLUMNS),
        dropna_subset=RESULTS_COLUMNS,
        fill_missing=True,
    )
    if b.num_rows == 0:
        return concat_triples([])
    t_uri = cat(ns, "test/", b["test_id"])
    key = cat(b["test_id"], "|", b["endpoint"], "|", b["effect"], "|",
              b["conc1_mean"], "|", b["conc1_unit"])
    r_b = cat("_:r|", key)
    c_b = cat("_:c|", key)
    ep = cat(ns, "endpoint/", b["endpoint"])
    ef = cat(ns, "effect/", b["effect"])
    conc = pc.replace_substring_regex(b["conc1_mean"], r"\D", "")
    has_conc = pc.greater(pc.utf8_length(conc), 0)
    parsed = parse_units(b["conc1_unit"])
    has_u = pc.and_(
        pc.and_(has_conc, pc.not_equal(b["conc1_unit"], "missing")),
        pc.greater(pc.utf8_length(parsed), 0),
    )
    return concat_triples([
        triples(r_b, ns + "endpoint", ep, False, graph),
        triples(r_b, ns + "effect", ef, False, graph),
        triples(c_b, RDF_VALUE, conc, True, graph, mask=has_conc),
        triples(c_b, UNIT_UNITS, cat(UNIT, parsed), False, graph, mask=has_u),
        triples(r_b, ns + "concentration", c_b, False, graph),
        triples(t_uri, ns + "hasResult", r_b, False, graph),
    ])


def _explode(list_arr: pa.Array, companions: list[pa.Array]):
    """Flatten a list column; gather companion arrays by parent index."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    flat = pc.list_flatten(list_arr)
    idx = pc.list_parent_indices(list_arr)
    return flat, [pc.take(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c, idx) for c in companions]


def emit_taxa(batch: pa.Table, ns: str = ECOTOX_NS, graph: str = TAXO_GRAPH) -> pa.Table:
    """species.txt rows → ecotoxGroup edges (comma-multi-valued), group
    labels, commonName/latinName literals (``DataAggregation.py:503-529``).
    Note the reference's ``gr.replace('\\W','')`` is a *literal* (non-regex)
    replace — a no-op for normal values — so group URIs keep slashes.
    """
    b = clean_table(
        batch.select(["species_number", "common_name", "latin_name", "ecotox_group"]),
        dropna_subset=["species_number", "common_name", "latin_name", "ecotox_group"],
    )
    if b.num_rows == 0:
        return concat_triples([])
    s_uri = cat(ns, "taxon/", b["species_number"])
    group = pc.replace_substring(b["ecotox_group"], " ", "")
    names_list = pc.split_pattern(group, ",")
    name_flat, [s_flat] = _explode(names_list, [s_uri])
    nonempty = pc.greater(pc.utf8_length(name_flat), 0)
    gri = cat(ns, "group/", name_flat)
    return concat_triples([
        triples(s_flat, ns + "ecotoxGroup", gri, False, graph, mask=nonempty),
        triples(gri, RDFS_LABEL, name_flat, True, graph, mask=nonempty),
        triples(s_uri, ns + "commonName", b["common_name"], True, graph,
                mask=pc.greater(pc.utf8_length(b["common_name"]), 0)),
        triples(s_uri, ns + "latinName", b["latin_name"], True, graph,
                mask=pc.greater(pc.utf8_length(b["latin_name"]), 0)),
    ])


def emit_synonyms(batch: pa.Table, ns: str = ECOTOX_NS, graph: str = TAXO_GRAPH) -> pa.Table:
    """species_synonyms.txt rows → synonym literal (``DataAggregation.py:695-705``)."""
    b = clean_table(
        batch.select(["species_number", "latin_name"]),
        dropna_subset=["species_number", "latin_name"],
    )
    if b.num_rows == 0:
        return concat_triples([])
    s_uri = cat(ns, "taxon/", b["species_number"])
    return triples(s_uri, ns + "synonym", b["latin_name"], True, graph)


ECOTOX_LINEAGE_COLS = [
    "genus", "family", "tax_order", "class", "superclass",
    "subphylum_div", "phylum_division", "kingdom",
]
# rank name paired with each lineage col, reference's deliberate one-off
# zip ``['species']+ks[1:]`` (DataAggregation.py:726)
_RANK_FOR_COL = ["species", "genus", "family", "tax_order", "class",
                 "superclass", "subphylum_div", "phylum_division"]


def emit_ecotox_hierarchy(batch: pa.Table, ns: str = ECOTOX_NS, graph: str = TAXO_GRAPH) -> pa.Table:
    """species.txt rows → rank triple + chained lineage edges
    (``DataAggregation.py:708-748``): rank is inferred from the first
    non-null lineage level via the reference's one-off zip; the chain
    connects consecutive non-null lineage entries; species-ranked rows
    use ``rdf:type`` for every edge, all other ranks ``rdfs:subClassOf``.
    All columns are ``\\W``-scrubbed (regex), as in the reference.
    """
    cols = ["species_number"] + ECOTOX_LINEAGE_COLS
    b = clean_table(
        batch.select(cols),
        dropna_subset=["species_number"],
        strip=False,
        scrub_nonword=cols,
    )
    if b.num_rows == 0:
        return concat_triples([])
    n = b.num_rows
    s_uri = cat(ns, "taxon/", b["species_number"])

    # rank = first non-null lineage col's paired rank name; if every
    # lineage col is null the loop leaves rank = 'phylum_division'.
    rank = pa.array(["phylum_division"] * n, type=pa.string())
    for col, rname in reversed(list(zip(ECOTOX_LINEAGE_COLS, _RANK_FOR_COL))):
        rank = pc.if_else(pc.is_valid(b[col].combine_chunks()), rname, rank)
    rank_uri = cat(ns, "rank/", rank)
    is_species = pc.equal(rank, "species")

    parts = [
        triples(rank_uri, RDF_TYPE, ns + "Rank", False, graph),
        triples(s_uri, ns + "rank", rank_uri, False, graph),
    ]
    # chain edges: child of lineage[j] = nearest non-null to its left
    # (coalesce over lineage[j-1..0], else the species node itself)
    # cat() propagates nulls, so a null lineage col yields a null URI
    lineage_uris = [cat(ns, "taxon/", b[c]) for c in ECOTOX_LINEAGE_COLS]
    for j, c in enumerate(ECOTOX_LINEAGE_COLS):
        parent = lineage_uris[j]
        child = s_uri
        if j > 0:
            child = pc.coalesce(*reversed(lineage_uris[:j]), s_uri)
        mask = pc.is_valid(b[c].combine_chunks())
        parts.append(triples(child, RDF_TYPE, parent, False, graph,
                             mask=pc.and_(mask, is_species)))
        parts.append(triples(child, RDFS_SUBCLASSOF, parent, False, graph,
                             mask=pc.and_(mask, pc.invert(is_species))))
    return concat_triples(parts)


def emit_chemicals(batch: pa.Table, ns: str = ECOTOX_NS, graph: str = CHEM_GRAPH) -> pa.Table:
    """chemicals.txt rows → Chemical type + per-alias labels + scrubbed
    group subclass edges (``DataAggregation.py:772-796``)."""
    b = clean_table(
        batch.select(["cas_number", "chemical_name", "ecotox_group"]),
        dropna_subset=["cas_number", "chemical_name", "ecotox_group"],
    )
    if b.num_rows == 0:
        return concat_triples([])
    c_uri = cat(ns, "cas/", b["cas_number"])

    alias_list = pc.split_pattern(b["chemical_name"], ", ")
    alias_flat, [c_alias] = _explode(alias_list, [c_uri])

    names_list = pc.split_pattern(b["ecotox_group"], ",")
    scrubbed = b["ecotox_group"]
    for ch in ["/", ".", " "]:
        scrubbed = pc.replace_substring(scrubbed, ch, "")
    gr_list = pc.split_pattern(scrubbed, ",")
    name_flat, [c_grp] = _explode(names_list, [c_uri])
    gr_flat, _ = _explode(gr_list, [])
    gri = cat(ECOTOX_NS, "group/", gr_flat)

    return concat_triples([
        triples(c_uri, RDF_TYPE, ns + "Chemical", False, graph),
        triples(c_alias, RDFS_LABEL, alias_flat, True, graph),
        triples(c_grp, RDFS_SUBCLASSOF, gri, False, graph),
        triples(gri, RDFS_LABEL, name_flat, True, graph),
        triples(gri, RDF_TYPE, ns + "ChemicalGroup", False, graph),
    ])


# --- static axiom blocks (DataAggregation.py:498-501,531-692,750-752) ---

_GROUP_DISJOINT = [
    ("Birds", ["Worms", "Algae", "Insects/Spiders", "Trees", "Mammals", "Fish",
               "Reptiles", "Moss", "Ferns", "Fungi", "Crustaceans", "Flowers",
               "Shrubs"]),
    ("Amphibians", ["Insects/Spiders", "Trees", "Moss", "Ferns", "Fungi"]),
    ("Algae", ["Insects/Spiders", "Trees", "Moss", "Ferns", "Fungi", "Mammals",
               "Vertebrates", "Reptiles", "Crustaceans"]),
    ("Invertebrates", ["Trees", "Moss", "Ferns", "Fungi", "Fish", "Mammals",
                       "Vertebrates"]),
    ("Insects/Spiders", ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Mammals",
                         "Vertebrates", "Fish"]),
    ("Trees", ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Mammals",
               "Vertebrates", "Fish"]),
    ("Mammals", ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Invertebrates",
                 "Fish", "Flowers", "Crustaceans"]),
    ("Fish", ["Birds", "Trees", "Moss", "Ferns", "Fungi", "Mammals", "Flowers",
              "Crustaceans"]),
    ("Reptiles", ["Trees", "Moss", "Ferns", "Fungi", "Mammals", "Fish",
                  "Insects/Spiders", "Crustaceans", "Flowers"]),
    ("Moss", ["Mammals", "Fish", "Crustaceans", "Insects/Spiders", "Worms",
              "Birds"]),
    ("Ferns", ["Mammals", "Fish", "Crustaceans", "Insects/Spiders", "Worms",
               "Birds"]),
    ("Fungi", ["Mammals", "Fish", "Vertebrates", "Invertebrates", "Crustaceans",
               "Insects/Spiders", "Worms", "Birds"]),
    ("Crustaceans", ["Mammals", "Fish", "Vertebrates", "Insects/Spiders",
                     "Worms", "Birds"]),
]


def ecotox_taxonomy_axioms(ns: str = ECOTOX_NS, graph: str = TAXO_GRAPH) -> pa.Table:
    items = [
        (ns + "latinName", OWL_SUBPROPERTYOF, RDFS_LABEL, False),
        (ns + "latinName", OWL_SUBPROPERTYOF, SKOS_PREFLABEL, False),
        (ns + "commonName", OWL_SUBPROPERTYOF, RDFS_LABEL, False),
        (ns + "rank", RDFS_DOMAIN, ns + "Taxon", False),
        (ns + "rank", RDFS_RANGE, ns + "Rank", False),
    ]
    base = ns + "group/"
    for a, bs in _GROUP_DISJOINT:
        for b in bs:
            items.append((base + a, OWL_DISJOINWITH, base + b, False))
    return static_triples(items, graph)
