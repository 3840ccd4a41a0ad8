"""NCBI-style taxonomy triple emitters (SURVEY M5-M8).

Vectorized Ray Data re-expression of the reference's ``Taxonomy`` loader
closures (``tera/DataAggregation.py:100-271``): each batch of hierarchy /
names / division rows flat-maps to a batch of triples; static axiom
blocks are a constant table unioned in once.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..cleaning import clean_table
from ..schema import (
    NCBI_NS,
    OWL_DISJOINWITH,
    OWL_SUBPROPERTYOF,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    SKOS_PREFLABEL,
)
from .base import cat, concat_triples, static_triples, triples

GRAPH = "ncbi_taxonomy"


def emit_hierarchy(batch: pa.Table, ns: str = NCBI_NS, graph: str = GRAPH) -> pa.Table:
    """nodes.dmp rows (child,parent,rank,division) → rank/parent/division
    triples, mirroring ``Taxonomy._load_hierarchy`` (``DataAggregation.py:134-159``):
    species rows use ``rdf:type`` edges, other ranks ``rdfs:subClassOf``;
    ``no rank`` rows emit no rank triples.
    """
    b = clean_table(batch.select(["child", "parent", "rank", "division"]))
    if b.num_rows == 0:
        return concat_triples([])
    rank_raw = b["rank"]
    rank = pc.replace_substring(rank_raw, " ", "_")
    c_uri = cat(ns, "taxon/", b["child"])
    p_uri = cat(ns, "taxon/", b["parent"])
    d_uri = cat(ns, "division/", pc.replace_substring(b["division"], " ", "_"))
    r_uri = cat(ns, "rank/", rank)

    has_rank = pc.not_equal(rank, "no_rank")
    is_species = pc.equal(rank, "species")
    not_species = pc.invert(is_species)

    return concat_triples([
        triples(c_uri, ns + "rank", r_uri, False, graph, mask=has_rank),
        triples(r_uri, RDFS_LABEL, rank_raw, True, graph, mask=has_rank),
        triples(r_uri, RDF_TYPE, ns + "Rank", False, graph, mask=has_rank),
        triples(c_uri, RDF_TYPE, p_uri, False, graph, mask=is_species),
        triples(c_uri, RDF_TYPE, d_uri, False, graph, mask=is_species),
        triples(c_uri, RDFS_SUBCLASSOF, p_uri, False, graph, mask=not_species),
        triples(c_uri, RDFS_SUBCLASSOF, d_uri, False, graph, mask=not_species),
    ])


def emit_names(batch: pa.Table, ns: str = NCBI_NS, graph: str = GRAPH) -> pa.Table:
    """names.dmp rows (taxon,name,unique_name,name_type) → label triples,
    mirroring ``Taxonomy._load_names`` (``DataAggregation.py:161-184``):
    the predicate itself is minted from the ``name_type`` value and gets
    subproperty / domain axioms alongside the data triple.
    """
    b = clean_table(batch.select(["taxon", "name", "unique_name", "name_type"]))
    if b.num_rows == 0:
        return concat_triples([])
    c_uri = cat(ns, "taxon/", b["taxon"])
    nt_uri = cat(ns, pc.replace_substring(b["name_type"], " ", "_"))
    has_un = pc.greater(pc.utf8_length(b["unique_name"]), 0)
    has_n = pc.greater(pc.utf8_length(b["name"]), 0)

    return concat_triples([
        triples(c_uri, ns + "uniqueName", b["unique_name"], True, graph, mask=has_un),
        triples(ns + "uniqueName", OWL_SUBPROPERTYOF, RDFS_LABEL,
                False, graph, mask=has_un),
        triples(ns + "uniqueName", OWL_SUBPROPERTYOF, SKOS_PREFLABEL,
                False, graph, mask=has_un),
        triples(nt_uri, OWL_SUBPROPERTYOF, RDFS_LABEL, False, graph, mask=has_n),
        triples(c_uri, nt_uri, b["name"], True, graph, mask=has_n),
        triples(nt_uri, RDFS_LABEL, b["name_type"], True, graph, mask=has_n),
        triples(nt_uri, RDFS_DOMAIN, ns + "Taxon", False, graph, mask=has_n),
    ])


def emit_divisions(batch: pa.Table, ns: str = NCBI_NS, graph: str = GRAPH) -> pa.Table:
    """division.dmp rows → type + label (``DataAggregation.py:186-198``)."""
    b = clean_table(batch.select(["division", "acronym", "name"]))
    if b.num_rows == 0:
        return concat_triples([])
    d_uri = cat(ns, "division/", b["division"])
    return concat_triples([
        triples(d_uri, RDF_TYPE, ns + "Division", False, graph),
        triples(d_uri, RDFS_LABEL, b["name"], True, graph),
    ])


# --- Static axiom blocks (M8, DataAggregation.py:200-271) ---

_DISJOINT_SPEC = [
    ("0", ["1", "2", "4", "5", "6", "9", "10"]),
    ("1", ["2", "4", "5", "6", "9", "10"]),
    ("2", ["4", "9", "10"]),
    ("3", ["2", "4", "5", "6", "10"]),
    ("4", ["2", "5", "6", "10"]),
    ("5", ["1"]),
    ("6", ["1"]),
    ("9", ["1", "0", "2", "4", "5", "6", "10"]),
]


def static_axioms(ns: str = NCBI_NS, graph: str = GRAPH) -> pa.Table:
    items = [
        (ns + "rank", RDFS_DOMAIN, ns + "Taxon", False),
        (ns + "rank", RDFS_RANGE, ns + "Rank", False),
    ]
    for a, bs in _DISJOINT_SPEC:
        for b in bs:
            items.append(
                (ns + "division/" + a, OWL_DISJOINWITH, ns + "division/" + b, False)
            )
    return static_triples(items, graph)
