"""Core schema constants for the Ray-Data-native KG engine.

The engine's spine is one canonical triple relation (SURVEY.md §1.4).
Namespaces mirror the reference (``tera/DataAggregation.py:7,102,382,477,
756``) so emitted triples are string-comparable with the reference's
output.  Note the reference's literal ``owl#disjoinWith`` misspelling
(``tera/DataAggregation.py:215``) is reproduced on purpose.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

# --- Namespaces (string prefixes; URIs are plain strings in the engine) ---
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
UNIT = "http://qudt.org/vocab/unit#"

RDF_TYPE = RDF + "type"
RDF_VALUE = RDF + "value"
RDFS_LABEL = RDFS + "label"
RDFS_SUBCLASSOF = RDFS + "subClassOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"
# The reference uses OWL.subPropertyOf (not RDFS) at DataAggregation.py:123
OWL_SUBPROPERTYOF = OWL + "subPropertyOf"
# The reference's misspelled disjointness predicate (DataAggregation.py:215)
OWL_DISJOINWITH = OWL + "disjoinWith"
OWL_SAMEAS = OWL + "sameAs"
SKOS_PREFLABEL = SKOS + "prefLabel"
UNIT_UNITS = UNIT + "units"

NCBI_NS = "https://www.ncbi.nlm.nih.gov/taxonomy/"
ECOTOX_NS = "https://cfpub.epa.gov/ecotox/"
EOL_NS = "https://eol.org/pages/"
PUBCHEM_NS = "http://rdf.ncbi.nlm.nih.gov/pubchem/compound/"

# NA sentinel vocabulary, verbatim from tera/DataAggregation.py:18 (string
# members only; parquet string columns cannot hold the float/int members).
NAN_VALUES = [
    "nan", "--", "-X", "NA", "NC", "", "sp.", "sp,", "var.", "variant",
    "NR", "sp", "ssp", "ssp.", "ssp,",
]

# --- Canonical triple schema (SURVEY.md §1.4) ---
TRIPLE_FIELDS = [
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()),
    ("graph", pa.string()),
]
TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)

# Lineage-extended triple schema (north rule: per-partition lineage).
TRIPLE_LINEAGE_SCHEMA = pa.schema(
    TRIPLE_FIELDS + [("conv_id", pa.string()), ("turn_idx", pa.int32())]
)

# Input transcript schema (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def bnode(*parts: str) -> str:
    """Deterministic blank-node id.

    rdflib mints random BNode ids per run (``DataAggregation.py:423,440``);
    distributed re-execution requires stable ids, so we hash the node's
    identifying attributes (SURVEY.md §7.4).
    """
    h = hashlib.sha1("|".join(parts).encode("utf-8")).hexdigest()
    return "_:" + h


def empty_triples(lineage: bool = False) -> pa.Table:
    schema = TRIPLE_LINEAGE_SCHEMA if lineage else TRIPLE_SCHEMA
    return schema.empty_table()
