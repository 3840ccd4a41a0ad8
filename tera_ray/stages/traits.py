"""EOL traits triple emitters (SURVEY M9-M11).

Vectorized re-expression of the reference's ``Traits`` loader closures
(``tera/DataAggregation.py:274-377``).  The reference gates every term on
``validators.url``; here that is a vectorized URL-shape regex (the
fixture vocabulary is plain http(s) URLs, where the two agree).

Note the reference's literal-trait loader (M12, ``:321-340``) is dead
code (buggy column list, never called) and is intentionally not ported
(SURVEY §2.2 M12).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..cleaning import clean_table
from ..schema import EOL_NS, RDFS_LABEL, RDFS_SUBCLASSOF
from .base import cat, concat_triples, triples

GRAPH = "eol_traits"

# validators.url stand-in: scheme://host... with no whitespace
_URL_RE = r"^https?://[^\s/$.?#][^\s]*$"


def is_url(col) -> pa.Array:
    return pc.match_substring_regex(col, _URL_RE)


def emit_traits(batch: pa.Table, ns: str = EOL_NS, graph: str = GRAPH) -> pa.Table:
    """traits.csv rows (page_id, predicate, value_uri) → one triple when
    subject, predicate and object are all URL-shaped
    (``DataAggregation.py:300-319``; with ``dtype=str`` inputs the
    Literal fallback branch is unreachable, so objects are always URIs).
    """
    b = clean_table(batch.select(["page_id", "predicate", "value_uri"]))
    if b.num_rows == 0:
        return concat_triples([])
    s = cat(ns, b["page_id"])
    mask = pc.and_(pc.and_(is_url(s), is_url(b["predicate"])), is_url(b["value_uri"]))
    return triples(s, b["predicate"], b["value_uri"], False, graph, mask=mask)


def emit_term_labels(batch: pa.Table, graph: str = GRAPH) -> pa.Table:
    """terms.csv rows (uri, name) → rdfs:label literals
    (``DataAggregation.py:342-353``)."""
    b = clean_table(batch.select(["uri", "name"]))
    if b.num_rows == 0:
        return concat_triples([])
    mask = pc.and_(is_url(b["uri"]), pc.greater(pc.utf8_length(b["name"]), 0))
    return triples(b["uri"], RDFS_LABEL, b["name"], True, graph, mask=mask)


def emit_subclasses(batch: pa.Table, graph: str = GRAPH) -> pa.Table:
    """eol_rels rows (child, parent) → rdfs:subClassOf when both are URLs
    (``DataAggregation.py:356-377``)."""
    b = clean_table(batch.select(["child", "parent"]))
    if b.num_rows == 0:
        return concat_triples([])
    mask = pc.and_(is_url(b["child"]), is_url(b["parent"]))
    return triples(b["child"], RDFS_SUBCLASSOF, b["parent"], False, graph, mask=mask)
