"""Mapping-file sources (SURVEY S5, J6): LogMap alignment ingestion.

The reference's ``LogMapMapping`` reads either an Alignment-format RDF
file (``alignmentCell`` entities, ``tera/DataIntegration.py:194-216``)
or a pipe-delimited txt (``e1|e2|type|score|is_instance`` with a 3-col
fallback, ``:218-237``), filters by threshold, optionally keeps the max
score per pair and strips namespaces.  Engine form: both produce a
``(src, dst, score)`` mapping Dataset; best-per-pair/threshold are the
shared mapping-table operators (``state/mapping.py``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..units import strip_namespace

_ALIGN_NS = "http://knowledgeweb.semanticweb.org/heterogeneity/"

_CELL_RE = re.compile(
    r"<(?:[A-Za-z0-9_]+:)?alignmententity1[^>]*?(?:rdf:resource=\"([^\"]+)\"[^>]*/>|>\s*<[^>]+rdf:about=\"([^\"]+)\")"
)


def parse_alignment_rdf(text: str) -> pa.Table:
    """Minimal Alignment-format parser: extracts per-Cell
    (entity1, entity2, measure) triples from the XML serialization.
    Covers the LogMap output subset (one Cell per mapping)."""
    cells = re.split(r"<(?:[A-Za-z0-9_]+:)?Cell[\s>]", text)[1:]
    src, dst, score = [], [], []

    def ent(block: str, which: str):
        m = re.search(
            rf"alignmententity{which}\s+rdf:resource=\"([^\"]+)\"", block)
        if m:
            return m.group(1)
        m = re.search(
            rf"alignmententity{which}[^>]*>\s*<[^>]*rdf:about=\"([^\"]+)\"",
            block)
        return m.group(1) if m else None

    for block in cells:
        e1, e2 = ent(block, "1"), ent(block, "2")
        m = re.search(r"alignmentmeasure[^>]*>([0-9.eE+-]+)<", block)
        if e1 and e2 and m:
            src.append(e1)
            dst.append(e2)
            score.append(float(m.group(1)))
    return pa.table({"src": pa.array(src, pa.string()),
                     "dst": pa.array(dst, pa.string()),
                     "score": pa.array(score, pa.float64())})


def read_logmap(path: str, threshold: float = 0.0, strip: bool = False,
                unique: bool = True):
    """LogMap mapping file (.rdf alignment format or | txt) →
    ``(src, dst, score)`` Dataset with the reference's threshold /
    best-per-pair / namespace-strip options applied."""
    import ray.data

    if path.endswith("rdf"):
        with open(path) as f:
            tbl = parse_alignment_rdf(f.read())
        ds = ray.data.from_arrow(tbl)
    else:
        from pyarrow import csv as pacsv

        parse = pacsv.ParseOptions(delimiter="|")
        ds = ray.data.read_csv(path, parse_options=parse)

        def norm(t: pa.Table) -> pa.Table:
            names = t.schema.names
            # 5-col (e1|e2|type|score|is_instance) or 3-col (e1|e2|score)
            if len(names) >= 4:
                e1, e2, sc = names[0], names[1], names[3]
            else:
                e1, e2, sc = names[0], names[1], names[2]
            return pa.table({
                "src": t[e1].cast(pa.string()),
                "dst": t[e2].cast(pa.string()),
                "score": t[sc].cast(pa.float64()),
            })

        ds = ds.map_batches(norm, batch_format="pyarrow")

    if threshold > 0.0:
        ds = ds.filter(expr=f"score >= {threshold!r}")
    if strip:
        def do_strip(t: pa.Table) -> pa.Table:
            return pa.table({
                "src": pa.array([strip_namespace(s, ["/", "#", "CID"])
                                 for s in t["src"].to_pylist()], pa.string()),
                "dst": pa.array([strip_namespace(s, ["/", "#", "CID"])
                                 for s in t["dst"].to_pylist()], pa.string()),
                "score": t["score"],
            })

        ds = ds.map_batches(do_strip, batch_format="pyarrow")
    if unique:
        from ..state.mapping import best_per_src

        # best score per (src,dst) pair — the reference's scores-dict gate
        def pairkey(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__pair", pc.binary_join_element_wise(t["src"].combine_chunks(),
                                                      t["dst"].combine_chunks(),
                                                      "\x1f"))

        ds = best_per_src(ds.map_batches(pairkey, batch_format="pyarrow"),
                          key="__pair")
        ds = ds.map_batches(lambda t: t.drop_columns(["__pair"]),
                            batch_format="pyarrow")
    return ds


def read_wikidata_csv(path: str):
    """Wikidata dump-CSV mapping (``DownloadedWikidata.load``,
    ``tera/DataIntegration.py:286-291``): comma CSV with header
    ``from,to``, everything string-typed → ``(src, dst, score=1.0)``
    Dataset (the reference's dict mapping carries no score; 1.0 marks an
    authoritative curated pair)."""
    import ray.data
    from pyarrow import csv as pacsv

    conv = pacsv.ConvertOptions(column_types={"from": pa.string(),
                                              "to": pa.string()})
    ds = ray.data.read_csv(path, convert_options=conv)

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["from"].cast(pa.string()),
            "dst": t["to"].cast(pa.string()),
            "score": pa.array(np.ones(t.num_rows), pa.float64()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


def endpoint_mapping(triples):
    """J6/missing-item parity with the reference's ``EndpointMapping``
    (``tera/DataIntegration.py:122-141``): collect every ``owl:sameAs``
    pair from a graph into a ``(src, dst, score=1.0)`` mapping Dataset.

    The reference pulls the pairs from a live SPARQL endpoint; the
    engine's graphs are triple Datasets, so the "endpoint" is the KG
    itself — one streaming predicate filter, no driver materialization.
    The result composes with the rest of the mapping algebra
    (``state.mapping.compose`` / ``best_per_src`` / ``invert``).
    """
    import pyarrow.compute as pc

    from ..schema import OWL_SAMEAS

    def pick(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["pred"], OWL_SAMEAS))
        return pa.table({
            "src": s["subj"].combine_chunks().cast(pa.string()),
            "dst": s["obj"].combine_chunks().cast(pa.string()),
            "score": pa.array(np.ones(s.num_rows), pa.float64()),
        })

    return triples.map_batches(pick, batch_format="pyarrow")
