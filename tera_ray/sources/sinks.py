"""Triple-store sinks (SURVEY S6).

The reference serializes the whole in-RAM graph with rdflib
(``DataObject.save``, ``tera/DataAggregation.py:54-62``, format inferred
from the file extension).  Engine sinks:

- partitioned Parquet + lineage manifest — ``state/checkpoint.write_stage``
  (the primary store format; resumable, balanced);
- :func:`write_ntriples` — N-Triples text export, one file per block,
  formatted inside ``map_batches`` (vectorized string building) and
  written via a streaming per-block task; no driver collect.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc


def _escape_literal(col: pa.Array) -> pa.Array:
    col = pc.replace_substring(col, "\\", "\\\\")
    col = pc.replace_substring(col, '"', '\\"')
    col = pc.replace_substring(col, "\n", "\\n")
    return pc.replace_substring(col, "\r", "\\r")


def format_nt(batch: pa.Table) -> pa.Table:
    """Triple batch → one NT line per row (vectorized concat).

    Blank-node ids (``_:...``) pass through unwrapped; URIs get angle
    brackets; literals are escaped and quoted.
    """
    subj = batch["subj"].combine_chunks()
    pred = batch["pred"].combine_chunks()
    obj = batch["obj"].combine_chunks()
    lit = pc.fill_null(batch["obj_is_literal"].combine_chunks(), False)

    def term(col, allow_literal=False, lit_mask=None):
        is_bnode = pc.starts_with(col, "_:")
        # UCHAR-escape IRIREF-forbidden chars (space, <>, quotes, …) so
        # dirty URI columns can't corrupt the line; the reader inverts
        uri = pc.binary_join_element_wise(
            pa.array(["<"] * len(col)), _escape_ttl_iri(col),
            pa.array([">"] * len(col)), "")
        out = pc.if_else(is_bnode, col, uri)
        if allow_literal:
            quoted = pc.binary_join_element_wise(
                pa.array(['"'] * len(col)), _escape_literal(col),
                pa.array(['"'] * len(col)), "")
            out = pc.if_else(lit_mask, quoted, out)
        return out

    line = pc.binary_join_element_wise(
        term(subj), term(pred), term(obj, True, lit), pa.array(["."] * len(subj)),
        " ")
    return pa.table({"line": line})


def write_ntriples(ds, path: str) -> list[str]:
    """Triple Dataset → ``<path>/part-<hash>.nt``, one file per batch,
    written INSIDE the map task (no driver collect).  Filenames derive
    from the content hash, so task retries overwrite the same file
    instead of duplicating output (deterministic, idempotent)."""
    import hashlib

    os.makedirs(path, exist_ok=True)

    def fmt_and_write(t: pa.Table) -> pa.Table:
        lines = format_nt(t)["line"].to_pylist()
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        name = hashlib.sha1(payload).hexdigest()[:16]
        p = os.path.join(path, f"part-{name}.nt")
        with open(p, "wb") as f:
            f.write(payload)
        return pa.table({"path": pa.array([p]),
                         "rows": pa.array([t.num_rows], pa.int64())})

    out = ds.map_batches(fmt_and_write, batch_format="pyarrow")
    return sorted(r["path"] for r in out.take_all())


_PN_LOCAL_RE = r"^[A-Za-z0-9_]([A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?$"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _escape_ttl_literal(col: pa.Array) -> pa.Array:
    col = pc.replace_substring(col, "\\", "\\\\")
    col = pc.replace_substring(col, '"', '\\"')
    col = pc.replace_substring(col, "\n", "\\n")
    col = pc.replace_substring(col, "\t", "\\t")
    return pc.replace_substring(col, "\r", "\\r")


#: chars IRIREF forbids that actually occur in dirty URI columns —
#: UCHAR-escaped on write (\uXXXX, spec §6.4), unescaped by the reader
_IRI_BAD = ["\\", " ", "<", ">", '"', "{", "}", "|", "^", "`",
            "\t", "\n", "\r"]


def _escape_ttl_iri(col: pa.Array) -> pa.Array:
    for ch in _IRI_BAD:
        col = pc.replace_substring(col, ch, "\\u%04X" % ord(ch))
    return col


def format_turtle(batch: pa.Table, prefixes: dict[str, str]) -> pa.Table:
    """Triple batch → Turtle lines: rows sorted by subject, same-subject
    runs grouped into ``;`` predicate lists, URIs compressed to
    ``pfx:local`` when the local part is a valid PN_LOCAL (else kept as
    ``<uri>``), ``rdf:type`` written as ``a``.  All vectorized (sort +
    run-boundary masks + element-wise joins) — no Python row loop."""
    idx = pc.sort_indices(batch, sort_keys=[("subj", "ascending"),
                                            ("pred", "ascending"),
                                            ("obj", "ascending")])
    batch = batch.take(idx)
    n = batch.num_rows
    subj = batch["subj"].combine_chunks()
    pred = batch["pred"].combine_chunks()
    obj = batch["obj"].combine_chunks()
    lit = pc.fill_null(batch["obj_is_literal"].combine_chunks(), False)

    def term(col):
        is_bnode = pc.starts_with(col, "_:")
        out = pc.binary_join_element_wise(
            pa.array(["<"] * len(col)), _escape_ttl_iri(col),
            pa.array([">"] * len(col)), "")
        out = pc.if_else(is_bnode, col, out)
        for pfx, base in prefixes.items():
            suf = pc.utf8_slice_codeunits(col, len(base))
            ok = pc.and_(pc.starts_with(col, base),
                         pc.match_substring_regex(suf, _PN_LOCAL_RE))
            short = pc.binary_join_element_wise(
                pa.array([pfx + ":"] * len(col)), suf, "")
            out = pc.if_else(ok, short, out)
        return out

    quoted = pc.binary_join_element_wise(
        pa.array(['"'] * n), _escape_ttl_literal(obj),
        pa.array(['"'] * n), "")
    obj_t = pc.if_else(lit, quoted, term(obj))
    pred_t = pc.if_else(pc.equal(pred, pa.scalar(_RDF_TYPE, pa.string())),
                        pa.scalar("a", pa.string()), term(pred))

    import numpy as np

    s = subj.to_numpy(zero_copy_only=False)
    first = np.ones(n, bool)
    first[1:] = s[1:] != s[:-1]
    last = np.ones(n, bool)
    last[:-1] = s[:-1] != s[1:]
    head = pc.if_else(pa.array(first),
                      pc.binary_join_element_wise(
                          term(subj), pa.array(["\n    "] * n), ""),
                      pa.scalar("    ", pa.string()))
    tail = pc.if_else(pa.array(last), pa.scalar(" .", pa.string()),
                      pa.scalar(" ;", pa.string()))
    line = pc.binary_join_element_wise(
        head, pred_t, pa.array([" "] * n), obj_t, tail, "")
    return pa.table({"line": line})


def write_turtle(ds, path: str, prefixes: dict[str, str] | None = None
                 ) -> list[str]:
    """Triple Dataset → ``<path>/part-<hash>.ttl`` with an ``@prefix``
    header per file; one file per batch written INSIDE the map task
    (no driver collect), content-hash names so retries are idempotent
    — the Turtle sibling of :func:`write_ntriples` (reference
    ``DataObject.save`` picks ttl from the extension,
    ``tera/DataAggregation.py:54-62``)."""
    import hashlib

    os.makedirs(path, exist_ok=True)
    pfx = dict(prefixes or {})
    header = "".join(f"@prefix {p}: <{b}> .\n" for p, b in pfx.items())

    def fmt_and_write(t: pa.Table) -> pa.Table:
        lines = format_turtle(t, pfx)["line"].to_pylist()
        payload = (header + "\n".join(lines) + "\n").encode("utf-8")
        name = hashlib.sha1(payload).hexdigest()[:16]
        p = os.path.join(path, f"part-{name}.ttl")
        with open(p, "wb") as f:
            f.write(payload)
        return pa.table({"path": pa.array([p]),
                         "rows": pa.array([t.num_rows], pa.int64())})

    out = ds.map_batches(fmt_and_write, batch_format="pyarrow")
    return sorted(r["path"] for r in out.take_all())


# ---------------------------------------------------------------------------
# RDF/XML sink (reference DataObject.save with a .xml/.rdf extension,
# tera/DataAggregation.py:54-62)

_NCNAME_SUFFIX = re.compile(r"[A-Za-z_][A-Za-z0-9._-]*$")


def _escape_xml_text(col: pa.Array) -> pa.Array:
    col = pc.replace_substring(col, "&", "&amp;")   # FIRST — order matters
    col = pc.replace_substring(col, "<", "&lt;")
    col = pc.replace_substring(col, ">", "&gt;")
    # XML end-of-line normalization folds a literal \r (or \r\n) into
    # \n on PARSE (XML 1.0 §2.11) — a raw \r would corrupt the
    # roundtrip; a character reference survives it
    return pc.replace_substring(col, "\r", "&#13;")


def _escape_xml_attr(col: pa.Array) -> pa.Array:
    col = pc.replace_substring(_escape_xml_text(col), '"', "&quot;")
    # attribute-value normalization (XML 1.0 §3.3.3) additionally
    # turns raw \n and \t into spaces — reference them too
    col = pc.replace_substring(col, "\n", "&#10;")
    return pc.replace_substring(col, "\t", "&#9;")


def _qname_split(uri: str) -> tuple[str, str]:
    """Namespace/local split for a predicate URI: the longest NCName
    suffix becomes the local part (the rdflib convention).  Raises on
    predicates with no serializable local part (e.g. ending in '/')."""
    m = _NCNAME_SUFFIX.search(uri)
    if not m or m.start() == 0:
        raise ValueError(f"predicate not RDF/XML-serializable: {uri!r}")
    return uri[:m.start()], uri[m.start():]


def format_rdfxml(batch: pa.Table) -> tuple[pa.Table, dict[str, str]]:
    """Triple batch → RDF/XML body lines + the namespace table the
    enclosing ``<rdf:RDF>`` element must declare.  Vectorized like
    :func:`format_turtle`: subject-sorted rows, run-boundary masks open/
    close one ``rdf:Description`` per subject, predicate QNames come
    from a factorize over the (low-cardinality) distinct predicates."""
    import numpy as np

    idx = pc.sort_indices(batch, sort_keys=[("subj", "ascending"),
                                            ("pred", "ascending"),
                                            ("obj", "ascending")])
    batch = batch.take(idx)
    n = batch.num_rows
    subj = batch["subj"].combine_chunks()
    pred = batch["pred"].combine_chunks()
    obj = batch["obj"].combine_chunks()
    lit = pc.fill_null(batch["obj_is_literal"].combine_chunks(), False)

    # predicate QNames: factorize, then map the few distinct values
    codes = pc.dictionary_encode(pred)
    uniq = codes.dictionary.to_pylist() if n else []
    ns: dict[str, str] = {}
    qn = []
    for u in uniq:
        ns_uri, local = _qname_split(u)
        pfx = ns.setdefault(ns_uri, f"n{len(ns)}")
        qn.append(f"{pfx}:{local}")
    qnames = pa.array(np.asarray(qn, object)[
        codes.indices.to_numpy(zero_copy_only=False)] if n else [],
        pa.string())

    def bnode_id(col):
        return pc.utf8_slice_codeunits(col, 2)

    obj_bn = pc.and_(pc.invert(lit), pc.starts_with(obj, "_:"))
    obj_iri = pc.and_(pc.invert(lit), pc.invert(pc.starts_with(obj, "_:")))
    prop = pc.binary_join_element_wise(          # literal form by default
        pa.array(["    <"] * n), qnames, pa.array([">"] * n),
        _escape_xml_text(obj),
        pa.array(["</"] * n), qnames, pa.array([">"] * n), "")
    prop = pc.if_else(obj_iri, pc.binary_join_element_wise(
        pa.array(["    <"] * n), qnames,
        pa.array([' rdf:resource="'] * n), _escape_xml_attr(obj),
        pa.array(['"/>'] * n), ""), prop)
    prop = pc.if_else(obj_bn, pc.binary_join_element_wise(
        pa.array(["    <"] * n), qnames,
        pa.array([' rdf:nodeID="'] * n), bnode_id(obj),
        pa.array(['"/>'] * n), ""), prop)

    s = subj.to_numpy(zero_copy_only=False)
    first = np.ones(n, bool)
    first[1:] = s[1:] != s[:-1]
    last = np.ones(n, bool)
    last[:-1] = s[:-1] != s[1:]
    subj_bn = pc.starts_with(subj, "_:")
    open_tag = pc.if_else(subj_bn, pc.binary_join_element_wise(
        pa.array(['  <rdf:Description rdf:nodeID="'] * n), bnode_id(subj),
        pa.array(['">\n'] * n), ""),
        pc.binary_join_element_wise(
            pa.array(['  <rdf:Description rdf:about="'] * n),
            _escape_xml_attr(subj), pa.array(['">\n'] * n), ""))
    head = pc.if_else(pa.array(first), open_tag, pa.scalar("", pa.string()))
    tail = pc.if_else(pa.array(last),
                      pa.scalar("\n  </rdf:Description>", pa.string()),
                      pa.scalar("", pa.string()))
    line = pc.binary_join_element_wise(head, prop, tail, "")
    return pa.table({"line": line}), ns


def write_rdfxml(ds, path: str) -> list[str]:
    """Triple Dataset → ``<path>/part-<hash>.rdf``, one well-formed
    RDF/XML document per block written INSIDE the map task (no driver
    collect), content-hash names so retries are idempotent — the
    RDF/XML sibling of :func:`write_ntriples` / :func:`write_turtle`."""
    import hashlib

    os.makedirs(path, exist_ok=True)

    def fmt_and_write(t: pa.Table) -> pa.Table:
        body, ns = format_rdfxml(t)
        decls = "".join(f'\n         xmlns:{p}="{u}"'
                        for u, p in ns.items())
        payload = (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<rdf:RDF xmlns:rdf='
            '"http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
            f"{decls}>\n"
            + "\n".join(body["line"].to_pylist())
            + "\n</rdf:RDF>\n").encode("utf-8")
        name = hashlib.sha1(payload).hexdigest()[:16]
        p = os.path.join(path, f"part-{name}.rdf")
        with open(p, "wb") as f:
            f.write(payload)
        return pa.table({"path": pa.array([p]),
                         "rows": pa.array([t.num_rows], pa.int64())})

    out = ds.map_batches(fmt_and_write, batch_format="pyarrow")
    return sorted(r["path"] for r in out.take_all())
