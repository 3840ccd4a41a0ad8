"""Dump-file sources (SURVEY S1-S3).

The reference reads pipe-delimited NCBI/ECOTOX dumps and comma CSVs with
``pandas.read_csv(sep=..., dtype=str, na_values=nan_values)``
(``tera/DataAggregation.py:135,162,187,301,399,504,696,719,773``) and
parses turtle/ntriples files via rdflib (``:813-817,834-838,855-859``).
Engine equivalents:

- :func:`read_pipe_dump` — ``ray.data.read_csv`` with ``|`` delimiter,
  all-string columns, reference NA sentinels nulled.  NCBI ``.dmp``
  files put literal tab characters around every ``|`` — handled by a
  post-read trim (the reference relies on ``str.strip`` the same way).
- :func:`read_comma_dump` — comma CSV with the headerless fallback the
  EOL loader needs (``DataAggregation.py:356-366``: retry with
  ``header=None`` + swapped columns when expected columns are absent).
- :func:`read_ntriples` — ``read_text`` + a vectorized-enough NT/TTL
  line parser covering the 1-triple-per-line subset the reference
  corpus uses (``test_data/pc_test1.ttl``): ``@prefix`` declarations,
  ``pfx:local`` terms, ``<uri>`` terms, quoted literals.
- :func:`read_turtle` — FULL Turtle via :class:`TurtleParser`
  (@prefix/@base + SPARQL forms, ';'/',' lists, multi-line and
  lang/typed literals, numeric/boolean shortcuts, bnode property
  lists, collections); per-file parallelism — Turtle is not
  line-splittable.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..cleaning import nullify_sentinels
from ..schema import TRIPLE_SCHEMA


def _clean_strings(names: list[str] | None = None):
    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.schema.names:
            col = t[name]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = nullify_sentinels(pc.utf8_trim_whitespace(col))
            cols[name] = col
        out = pa.table(cols)
        if names:
            out = out.rename_columns(names[: out.num_columns])
        return out

    return fn


def read_pipe_dump(paths, column_names: list[str] | None = None,
                   usecols: list[int] | None = None):
    """``|``-delimited dump → all-string Dataset with sentinel nulls.

    ``column_names`` assigns names positionally (dumps ship headerless);
    ``usecols`` prunes by position BEFORE shipping blocks downstream
    (column pruning at the read, SURVEY §7.4)."""
    import ray.data
    from pyarrow import csv as pacsv

    parse = pacsv.ParseOptions(delimiter="|")
    read = pacsv.ReadOptions(autogenerate_column_names=True)
    convert = pacsv.ConvertOptions(strings_can_be_null=False)
    ds = ray.data.read_csv(paths, parse_options=parse, read_options=read,
                           convert_options=convert)

    def prep(t: pa.Table) -> pa.Table:
        # force every column to string (dtype=str semantics)
        cols = [t[c].cast(pa.string()) if not pa.types.is_string(t[c].type)
                else t[c] for c in t.schema.names]
        t = pa.table(dict(zip(t.schema.names, cols)))
        if usecols is not None:
            t = t.select([t.schema.names[i] for i in usecols])
        return _clean_strings(column_names)(t)

    return ds.map_batches(prep, batch_format="pyarrow")


def read_comma_dump(paths, expected_cols: list[str],
                    fallback_names: list[str] | None = None):
    """Comma CSV; if ``expected_cols`` are absent from the header, the
    batch is re-interpreted headerless with ``fallback_names``
    (the EOL loader's retry, ``DataAggregation.py:356-366``)."""
    import ray.data

    ds = ray.data.read_csv(paths)

    def prep(t: pa.Table) -> pa.Table:
        have = set(t.schema.names)
        if all(c in have for c in expected_cols):
            return _clean_strings()(t.select(expected_cols))
        assert fallback_names is not None, (
            f"columns {expected_cols} absent and no fallback_names given")
        t = t.rename_columns(fallback_names[: t.num_columns])
        return _clean_strings()(t.select(
            [c for c in expected_cols if c in fallback_names]))

    return ds.map_batches(prep, batch_format="pyarrow")


_PREFIX_RE = re.compile(r"^@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.\s*$")
_TERM_RE = re.compile(
    r"<([^>]*)>"                 # <uri>
    r"|\"((?:[^\"\\]|\\.)*)\""   # "literal" (escapes allowed)
    r"(?:\^\^\S+|@[A-Za-z-]+)?"  # optional datatype/lang tag
    r"|([A-Za-z0-9_-]*):([A-Za-z0-9_.-]+)"  # pfx:local
)


#: marker predicate for dead-letter rows (see ``NTriplesParser``)
DEAD_LETTER_PRED = "tera:parseError"


class NTriplesParser:
    """Stateful per-file parser: ``@prefix`` table accumulates as lines
    stream through (prefix declarations precede use in TTL).

    With ``dead_letter=True``, malformed DATA lines (not blank/comment/
    prefix) are not silently dropped — they come out as rows with
    ``pred == DEAD_LETTER_PRED`` (subj = offending line, obj = reason,
    graph = ``<graph>__rejects``), so a pipeline can route them to a
    dead-letter sink instead of swallowing errors (SURVEY §4 retries
    row: deterministic, side-effect-free stages; no swallowed errors).
    """

    def __init__(self, graph: str = "rdf", dead_letter: bool = False):
        self.prefixes: dict[str, str] = {}
        self.graph = graph
        self.dead_letter = dead_letter

    def parse_line(self, line: str):
        """Returns a triple tuple, None (ignorable line), or a str
        reject-reason."""
        line = line.strip()
        if not line or line.startswith("#"):
            return None
        m = _PREFIX_RE.match(line)
        if m:
            self.prefixes[m.group(1)] = m.group(2)
            return None
        if not line.endswith("."):
            return "no terminating dot"
        body = line[:-1].rstrip()
        terms = []
        is_lit = False
        for m in _TERM_RE.finditer(body):
            uri, lit, pfx, local = m.group(1), m.group(2), m.group(3), m.group(4)
            if uri is not None:
                # invert the writer's UCHAR escapes (\uXXXX for the
                # IRIREF-forbidden chars, sinks._IRI_BAD)
                terms.append((_ttl_unescape(uri) if "\\" in uri else uri,
                              False))
            elif lit is not None:
                # full ECHAR/UCHAR unescape (\\ \" \n \t \r \uXXXX…),
                # inverting sinks._escape_literal — not just \"
                terms.append((_ttl_unescape(lit) if "\\" in lit else lit,
                              True))
            elif local is not None:
                if pfx == "_":  # blank node: keep the _:id form verbatim
                    terms.append(("_:" + local, False))
                else:
                    base = self.prefixes.get(pfx or "")
                    if base is None:
                        return f"undeclared prefix {pfx!r}"
                    terms.append((base + local, False))
            if len(terms) == 3:
                break
        if len(terms) != 3:
            return f"expected 3 terms, found {len(terms)}"
        (s, _), (p, _), (o, is_lit) = terms
        return s, p, o, is_lit

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj, pred, obj, lit, graphs = [], [], [], [], []
        for line in batch["text"].to_pylist():
            r = self.parse_line(line)
            if r is None:
                continue
            if isinstance(r, str):
                if self.dead_letter:
                    subj.append(line.strip())
                    pred.append(DEAD_LETTER_PRED)
                    obj.append(r)
                    lit.append(True)
                    graphs.append(self.graph + "__rejects")
                continue
            subj.append(r[0])
            pred.append(r[1])
            obj.append(r[2])
            lit.append(r[3])
            graphs.append(self.graph)
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_is_literal": pa.array(lit, pa.bool_()),
            "graph": pa.array(graphs, pa.string()),
        }, schema=TRIPLE_SCHEMA)


def read_ntriples(paths, graph: str = "rdf", concurrency=(1, 4),
                  dead_letter: bool = False):
    """TTL/NT file(s) → triple Dataset.

    One actor per FILE GROUP keeps the prefix table coherent: prefix
    declarations must be seen before use, so parallelism is per-file
    (``file_extensions`` grouping), matching the reference's per-file
    ``Graph().parse`` accumulation.  ``dead_letter=True`` keeps
    malformed lines as ``DEAD_LETTER_PRED`` rows (filter on
    ``graph == <graph>__rejects`` to split them into a rejects sink)."""
    import ray.data

    ds = ray.data.read_text(paths)
    return ds.map_batches(NTriplesParser,
                          fn_constructor_kwargs={"graph": graph,
                                                 "dead_letter": dead_letter},
                          batch_format="pyarrow", concurrency=concurrency)


# --- full Turtle (S3 — the reference's ``rdflib.Graph().parse`` surface,
# ``tera/DataAggregation.py:816-817,837-838,858-859``: PubChem / ChEBI /
# MeSH dumps with @prefix headers, ';'/',' predicate-object lists,
# multi-line and typed/lang literals, bnode property lists, collections).

_TTL_TOKEN = re.compile(r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iri><(?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
  | (?P<long_dq>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<long_sq>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<dq>"(?:[^"\\\n]|\\.)*")
  | (?P<sq>'(?:[^'\\\n]|\\.)*')
  | (?P<dtype_mark>\^\^)
  | (?P<at_word>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<pname>(?:[A-Za-z_][\w.\-]*)?:(?:[\w\-](?:[\w.\-]*[\w\-])?)?)
  | (?P<num>[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?
                   |\.\d+(?:[eE][+-]?\d+)?
                   |\d+[eE][+-]?\d+
                   |\d+))
  | (?P<word>[A-Za-z_][\w\-]*)
  | (?P<punct>[;,.\[\]()])
""", re.X)

_UNESCAPE_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_ESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
               '"': '"', "'": "'", "\\": "\\"}
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _ttl_unescape(s: str) -> str:
    def repl(m: re.Match) -> str:
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        return _ESCAPE_MAP.get(e, e)

    return _UNESCAPE_RE.sub(repl, s)


class TurtleSyntaxError(ValueError):
    pass


class _Tokens:
    """Turtle token stream (whitespace/comments pre-stripped)."""

    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TTL_TOKEN.match(text, pos)
            if m is None:
                # untokenizable run: ONE error token (the parser's
                # statement-level resync skips past it), then resume at
                # the next whitespace — one bad char never kills a file
                line = text.count("\n", 0, pos) + 1
                bad = text[pos:pos + 20]
                self.toks.append(
                    ("error", f"line {line}: cannot tokenize at {bad!r}"))
                nxt = re.search(r"\s", text[pos:])
                pos = pos + nxt.start() if nxt else len(text)
                continue
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            self.toks.append((kind, m.group()))
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.i = min(self.i + 1, len(self.toks))
        return t


class TurtleParser:
    """Document-level Turtle parser → (subj, pred, obj, obj_is_literal)
    triples.  Covers the grammar the reference corpus needs: @prefix /
    @base (and SPARQL-style PREFIX / BASE), ``a``, ';'/',' predicate-
    object lists, short/long single/double-quoted literals with escapes,
    language tags and ^^datatypes (tags recorded but DROPPED from the
    triple — same convention as :class:`NTriplesParser`), numeric /
    boolean literal shortcuts (kept in lexical form), ``_:`` blank
    nodes, ``[ … ]`` property lists and ``( … )`` collections (fresh
    deterministic ``_:tb{n}`` ids per document).

    Recovery: a syntax error inside one statement records a reject and
    resynchronizes at the next top-level ``.`` — one bad statement
    never poisons the file (dead-letter discipline, SURVEY §4).
    """

    def __init__(self, graph: str = "rdf", dead_letter: bool = False):
        self.graph = graph
        self.dead_letter = dead_letter

    # --- document parse (called per file) ---------------------------------
    def parse_document(self, text: str):
        triples: list[tuple[str, str, str, bool]] = []
        rejects: list[str] = []
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self._bn = 0
        try:
            tk = _Tokens(text)
        except TurtleSyntaxError as e:
            return [], [str(e)]
        while tk.peek()[0] != "eof":
            start = tk.i
            try:
                if self._directive(tk):
                    continue
                self._statement(tk, triples)
            except TurtleSyntaxError as e:
                rejects.append(str(e))
                tk.i = max(tk.i, start + 1)
                depth = 0
                while tk.peek()[0] != "eof":     # resync at top-level '.'
                    kind, v = tk.next()
                    if kind == "punct":
                        if v in "[(":
                            depth += 1
                        elif v in "])":
                            depth -= 1
                        elif v == "." and depth <= 0:
                            break
        return triples, rejects

    # --- grammar ----------------------------------------------------------
    def _directive(self, tk: _Tokens) -> bool:
        kind, v = tk.peek()
        low = v.lower()
        if kind == "at_word" and low in ("@prefix", "@base"):
            tk.next()
            sparql_form = False
        elif kind == "word" and low in ("prefix", "base"):
            tk.next()
            sparql_form = True
            low = "@" + low
        else:
            return False
        if low == "@prefix":
            pk, pv = tk.next()
            if pk != "pname" or not pv.endswith(":"):
                raise TurtleSyntaxError(f"@prefix needs 'pfx:', got {pv!r}")
            ik, iv = tk.next()
            if ik != "iri":
                raise TurtleSyntaxError(f"@prefix needs <iri>, got {iv!r}")
            self.prefixes[pv[:-1]] = self._resolve_iri(iv[1:-1])
        else:
            ik, iv = tk.next()
            if ik != "iri":
                raise TurtleSyntaxError(f"@base needs <iri>, got {iv!r}")
            self.base = iv[1:-1]
        if not sparql_form:
            pk, pv = tk.next()
            if (pk, pv) != ("punct", "."):
                raise TurtleSyntaxError(f"directive needs '.', got {pv!r}")
        return True

    def _statement(self, tk: _Tokens, out: list) -> None:
        subj = self._subject(tk, out)
        self._pred_obj_list(tk, subj, out)
        pk, pv = tk.next()
        if (pk, pv) != ("punct", "."):
            raise TurtleSyntaxError(f"statement needs '.', got {pv!r}")

    def _pred_obj_list(self, tk: _Tokens, subj: str, out: list) -> None:
        while True:
            verb = self._verb(tk)
            while True:                      # object list
                val, lit = self._object(tk, out)
                out.append((subj, verb, val, lit))
                if tk.peek() == ("punct", ","):
                    tk.next()
                    continue
                break
            if tk.peek() == ("punct", ";"):
                while tk.peek() == ("punct", ";"):   # ';;' is legal
                    tk.next()
                if tk.peek()[1] in (".", "]") or tk.peek()[0] == "eof":
                    break                    # trailing ';'
                continue
            break

    def _verb(self, tk: _Tokens) -> str:
        kind, v = tk.peek()
        if kind == "word" and v == "a":
            tk.next()
            from ..schema import RDF

            return RDF + "type"
        if kind in ("iri", "pname"):
            val, lit = self._term(tk)
            if lit or val.startswith("_:"):
                raise TurtleSyntaxError(f"predicate must be an IRI: {v!r}")
            return val
        raise TurtleSyntaxError(f"expected predicate, got {v!r}")

    def _subject(self, tk: _Tokens, out: list) -> str:
        kind, v = tk.peek()
        if kind == "punct" and v == "[":
            return self._bnode_props(tk, out)
        if kind == "punct" and v == "(":
            return self._collection(tk, out)
        val, lit = self._term(tk)
        if lit:
            raise TurtleSyntaxError(f"literal subject: {v!r}")
        return val

    def _object(self, tk: _Tokens, out: list) -> tuple[str, bool]:
        kind, v = tk.peek()
        if kind == "punct" and v == "[":
            return self._bnode_props(tk, out), False
        if kind == "punct" and v == "(":
            return self._collection(tk, out), False
        return self._term(tk)

    def _bnode_props(self, tk: _Tokens, out: list) -> str:
        tk.next()                            # '['
        self._bn += 1
        node = f"_:tb{self._bn}"
        if tk.peek() != ("punct", "]"):
            self._pred_obj_list(tk, node, out)
        pk, pv = tk.next()
        if (pk, pv) != ("punct", "]"):
            raise TurtleSyntaxError(f"property list needs ']', got {pv!r}")
        return node

    def _collection(self, tk: _Tokens, out: list) -> str:
        from ..schema import RDF

        tk.next()                            # '('
        items: list[tuple[str, bool]] = []
        while tk.peek() != ("punct", ")"):
            if tk.peek()[0] == "eof":
                raise TurtleSyntaxError("unterminated collection")
            items.append(self._object(tk, out))
        tk.next()                            # ')'
        if not items:
            return RDF + "nil"
        nodes = []
        for _ in items:
            self._bn += 1
            nodes.append(f"_:tb{self._bn}")
        for i, ((val, lit), node) in enumerate(zip(items, nodes)):
            out.append((node, RDF + "first", val, lit))
            nxt = nodes[i + 1] if i + 1 < len(nodes) else RDF + "nil"
            out.append((node, RDF + "rest", nxt, False))
        return nodes[0]

    def _term(self, tk: _Tokens) -> tuple[str, bool]:
        kind, v = tk.next()
        if kind == "error":
            raise TurtleSyntaxError(v)
        if kind == "iri":
            # IRIREF admits \uXXXX / \UXXXXXXXX UCHAR escapes (spec
            # §6.4) — the Turtle sink uses them for chars IRIREF forbids
            return self._resolve_iri(_ttl_unescape(v[1:-1])), False
        if kind == "pname":
            pfx, _, local = v.partition(":")
            if pfx == "_":
                return "_:" + local, False
            base = self.prefixes.get(pfx)
            if base is None:
                raise TurtleSyntaxError(f"undeclared prefix {pfx!r}")
            return base + local, False
        if kind in ("dq", "sq"):
            val = _ttl_unescape(v[1:-1])
        elif kind in ("long_dq", "long_sq"):
            val = _ttl_unescape(v[3:-3])
        elif kind == "num":
            return v, True
        elif kind == "word" and v in ("true", "false"):
            return v, True
        else:
            raise TurtleSyntaxError(f"expected term, got {v!r}")
        # optional lang tag / datatype — consumed, dropped (NT parity)
        nk, nv = tk.peek()
        if nk == "at_word":
            tk.next()
        elif nk == "dtype_mark":
            tk.next()
            dk, dv = tk.next()
            if dk not in ("iri", "pname"):
                raise TurtleSyntaxError(f"^^ needs an IRI, got {dv!r}")
        return val, True

    def _resolve_iri(self, iri: str) -> str:
        if self.base and not _SCHEME_RE.match(iri):
            return self.base + iri
        return iri

    # --- Ray stage --------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        subj, pred, obj, lit, graphs = [], [], [], [], []
        paths = (batch["path"].to_pylist() if "path" in batch.schema.names
                 else [""] * batch.num_rows)
        for raw, path in zip(batch["bytes"].to_pylist(), paths):
            text = raw.decode("utf-8") if isinstance(raw, bytes) else raw
            triples, rejects = self.parse_document(text)
            for s, p, o, is_l in triples:
                subj.append(s)
                pred.append(p)
                obj.append(o)
                lit.append(is_l)
                graphs.append(self.graph)
            if self.dead_letter:
                for reason in rejects:
                    subj.append(path)
                    pred.append(DEAD_LETTER_PRED)
                    obj.append(reason)
                    lit.append(True)
                    graphs.append(self.graph + "__rejects")
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_is_literal": pa.array(lit, pa.bool_()),
            "graph": pa.array(graphs, pa.string()),
        }, schema=TRIPLE_SCHEMA)


def read_turtle(paths, graph: str = "rdf", dead_letter: bool = False,
                concurrency=(1, 8)):
    """Turtle file(s) → triple Dataset via :class:`TurtleParser`.

    Parallelism is PER FILE (``read_binary_files``): Turtle is not
    line-splittable — statements span lines and @prefix bindings scope
    the whole document — so a file is the atomic parse unit (same
    granularity as the reference's per-file ``Graph().parse``).  At
    100 TB the corpus ships as MANY files (dump shards), which is
    exactly what this layout parallelizes over; a single giant TTL
    file should be converted to N-Triples (line-splittable,
    :func:`read_ntriples`) first."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(TurtleParser,
                          fn_constructor_kwargs={"graph": graph,
                                                 "dead_letter": dead_letter},
                          batch_format="pyarrow", concurrency=concurrency)


# ---------------------------------------------------------------------------
# RDF/XML (the third reference dump format: rdflib's Graph().parse
# handles .xml/.rdf dumps and DataObject.save picks the format from the
# extension, tera/DataAggregation.py:54-62 — PubChem/MeSH ship RDF/XML)

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_NS = "http://www.w3.org/XML/1998/namespace"
_SCHEME_RE2 = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


class RdfXmlParser:
    """Document-level RDF/XML parser → (subj, pred, obj, obj_is_literal)
    triples, covering the serialization rdflib and typical ontology
    dumps emit: ``rdf:Description`` and typed node elements,
    ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` subjects (resolved
    against ``xml:base``), property elements with ``rdf:resource`` /
    ``rdf:nodeID`` / ``rdf:datatype`` / text / nested node elements,
    ``rdf:parseType="Resource"`` (implicit bnode), ``"Literal"``
    (inner XML kept as the literal's lexical form) and ``"Collection"``
    (rdf:first/rest chains), property ATTRIBUTES on node elements, and
    ``rdf:li`` → ``rdf:_n`` container numbering.  Language tags and
    datatypes are recorded but DROPPED from the triple — the same
    convention as :class:`NTriplesParser` / :class:`TurtleParser`.
    Reification (``rdf:ID`` on property elements) is not supported.

    XML is a document format — a well-formedness error rejects the
    whole file (ONE dead-letter row), unlike Turtle's per-statement
    resync; fresh bnodes are deterministic ``_:rx{n}`` per document."""

    def __init__(self, graph: str = "rdfxml", dead_letter: bool = False):
        self.graph = graph
        self.dead_letter = dead_letter

    # --- document parse (called per file) ---------------------------------
    def parse_document(self, text: str):
        import xml.etree.ElementTree as ET

        self._bn = 0
        triples: list[tuple[str, str, str, bool]] = []
        try:
            root = ET.fromstring(text)
        except ET.ParseError as e:
            return [], [f"XML parse error: {e}"]
        base = root.get(f"{{{_XML_NS}}}base", "")
        rejects: list[str] = []
        nodes = (list(root) if root.tag == f"{{{_RDF_NS}}}RDF" else [root])
        for el in nodes:
            try:
                self._node(el, triples, base)
            except ValueError as e:        # pragma: no cover - defensive
                rejects.append(str(e))
        return triples, rejects

    def _fresh(self) -> str:
        self._bn += 1
        return f"_:rx{self._bn}"

    def _resolve(self, iri: str, base: str) -> str:
        if base and not _SCHEME_RE2.match(iri):
            return base + iri
        return iri

    @staticmethod
    def _expand(tag: str) -> str:
        # ElementTree's Clark notation {ns}local → ns+local (RDF names
        # concatenate namespace and local part)
        return tag[1:].replace("}", "", 1) if tag.startswith("{") else tag

    _NODE_ATTRS = (f"{{{_RDF_NS}}}about", f"{{{_RDF_NS}}}ID",
                   f"{{{_RDF_NS}}}nodeID", f"{{{_XML_NS}}}base",
                   f"{{{_XML_NS}}}lang")

    def _node(self, el, out: list, base: str) -> str:
        """A node element → its subject term (emitting its triples)."""
        base = el.get(f"{{{_XML_NS}}}base", base)
        about = el.get(f"{{{_RDF_NS}}}about")
        rid = el.get(f"{{{_RDF_NS}}}ID")
        nid = el.get(f"{{{_RDF_NS}}}nodeID")
        if about is not None:
            subj = self._resolve(about, base)
        elif rid is not None:
            subj = f"{base}#{rid}"
        elif nid is not None:
            subj = "_:" + nid
        else:
            subj = self._fresh()
        tag = self._expand(el.tag)
        if tag != _RDF_NS + "Description":
            out.append((subj, _RDF_NS + "type", tag, False))
        for attr, val in el.attrib.items():
            if attr in self._NODE_ATTRS:
                continue
            a = self._expand(attr)
            if a == _RDF_NS + "type":
                out.append((subj, a, self._resolve(val, base), False))
            elif not a.startswith(_RDF_NS):    # property attribute
                out.append((subj, a, val, True))
        li = 0
        for pel in el:
            li = self._property(subj, pel, out, base, li)
        return subj

    def _property(self, subj: str, pel, out: list, base: str,
                  li: int) -> int:
        """One property element of ``subj``; returns the updated
        ``rdf:li`` counter."""
        base = pel.get(f"{{{_XML_NS}}}base", base)
        pred = self._expand(pel.tag)
        if pred == _RDF_NS + "li":
            li += 1
            pred = f"{_RDF_NS}_{li}"
        ptype = pel.get(f"{{{_RDF_NS}}}parseType")
        res = pel.get(f"{{{_RDF_NS}}}resource")
        nid = pel.get(f"{{{_RDF_NS}}}nodeID")
        dt = pel.get(f"{{{_RDF_NS}}}datatype")
        if ptype == "Resource":
            b = self._fresh()
            out.append((subj, pred, b, False))
            inner_li = 0
            for sub in pel:
                inner_li = self._property(b, sub, out, base, inner_li)
            return li
        if ptype == "Literal":
            import xml.etree.ElementTree as ET

            lex = (pel.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in pel)
            out.append((subj, pred, lex, True))
            return li
        if ptype == "Collection":
            items = [self._node(c, out, base) for c in pel]
            head = _RDF_NS + "nil" if not items else self._fresh()
            out.append((subj, pred, head, False))
            cur = head
            for i, item in enumerate(items):
                out.append((cur, _RDF_NS + "first", item, False))
                nxt = (self._fresh() if i + 1 < len(items)
                       else _RDF_NS + "nil")
                out.append((cur, _RDF_NS + "rest", nxt, False))
                cur = nxt
            return li
        if res is not None:
            out.append((subj, pred, self._resolve(res, base), False))
            return li
        if nid is not None:
            out.append((subj, pred, "_:" + nid, False))
            return li
        children = list(pel)
        if children:                        # nested node element(s)
            for c in children:
                obj = self._node(c, out, base)
                out.append((subj, pred, obj, False))
            return li
        # plain / typed literal (datatype recorded but dropped, dt unused
        # beyond documenting intent — same convention as the TTL parser)
        del dt
        out.append((subj, pred, pel.text or "", True))
        return li

    # --- Ray stage --------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        subj, pred, obj, lit, graphs = [], [], [], [], []
        paths = (batch["path"].to_pylist() if "path" in batch.schema.names
                 else [""] * batch.num_rows)
        for raw, path in zip(batch["bytes"].to_pylist(), paths):
            text = raw.decode("utf-8") if isinstance(raw, bytes) else raw
            triples, rejects = self.parse_document(text)
            for s, p, o, is_l in triples:
                subj.append(s)
                pred.append(p)
                obj.append(o)
                lit.append(is_l)
                graphs.append(self.graph)
            if self.dead_letter:
                for reason in rejects:
                    subj.append(path)
                    pred.append(DEAD_LETTER_PRED)
                    obj.append(reason)
                    lit.append(True)
                    graphs.append(self.graph + "__rejects")
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_is_literal": pa.array(lit, pa.bool_()),
            "graph": pa.array(graphs, pa.string()),
        }, schema=TRIPLE_SCHEMA)


def read_rdfxml(paths, graph: str = "rdfxml", dead_letter: bool = False,
                concurrency=(1, 8)):
    """RDF/XML file(s) → triple Dataset via :class:`RdfXmlParser`.
    Per-FILE parallelism like :func:`read_turtle` — XML is not
    line-splittable; dump corpora ship as many files, which is the unit
    this layout fans out over."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(RdfXmlParser,
                          fn_constructor_kwargs={"graph": graph,
                                                 "dead_letter": dead_letter},
                          batch_format="pyarrow", concurrency=concurrency)
