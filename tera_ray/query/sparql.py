"""SPARQL-SELECT front-end over the triple Dataset (SURVEY F5 + T4).

The reference's entire access layer speaks SPARQL strings
(``tera/DataAccess.py`` — e.g. the flagship endpoint query at
``:977-994`` and the compounds scan at ``:650-654``), with PREFIX
headers built by ``tera/utils.py:319-335``.  This module parses the
query-shape subset those call sites actually use and compiles it onto
the engine's distributed BGP matcher (:func:`tera_ray.query.kg.
bgp_match` — constant-filter scans folded through co-group shuffles),
so a reference user can run their existing query strings unchanged:

- ``PREFIX`` headers + the reference's default namespaces
  (``DataAccess.py:71-80``) preloaded as :data:`DEFAULT_NS`
- ``SELECT [DISTINCT] ?v … | *`` and ``LIMIT n``
- ``WHERE { … }`` (the ``WHERE`` keyword itself optional, as in
  ``DataAccess.py:650``) with ``.``-separated triple patterns,
  ``;`` predicate lists, ``,`` object lists, ``a`` for ``rdf:type``,
  and ``[ … ]`` blank-node property lists (flattened to fresh
  internal variables, e.g. the nested concentration BNode)
- ``OPTIONAL { … }`` groups — each group is matched as its own
  sub-BGP and LEFT-joined to the required bindings on the shared
  variables (one co-group shuffle per group), which is exact SPARQL
  left-join semantics for the reference's non-nested optionals
- ``FILTER`` with ``isURI``/``isLiteral``, ``STRSTARTS(str(?v), …)``,
  ``regex(?v, "re")``, ``=`` / ``!=``, ``&&`` / ``||`` — compiled to
  vectorized Arrow kernels applied to the binding relation

Unsupported constructs the reference never uses (``UNION``,
``VALUES``, ``GRAPH``, subqueries, ``ORDER BY``, aggregates) raise
``SparqlUnsupported`` with the offending token.

``isURI`` note: the engine's term columns are plain strings, so
``isURI(?v)`` is compiled as an IRI-scheme prefix test
(``scheme://…``) — equivalent over this KG, where every non-literal
term is an absolute http(s) IRI or a ``_:`` blank id (blank ids are
NOT URIs, matching rdflib).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import ECOTOX_NS, OWL, RDF, RDFS, SKOS, UNIT

__all__ = ["sparql_select", "prefixes", "DEFAULT_NS", "SparqlError",
           "SparqlUnsupported"]


def prefixes(init_ns: dict) -> str:
    """Format a namespace dict as SPARQL PREFIX headers — behavioral
    parity with the reference's ``utils.prefixes``
    (``tera/utils.py:319-335``), including the tab separators."""
    q = ""
    for k, i in init_ns.items():
        q += "PREFIX\t" + k + ":\t" + "<" + str(i) + ">\n"
    return q


#: the reference's default namespaces (``DataAccess.py:71-80``) with the
#: engine's store namespace bound to ``ns:``
DEFAULT_NS = {
    "rdf": RDF,
    "rdfs": RDFS,
    "owl": OWL,
    "skos": SKOS,
    "unit": UNIT,
    "ns": ECOTOX_NS,
    "mesh": "http://id.nlm.nih.gov/mesh/",
    "obo": "http://purl.obolibrary.org/obo/",
    "pubchem": "http://rdf.ncbi.nlm.nih.gov/pubchem/vocabulary#",
    "compound": "http://rdf.ncbi.nlm.nih.gov/pubchem/compound/",
}


class SparqlError(ValueError):
    pass


class SparqlUnsupported(SparqlError):
    pass


_TOKEN = re.compile(
    r"""(?P<ws>\s+|\#[^\n]*)
      | (?P<uri><[^<>\s]*>)
      | (?P<var>\?\w+)
      | (?P<lit>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
      | (?P<pname>[A-Za-z_][\w-]*:[\w./#-]*)
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<word>[A-Za-z_]\w*)
      | (?P<punct>&&|\|\||!=|[{}\[\];,.()=*])
    """,
    re.X,
)

_UNSUPPORTED = {"UNION", "VALUES", "GRAPH", "ORDER", "GROUP", "HAVING",
                "MINUS", "SERVICE", "BIND", "CONSTRUCT", "ASK", "DESCRIBE"}


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN.match(q, i)
        if m is None:
            raise SparqlError(f"cannot tokenize at: {q[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    return out


@dataclass
class _Query:
    select: list[str]           # variable names without '?' ([] = *)
    distinct: bool
    patterns: list[tuple]       # required (s, p, o)
    optionals: list[list[tuple]]  # one sub-BGP per OPTIONAL group
    filters: list = field(default_factory=list)  # compiled mask fns
    limit: int | None = None


class _Parser:
    def __init__(self, tokens, ns: dict):
        self.toks = tokens
        self.i = 0
        self.ns = dict(ns)
        self.bnode_n = 0

    # --- token helpers ---
    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value: str):
        kind, v = self.next()
        if v != value:
            raise SparqlError(f"expected {value!r}, got {v!r}")

    def kw(self, word: str) -> bool:
        kind, v = self.peek()
        if kind == "word" and v.upper() == word:
            self.i += 1
            return True
        return False

    # --- terms ---
    def term(self) -> str:
        """One RDF term → the engine's string form (URIs/blank ids as-is,
        literals unquoted) or a ``?var`` marker for bgp_match."""
        kind, v = self.next()
        if kind == "uri":
            return v[1:-1]
        if kind == "var":
            return v
        if kind == "lit":
            s = re.sub(r"\\(.)", r"\1", v[1:-1])
            # swallow optional @lang / ^^type tags (values are stored plain)
            if self.peek()[1] == "@" or self.peek()[1] == "^^":
                self.next(), self.next()
            return s
        if kind == "num":
            return v
        if kind == "pname":
            pfx, _, local = v.partition(":")
            if pfx not in self.ns:
                raise SparqlError(f"unknown prefix {pfx!r} in {v!r}")
            return self.ns[pfx] + local
        if kind == "word" and v == "a":
            return RDF + "type"
        raise SparqlError(f"expected a term, got {v!r}")

    def fresh_bnode_var(self) -> str:
        self.bnode_n += 1
        return f"?__b{self.bnode_n}"

    # --- grammar ---
    def parse(self) -> _Query:
        while self.kw("PREFIX"):
            kind, v = self.next()
            if kind != "pname" or not v.endswith(":"):
                # pname token captures 'rdf:' (empty local part)
                pfx = v.rstrip(":")
            else:
                pfx = v[:-1]
            kind2, uri = self.next()
            if kind2 != "uri":
                raise SparqlError(f"PREFIX {pfx}: expects <uri>, got {uri!r}")
            self.ns[pfx] = uri[1:-1]
        if not self.kw("SELECT"):
            kind, v = self.peek()
            raise (SparqlUnsupported(f"unsupported query form {v!r}")
                   if v.upper() in _UNSUPPORTED
                   else SparqlError(f"expected SELECT, got {v!r}"))
        distinct = self.kw("DISTINCT")
        self.kw("REDUCED")
        select: list[str] = []
        while True:
            kind, v = self.peek()
            if kind == "var":
                select.append(self.next()[1][1:])
            elif v == "*":
                self.next()
                select = []
                break
            else:
                break
        self.kw("WHERE")
        patterns, optionals, filters = self.group()
        limit = None
        if self.kw("LIMIT"):
            limit = int(self.next()[1])
        kind, v = self.peek()
        if kind != "eof":
            raise (SparqlUnsupported(f"unsupported construct {v!r}")
                   if v.upper() in _UNSUPPORTED
                   else SparqlError(f"unexpected trailing {v!r}"))
        return _Query(select=select, distinct=distinct, patterns=patterns,
                      optionals=optionals, filters=filters, limit=limit)

    def group(self, in_optional: bool = False):
        """``{ … }`` → (patterns, optional groups, filter fns)."""
        self.expect("{")
        patterns: list[tuple] = []
        optionals: list[list[tuple]] = []
        filters: list = []
        while True:
            kind, v = self.peek()
            if v == "}":
                self.next()
                return patterns, optionals, filters
            if kind == "word" and v.upper() in _UNSUPPORTED:
                raise SparqlUnsupported(f"unsupported construct {v!r}")
            if v == "{":
                raise SparqlUnsupported(
                    "nested group graph patterns (UNION/sub-groups)")
            if self.kw("OPTIONAL"):
                if in_optional:
                    raise SparqlUnsupported("nested OPTIONAL")
                sub_p, sub_o, sub_f = self.group(in_optional=True)
                if sub_o or sub_f:
                    raise SparqlUnsupported(
                        "OPTIONAL containing OPTIONAL/FILTER")
                optionals.append(sub_p)
            elif self.kw("FILTER"):
                if in_optional:
                    raise SparqlUnsupported("FILTER inside OPTIONAL")
                filters.append(self.filter_expr())
            else:
                patterns.extend(self.triple_statement())
            # statement separator (optional before '}')
            if self.peek()[1] == ".":
                self.next()

    def triple_statement(self) -> list[tuple]:
        out: list[tuple] = []
        kind, v = self.peek()
        if v == "[":
            subj = self.bnode_props(out)
        else:
            subj = self.term()
        self.pred_obj_list(subj, out)
        return out

    def pred_obj_list(self, subj: str, out: list) -> None:
        while True:
            pred = self.term()
            if pred.startswith("?") is False and not pred:
                raise SparqlError("empty predicate")
            while True:
                kind, v = self.peek()
                if v == "[":
                    # link the bnode var BEFORE its inner patterns so the
                    # BGP fold always has a shared variable
                    inner: list[tuple] = []
                    obj = self.bnode_props(inner)
                    out.append((subj, pred, obj))
                    out.extend(inner)
                else:
                    out.append((subj, pred, self.term()))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
                # a dangling ';' before '.' or '}' is legal SPARQL
                if self.peek()[1] in (".", "}", "]"):
                    return
                continue
            return

    def bnode_props(self, out: list) -> str:
        """``[ pred obj ; … ]`` → fresh variable bound by its patterns."""
        self.expect("[")
        var = self.fresh_bnode_var()
        self.pred_obj_list(var, out)
        self.expect("]")
        return var

    # --- FILTER expressions → vectorized mask closures ---
    def filter_expr(self):
        self.expect("(")
        fn = self._or_expr()
        self.expect(")")
        return fn

    def _or_expr(self):
        fn = self._and_expr()
        while self.peek()[1] == "||":
            self.next()
            a, b = fn, self._and_expr()
            fn = (lambda a, b: lambda t: pc.or_kleene(a(t), b(t)))(a, b)
        return fn

    def _and_expr(self):
        fn = self._primary()
        while self.peek()[1] == "&&":
            self.next()
            a, b = fn, self._primary()
            fn = (lambda a, b: lambda t: pc.and_kleene(a(t), b(t)))(a, b)
        return fn

    def _var_name(self) -> str:
        kind, v = self.next()
        if kind != "var":
            raise SparqlError(f"expected a variable, got {v!r}")
        return v[1:]

    def _str_arg(self) -> str:
        """A string-valued argument: literal, ``str(term)`` or term."""
        kind, v = self.peek()
        if kind == "word" and v == "str":
            self.next()
            self.expect("(")
            s = self.term()
            self.expect(")")
            return s
        return self.term()

    def _primary(self):
        kind, v = self.peek()
        if v == "(":
            self.next()
            fn = self._or_expr()
            self.expect(")")
            return fn
        if kind == "word":
            word = v
            low = word.lower()
            if low in ("isuri", "isiri"):
                self.next(), self.expect("(")
                var = self._strip_str_of_var()
                self.expect(")")
                return lambda t: pc.match_substring_regex(
                    t[var], r"^[A-Za-z][A-Za-z0-9+.-]*://")
            if low == "isliteral":
                self.next(), self.expect("(")
                var = self._strip_str_of_var()
                self.expect(")")
                return lambda t: pc.invert(pc.or_kleene(
                    pc.match_substring_regex(
                        t[var], r"^[A-Za-z][A-Za-z0-9+.-]*://"),
                    pc.starts_with(t[var], "_:")))
            if low == "strstarts":
                self.next(), self.expect("(")
                var = self._strip_str_of_var()
                self.expect(",")
                pref = self._str_arg()
                self.expect(")")
                return lambda t: pc.starts_with(t[var], pref)
            if low == "regex":
                self.next(), self.expect("(")
                var = self._strip_str_of_var()
                self.expect(",")
                pat = self.term()
                self.expect(")")
                return lambda t: pc.match_substring_regex(t[var], pat)
            raise SparqlUnsupported(f"unsupported FILTER function {word!r}")
        if kind == "var":
            var = self._var_name()
            op = self.next()[1]
            if op not in ("=", "!="):
                raise SparqlUnsupported(f"unsupported FILTER operator {op!r}")
            val = self.term()
            if op == "=":
                return lambda t: pc.equal(t[var], pa.scalar(val, pa.string()))
            return lambda t: pc.not_equal(t[var], pa.scalar(val, pa.string()))
        raise SparqlError(f"cannot parse FILTER at {v!r}")

    def _strip_str_of_var(self) -> str:
        """``?v`` or ``str(?v)`` → the variable name."""
        kind, v = self.peek()
        if kind == "word" and v == "str":
            self.next()
            self.expect("(")
            name = self._var_name()
            self.expect(")")
            return name
        return self._var_name()


def _pattern_vars(p) -> set[str]:
    return {t[1:] for t in p if isinstance(t, str) and t.startswith("?")}


def _connect_order(patterns: list[tuple]) -> list[tuple]:
    """Greedy connectivity ordering so bgp_match's left-to-right fold
    always joins on a shared variable (user queries may interleave
    disconnected-then-connected patterns); raises on a true cartesian
    product, same as bgp_match would."""
    if len(patterns) <= 1:
        return list(patterns)
    rest = list(patterns)
    out = [rest.pop(0)]
    bound = set(_pattern_vars(out[0]))
    while rest:
        for i, p in enumerate(rest):
            if _pattern_vars(p) & bound:
                bound |= _pattern_vars(p)
                out.append(rest.pop(i))
                break
        else:
            raise SparqlError(
                f"cartesian BGP product (no shared variable): {rest[0]}")
    return out


def _shared_vars(have: list[str], group: list[tuple]) -> list[str]:
    g_vars = []
    for p in group:
        for term in p:
            if isinstance(term, str) and term.startswith("?"):
                name = term[1:]
                if name in have and name not in g_vars:
                    g_vars.append(name)
    return g_vars


def sparql_select(triples, query: str, num_buckets: int = 64,
                  init_ns: dict | None = None):
    """Run a SPARQL SELECT string against a triple Dataset; returns a
    Dataset with one column per selected variable (see module docs for
    the supported subset).  ``init_ns`` extends/overrides
    :data:`DEFAULT_NS`; PREFIX headers in the query override both."""
    from .kg import bgp_match
    from ..query.relational import hash_join
    from ..stages.base import cat, dedup_triples

    ns = dict(DEFAULT_NS)
    if init_ns:
        ns.update(init_ns)
    ast = _Parser(_tokenize(query), ns).parse()
    if not ast.patterns:
        raise SparqlError("empty WHERE block")

    # ONE narrowing pass over the store for the WHOLE query (required
    # patterns + every OPTIONAL group): each bgp_match pattern scan
    # re-reads its input, so narrow+materialize here and disable
    # bgp_match's own pass — a lazy store's upstream lineage executes
    # exactly once per query
    all_patterns = list(ast.patterns) + [p for g in ast.optionals for p in g]
    preds = [p[1] for p in all_patterns]
    if all(not pr.startswith("?") for pr in preds):
        pset = pa.array(sorted(set(preds)), pa.string())

        def _narrow(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["pred"], value_set=pset)).select(
                ["subj", "pred", "obj"])

        triples = triples.map_batches(_narrow, batch_format="pyarrow")
    triples = triples.materialize()

    out = bgp_match(triples, _connect_order(ast.patterns),
                    num_buckets=num_buckets, narrow=False)
    have = [v[1:] for p in ast.patterns for v in p
            if isinstance(v, str) and v.startswith("?")]
    have = list(dict.fromkeys(have))

    for group in ast.optionals:
        shared = _shared_vars(have, group)
        if not shared:
            raise SparqlError("OPTIONAL group shares no variable with "
                              "the required patterns")
        sub = bgp_match(triples, _connect_order(group),
                        num_buckets=num_buckets, narrow=False)
        g_vars = list(dict.fromkeys(
            v[1:] for p in group for v in p
            if isinstance(v, str) and v.startswith("?")))

        def keyed(vars_):
            def add(t: pa.Table) -> pa.Table:
                parts: list = []
                for i, v in enumerate(vars_):
                    if i:
                        parts.append("\x1f")
                    parts.append(t[v])
                return t.append_column("__k", cat(*parts))
            return add

        left = out.map_batches(keyed(shared), batch_format="pyarrow")
        right = sub.map_batches(keyed(shared), batch_format="pyarrow")
        new_cols = [v for v in g_vars if v not in have]

        def proj(cols):
            def f(t: pa.Table) -> pa.Table:
                return t.select(cols)
            return f

        right = right.map_batches(proj(["__k"] + new_cols),
                                  batch_format="pyarrow")
        out = hash_join(left, right, on="__k", how="left",
                        num_buckets=num_buckets).map_batches(
            _drop_key, batch_format="pyarrow")
        have += new_cols

    for fn in ast.filters:
        out = out.map_batches(_masker(fn), batch_format="pyarrow")

    select = ast.select or [v for v in have if not v.startswith("__b")]
    missing = [v for v in select if v not in have]
    if missing:
        raise SparqlError(f"SELECT variables not bound in WHERE: {missing}")
    out = out.map_batches(_projector(select), batch_format="pyarrow")
    if ast.distinct:
        out = dedup_triples(out, keys=tuple(select))
    if ast.limit is not None:
        out = out.limit(ast.limit)
    return out


def _drop_key(t: pa.Table) -> pa.Table:
    return t.drop_columns(["__k"])


def _masker(fn):
    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        m = fn(t)
        # SPARQL FILTER drops error/unbound rows: null mask → False
        return t.filter(pc.fill_null(m, False))
    return f


def _projector(cols):
    def f(t: pa.Table) -> pa.Table:
        return t.select(cols)
    return f
