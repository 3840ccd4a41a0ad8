"""Property-based differential test for the SPARQL front-end: random
small stores × random connected query shapes, compared against a naive
in-test BGP evaluator with SPARQL bag semantics (nested loops are fine
at test scale — the point is an INDEPENDENT implementation of the
semantics, not speed)."""

import itertools

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

import ray.data

from tera_ray.query.sparql import sparql_select

NS = "http://ex.org/"
SUBJECTS = [NS + f"s{i}" for i in range(5)]
PREDS = [NS + f"p{i}" for i in range(3)]
OBJECTS = SUBJECTS[:2] + ["litA", "litB", "litC"]


def naive_bgp(triples, patterns, binding=None):
    """All bag-semantics solutions of a connected BGP (dict bindings)."""
    if not patterns:
        yield dict(binding or {})
        return
    (s, p, o), rest = patterns[0], patterns[1:]
    binding = binding or {}

    def match(term, value):
        if isinstance(term, str) and term.startswith("?"):
            name = term[1:]
            if name in binding and binding[name] != value:
                return None
            return {name: value}
        return {} if term == value else None

    for ts, tp, to in triples:
        new = {}
        ok = True
        for term, value in ((s, ts), (p, tp), (o, to)):
            m = match(term, value)
            if m is None:
                ok = False
                break
            # repeated var within the pattern must agree
            for k, v in m.items():
                if new.get(k, v) != v:
                    ok = False
                    break
                new[k] = v
            if not ok:
                break
        if ok:
            merged = dict(binding)
            merged.update(new)
            yield from naive_bgp(triples, rest, merged)


def naive_select(triples, patterns, select, optional=(), distinct=False):
    rows = []
    for b in naive_bgp(triples, patterns):
        if optional:
            ext = list(naive_bgp(triples, list(optional), b))
            if ext:
                for e in ext:
                    rows.append(tuple(e.get(v) for v in select))
                continue
        rows.append(tuple(b.get(v) for v in select))
    if distinct:
        # set semantics preserving first occurrence
        seen, out = set(), []
        for r in rows:
            if r not in seen:
                seen.add(r)
                out.append(r)
        return sorted(out, key=lambda r: tuple(str(x) for x in r))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


triple_st = st.tuples(st.sampled_from(SUBJECTS), st.sampled_from(PREDS),
                      st.sampled_from(OBJECTS))


def query_shape(draw):
    """A connected 1-3 pattern BGP (+ optional 1-pattern group) over
    variables ?a ?b ?c, with constants mixed in."""
    n = draw(st.integers(1, 3))
    vars_ = ["?a", "?b", "?c"]
    patterns = []
    bound = []
    for i in range(n):
        p = draw(st.sampled_from(PREDS))
        if i == 0:
            s = draw(st.one_of(st.sampled_from(SUBJECTS),
                               st.just(vars_[0])))
            o = vars_[1] if s != vars_[0] else vars_[1]
        else:
            # stay connected: subject is an already-bound variable
            s = draw(st.sampled_from(bound))
            o = draw(st.one_of(st.sampled_from(OBJECTS),
                               st.just(vars_[min(i + 1, 2)])))
        patterns.append((s, p, o))
        bound = sorted({t for pat in patterns for t in pat
                        if isinstance(t, str) and t.startswith("?")})
    optional = ()
    if draw(st.booleans()) and bound:
        os_ = draw(st.sampled_from(bound))
        optional = ((os_, draw(st.sampled_from(PREDS)), "?opt"),)
    return patterns, optional, bound


@st.composite
def store_and_query(draw):
    triples = draw(st.lists(triple_st, min_size=0, max_size=25))
    patterns, optional, bound = query_shape(draw)
    distinct = draw(st.booleans())
    return triples, patterns, optional, bound, distinct


def to_sparql(patterns, optional, select, distinct):
    def term(t):
        if isinstance(t, str) and t.startswith("?"):
            return t
        if t.startswith("http"):
            return f"<{t}>"
        return f'"{t}"'

    body = " . ".join(" ".join(term(x) for x in p) for p in patterns)
    if optional:
        body += (" OPTIONAL { "
                 + " . ".join(" ".join(term(x) for x in p)
                              for p in optional) + " }")
    d = "DISTINCT " if distinct else ""
    return (f"SELECT {d}{' '.join('?' + v for v in select)} "
            f"WHERE {{ {body} }}")


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=80, deadline=None)
@given(store_and_query())
def test_select_matches_naive_evaluator(case):
    triples, patterns, optional, bound, distinct = case
    select = [v[1:] for v in bound]
    if optional:
        select = select + ["opt"]
    want = naive_select(triples, patterns, select,
                        optional=optional, distinct=distinct)
    store = ray.data.from_arrow(pa.table({
        "subj": pa.array([t[0] for t in triples], pa.string()),
        "pred": pa.array([t[1] for t in triples], pa.string()),
        "obj": pa.array([t[2] for t in triples], pa.string()),
    }))
    q = to_sparql(patterns, optional, select, distinct)
    try:
        out = sparql_select(store, q, num_buckets=4)
    except ValueError as e:
        # empty-store edge: the engine reports empty WHERE results the
        # same way as populated ones; only a truly empty *store* with a
        # non-trivial plan may surface as an empty Dataset union. Any
        # parse error here is a real bug.
        raise AssertionError(f"query failed to compile: {q!r}: {e}")
    got = []
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        got.extend(zip(*[b[c].to_pylist() for c in select]))
    got = sorted(got, key=lambda r: tuple(str(x) for x in r))
    assert got == want, (
        f"\nquery: {q}\nstore: {triples}\ngot:  {got}\nwant: {want}")


def naive_path(triples, pred, mod):
    """DISTINCT (s, o) pairs of ``pred`` under a path modifier, per
    SPARQL 1.1 §9.3 — an independent reachability oracle."""
    edges = {(s, o) for s, p, o in triples if p == pred}
    nodes = {s for s, _, _ in triples} | {o for _, _, o in triples}
    if mod == "?":
        return edges | {(n, n) for n in nodes}
    # transitive closure by repeated squaring-ish expansion
    clos = set(edges)
    while True:
        new = {(a, d) for a, b in clos for c, d in edges if b == c} - clos
        if not new:
            break
        clos |= new
    if mod == "*":
        return clos | {(n, n) for n in nodes}
    return clos


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(st.lists(triple_st, min_size=1, max_size=20),
       st.sampled_from(["+", "*", "?"]),
       st.sampled_from(PREDS),
       st.sampled_from([None, "fwd", "back"]))
def test_path_modifiers_match_reachability_oracle(triples, mod, pred,
                                                  anchor):
    want_pairs = naive_path(triples, pred, mod)
    store = ray.data.from_arrow(pa.table({
        "subj": pa.array([t[0] for t in triples], pa.string()),
        "pred": pa.array([t[1] for t in triples], pa.string()),
        "obj": pa.array([t[2] for t in triples], pa.string()),
    }))
    if anchor is None:
        q = f"SELECT ?s ?o WHERE {{ ?s <{pred}>{mod} ?o }}"
        want = sorted(want_pairs)
        cols = ["s", "o"]
    elif anchor == "fwd":
        a = SUBJECTS[0]
        q = f"SELECT ?o WHERE {{ <{a}> <{pred}>{mod} ?o }}"
        want = sorted((o,) for s, o in want_pairs if s == a)
        # anchored zero-length: the constant matches itself even when
        # absent from the graph
        if mod in ("*", "?") and (a,) not in want:
            want = sorted(want + [(a,)])
        cols = ["o"]
    else:
        b = OBJECTS[0]
        q = f"SELECT ?s WHERE {{ ?s <{pred}>{mod} <{b}> }}"
        want = sorted((s,) for s, o in want_pairs if o == b)
        if mod in ("*", "?") and (b,) not in want:
            want = sorted(want + [(b,)])
        cols = ["s"]
    out = sparql_select(store, q, num_buckets=4)
    got = []
    for batch in out.iter_batches(batch_format="pyarrow", batch_size=None):
        got.extend(zip(*[batch[c].to_pylist() for c in cols]))
    assert sorted(got) == want, f"\nquery: {q}\nstore: {triples}"
