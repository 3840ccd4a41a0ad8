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
                terms.append((uri, False))
            elif lit is not None:
                terms.append((lit.replace('\\"', '"'), True))
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
