"""JSONL source/sink (engine-first; no reference counterpart).

JSON-Lines is the dominant interchange format for LLM training
corpora; this module gives the engine a first-class shard-parallel
reader with DEAD-LETTER semantics (the NT reader's contract,
`dumps.py:read_ntriples`) and a deterministic sharded writer:

- :func:`read_jsonl` — ``ray.data.read_text`` (one task per file /
  block, so 100k shards fan out naturally) → per-batch parse.  FAST
  path: the whole batch of lines is parsed in one vectorized
  ``pyarrow.json.read_json`` call (zero Python per row).  SLOW path,
  taken only for a batch that fails the vectorized parse: per-line
  ``json.loads`` with malformed lines captured as reject rows
  ``(col → null …, __error, __line)`` instead of killing the job —
  at corpus scale a handful of truncated lines per shard is the NORM,
  not an error.  Filter ``__error IS NULL`` / NOT NULL to split good
  rows from the rejects sink.
- :func:`write_jsonl` — one ``.jsonl`` file per block via Ray's JSON
  datasink; compose with ``text.curation.shuffle_shards`` +
  ``repartition`` upstream for deterministic shard counts.

Schema discipline: JSONL is schemaless, so ``columns`` (name → pyarrow
type) is REQUIRED for the reader — at 100 TB you never want a
schema-inference pass over every shard, and a declared schema is what
makes missing keys (→ null) and extra keys (→ dropped) deterministic.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def _reject_row(line: str, err: str, fields: list[tuple[str, pa.DataType]]):
    row = {name: None for name, _ in fields}
    row["__error"] = err
    row["__line"] = line
    return row


class JsonlParser:
    """Callable batch parser: lines → typed table (+ dead-letter cols)."""

    def __init__(self, columns: dict, dead_letter: bool = True):
        self.fields = [(n, t) for n, t in columns.items()]
        self.schema = pa.schema(self.fields)
        self.dead_letter = dead_letter
        self.out_schema = pa.schema(
            list(self.fields) + [("__error", pa.string()),
                                 ("__line", pa.string())]) \
            if dead_letter else self.schema

    def _empty(self) -> pa.Table:
        return self.out_schema.empty_table()

    def _finish(self, tbl: pa.Table, n: int) -> pa.Table:
        cols = {}
        for name, typ in self.fields:
            if name in tbl.schema.names:
                cols[name] = tbl[name].cast(typ)
            else:                         # key absent in every row
                cols[name] = pa.nulls(n, typ)
        if self.dead_letter:
            cols["__error"] = pa.nulls(n, pa.string())
            cols["__line"] = pa.nulls(n, pa.string())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        n = len(lines)
        if n == 0:
            return self._empty()
        # FAST path: one vectorized Arrow JSON parse over the batch;
        # the newline re-join happens in C (binary_join over a single
        # list spanning the column), never per-Python-row
        import pyarrow.compute as pc
        import pyarrow.json as pj

        one_list = pa.ListArray.from_arrays(
            pa.array([0, n], pa.int32()), lines.cast(pa.string()))
        buf = pa.py_buffer(
            (pc.binary_join(one_list, "\n")[0].as_py() + "\n")
            .encode("utf-8"))
        try:
            tbl = pj.read_json(
                pa.BufferReader(buf),
                parse_options=pj.ParseOptions(
                    explicit_schema=self.schema,
                    unexpected_field_behavior="ignore"))
            if tbl.num_rows == n:
                return self._finish(tbl, n)
        except pa.ArrowInvalid:
            pass
        # SLOW path (dirty batch only): per-line with reject capture
        good, bad = [], []
        for raw in lines.to_pylist():
            if not raw.strip():
                continue
            try:
                obj = json.loads(raw)
                if not isinstance(obj, dict):
                    raise ValueError("top-level JSON is not an object")
                good.append(({name: obj.get(name)
                              for name, _ in self.fields}, raw))
            except (ValueError, TypeError) as exc:
                bad.append(_reject_row(raw, str(exc), self.fields))
        parts = []
        if good:
            try:
                gt = pa.Table.from_pylist([r for r, _ in good],
                                          schema=self.schema)
                parts.append(self._finish(gt, len(good)))
            except pa.ArrowInvalid:
                # a type-mismatched value (e.g. string where int64 is
                # declared) — isolate offenders row-by-row into rejects
                for row, raw in good:
                    try:
                        gt = pa.Table.from_pylist([row], schema=self.schema)
                        parts.append(self._finish(gt, 1))
                    except pa.ArrowInvalid as exc:
                        bad.append(_reject_row(raw, str(exc), self.fields))
        if bad and self.dead_letter:
            parts.append(pa.Table.from_pylist(bad, schema=self.out_schema))
        return pa.concat_tables(parts) if parts else self._empty()


def read_jsonl(paths, columns: dict, dead_letter: bool = True):
    """JSONL file(s)/dir(s) → typed Dataset.

    ``columns``: ``{name: pyarrow type}`` declared schema (see module
    docstring).  With ``dead_letter=True`` malformed lines survive as
    rows with ``__error``/``__line`` set and every declared column
    null; with ``False`` they are silently dropped.
    """
    import ray.data

    ds = ray.data.read_text(paths)
    return ds.map_batches(
        JsonlParser(columns, dead_letter=dead_letter),
        batch_format="pyarrow")


def write_jsonl(ds, path: str) -> None:
    """Dataset → one ``.jsonl`` file per block under ``path``
    (streaming sink, no driver materialization).  Shard count/size =
    upstream block layout (``repartition`` / ``shuffle_shards`` to
    control it)."""
    ds.write_json(path, pandas_json_args_fn=lambda: {
        "orient": "records", "lines": True})
