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
        uri = pc.binary_join_element_wise(
            pa.array(["<"] * len(col)), col, pa.array([">"] * len(col)), "")
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
