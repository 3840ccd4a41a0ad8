"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and, where an ``oracle_sql()``
entry exists, compares against DuckDB the way the driver does:
column-name-sorted schema match, row count, and row-multiset value
compare (floats rounded at 1e-9).  Rows-only queries are checked for
non-empty stable output.

Usage::

    python tools/sweep.py [--sf /root/testdata/sf0.01] [--only name,name]

Prints one status line per query and a final JSON summary; exit code 1
on any failure.  Owns its own Ray session (scripts may init; the driver
surface itself must not).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

_SF_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]


def _norm_type(t: pa.DataType) -> pa.DataType:
    """List field NAMES are cosmetic (DuckDB emits ``l``, Arrow builders
    ``item``); everything else — including string vs large_string and
    int32 vs int64 — is a real drift the driver's value hash can see."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(_norm_type(t.value_type))
    if pa.types.is_fixed_size_list(t):
        return pa.list_(_norm_type(t.value_type), t.list_size)
    return t


def _type_drift(got: pa.Schema, want: pa.Schema) -> list[str]:
    out = []
    for f in want:
        if f.name in got.names and (_norm_type(got.field(f.name).type)
                                    != _norm_type(f.type)):
            out.append(f"{f.name}: engine {got.field(f.name).type}"
                       f" vs oracle {f.type}")
    return out


def _rows(tbl: pa.Table):
    cols = sorted(tbl.schema.names)
    t = tbl.select(cols)
    out = []
    for r in t.to_pylist():
        row = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 9) if math.isfinite(v) else v
            row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda x: tuple(str(v) for v in x))


def _materialize(res) -> pa.Table:
    import pandas as pd

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    parts = list(res.iter_batches(batch_format="pyarrow", batch_size=None))
    return (pa.concat_tables(parts, promote_options="permissive")
            if parts else pa.table({}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    # Ray-internal Sort/Join operators emit schema-less EMPTY
    # RefBundles; drop only that spurious warning (see bench.py
    # _silence_empty_refbundle_warning for the full rationale)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _silence_empty_refbundle_warning
    _silence_empty_refbundle_warning()

    import duckdb

    import __ray_entry__ as entry

    qs = entry.queries()
    oq = entry.oracle_sql()
    only = {n for n in args.only.split(",") if n}
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 1

    con = duckdb.connect()
    for t in _SF_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{args.sf}/{t}.parquet')")

    ok = bad = rows_only = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = _materialize(fn(args.sf))
            if name in oq:
                want = con.execute(oq[name]).fetch_arrow_table()
                assert sorted(got.schema.names) == sorted(want.schema.names), (
                    f"columns {sorted(got.schema.names)} vs"
                    f" {sorted(want.schema.names)}")
                drift = _type_drift(got.schema, want.schema)
                assert not drift, "dtype drift: " + "; ".join(drift)
                g, w = _rows(got), _rows(want)
                assert len(g) == len(w), f"{len(g)} rows vs oracle {len(w)}"
                assert g == w, "value mismatch: " + str(next(
                    ((a, b) for a, b in zip(g, w) if a != b), None))
                ok += 1
                status = f"ok     {got.num_rows} rows"
            else:
                assert got.num_rows >= 0
                rows_only += 1
                status = f"rows   {got.num_rows} rows (no oracle)"
        except Exception as e:  # noqa: BLE001 — sweep must not abort
            bad += 1
            status = f"FAIL   {type(e).__name__}: {e}"
            failures.append(name)
            traceback.print_exc()
        print(f"{name:32s} {status}  [{time.perf_counter() - t0:.1f}s]",
              flush=True)
    print(json.dumps({"oracled_pass": ok, "rows_only": rows_only,
                      "failed": bad, "failures": failures}))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
