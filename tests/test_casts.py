"""DuckDB-identical string→int64 cast semantics.

Pins the r02 driver hash-mismatch root cause (`events_props_sum`):
DuckDB ``CAST(varchar AS BIGINT)`` trims whitespace and coerces
decimal / exponent / hex / underscored shapes that polars' strict-less
Int64 cast nulls out.  ``sql_try_cast_int64`` must agree with DuckDB's
``TRY_CAST`` bit-for-bit on every shape, including the adversarial ones
absent from the driver-generated fixtures.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from tera_ray.cleaning import sql_try_cast_int64

# Every shape family DuckDB's VARCHAR→BIGINT grammar accepts or rejects.
SHAPES = [
    "0", "7", "-7", "+5", "007", " 12", "  12  ", "\t3\n",
    "1.5", "2.5", "-0.5", "0.5", ".5", "5.", "9.0", "-3.7",
    "1.49", "1.50", "1.4999999", "123.456",
    "1e3", "1E3", "1.23e2", "-2.5e1", "1e18", "1e30", "5e-1", "2.5e-1",
    "9223372036854775807", "9223372036854775808", "-9223372036854775808",
    "-9223372036854775809", "9223372036854775807.0",
    "999999999999999999999", "0x10", "0XfF", "5_0", "1_000_000",
    "true", "false", "abc", "", " ", "nan", "inf", "-inf", "NaN",
    "1.2.3", "--5", "++5", "5-", "e3", ".e3", "+", "-", ".", "0x",
    "1_", "_1", None,
]


def _duckdb_try_cast(values):
    con = duckdb.connect()
    tbl = pa.table({"v": pa.array(values, type=pa.string())})
    con.register("t", tbl)
    return [r[0] for r in
            con.execute("SELECT TRY_CAST(v AS BIGINT) FROM t").fetchall()]


def test_try_cast_matches_duckdb_on_pinned_shapes():
    values = SHAPES
    got = sql_try_cast_int64(pa.array(values, type=pa.string())).to_pylist()
    want = _duckdb_try_cast(values)
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches


def test_try_cast_matches_duckdb_on_random_numeric_strings():
    import random

    rng = random.Random(7)
    values = []
    for _ in range(500):
        kind = rng.randrange(5)
        if kind == 0:
            values.append(str(rng.randint(-10**19, 10**19)))
        elif kind == 1:
            values.append(f"{rng.uniform(-1e6, 1e6):.{rng.randrange(1, 8)}f}")
        elif kind == 2:
            values.append(f"{rng.uniform(-100, 100):g}e{rng.randint(-5, 19)}")
        elif kind == 3:
            values.append(" " * rng.randrange(3) + str(rng.randint(0, 999))
                          + " " * rng.randrange(3))
        else:
            values.append(rng.choice(["x", "12a", "a12", "1 2", "⅕", "４２"]))
    got = sql_try_cast_int64(pa.array(values, type=pa.string())).to_pylist()
    want = _duckdb_try_cast(values)
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches[:10]


def test_events_props_sum_parity_on_adversarial_payloads(ray_session,
                                                         tmp_path):
    """End-to-end: the exact `events_props_sum` extract+aggregate against
    DuckDB's oracle SQL over a fixture whose $.k payloads carry the
    shapes that diverged under the driver (floats, padded, exponents)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    payloads = ['{"k": 69}', '{"k": 1.5}', '{"k": " 7 "}', '{"k": "1e3"}',
                '{"k": "9.0"}', '{"k": -2.5}', '{"k": "  12"}',
                '{"k": 0.49}', '{"k": null}', '{}', '{"k": "x"}',
                '{"k": 2.5}', '{"k": "-3.7"}']
    rows = []
    for i in range(200):
        rows.append({"event_type": ["click", "view", "error"][i % 3],
                     "props": payloads[i % len(payloads)]})
    tbl = pa.Table.from_pylist(rows)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "events.parquet")

    res = entry.queries()["events_props_sum"](str(sf))
    got = pa.concat_tables(
        list(res.iter_batches(batch_format="pyarrow", batch_size=None)))
    got = got.sort_by("event_type")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(
        "SELECT event_type,"
        " sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))"
        " AS k_sum, count(*) AS n"
        " FROM events GROUP BY event_type ORDER BY event_type").fetch_arrow_table()
    assert got.to_pylist() == want.to_pylist()
