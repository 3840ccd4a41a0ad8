"""Edge-case semantics of the temporal operators (asof / interval /
sliding window / exact quantiles).  num_buckets=1 forces every key into
ONE bucket so key-isolation inside a shared bucket is what's tested,
not the shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(parts) if parts else pa.table({})


def _mk(rows: dict) -> "ray.data.Dataset":  # noqa: F821
    import ray

    return ray.data.from_arrow(pa.table(rows))


@pytest.fixture()
def asof_inputs():
    left = _mk({"k": [1, 1, 2, 3], "lts": [10, 20, 15, 7],
                "lval": ["a", "b", "c", "d"]})
    right = _mk({"k": [1, 1, 1, 2], "rts": [10, 12, 19, 99],
                 "rid": [100, 101, 102, 103]})
    return left, right


@pytest.mark.usefixtures("ray_session")
def test_asof_inclusive_vs_strict(asof_inputs):
    from tera_ray.query.temporal import asof_join

    left, right = asof_inputs
    inc = _collect(asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        left_cols=["k", "lts", "lval"], right_cols=["rts", "rid"],
        strict=False, how="left", num_buckets=1))
    got = {(r["k"], r["lts"]): r["rid"] for r in inc.to_pylist()}
    # k=1 lts=10 matches rts=10 inclusively; lts=20 matches rts=19
    assert got[(1, 10)] == 100 and got[(1, 20)] == 102
    assert got[(2, 15)] is None          # only right ts=99 > 15
    assert got[(3, 7)] is None           # key absent on right

    st = _collect(asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        left_cols=["k", "lts", "lval"], right_cols=["rts", "rid"],
        strict=True, how="left", num_buckets=1))
    gs = {(r["k"], r["lts"]): r["rid"] for r in st.to_pylist()}
    assert gs[(1, 10)] is None           # rts=10 not < 10
    assert gs[(1, 20)] == 102


@pytest.mark.usefixtures("ray_session")
def test_asof_inner_tolerance_and_tiebreak():
    from tera_ray.query.temporal import asof_join

    left = _mk({"k": [1, 1], "lts": [50, 200], "lval": ["x", "y"]})
    # two right rows tied on ts=40: the max-rid one must win
    right = _mk({"k": [1, 1, 1], "rts": [40, 40, 10],
                 "rid": [7, 9, 1]})
    out = _collect(asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        left_cols=["k", "lts", "lval"], right_cols=["rts", "rid"],
        strict=False, how="inner", tolerance_us=20,
        right_tiebreak=["rid"], num_buckets=1))
    rows = {r["lts"]: r["rid"] for r in out.to_pylist()}
    assert rows == {50: 9}  # lts=200 is 160 past rts=40 → outside tolerance


@pytest.mark.usefixtures("ray_session")
def test_interval_join_key_isolation_and_overlap():
    from tera_ray.query.temporal import interval_join

    pts = _mk({"k": [1, 1, 2], "t": [5, 14, 5], "pid": [0, 1, 2]})
    # k=1: two OVERLAPPING intervals [0,10) and [4,15); k=2 has none
    iv = _mk({"k": [1, 1, 9], "s": [0, 4, 0], "e": [10, 15, 100],
              "iid": [10, 11, 12]})
    out = _collect(interval_join(
        pts, iv, key="k", ts="t", start="s", end="e", max_width_us=20,
        point_cols=["k", "t", "pid"], interval_cols=["s", "e", "iid"],
        num_buckets=1))
    pairs = sorted((r["pid"], r["iid"]) for r in out.to_pylist())
    # t=5 hits both intervals; t=14 only [4,15); k=2 point matches nothing
    # even though k=9's [0,100) covers t=5 (key isolation in-bucket)
    assert pairs == [(0, 10), (0, 11), (1, 11)]


@pytest.mark.usefixtures("ray_session")
def test_interval_join_boundary_semantics():
    from tera_ray.query.temporal import interval_join

    pts = _mk({"k": [1, 1], "t": [0, 10], "pid": [0, 1]})
    iv = _mk({"k": [1], "s": [0], "e": [10], "iid": [5]})
    out = _collect(interval_join(
        pts, iv, key="k", ts="t", start="s", end="e", max_width_us=10,
        point_cols=["k", "t", "pid"], interval_cols=["s", "e", "iid"],
        num_buckets=1))
    # [start, end): t=0 in, t=10 out
    assert [r["pid"] for r in out.to_pylist()] == [0]


@pytest.mark.usefixtures("ray_session")
def test_sliding_window_counts():
    from tera_ray.query.temporal import sliding_window_agg

    # window=4, hop=2 → each row in 2 windows
    ds = _mk({"ts": [0, 1, 2, 5], "v": [1.0, 2.0, 3.0, 4.0]})
    out = _collect(sliding_window_agg(
        ds, "ts", 4, 2, keys=[], aggs=[("v", "count", "n"),
                                       ("v", "max", "vmax")]))
    got = {r["window_start"]: (r["n"], r["vmax"])
           for r in out.to_pylist()}
    # ts 0,1 → windows -2,0 ; ts 2 → 0,2 ; ts 5 → 2,4
    assert got == {-2: (2, 2.0), 0: (3, 3.0), 2: (2, 4.0), 4: (1, 4.0)}


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_matches_numpy():
    from tera_ray.query.relational import exact_quantiles

    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 25.0, size=5000)
    ds = _mk({"x": vals})
    qs = [0.1, 0.5, 0.9]
    # tiny collect_cap forces several narrowing rounds
    out = exact_quantiles(ds, "x", qs, num_bins=16, collect_cap=64)
    want = np.quantile(vals, qs)  # numpy 'linear' == quantile_cont
    got = out["value"].to_pylist()
    assert np.allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_constant_column():
    from tera_ray.query.relational import exact_quantiles

    ds = _mk({"x": [3.5] * 1000})
    out = exact_quantiles(ds, "x", [0.25, 0.75], num_bins=8,
                          collect_cap=10)
    assert out["value"].to_pylist() == [3.5, 3.5]


@pytest.mark.usefixtures("ray_session")
class TestFunnel:
    def test_strict_ordering_semantics(self):
        import pyarrow as pa
        import ray

        from tera_ray.query.relational import funnel_stages

        def ts(sec):
            return sec * 1_000_000

        rows = [
            # u1: full funnel in order → 3
            (1, ts(1), "view"), (1, ts(2), "click"), (1, ts(3), "purchase"),
            # u2: click BEFORE first view → click doesn't count → 1
            (2, ts(1), "click"), (2, ts(2), "view"),
            # u3: purchase before click → stops at 2
            (3, ts(1), "view"), (3, ts(2), "purchase"), (3, ts(3), "click"),
            # u4: no funnel steps at all → 0
            (4, ts(1), "error"),
            # u5: click at SAME ts as view (not strictly after) → 1
            (5, ts(1), "view"), (5, ts(1), "click"),
            # u6: later second view re-opens nothing (first-touch) → 1
            (6, ts(5), "view"), (6, ts(2), "click"), (6, ts(6), "view"),
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        })
        out = {r["user_id"]: r["stage"] for r in funnel_stages(
            ray.data.from_arrow(t).repartition(3), "user_id", "ts",
            "event_type", ["view", "click", "purchase"]).take_all()}
        assert out == {1: 3, 2: 1, 3: 2, 4: 0, 5: 1, 6: 1}
