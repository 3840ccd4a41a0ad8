"""Edge-case semantics of the analytic operators added in round 2:
window functions, top-k per key, semi/anti join, exact heavy hitters.
``num_buckets=1`` forces all keys into one bucket so in-bucket key
isolation is what's tested, not the shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(parts) if parts else pa.table({})


def _mk(rows: dict, **kw):
    import ray

    return ray.data.from_arrow(pa.table(rows), **kw)


@pytest.mark.usefixtures("ray_session")
def test_window_partition_null_keys_and_cumsum_nulls():
    from tera_ray.query.window import window_funcs

    # null partition keys form ONE partition (SQL PARTITION BY); the
    # value column is null until row 2 → cumsum null, then ignores nulls
    ds = _mk({"k": [None, None, 1, 1], "o": [1, 2, 1, 2],
              "v": [None, 5.0, 2.0, None]})
    out = _collect(window_funcs(
        ds, ["k"], [("o", "ascending")],
        [("row_number", None, "rn"), ("cumsum", "v", "run")],
        num_buckets=1))
    got = {(r["k"], r["o"]): (r["rn"], r["run"]) for r in out.to_pylist()}
    assert got[(None, 1)] == (1, None)      # no non-null v yet
    assert got[(None, 2)] == (2, 5.0)
    assert got[(1, 1)] == (1, 2.0)
    assert got[(1, 2)] == (2, 2.0)          # null v ignored, sum carries


@pytest.mark.usefixtures("ray_session")
def test_window_lag_lead_offsets():
    from tera_ray.query.window import window_funcs

    ds = _mk({"k": [1, 1, 1, 2], "o": [1, 2, 3, 1],
              "v": [10, 20, 30, 99]})
    out = _collect(window_funcs(
        ds, ["k"], [("o", "ascending")],
        [("lag", "v", "l2", 2), ("lead", "v", "f1")], num_buckets=1))
    got = {(r["k"], r["o"]): (r["l2"], r["f1"]) for r in out.to_pylist()}
    assert got[(1, 1)] == (None, 20)
    assert got[(1, 3)] == (10, None)        # lead never crosses into k=2
    assert got[(2, 1)] == (None, None)


@pytest.mark.usefixtures("ray_session")
def test_topk_small_groups_and_ties():
    from tera_ray.query.relational import topk_per_key

    ds = _mk({"k": ["a", "a", "a", "b"], "s": [5, 5, 1, 9],
              "u": [2, 1, 3, 4]})
    out = _collect(topk_per_key(
        ds, "k", [("s", "descending"), ("u", "ascending")], 2,
        num_buckets=1))
    rows = sorted((r["k"], r["s"], r["u"]) for r in out.to_pylist())
    # a: the two s=5 rows win, tie broken by u; b: group smaller than k
    assert rows == [("a", 5, 1), ("a", 5, 2), ("b", 9, 4)]


@pytest.mark.usefixtures("ray_session")
def test_semi_anti_null_semantics_both_paths():
    from tera_ray.query.relational import key_semi_join

    left = _mk({"k": [1, 2, None], "v": ["a", "b", "c"]})
    right = _mk({"rk": [1, None]})
    for limit in (10, 0):   # broadcast path, then co-group path
        semi = _collect(key_semi_join(
            left, right, "k", "rk", broadcast_limit=limit))
        anti = _collect(key_semi_join(
            left, right, "k", "rk", anti=True, broadcast_limit=limit))
        assert sorted(semi["v"].to_pylist()) == ["a"]
        # NOT EXISTS: null left key kept by anti, null right key ignored
        assert sorted(anti["v"].to_pylist()) == ["b", "c"]


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_cross_batch_accumulation():
    from tera_ray.query.relational import heavy_hitters

    # value 7 is locally frequent in block 2 only; its GLOBAL share
    # (30/200 = 15%) still must be found.  value 8 (19/200 = 9.5%)
    # must not, even though it is locally frequent in block 2.
    b1 = pa.table({"x": np.r_[np.arange(91) + 100, np.full(9, 8)]})
    b2 = pa.table({"x": np.r_[np.arange(60) + 1000, np.full(30, 7),
                              np.full(10, 8)]})
    import ray

    ds = ray.data.from_arrow([b1, b2])
    out = heavy_hitters(ds, "x", 0.10)
    got = dict(zip(out["x"].to_pylist(), out["cnt"].to_pylist()))
    assert got == {7: 30}


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_threshold_inclusive():
    from tera_ray.query.relational import heavy_hitters

    ds = _mk({"x": [1, 1, 2, 3, 4, 5, 6, 7, 8, 9]})
    out = heavy_hitters(ds, "x", 0.2)      # 1 has exactly 2/10 = 0.2
    assert out["x"].to_pylist() == [1] and out["cnt"].to_pylist() == [2]


@pytest.mark.usefixtures("ray_session")
class TestRollingAndNtile:
    def _ds(self):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "k": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
            "o": pa.array([1, 2, 3, 4, 5, 1, 2], pa.int64()),
            "v": pa.array([10.0, None, 30.0, 40.0, 50.0, 7.0, 9.0],
                          pa.float64()),
        }))

    def _run(self, specs):
        from tera_ray.query.window import window_funcs

        out = window_funcs(self._ds(), ["k"], [("o", "ascending")], specs)
        rows = []
        for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
            rows.extend(b.to_pylist())
        return sorted(rows, key=lambda r: (r["k"], r["o"]))

    def test_rolling_mean_clamps_and_skips_nulls(self):
        rows = self._run([("rolling_mean", "v", "m", 3)])
        got = [r["m"] for r in rows]
        # a: [10], [10,N], [10,N,30], [N,30,40], [30,40,50]; b: [7], [7,9]
        assert got == pytest.approx([10.0, 10.0, 20.0, 35.0, 40.0,
                                     7.0, 8.0])

    def test_rolling_sum_partition_reset(self):
        rows = self._run([("rolling_sum", "v", "s", 2)])
        got = [r["s"] for r in rows]
        assert got == pytest.approx([10.0, 10.0, 30.0, 70.0, 90.0,
                                     7.0, 16.0])

    def test_ntile_sizes_larger_first(self):
        rows = self._run([("ntile", None, "t", 2)])
        assert [r["t"] for r in rows] == [1, 1, 1, 2, 2, 1, 2]

    def test_percent_rank_edges(self):
        rows = self._run([("percent_rank", None, "p")])
        a = [r["p"] for r in rows if r["k"] == "a"]
        b = [r["p"] for r in rows if r["k"] == "b"]
        assert a == pytest.approx([0.0, 0.25, 0.5, 0.75, 1.0])
        assert b == pytest.approx([0.0, 1.0])


@pytest.mark.usefixtures("ray_session")
def test_rolling_std_sample_semantics():
    """rolling_std: STDDEV_SAMP over the clamped window — null until
    the window holds two non-null values, partition-reset."""
    import ray.data

    from tera_ray.query.window import window_funcs

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"] * 4 + ["b"], pa.string()),
        "o": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "v": pa.array([2.0, 4.0, None, 8.0, 5.0], pa.float64()),
    }))
    out = window_funcs(ds, ["k"], [("o", "ascending")],
                       [("rolling_std", "v", "s", 3)])
    rows = sorted((r["k"], r["o"], r["s"]) for b in out.iter_batches(
        batch_format="pyarrow", batch_size=None) for r in b.to_pylist())
    by = {(k, o): s for k, o, s in rows}
    assert by[("a", 1)] is None                   # single value
    assert by[("a", 2)] == pytest.approx(2 ** 0.5)  # std(2,4)
    assert by[("a", 3)] == pytest.approx(2 ** 0.5)  # null ignored
    assert by[("a", 4)] == pytest.approx(2.828427, abs=1e-6)  # std(4,8)
    assert by[("b", 1)] is None                   # partition reset


@pytest.mark.usefixtures("ray_session")
def test_fill_forward_locf():
    """fill_forward: last_value IGNORE NULLS — null head stays null,
    gaps carry the LAST observation, partitions isolate, and the
    output preserves the input column type (string here)."""
    import ray.data

    from tera_ray.query.window import window_funcs

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
        "o": pa.array([1, 2, 3, 4, 5, 1, 2], pa.int64()),
        "v": pa.array([None, "x", None, "y", None, None, "z"],
                      pa.string()),
    }))
    out = window_funcs(ds, ["k"], [("o", "ascending")],
                       [("fill_forward", "v", "f")])
    by = {(r["k"], r["o"]): r["f"] for b in out.iter_batches(
        batch_format="pyarrow", batch_size=None) for r in b.to_pylist()}
    assert by[("a", 1)] is None            # nothing observed yet
    assert by[("a", 2)] == "x"
    assert by[("a", 3)] == "x"             # gap carries forward
    assert by[("a", 4)] == "y"             # new observation replaces
    assert by[("a", 5)] == "y"
    assert by[("b", 1)] is None            # partition isolation:
    assert by[("b", 2)] == "z"             # 'y' never leaks into b
