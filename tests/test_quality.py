"""Data-quality constraint suite + PSI drift (tera_ray/quality)."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from tera_ray.quality import (
    approx_distinct,
    approx_foreign_key,
    approx_unique,
    foreign_key,
    histogram_psi,
    in_range,
    in_set,
    matches,
    not_null,
    run_checks,
    unique,
)


def _ds(tbl: pa.Table, parallelism: int = 3):
    return ray.data.from_arrow(tbl).repartition(parallelism)


@pytest.fixture()
def dirty():
    return _ds(pa.table({
        "id": pa.array([1, 2, 2, 3, 4, None], pa.int64()),
        "val": pa.array([5.0, -1.0, 7.0, 120.0, None, 3.0]),
        "cat": pa.array(["a", "b", "zz", None, "a", "b"]),
        "code": pa.array(["X-1", "X-2", "nope", "X-9", None, "X-3"]),
        "fk": pa.array([10, 10, 20, 99, None, 30], pa.int64()),
    }))


@pytest.fixture()
def ref():
    return _ds(pa.table({"rid": pa.array([10, 20, 30], pa.int64())}), 1)


class TestRunChecks:
    def test_report(self, dirty, ref):
        rep = run_checks(dirty, [
            not_null("id"),
            in_range("val", 0, 100),
            in_set("cat", ["a", "b"]),
            matches("code", r"^X-\d$"),
            unique("id"),
            foreign_key(["fk"], ref, ["rid"]),
        ]).to_pylist()
        by = {(r["chk"], r["col"]): r for r in rep}
        assert by[("not_null", "id")]["violations"] == 1
        # -1 and 120 out of range; nulls don't violate range
        assert by[("in_range", "val")]["violations"] == 2
        assert by[("in_set", "cat")]["violations"] == 1
        assert by[("matches", "code")]["violations"] == 1
        # ids: 1,2,2,3,4,None -> 5 distinct (null is a group), 6 rows
        assert by[("unique", "id")]["violations"] == 1
        # fk: 99 orphan + NULL never matches (NOT EXISTS) -> 2
        assert by[("foreign_key", "fk")]["violations"] == 2
        assert all(r["n"] == 6 for r in rep)
        assert not by[("not_null", "id")]["passed"]

    def test_all_pass_and_threshold(self, ref):
        ds = _ds(pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                           "fk": pa.array([10, 20, 30, 10], pa.int64())}))
        rep = run_checks(ds, [not_null("id"), unique("id"),
                              foreign_key(["fk"], ref, ["rid"])])
        assert all(r["passed"] for r in rep.to_pylist())
        # threshold: 1 violation of 4 rows passes at max_frac=0.5
        ds2 = _ds(pa.table({"id": pa.array([1, 1, 2, 3], pa.int64())}))
        rep2 = run_checks(ds2, [unique("id")], max_frac=0.5).to_pylist()
        assert rep2[0]["violations"] == 1 and rep2[0]["passed"]

    def test_multi_column_unique_and_fk(self):
        ds = _ds(pa.table({
            "a": pa.array([1, 1, 2, 2], pa.int64()),
            "b": pa.array(["x", "x", "x", "y"], pa.string()),
        }))
        rep = run_checks(ds, [unique("a", "b")]).to_pylist()
        assert rep[0]["violations"] == 1 and rep[0]["col"] == "a,b"
        ref = _ds(pa.table({"ra": pa.array([1, 2], pa.int64()),
                            "rb": pa.array(["x", "y"], pa.string())}), 1)
        rep2 = run_checks(ds, [foreign_key(["a", "b"], ref,
                                           ["ra", "rb"])]).to_pylist()
        # (1,x),(1,x),(2,y) match; (2,x) is an orphan
        assert rep2[0]["violations"] == 1

    def test_same_kind_same_col_fold_separately(self):
        # Two in_range checks on one column must each report their OWN
        # violation count (regression: partials were keyed (kind, col)).
        ds = _ds(pa.table({"v": pa.array([1.0, 5.0, 50.0, 500.0])}))
        rep = run_checks(ds, [
            in_range("v", 0, 100),   # 500 out -> 1
            in_range("v", 0, 10),    # 50, 500 out -> 2
            in_range("v", 2, 1000),  # 1 out -> 1
        ]).to_pylist()
        assert sorted(r["violations"] for r in rep) == [1, 1, 2]

    def test_fk_null_in_ref_still_orphans_null_left(self):
        # NOT EXISTS semantics: a NULL ref key matches nothing, so a
        # NULL left key stays an orphan even when ref contains NULL.
        ds = _ds(pa.table({"fk": pa.array([10, None, 99], pa.int64())}))
        ref = _ds(pa.table({"rid": pa.array([10, None], pa.int64())}), 1)
        rep = run_checks(ds, [foreign_key(["fk"], ref, ["rid"])]).to_pylist()
        assert rep[0]["violations"] == 2  # None and 99

    def test_empty_dataset(self):
        ds = _ds(pa.table({"id": pa.array([], pa.int64())}), 1)
        rep = run_checks(ds, [not_null("id"), unique("id")]).to_pylist()
        assert all(r["n"] == 0 and r["violations"] == 0 and r["passed"]
                   for r in rep)


class TestApproxDistinct:
    def test_estimate_within_tolerance(self):
        n = 100_000
        ds = _ds(pa.table({"k": pa.array(
            [f"key-{i % 40_000}" for i in range(n)])}), 8)
        est = approx_distinct(ds, "k")
        assert abs(est / 40_000 - 1) < 0.05, est

    def test_merge_equals_whole(self):
        # registers fold by max: partitioning must not change the
        # estimate (mergeability is what makes the sketch distributable)
        tbl = pa.table({"k": pa.array([f"k{i}" for i in range(5000)])})
        assert approx_distinct(_ds(tbl, 1), "k") == \
            approx_distinct(_ds(tbl, 13), "k")

    def test_small_range_linear_counting(self):
        # tiny cardinalities hit the linear-counting correction and
        # should be near-exact
        tbl = pa.table({"k": pa.array(["a", "b", "c", "a", "b"])})
        est = approx_distinct(_ds(tbl, 2), "k")
        assert abs(est - 3) < 0.5, est

    def test_approx_unique_check(self):
        # unique key passes; a 50%-duplicated key fails well beyond tol
        n = 20_000
        uniq = _ds(pa.table({"id": pa.array(range(n), pa.int64())}), 4)
        rep = run_checks(uniq, [approx_unique("id", tol=0.05)]).to_pylist()
        assert rep[0]["passed"], rep
        dup = _ds(pa.table({"id": pa.array(
            [i // 2 for i in range(n)], pa.int64())}), 4)
        rep2 = run_checks(dup, [approx_unique("id", tol=0.05)]).to_pylist()
        assert not rep2[0]["passed"], rep2
        # violations ~ n/2 within the sketch's error band
        assert abs(rep2[0]["violations"] / (n / 2) - 1) < 0.1

    def test_approx_foreign_key_definite_orphans(self):
        # members never orphan; misses + NULLs are definite orphans
        ds = _ds(pa.table({"fk": pa.array([10, 10, 20, 99, None, 77],
                                          pa.int64())}))
        ref = _ds(pa.table({"rid": pa.array([10, 20, 30], pa.int64())}), 1)
        rep = run_checks(ds, [approx_foreign_key(["fk"], ref, ["rid"])])
        r = rep.to_pylist()[0]
        # exact orphan count is 3 (99, None, 77); bloom may undercount
        # the non-null misses but never overcounts, and NULL is always
        # counted — at this fill factor fpp ~ 0, so expect exactly 3
        assert r["violations"] == 3 and r["chk"] == "approx_foreign_key"

    def test_approx_fk_lower_bounds_exact(self):
        # property: approx violations <= exact violations, and with a
        # deliberately tiny filter the gap is only ever an UNDERcount
        n = 5000
        ds = _ds(pa.table({"fk": pa.array(
            [i % 2000 for i in range(n)], pa.int64())}), 4)
        ref = _ds(pa.table({"rid": pa.array(range(1000), pa.int64())}), 2)
        rep = run_checks(ds, [
            foreign_key(["fk"], ref, ["rid"]),
            approx_foreign_key(["fk"], ref, ["rid"], num_bits=1 << 10),
        ])
        by = {r["chk"]: r for r in rep.to_pylist()}
        exact = by["foreign_key"]["violations"]
        approx = by["approx_foreign_key"]["violations"]
        # orphan keys 1000..1999 appear twice each -> 2000 exact orphans
        assert exact == 2000
        assert 0 <= approx <= exact

    def test_approx_fk_multi_column(self):
        ds = _ds(pa.table({
            "a": pa.array([1, 1, 2, 2], pa.int64()),
            "b": pa.array(["x", "x", "x", "y"], pa.string()),
        }))
        ref = _ds(pa.table({"ra": pa.array([1, 2], pa.int64()),
                            "rb": pa.array(["x", "y"], pa.string())}), 1)
        rep = run_checks(ds, [approx_foreign_key(["a", "b"], ref,
                                                 ["ra", "rb"])]).to_pylist()
        # (2,x) is the only orphan; fpp ~ 0 at this fill factor
        assert rep[0]["violations"] == 1

    def test_two_approx_fks_build_concurrently(self):
        # two approx FK checks (thread-pooled ref-bloom builds) fold
        # independently in one report
        ds = _ds(pa.table({
            "a": pa.array([1, 2, 9], pa.int64()),
            "b": pa.array([10, 77, 77], pa.int64()),
        }))
        ra = _ds(pa.table({"k": pa.array([1, 2], pa.int64())}), 1)
        rb = _ds(pa.table({"k": pa.array([10], pa.int64())}), 1)
        rep = run_checks(ds, [
            approx_foreign_key(["a"], ra, ["k"]),
            approx_foreign_key(["b"], rb, ["k"]),
        ]).to_pylist()
        by = {r["col"]: r for r in rep}
        assert by["a"]["violations"] == 1  # 9
        assert by["b"]["violations"] == 2  # 77, 77

    def test_approx_and_exact_unique_together(self):
        # both kinds over one column in ONE run_checks pass
        ds = _ds(pa.table({"id": pa.array([1, 2, 2, 3], pa.int64())}))
        rep = run_checks(ds, [unique("id"), approx_unique("id", tol=0.3)])
        by = {r["chk"]: r for r in rep.to_pylist()}
        assert by["unique"]["violations"] == 1
        assert by["approx_unique"]["violations"] in (0, 1, 2)


class TestHistogramPsi:
    def test_identical_splits_zero(self):
        vals = list(range(100))
        tbl = pa.table({
            "split": pa.array(["a"] * 100 + ["b"] * 100),
            "v": pa.array(vals + vals, pa.float64()),
        })
        out = histogram_psi(_ds(tbl), "split", "v", [25, 50, 75],
                            base="a", cmp="b").to_pylist()
        assert len(out) == 4
        assert all(r["psi_term"] == 0.0 for r in out)
        assert sum(r["n_base"] for r in out) == 100

    def test_shifted_distribution_positive(self):
        rng = np.random.default_rng(7)
        a = rng.normal(0, 1, 500)
        b = rng.normal(2, 1, 500)
        tbl = pa.table({
            "split": pa.array(["a"] * 500 + ["b"] * 500),
            "v": pa.array(np.concatenate([a, b]), pa.float64()),
        })
        out = histogram_psi(_ds(tbl), "split", "v", [-1, 0, 1, 2],
                            base="a", cmp="b")
        assert sum(out["psi_term"].to_pylist()) > 0.5

    def test_bin_edges_right_open(self):
        # v == edge goes to the HIGHER bin (count of edges <= v)
        tbl = pa.table({"split": pa.array(["a", "b"]),
                        "v": pa.array([10.0, 10.0])})
        out = histogram_psi(_ds(tbl, 1), "split", "v", [10],
                            base="a", cmp="b").to_pylist()
        assert out[1]["n_base"] == 1 and out[1]["n_cmp"] == 1


class TestPartitionInvariance:
    def test_report_is_partitioning_invariant(self):
        """The whole report — exact counters, HLL registers, bloom
        orphans — must not depend on how rows are split into blocks
        (the mergeable-partials contract)."""
        import numpy as np

        rng = np.random.RandomState(11)
        n = 4000
        tbl = pa.table({
            "id": pa.array(rng.randint(0, 3000, n), pa.int64()),
            "v": pa.array(rng.uniform(-50, 150, n)),
            "fk": pa.array(rng.randint(0, 1500, n), pa.int64()),
        })
        ref = _ds(pa.table({"rid": pa.array(range(1000), pa.int64())}), 2)

        def report(parallelism):
            return run_checks(_ds(tbl, parallelism), [
                not_null("id"),
                in_range("v", 0, 100),
                unique("id"),
                approx_unique("id", tol=0.05),
                foreign_key(["fk"], ref, ["rid"]),
                approx_foreign_key(["fk"], ref, ["rid"]),
            ]).to_pylist()

        assert report(1) == report(7) == report(16)
