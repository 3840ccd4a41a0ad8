"""HyperLogLog sketch: accuracy and merge behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray


@pytest.mark.usefixtures("ray_session")
class TestHLL:
    def test_estimate_accuracy(self):
        from tera_ray.sketch.hll import approx_count_distinct

        n = 10_000
        # heavy duplication across many batches
        vals = np.arange(n).repeat(5)
        rng = np.random.default_rng(3)
        rng.shuffle(vals)
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
        est = approx_count_distinct(ds, "v").take_all()[0]["approx_n"]
        assert abs(est - n) / n < 0.02  # p=14 → σ ≈ 0.8%

    def test_partition_invariance(self):
        from tera_ray.sketch.hll import approx_count_distinct

        t = pa.table({"v": np.arange(2_000)})
        a = approx_count_distinct(
            ray.data.from_arrow(t), "v").take_all()[0]["approx_n"]
        b = approx_count_distinct(
            ray.data.from_arrow(t).repartition(7), "v").take_all()[0]["approx_n"]
        assert a == b  # register max is order/partition invariant


@pytest.mark.usefixtures("ray_session")
class TestCMS:
    def test_overestimate_and_accuracy(self):
        from tera_ray.sketch.cms import cms_point_estimates

        # zipf-ish: key k appears (50-k) times
        keys = np.repeat(np.arange(50), 50 - np.arange(50))
        rng = np.random.default_rng(11)
        rng.shuffle(keys)
        ds = ray.data.from_arrow(pa.table({"v": keys})).repartition(6)
        probes = [0, 1, 2, 10, 49]
        truth = {str(k): int((keys == k).sum()) for k in probes}
        est = {r["key"]: r["est_cnt"] for r in
               cms_point_estimates(ds, "v", probes).take_all()}
        for k, t in truth.items():
            assert est[k] >= t          # CMS never under-estimates
            assert est[k] - t <= 0.01 * len(keys)  # εN bound, ε=e/2048


@pytest.mark.usefixtures("ray_session")
class TestHistogram:
    def test_error_bounded_by_bin_width(self):
        from tera_ray.sketch.histogram import histogram_quantiles

        rng = np.random.default_rng(11)
        xs = rng.uniform(0.0, 1000.0, 50_000)
        ds = ray.data.from_arrow(pa.table({"x": xs})).repartition(8)
        out = {r["q"]: r["est"] for r in histogram_quantiles(
            ds, "x", [0.1, 0.5, 0.9], lo=0.0, width=10.0,
            num_bins=100).take_all()}
        for q in (0.1, 0.5, 0.9):
            exact = np.quantile(xs, q)
            # estimate = lower edge of the covering bin
            assert exact - 10.0 <= out[q] <= exact + 10.0

    def test_partition_invariance_and_clamping(self):
        from tera_ray.sketch.histogram import histogram_quantiles

        xs = np.concatenate([np.full(10, -50.0), np.linspace(0, 99, 100),
                             np.full(10, 1e9)])  # out-of-range both ends
        t = pa.table({"x": xs})
        kw = dict(qs=[0.01, 0.5, 0.999], lo=0.0, width=5.0, num_bins=20)
        a = histogram_quantiles(ray.data.from_arrow(t), "x", **kw).take_all()
        b = histogram_quantiles(
            ray.data.from_arrow(t).repartition(7), "x", **kw).take_all()
        assert a == b  # bin-count sums are partition invariant
        ests = {r["q"]: r["est"] for r in a}
        assert ests[0.01] == 0.0        # clamped low tail → bin 0
        assert ests[0.999] == 5.0 * 19  # clamped high tail → last bin

    def test_quantile_band_filter_trims_tails(self):
        from tera_ray.sketch.histogram import quantile_band_filter

        # 1000 mid values + extreme tails; p05-p95 band must drop the
        # tails and keep the bulk
        xs = np.concatenate([np.full(30, 1.0), np.linspace(400, 600, 1000),
                             np.full(30, 5000.0)])
        t = pa.table({"id": pa.array(range(len(xs)), pa.int64()),
                      "x": pa.array(xs, pa.float64())})
        out = quantile_band_filter(
            ray.data.from_arrow(t).repartition(6), "x", 0.05, 0.95,
            lo=0.0, width=100.0, num_bins=64).take_all()
        kept = [r["x"] for r in out]
        assert 1.0 not in kept and 5000.0 not in kept
        assert len(kept) >= 900  # bulk survives (bin-resolution slack)

    def test_grouped_quantiles_match_global_per_key(self):
        from tera_ray.sketch.histogram import (
            grouped_histogram_quantiles, histogram_quantiles)

        rng = np.random.default_rng(5)
        ka = rng.uniform(0, 500, 3000)
        kb = rng.uniform(300, 900, 2000)
        t = pa.table({
            "k": pa.array(["a"] * 3000 + ["b"] * 2000, pa.string()),
            "x": pa.array(np.concatenate([ka, kb]), pa.float64())})
        kw = dict(qs=[0.5, 0.9], lo=0.0, width=20.0, num_bins=64)
        got = {(r["k"], r["q"]): r["est"] for r in grouped_histogram_quantiles(
            ray.data.from_arrow(t).repartition(6), "k", "x",
            **kw).take_all()}
        # per-key grouped sketch == global sketch run on each key alone
        for key, vals in (("a", ka), ("b", kb)):
            solo = {r["q"]: r["est"] for r in histogram_quantiles(
                ray.data.from_arrow(pa.table({"x": vals})), "x",
                **kw).take_all()}
            for q in (0.5, 0.9):
                assert got[(key, q)] == solo[q]


@pytest.mark.usefixtures("ray_session")
def test_grouped_hll_accuracy_and_merge():
    """Per-key estimates within ~3% of exact for 4 keys x 5k distinct,
    and a key's estimate is independent of how rows are batched."""
    import ray.data

    from tera_ray.sketch.hll import grouped_approx_count_distinct

    keys, vals = [], []
    for g in range(4):
        n = 2000 + 1000 * g
        keys += [f"g{g}"] * n
        vals += [f"v{g}_{i}" for i in range(n)]
    tbl = pa.table({"k": pa.array(keys, pa.string()),
                    "v": pa.array(vals, pa.string())})

    def run(nblocks):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = {}
        for b in grouped_approx_count_distinct(ds, "k", "v").iter_batches(
                batch_format="pyarrow", batch_size=None):
            out.update({r["k"]: r["approx_n"] for r in b.to_pylist()})
        return out

    one = run(1)
    many = run(7)
    assert one == many          # mergeable: batching must not matter
    for g in range(4):
        exact = 2000 + 1000 * g
        assert abs(one[f"g{g}"] - exact) / exact < 0.03, (g, one[f"g{g}"])
