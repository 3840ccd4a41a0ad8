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
