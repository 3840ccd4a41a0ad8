"""Bloom-filter semi-join: no false negatives, exactness via verify,
null-key semantics."""

import numpy as np
import pyarrow as pa
import pytest


def _from_arrow(t, blocks=4):
    import ray.data

    return ray.data.from_arrow(t).repartition(blocks)


@pytest.fixture()
def sides(ray_session):
    rng = np.random.default_rng(7)
    left = pa.table({
        "k": pa.array(rng.integers(0, 2000, 5000), pa.int64()),
        "v": pa.array(np.arange(5000), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array(rng.choice(2000, 300, replace=False).astype("int64")),
    })
    return left, right


class TestBuildProbe:
    def test_no_false_negatives(self, ray_session, sides):
        from tera_ray.query.bloom import _hash_pair, _probe_bits, build_bloom

        _, right = sides
        words = build_bloom(_from_arrow(right), "rk", num_bits=1 << 12)
        h1, h2 = _hash_pair(right["rk"])
        assert _probe_bits(words, h1, h2, 1 << 12, 4).all()

    def test_fpp_is_bounded_when_sized(self, ray_session, sides):
        from tera_ray.query.bloom import _hash_pair, _probe_bits, build_bloom

        _, right = sides
        # ~10 bits/key for 300 keys -> 4096 bits; non-members mostly reject
        words = build_bloom(_from_arrow(right), "rk", num_bits=1 << 12)
        non = pa.array(np.arange(10_000, 20_000, dtype="int64"))
        h1, h2 = _hash_pair(non)
        fp = _probe_bits(words, h1, h2, 1 << 12, 4).mean()
        assert fp < 0.05

    def test_build_skips_null_keys(self, ray_session):
        from tera_ray.query.bloom import build_bloom

        t = pa.table({"rk": pa.array([None, None], pa.int64())})
        words = build_bloom(_from_arrow(t, blocks=1), "rk", num_bits=1 << 10)
        assert not words.any()


class TestBloomSemiJoin:
    def _multiset(self, ds):
        rows = ds.take_all()
        from collections import Counter

        return Counter((r["k"], r["v"]) for r in rows)

    def test_matches_plain_semi_join(self, ray_session, sides):
        from tera_ray.query.bloom import bloom_semi_join
        from tera_ray.query.relational import key_semi_join

        left, right = sides
        lds, rds = _from_arrow(left), _from_arrow(right)
        got = bloom_semi_join(lds, rds, "k", "rk", num_bits=1 << 12)
        want = key_semi_join(lds, rds, "k", "rk")
        assert self._multiset(got) == self._multiset(want)

    def test_exact_even_with_saturated_filter(self, ray_session, sides):
        # 64-bit filter for 300 keys: nearly every probe is a false
        # positive -- the verify stage must still produce the exact set.
        from tera_ray.query.bloom import bloom_semi_join
        from tera_ray.query.relational import key_semi_join

        left, right = sides
        lds, rds = _from_arrow(left), _from_arrow(right)
        got = bloom_semi_join(lds, rds, "k", "rk", num_bits=64)
        want = key_semi_join(lds, rds, "k", "rk")
        assert self._multiset(got) == self._multiset(want)

    def test_inexact_mode_is_superset(self, ray_session, sides):
        from tera_ray.query.bloom import bloom_semi_join
        from tera_ray.query.relational import key_semi_join

        left, right = sides
        lds, rds = _from_arrow(left), _from_arrow(right)
        got = self._multiset(
            bloom_semi_join(lds, rds, "k", "rk", num_bits=1 << 12,
                            exact=False))
        want = self._multiset(key_semi_join(lds, rds, "k", "rk"))
        assert all(got[k] >= n for k, n in want.items())

    def test_null_left_keys_match_nothing(self, ray_session):
        from tera_ray.query.bloom import bloom_semi_join

        left = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                         "v": pa.array([10, 11, 12], pa.int64())})
        right = pa.table({"rk": pa.array([1, None], pa.int64())})
        out = bloom_semi_join(_from_arrow(left, 1), _from_arrow(right, 1),
                              "k", "rk", num_bits=1 << 10)
        assert self._multiset(out) == {(1, 10): 1}
