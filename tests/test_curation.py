"""Unit tests for tera_ray.text.curation (PII scrub, deterministic
split/sample, contamination, repetition).  Driver-style SQL parity for
the six judged queries lives in test_driver_contract.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tera_ray.text.curation import (
    ContaminationStage, deterministic_split, pii_scrub, repetition_stats,
    stratified_sample,
)


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


class TestPiiScrub:
    def test_chain_redacts_all_kinds(self):
        t = _docs(["mail a@b.co or visit https://x.org/p?a@b now",
                   "node 10.0.0.1 call 555-123-4567",
                   None])
        out = pii_scrub(t)
        clean = out["clean"].to_pylist()
        assert clean[0] == "mail <EMAIL> or visit <URL> now"
        assert clean[1] == "node <IP> call <PHONE>"
        assert clean[2] == ""
        # the a@b inside the URL was consumed by the URL replacement
        assert out["n_url"].to_pylist() == [1, 0, 0]
        assert out["n_email"].to_pylist() == [1, 0, 0]
        assert out["n_ipv4"].to_pylist() == [0, 1, 0]
        assert out["n_phone"].to_pylist() == [0, 1, 0]
        assert out["n_redactions"].to_pylist() == [2, 2, 0]

    def test_counts_post_chain(self):
        # an email inside a URL is counted as URL, not email
        t = _docs(["https://h.io/mail?to=x@y.org plus z@w.net"])
        out = pii_scrub(t)
        assert out["n_url"].to_pylist() == [1]
        assert out["n_email"].to_pylist() == [1]


class TestDeterministicSplit:
    def test_partition_of_unity_and_determinism(self):
        ids = list(range(5000))
        t = pa.table({"doc_id": pa.array(ids, pa.int64())})
        out = deterministic_split(t)
        labels = out["split"].to_pylist()
        assert set(labels) <= {"train", "val", "test"}
        frac = labels.count("train") / len(labels)
        assert 0.85 < frac < 0.95          # ~0.90 ± sampling noise
        # stable under re-partitioning / reruns: same id → same label
        again = deterministic_split(t.take(list(reversed(range(5000)))))
        m = dict(zip(again["doc_id"].to_pylist(), again["split"].to_pylist()))
        assert all(m[i] == l for i, l in zip(ids, labels))

    def test_salts_are_independent(self):
        t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
        s1 = deterministic_split(t, salt="split:")["split"].to_pylist()
        s2 = deterministic_split(t, salt="other:")["split"].to_pylist()
        assert s1 != s2                     # different salt → different map


class TestStratifiedSample:
    def test_rates_and_determinism(self):
        n = 4000
        t = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "src": pa.array(["a" if i % 2 else "b" for i in range(n)]),
        })
        out = stratified_sample(t, "src", {"a": 1.0, "b": 0.25})
        kept = out["src"].to_pylist()
        assert kept.count("a") == n // 2          # rate 1.0 keeps all
        assert 0.15 < kept.count("b") / (n // 2) < 0.35
        out2 = stratified_sample(t, "src", {"a": 1.0, "b": 0.25})
        assert out.equals(out2)

    def test_default_rate_drops(self):
        t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                      "src": pa.array(["x"] * 100)})
        assert stratified_sample(t, "src", {}).num_rows == 0


class TestContamination:
    def test_overlap_counts(self, ray_session):
        import ray

        bench = pa.array(["the quick brown fox jumps high"])
        t = _docs(["the quick brown fox runs",        # shares 2 shingles
                   "completely different words here entirely",
                   "xy"])                             # < n tokens
        stage = ContaminationStage(ray.put(bench), n=3)
        out = stage(t)
        assert out["n_overlap"].to_pylist() == [2, 0, 0]
        assert out["contaminated"].to_pylist() == [True, False, False]
        assert out["n_shingles"].to_pylist() == [3, 3, 0]


class TestRepetition:
    def test_signals(self):
        t = _docs(["a a a b", "w x y z", ""])
        out = repetition_stats(t)
        assert out["n_tokens"].to_pylist() == [4, 4, 0]
        assert out["n_distinct"].to_pylist() == [2, 4, 0]
        assert out["dup_frac"].to_pylist() == [0.5, 0.0, 0.0]
        assert out["top_frac"].to_pylist() == [0.75, 0.25, 0.0]

    def test_tokenization_is_lower_alnum(self):
        out = repetition_stats(_docs(["Foo-foo FOO!"]))
        assert out["n_tokens"].to_pylist() == [3]
        assert out["n_distinct"].to_pylist() == [1]


@pytest.mark.usefixtures("ray_session")
class TestStratifiedCap:
    def test_quota_determinism_and_subset(self):
        import ray

        from tera_ray.text.curation import stratified_cap

        t = pa.table({
            "doc_id": pa.array(list(range(300)), pa.int64()),
            "src": pa.array([f"s{i % 3}" for i in range(300)], pa.string()),
        })

        def run(parts):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = stratified_cap(ds, "src", 7, id_col="doc_id").take_all()
            return sorted((r["src"], r["doc_id"]) for r in out)

        a, b = run(1), run(9)
        assert a == b  # priority is a pure function of the id
        per = {}
        for s, d in a:
            per[s] = per.get(s, 0) + 1
        assert per == {"s0": 7, "s1": 7, "s2": 7}
        assert set(d for _, d in a) <= set(range(300))

    def test_small_stratum_kept_whole(self):
        import ray

        from tera_ray.text.curation import stratified_cap

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "src": pa.array(["a", "a", "b"], pa.string())})
        out = stratified_cap(ray.data.from_arrow(t), "src", 10,
                             id_col="doc_id").take_all()
        assert len(out) == 3  # cap never drops below-quota strata


@pytest.mark.usefixtures("ray_session")
class TestShuffleShards:
    def test_permutation_and_partition_invariance(self):
        import ray

        from tera_ray.text.curation import shuffle_shards

        t = pa.table({"doc_id": pa.array(list(range(500)), pa.int64())})

        def run(parts):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = shuffle_shards(ds, "doc_id", n_shards=4).take_all()
            return sorted((r["doc_id"], r["shard"], r["pos"]) for r in out)

        a, b = run(1), run(11)
        assert a == b  # assignment is a pure function of the id
        assert len(a) == 500
        # dense 0..n-1 positions within every shard
        by_shard = {}
        for _, s, p in a:
            by_shard.setdefault(s, []).append(p)
        assert set(by_shard) == {0, 1, 2, 3}
        for ps in by_shard.values():
            assert sorted(ps) == list(range(len(ps)))


@pytest.mark.usefixtures("ray_session")
class TestProportionalMix:
    def test_quotas_and_determinism(self):
        import ray
        import ray.data

        from tera_ray.text.curation import proportional_mix

        n = 300
        t = pa.table({
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "source": pa.array(
                ["a"] * 150 + ["b"] * 100 + ["c"] * 5 + ["d"] * 45,
                pa.string()),
        })

        def run(parts):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = proportional_mix(
                ds, "source", {"a": 0.5, "b": 0.3, "c": 0.2},
                total=40).take_all()
            return sorted((r["doc_id"], r["source"]) for r in out)

        one, many = run(1), run(13)
        assert one == many          # partition-invariant selection
        by = {}
        for _, s in one:
            by[s] = by.get(s, 0) + 1
        # quotas floor(40×f) = 20/12/8; 'c' has only 5 rows → all 5;
        # 'd' is unlisted → dropped entirely
        assert by == {"a": 20, "b": 12, "c": 5}

    def test_zero_quota_stratum_dropped(self):
        import ray
        import ray.data

        from tera_ray.text.curation import proportional_mix

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "source": pa.array(["a", "a", "b"], pa.string())})
        out = proportional_mix(ray.data.from_arrow(t), "source",
                               {"a": 0.9, "b": 0.01}, total=2).take_all()
        # floor(2×0.01)=0 → 'b' contributes nothing, never errors
        assert sorted(r["source"] for r in out) == ["a"]
