"""Unit tests for the round-2 additions: distributed k-means
(``ann/kmeans.py``), the inverted index / keyword tagging
(``text/index.py``), and the grouped standardize / MAD-outlier
compositions (``query/relational.py``).  Oracle parity for the judged
queries lives in test_driver_contract.py; these cover semantics the
SQL gate can't (Lloyd convergence, skew caps, zero-MAD groups)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mat(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return ds
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return (pa.concat_tables(parts, promote_options="permissive")
            if parts else pa.table({}))


@pytest.mark.usefixtures("ray_session")
class TestKMeans:
    def _toy(self):
        import ray.data

        rng = np.random.RandomState(7)
        # three well-separated blobs in 8-d
        centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0] * 8])
        pts = np.concatenate(
            [c + rng.randn(40, 8) for c in centers]).astype(np.float32)
        ids = np.arange(len(pts), dtype=np.int64)
        tbl = pa.table({
            "vec_id": ids,
            "embedding": pa.array(list(pts), pa.list_(pa.float32(), 8)),
        })
        return ray.data.from_arrow(tbl), pts

    def test_assign_nearest_and_ties(self):
        import ray.data

        from tera_ray.ann.kmeans import kmeans_assign

        # two identical centroids: ties must break to the smaller cid
        C = np.array([[0.0, 0.0], [0.0, 0.0], [5.0, 5.0]])
        cids = np.array([7, 3, 9])
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[0.1, 0.1], [4.9, 5.0]],
                                  pa.list_(pa.float32(), 2)),
        }))
        out = _mat(kmeans_assign(ds, cids, C)).to_pylist()
        by_id = {r["vec_id"]: r["cluster"] for r in out}
        assert by_id[1] == 3          # min cid among the tied pair {7, 3}
        assert by_id[2] == 9

    def test_lloyd_converges_and_is_deterministic(self):
        from tera_ray.ann.kmeans import kmeans_lloyd, seed_centroids

        ds, pts = self._toy()
        cids, C0 = seed_centroids(ds, 3)

        def inertia(C, assign_tbl):
            a = {r["vec_id"]: r["cluster"] for r in assign_tbl.to_pylist()}
            pos = {int(c): i for i, c in enumerate(cids)}
            return sum(
                float(((pts[i] - C[pos[a[i]]]) ** 2).sum())
                for i in range(len(pts)))

        C1, asg1 = kmeans_lloyd(ds, cids, C0, iters=1)
        C3, asg3 = kmeans_lloyd(ds, cids, C0, iters=3)
        t1, t3 = _mat(asg1), _mat(asg3)
        assert inertia(C3, t3) <= inertia(C1, t1) + 1e-9
        # deterministic: same seeds, same input → identical centroids
        C3b, _ = kmeans_lloyd(ds, cids, C0, iters=3)
        assert np.array_equal(C3, C3b)
        # blobs are well separated: 3 iters must recover the 3 clusters
        labels = {r["vec_id"]: r["cluster"] for r in t3.to_pylist()}
        groups = [set(labels[i] for i in range(s, s + 40))
                  for s in (0, 40, 80)]
        assert all(len(g) == 1 for g in groups)
        assert len(set().union(*groups)) == 3

    def test_lloyd_empty_cluster_keeps_previous_centroid(self):
        import ray.data

        from tera_ray.ann.kmeans import kmeans_lloyd

        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0, 0.0], [0.2, 0.0]],
                                  pa.list_(pa.float32(), 2)),
        }))
        C0 = np.array([[0.1, 0.0], [99.0, 99.0]])
        C1, _ = kmeans_lloyd(ds, np.array([0, 1]), C0, iters=1)
        assert np.array_equal(C1[1], C0[1])     # empty cluster unchanged
        assert np.allclose(C1[0], [0.1, 0.0])   # mean of both points


@pytest.mark.usefixtures("ray_session")
class TestInvertedIndex:
    def _docs(self):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["the cat sat", "the dog", "THE the cat",
                              None], pa.string()),
        }))

    def test_postings_sorted_distinct(self):
        from tera_ray.text.index import inverted_index

        out = _mat(inverted_index(self._docs(), min_df=1))
        by_tok = {r["token"]: r for r in out.to_pylist()}
        assert by_tok["the"]["postings"] == [1, 2, 3]   # distinct, sorted
        assert by_tok["the"]["df"] == 3
        assert by_tok["cat"]["postings"] == [1, 3]
        assert "" not in by_tok

    def test_max_df_cap_drops_and_logs(self, caplog):
        import logging

        from tera_ray.text.index import inverted_index

        with caplog.at_level(logging.WARNING, logger="tera_ray.text.index"):
            out = _mat(inverted_index(self._docs(), min_df=1, max_df=2))
        by_tok = {r["token"] for r in out.to_pylist()}
        assert "the" not in by_tok          # df=3 > cap
        assert "cat" in by_tok

    def test_keyword_tags_substring_semantics(self):
        from tera_ray.text.index import keyword_tags

        out = _mat(keyword_tags(self._docs(), ["cat", "at", "THE"]))
        pairs = {(r["doc_id"], r["keyword"]) for r in out.to_pylist()}
        assert (1, "cat") in pairs and (3, "cat") in pairs
        assert (1, "at") in pairs           # substring of both sat & cat
        assert (3, "THE") in pairs          # case-sensitive contains
        assert (1, "THE") not in pairs
        assert not any(d == 4 for d, _ in pairs)   # null text → no tags


@pytest.mark.usefixtures("ray_session")
class TestRobustStats:
    def test_mad_zero_group_keeps_nothing(self):
        import ray.data

        from tera_ray.query.relational import mad_outliers

        tbl = pa.table({
            "g": pa.array(["a"] * 5 + ["b"] * 5, pa.string()),
            "v": pa.array([1.0] * 5 + [0, 0, 0, 0, 100.0], pa.float64()),
            "rid": pa.array(list(range(10)), pa.int64()),
        })
        out = _mat(mad_outliers(ray.data.from_arrow(tbl), key="g",
                                col="v", k=3.0, keep_cols=["rid"]))
        rows = out.to_pylist()
        # group a: constant → MAD 0 → nothing kept; group b: MAD 0 too
        assert rows == []

    def test_mad_flags_tail(self):
        import ray.data

        from tera_ray.query.relational import mad_outliers

        v = [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 1000.0]
        tbl = pa.table({"g": pa.array(["x"] * 10, pa.string()),
                        "v": pa.array(v, pa.float64()),
                        "rid": pa.array(list(range(10)), pa.int64())})
        out = _mat(mad_outliers(ray.data.from_arrow(tbl), key="g",
                                col="v", k=3.0, keep_cols=["rid"]))
        assert [r["rid"] for r in out.to_pylist()] == [9]

    def test_zscore_null_for_constant_group(self):
        import ray.data

        from tera_ray.query.relational import grouped_standardize

        tbl = pa.table({"g": pa.array(["a", "a", "b", "b"], pa.string()),
                        "v": pa.array([1.0, 3.0, 5.0, 5.0], pa.float64()),
                        "rid": pa.array([0, 1, 2, 3], pa.int64())})
        out = _mat(grouped_standardize(ray.data.from_arrow(tbl), key="g",
                                       col="v", keep_cols=["rid"]))
        by_rid = {r["rid"]: r["z"] for r in out.to_pylist()}
        assert by_rid[2] is None and by_rid[3] is None   # std 0 → null
        assert by_rid[0] == pytest.approx(-0.707107, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
class TestLeakageSplitAndSkew:
    def test_cluster_members_share_split(self):
        import ray.data

        from tera_ray.text.curation import leakage_safe_split

        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }))
        # cluster {1,2,3} canonical 1; {4} and {5} singletons
        mapping = ray.data.from_arrow(pa.table({
            "src": pa.array(["2", "3"], pa.string()),
            "dst": pa.array(["1", "1"], pa.string()),
            "score": pa.array([1.0, 1.0], pa.float64()),
        }))
        out = _mat(leakage_safe_split(docs, mapping)).to_pylist()
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["canon_id"] == by_id[2]["canon_id"] == \
            by_id[3]["canon_id"] == "1"
        assert len({by_id[i]["split"] for i in (1, 2, 3)}) == 1
        assert by_id[4]["canon_id"] == "4"
        # canon hash decides: member 2's split equals canon 1's split,
        # NOT what its own id would hash to in a plain split
        from tera_ray.text.curation import deterministic_split

        plain = deterministic_split(
            pa.table({"doc_id": pa.array(["1", "2", "3", "4", "5"],
                                         pa.string())}), id_col="doc_id")
        plain_by = {r["doc_id"]: r["split"] for r in plain.to_pylist()}
        assert by_id[2]["split"] == plain_by["1"]

    def test_skew_stats_uniform_vs_hot(self):
        import ray.data

        from tera_ray.query.relational import key_skew_stats

        uni = ray.data.from_arrow(pa.table({
            "k": pa.array([str(i % 8) for i in range(800)], pa.string())}))
        hot = ray.data.from_arrow(pa.table({
            "k": pa.array(["h"] * 793 + [str(i) for i in range(7)],
                          pa.string())}))
        u = _mat(key_skew_stats(uni, "k")).to_pylist()[0]
        h = _mat(key_skew_stats(hot, "k")).to_pylist()[0]
        assert u["n"] == h["n"] == 800 and u["n_keys"] == h["n_keys"] == 8
        assert u["top1_share"] == pytest.approx(0.125)
        assert u["entropy_bits"] == pytest.approx(3.0)
        assert h["top1_share"] > 0.99 and h["entropy_bits"] < 0.2


@pytest.mark.usefixtures("ray_session")
def test_boolean_search_requires_all_needles():
    import ray.data

    from tera_ray.text.index import boolean_search

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["spark and vector", "spark only",
                          "vector sparkle"], pa.string()),
    }))
    out = sorted(r["doc_id"] for r in
                 _mat(boolean_search(docs, ["spark", "vector"])).to_pylist())
    # doc 3 has token "sparkle", not "spark" — token-level, not substring
    assert out == [1]


@pytest.mark.usefixtures("ray_session")
class TestReviewFixRegressions:
    """Round-2 self-review fixes: null group keys, all-incomplete corr
    groups, weight<=0 sampling rows."""

    def test_standardize_null_key_partition(self):
        import ray.data

        from tera_ray.query.relational import grouped_standardize

        tbl = pa.table({"g": pa.array([None, None, "a", "a"], pa.string()),
                        "v": pa.array([1.0, 3.0, 10.0, 20.0], pa.float64()),
                        "rid": pa.array([0, 1, 2, 3], pa.int64())})
        out = {r["rid"]: r["z"] for r in _mat(grouped_standardize(
            ray.data.from_arrow(tbl), key="g", col="v",
            keep_cols=["rid"])).to_pylist()}
        # the null partition gets REAL stats (SQL groups nulls together)
        assert out[0] == pytest.approx(-0.707107, abs=1e-6)
        assert out[1] == pytest.approx(0.707107, abs=1e-6)

    def test_winsorize_null_key_partition(self):
        import ray.data

        from tera_ray.query.relational import grouped_winsorize

        tbl = pa.table({"g": pa.array([None] * 5, pa.string()),
                        "v": pa.array([1.0, 2, 3, 4, 100.0], pa.float64()),
                        "rid": pa.array(list(range(5)), pa.int64())})
        out = {r["rid"]: r["clipped"] for r in _mat(grouped_winsorize(
            ray.data.from_arrow(tbl), key="g", col="v", lo_q=0.25,
            hi_q=0.75, keep_cols=["rid"])).to_pylist()}
        assert out[4] < 100.0          # clipped, not passed through
        assert out[0] >= 1.0

    def test_corr_all_incomplete_group_surfaces(self):
        import ray.data

        from tera_ray.query.relational import grouped_corr

        tbl = pa.table({
            "g": pa.array(["a", "a", "b"], pa.string()),
            "x": pa.array([1.0, 2.0, None], pa.float64()),
            "y": pa.array([2.0, 4.0, 5.0], pa.float64()),
        })
        out = {r["g"]: r for b in grouped_corr(
            ray.data.from_arrow(tbl), ["g"], "x", "y")
            .iter_batches(batch_format="pyarrow", batch_size=None)
            for r in b.to_pylist()}
        assert "b" in out                       # group not dropped
        assert out["b"]["n"] == 0
        assert out["b"]["corr"] is None and out["b"]["covar"] is None

    def test_weighted_sample_nonpositive_weights_dropped(self):
        import ray.data

        from tera_ray.text.curation import weighted_sample_per_key

        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "src": pa.array(["s"] * 4, pa.string()),
            "w": pa.array([0.0, -1.0, 5.0, 2.0], pa.float64()),
        })
        out = sorted(r["doc_id"] for r in _mat(weighted_sample_per_key(
            ray.data.from_arrow(tbl), key="src", weight_col="w", k=10,
            id_col="doc_id")).to_pylist())
        assert out == [3, 4]           # w<=0 never sampled, k not padded


def test_quantize_empty_batches_keep_schema():
    """Empty blocks (empty fragments / post-filter) must not crash the
    quantizer and must keep a concat-stable schema (round-2 review)."""
    from tera_ray.ann.quantize import quantize_batch

    fixed = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32(), 4))})
    out = quantize_batch(fixed)
    assert out.num_rows == 0
    assert out.schema.field("q").type == pa.list_(pa.int8(), 4)
    var = pa.table({"vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32()))})
    assert quantize_batch(var).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_rolling_std_large_mean_small_variance():
    """Shifted-data centering: values ~1e8 with std ~2 must not cancel
    to 0 (the naive sum-of-squares form loses all precision here)."""
    import ray.data

    from tera_ray.query.window import window_funcs

    base = 1.0e8
    vals = [base + v for v in (0.0, 2.0, 4.0, 2.0, 0.0)]
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"] * 5, pa.string()),
        "o": pa.array(list(range(5)), pa.int64()),
        "v": pa.array(vals, pa.float64()),
    }))
    out = window_funcs(ds, ["k"], [("o", "ascending")],
                       [("rolling_std", "v", "s", 3)])
    rows = {r["o"]: r["s"] for b in out.iter_batches(
        batch_format="pyarrow", batch_size=None) for r in b.to_pylist()}
    import statistics

    assert rows[2] == pytest.approx(statistics.stdev([base, base + 2,
                                                      base + 4]), rel=1e-9)
    assert rows[4] == pytest.approx(statistics.stdev([base + 4, base + 2,
                                                      base]), rel=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestBM25:
    def _docs(self):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([
                "cat cat cat dog",          # high tf for cat
                "cat dog bird",
                "bird bird bird",
                "dog",
                None,                        # null text → dl 0, score 0
            ], pa.string()),
        }))

    def _bm25_ref(self, texts, terms, k1=1.2, b=0.75):
        """Scalar reference BM25 (Robertson idf) for the fixture."""
        import math

        import re as _re

        toks = [[w for w in _re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
                for t in texts]
        n = len(toks)
        avgdl = sum(len(t) for t in toks) / n
        scores = []
        for doc in toks:
            s = 0.0
            for term in sorted(set(terms)):
                df = sum(1 for d in toks if term in d)
                tf = doc.count(term)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(doc) / avgdl))
            scores.append(int(math.floor(s * 1e6 + 0.5)))
        return scores

    def test_matches_scalar_reference_and_ranks(self):
        from tera_ray.text.index import bm25_topk

        texts = ["cat cat cat dog", "cat dog bird", "bird bird bird",
                 "dog", None]
        ref = self._bm25_ref(texts, ["cat", "dog"])
        out = _mat(bm25_topk(self._docs(), ["cat", "dog"], k=10)).to_pylist()
        got = {r["doc_id"]: r["score_micro"] for r in out}
        want = {i + 1: s for i, s in enumerate(ref) if s > 0}
        assert got == want
        # rank is dense 1..n by (-score, doc_id)
        ordered = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [(r["doc_id"], r["rank"]) for r in
                sorted(out, key=lambda r: r["rank"])] == [
            (d, i + 1) for i, (d, _) in enumerate(ordered)]

    def test_k_truncates_and_term_missing_everywhere(self):
        from tera_ray.text.index import bm25_topk

        out = _mat(bm25_topk(self._docs(), ["cat", "zzz"], k=2)).to_pylist()
        assert len(out) == 2 and [r["rank"] for r in out] == [1, 2]
        # unseen term contributes nothing, no crash; doc 1 still wins on cat tf
        assert out[0]["doc_id"] == 1
