"""Tests for training-data ops: text analysis, dedup family, ANN search."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _docs():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog near the river bank today",
            "the quick brown fox jumps over the lazy dog near the river bank tonight",
            "completely different text about ray data pipelines and arrow batches here",
            "another unrelated document discussing knowledge graph construction at scale",
            "the quick brown fox jumps over the lazy dog near the river bank today",
            "short one",
        ],
    })


class TestTextAnalysis:
    def test_token_counts(self):
        from tera_ray.text.analysis import token_stats

        t = pa.table({"text": ["a b  c", "", "  ", "one", "x,y z"]})
        out = token_stats(t)
        assert out["n_tokens_ws"].to_pylist() == [3, 0, 0, 1, 2]
        # BPE-ish: "x,y z" → ' ?x' ',' 'y' ' z' = 4 pieces
        assert out["n_tokens_bpe"].to_pylist()[4] == 4

    def test_quality_bounds_and_signals(self):
        from tera_ray.text.analysis import quality_stats

        t = pa.table({"text": ["the cat is on the mat and it is fine " * 10,
                               "!!! ??? ,,,", ""]})
        out = quality_stats(t)
        q = out["quality"].to_pylist()
        assert all(0.0 <= x <= 1.0 for x in q)
        assert q[0] > q[1]  # clean prose beats punctuation soup
        assert out["punct_ratio"].to_pylist()[1] > 0.5
        assert out["stopword_ratio"].to_pylist()[0] > 0.3

    def test_langid(self):
        from tera_ray.text.analysis import langid

        t = pa.table({"text": [
            "the cat and the dog are in the house that it was for",
            "der hund und die katze ist nicht im haus für den",
            "le chat et le chien est dans la maison pour les",
            "el perro y el gato es una casa de los en que no",
            "你好世界 这是一个测试 中文文本",
            "zzz qqq xxx",
        ]})
        assert langid(t)["lang_pred"].to_pylist() == [
            "en", "de", "fr", "es", "zh", "und"]

    def test_fingerprint_stable_and_order_sensitive(self):
        from tera_ray.text.analysis import fingerprint

        t = pa.table({"text": ["alpha beta gamma", "Alpha  beta GAMMA",
                               "gamma beta alpha", ""]})
        fp = fingerprint(t)["fp64"].to_pylist()
        assert fp[0] == fp[1]          # normalization: case/whitespace
        assert fp[0] != fp[2]          # order-sensitive
        # identical when computed again (cross-run determinism)
        assert fingerprint(t)["fp64"].to_pylist() == fp


class TestDedup:
    def test_exact_dedup_keeps_min_order(self, ray_session):
        from tera_ray.dedup.exact import dedup_exact

        ds = ray.data.from_arrow(_docs())
        out = dedup_exact(ds, keys=["text"], order_by="doc_id").take_all()
        assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3, 5]

    def test_line_dedup_scrubs_hot_lines(self, ray_session):
        from tera_ray.dedup.lines import dedup_lines, hot_lines

        docs = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a\nb\nc", "b\nc", "x\nb\nx"], pa.string()),
        })
        # hot at min_docs=2: b (3 docs) and c (2 docs); x repeats only
        # WITHIN doc 3, so per-doc distinctness keeps it cold
        hot = sorted(r["line"] for r in hot_lines(
            ray.data.from_arrow(docs), min_docs=2).take_all())
        assert hot == ["b", "c"]
        out = {r["doc_id"]: r["text"] for r in dedup_lines(
            ray.data.from_arrow(docs), min_docs=2).take_all()}
        # surviving lines keep order; fully-scrubbed docs keep '' text
        assert out == {1: "a", 2: "", 3: "x\nx"}
        out3 = {r["doc_id"]: r["text"] for r in dedup_lines(
            ray.data.from_arrow(docs), min_docs=3).take_all()}
        assert out3 == {1: "a\nc", 2: "c", 3: "x\nx"}
        # the broadcast-set bound fails fast instead of silently growing
        with pytest.raises(ValueError):
            dedup_lines(ray.data.from_arrow(docs), min_docs=1, max_hot=2)
        # empty hot set (threshold above every count): pure pass-through
        # (regression: Ray drops empty blocks, concat of [] raised)
        out9 = {r["doc_id"]: r["text"] for r in dedup_lines(
            ray.data.from_arrow(docs), min_docs=9).take_all()}
        assert out9 == {1: "a\nb\nc", 2: "b\nc", 3: "x\nb\nx"}

    def test_minhash_clusters_near_dups(self, ray_session):
        from tera_ray.dedup.minhash import minhash_dedup

        ds = ray.data.from_arrow(_docs())
        m = {r["src"]: r["dst"] for r in minhash_dedup(ds, threshold=0.5).take_all()}
        assert m == {"1": "0", "4": "0"}

    def test_minhash_exact_dup_at_high_threshold(self, ray_session):
        from tera_ray.dedup.minhash import minhash_dedup

        ds = ray.data.from_arrow(_docs())
        m = {r["src"]: r["dst"] for r in minhash_dedup(ds, threshold=0.99).take_all()}
        assert m == {"4": "0"}  # only the byte-identical pair survives

    def test_simhash_finds_exact_and_near(self, ray_session):
        from tera_ray.dedup.simhash import simhash_pairs

        ds = ray.data.from_arrow(_docs())
        pairs = {(r["a"], r["b"]): r["hamming"]
                 for r in simhash_pairs(ds, max_hamming=10).take_all()}
        assert pairs[(0, 4)] == 0       # identical docs: distance 0
        assert (0, 1) in pairs          # near-dup within 10 bits
        assert (0, 2) not in pairs      # unrelated text excluded

    def test_embed_cosine_pairs(self, ray_session):
        from tera_ray.dedup.embed import cosine_dup_pairs

        rng = np.random.RandomState(0)
        V = rng.standard_normal((50, 16)).astype(np.float32)
        V[7] = V[3] + 0.01 * rng.standard_normal(16)
        emb = pa.table({
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1), pa.float32()), 16)})
        out = cosine_dup_pairs(ray.data.from_arrow(emb), threshold=0.95).take_all()
        assert [(r["a"], r["b"]) for r in out] == [(3, 7)]
        assert out[0]["cosine"] > 0.99

    def test_semdedup(self, ray_session):
        """SemDeDup semantics: near-dups in the SAME cluster drop to the
        min-id keeper; an equally-similar pair split ACROSS clusters
        (L2 clusters on position, cosine on direction) is never
        compared; the block-chunked Gram path matches the one-shot."""
        from tera_ray.dedup.embed import semdedup

        rng = np.random.RandomState(1)
        V = np.zeros((7, 4), np.float64)
        V[0] = (10, 0, 0, 0)            # centroid seed, cluster 0
        V[1] = (-10, 0, 0, 0)           # centroid seed, cluster 1
        V[2] = (2, 1.5, 0, 0)           # dup-group keeper (min id)
        V[3] = V[2] + 1e-4 * rng.standard_normal(4)
        V[4] = V[2] + 1e-4 * rng.standard_normal(4)
        V[5] = (1, 5, 0, 0)             # → cluster 0
        V[6] = (-1, 5, 0, 0)            # → cluster 1; cos(5,6)=0.923
        emb = pa.table({
            "vec_id": pa.array(range(7), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1), pa.float64()), 4)})
        ds = ray.data.from_arrow(emb)
        kept = {r["vec_id"]: r["cluster"]
                for r in semdedup(ds, k=2, threshold=0.9).take_all()}
        # same-cluster near-identical trio collapses to its min id
        assert 2 in kept and 3 not in kept and 4 not in kept
        # 5 and 6 have cosine 0.923 ≥ 0.9 but live in DIFFERENT
        # clusters → both survive (cluster isolation)
        assert 5 in kept and 6 in kept and kept[5] != kept[6]
        assert set(kept) == {0, 1, 2, 5, 6}
        # chunked Gram scan is exact: block=2 equals one-shot block
        kept_b2 = {r["vec_id"]
                   for r in semdedup(ds, k=2, threshold=0.9,
                                     block=2).take_all()}
        assert kept_b2 == set(kept)


class TestANN:
    @pytest.fixture()
    def emb(self):
        rng = np.random.RandomState(1)
        V = rng.standard_normal((200, 32)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1), pa.float32()), 32)})
        return V, t

    def test_brute_matches_numpy_oracle(self, ray_session, emb):
        from tera_ray.ann.search import brute_topk

        V, t = emb
        Q = V[[5, 17]]
        res = brute_topk(ray.data.from_arrow(t).repartition(4),
                         qids=[5, 17], Q=Q, k=5).take_all()
        got = {}
        for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append(r["vec_id"])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        for qi, qid in [(0, 5), (1, 17)]:
            sims = Vn @ Vn[[5, 17][qi]]
            expect = list(np.lexsort((np.arange(len(sims)), -sims))[:5])
            assert got[qid] == expect

    def test_ivf_full_probe_equals_brute(self, ray_session, emb):
        from tera_ray.ann.search import brute_topk, ivf_topk

        V, t = emb
        ds = ray.data.from_arrow(t)
        b = brute_topk(ds, qids=[3], Q=V[[3]], k=8).take_all()
        i = ivf_topk(ds, qids=[3], Q=V[[3]], k=8, n_centroids=16,
                     nprobe=16).take_all()
        key = lambda rows: [(r["vec_id"], r["rank"]) for r in
                            sorted(rows, key=lambda r: r["rank"])]
        assert key(b) == key(i)

    def test_ivf_partial_probe_recall(self, ray_session, emb):
        from tera_ray.ann.search import brute_topk, ivf_topk

        V, t = emb
        ds = ray.data.from_arrow(t)
        b = {r["vec_id"] for r in brute_topk(ds, qids=[9], Q=V[[9]], k=10).take_all()}
        i = {r["vec_id"] for r in ivf_topk(ds, qids=[9], Q=V[[9]], k=10,
                                           n_centroids=16, nprobe=8).take_all()}
        assert len(b & i) / len(b) >= 0.5  # partial probe keeps decent recall

    def test_knn_join_full_probe_is_exact(self, ray_session, emb):
        """nprobe == n_lists: every query meets every data list, so the
        self-join must equal the brute-force numpy answer (self
        excluded) for EVERY row, rank order and all."""
        from tera_ray.ann.search import knn_join

        V, t = emb
        res = knn_join(ray.data.from_arrow(t).repartition(4), k=5,
                       n_lists=8, nprobe=8, dtype=np.float64).take_all()
        got = {}
        for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append(r["vec_id"])
        Vn = (V.astype(np.float64)
              / np.linalg.norm(V.astype(np.float64), axis=1, keepdims=True))
        sims = Vn @ Vn.T
        np.fill_diagonal(sims, -np.inf)
        for qid in range(len(V)):
            expect = list(np.lexsort((np.arange(len(V)), -sims[qid]))[:5])
            assert got[qid] == expect, qid

    def test_topk_tolerates_empty_blocks(self, ray_session, emb):
        """A zero-row block (filtered corpus, tiny partitions) must
        yield a typed empty partial, not a matmul shape crash."""
        from tera_ray.ann.search import (
            _brute_score,
            _empty_result,
            brute_topk,
            ivf_topk,
            make_query_ref,
        )

        V, t = emb
        # direct-call guard check: Ray may elide empty blocks in the
        # Dataset path, so the unit-level call is the real regression
        ref = make_query_ref([3], V[[3]])
        got = _brute_score(t.slice(0, 0), queries_ref=ref, k=5,
                           id_col="vec_id", vec_col="embedding")
        assert got.schema.equals(_empty_result("vec_id").schema)
        assert got.num_rows == 0
        ds = ray.data.from_arrow(t).union(
            ray.data.from_arrow(t.slice(0, 0))).repartition(6)
        b = brute_topk(ds, qids=[3], Q=V[[3]], k=5).take_all()
        assert [r["vec_id"] for r in
                sorted(b, key=lambda r: r["rank"])][0] == 3
        i = ivf_topk(ds, qids=[3], Q=V[[3]], k=5, n_centroids=8,
                     nprobe=8).take_all()
        assert {r["vec_id"] for r in b} == {r["vec_id"] for r in i}

    def test_centroid_sample_exact_count(self, ray_session, emb):
        """The sample must contain EXACTLY min(sample_size, n) vectors
        — a thin hash draw escalates the threshold instead of silently
        under-delivering."""
        from tera_ray.ann.search import _centroid_sample

        V, t = emb
        ds = ray.data.from_arrow(t).repartition(4)
        for k in (3, 50, 150, 199, 200, 500):
            s = _centroid_sample(ds, "vec_id", "embedding", k)
            assert s.shape == (min(k, 200), 32), k

    def test_centroid_sample_order_invariant(self, ray_session, emb):
        """Centroid training must see the SAME sample whatever the
        input row order/partitioning: the bottom-k-by-salted-hash
        sample is a pure function of the id set, unlike the former
        limit() head sample (biased on source-ordered data).  Also
        checks the sample is a strict subset when capped."""
        from tera_ray.ann.search import _centroid_sample

        V, t = emb
        fwd = ray.data.from_arrow(t).repartition(4)
        rev = ray.data.from_arrow(t.take(pa.array(
            list(range(t.num_rows - 1, -1, -1))))).repartition(7)
        s_fwd = _centroid_sample(fwd, "vec_id", "embedding", 50)
        s_rev = _centroid_sample(rev, "vec_id", "embedding", 50)
        assert s_fwd.shape == (50, 32)
        np.testing.assert_array_equal(s_fwd, s_rev)
        # sample_size >= n keeps every row
        s_all = _centroid_sample(fwd, "vec_id", "embedding", 500)
        assert s_all.shape == (200, 32)

    def test_ivf_partial_probe_order_invariant(self, ray_session, emb):
        """End-to-end: a partial-probe IVF query (where centroids DO
        affect the answer) returns identical rows on a reversed,
        repartitioned copy of the corpus."""
        from tera_ray.ann.search import ivf_topk

        V, t = emb
        fwd = ray.data.from_arrow(t).repartition(4)
        rev = ray.data.from_arrow(t.take(pa.array(
            list(range(t.num_rows - 1, -1, -1))))).repartition(7)
        key = lambda rows: sorted((r["query_id"], r["rank"], r["vec_id"])
                                  for r in rows)
        a = ivf_topk(fwd, qids=[9], Q=V[[9]], k=10, n_centroids=16,
                     nprobe=4).take_all()
        b = ivf_topk(rev, qids=[9], Q=V[[9]], k=10, n_centroids=16,
                     nprobe=4).take_all()
        assert key(a) == key(b)

    def test_knn_join_partial_probe_recall(self, ray_session, emb):
        from tera_ray.ann.search import knn_join

        V, t = emb
        ds = ray.data.from_arrow(t)
        exact = knn_join(ds, k=5, n_lists=8, nprobe=8).take_all()
        approx = knn_join(ds, k=5, n_lists=8, nprobe=2).take_all()
        ex = {(r["query_id"], r["vec_id"]) for r in exact}
        ap = {(r["query_id"], r["vec_id"]) for r in approx}
        assert len(ex & ap) / len(ex) >= 0.5
        # every query still answered (its own list is always probed)
        assert {r["query_id"] for r in approx} == set(range(len(V)))


@pytest.mark.usefixtures("ray_session")
class TestHashEmbed:
    def test_deterministic_normed_and_zero_doc(self):
        import numpy as np

        from tera_ray.text.analysis import hash_embed

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["hello world hello", "world", "",
                              "HELLO world hello"], pa.string()),
        })
        V = np.array(hash_embed(t, dim=8)["embedding"].to_pylist())
        # L2-normalized non-empty docs; empty doc = zero vector
        assert np.allclose(np.linalg.norm(V[[0, 1, 3]], axis=1), 1.0)
        assert np.allclose(V[2], 0.0)
        # case-insensitive tokenization: rows 0 and 3 identical
        assert np.allclose(V[0], V[3])
        # same tokens, different counts: same support, different vector
        assert set(np.nonzero(V[1])[0]) <= set(np.nonzero(V[0])[0])
        # stable across calls (no seed/hash-randomization dependence)
        V2 = np.array(hash_embed(t, dim=8)["embedding"].to_pylist())
        assert np.array_equal(V, V2)


class TestLogReg:
    def test_irls_matches_numpy_and_separates(self, ray_session):
        import numpy as np

        from tera_ray.text.classifier import logreg_fit, logreg_score

        rng = np.random.default_rng(1)
        n = 800
        X = rng.normal(size=(n, 3))
        z = 0.5 + X @ np.array([2.0, -1.0, 0.3])
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-z))).astype(np.int64)
        tbl = pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "f1": pa.array(X[:, 0]), "f2": pa.array(X[:, 1]),
            "f3": pa.array(X[:, 2]), "y": pa.array(y),
        })
        ds = ray.data.from_arrow(tbl).repartition(9)
        w, hist = logreg_fit(ds, ["f1", "f2", "f3"], "y")
        # independent single-machine IRLS (identical algorithm)
        Xd = np.column_stack([np.ones(n), X])
        wo = np.zeros(4)
        for _ in range(8):
            p = 1 / (1 + np.exp(-Xd @ wo))
            H = (Xd * (p * (1 - p))[:, None]).T @ Xd + 1e-6 * np.eye(4)
            wo = wo + np.linalg.solve(H, Xd.T @ (y - p) - 1e-6 * wo)
        assert np.allclose(w, wo, atol=1e-9)
        assert hist[-1] < hist[0]           # loss decreased
        sc = logreg_score(ds, w, ["f1", "f2", "f3"]).take_all()
        pred = {r["doc_id"]: r["score"] > 0.5 for r in sc}
        acc = np.mean([pred[i] == bool(y[i]) for i in range(n)])
        assert acc > 0.75                   # separates the noisy labels


class TestPCA:
    def test_fit_transform_matches_numpy(self, ray_session):
        import numpy as np

        from tera_ray.ann.pca import (pca_fit, pca_transform,
                                      vector_dim_stats)

        rng = np.random.default_rng(0)
        X32 = (rng.normal(size=(200, 8))
               @ np.diag([5, 3, 1, 1, .5, .5, .1, .1])).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array(X32.tolist(), pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl).repartition(7)
        X = X32.astype(np.float64)
        mu, comps, evar = pca_fit(ds, k=3)
        w = np.sort(np.linalg.eigvalsh(np.cov(X, rowvar=False)))[::-1][:3]
        assert np.allclose(np.sort(evar)[::-1], w, rtol=1e-8)
        # canonical signs: largest-|entry| coordinate positive
        for row in comps:
            assert row[int(np.argmax(np.abs(row)))] > 0
        out = pca_transform(ds, mu, comps, round_digits=6).take_all()
        got = np.stack([r["pca"] for r in
                        sorted(out, key=lambda r: r["vec_id"])])
        want = np.round((X - X.mean(0)) @ comps.T, 6)
        assert np.allclose(got, want)
        st = vector_dim_stats(ds)
        assert np.allclose(st["mean"].to_numpy(), np.round(X.mean(0), 6))
        assert np.allclose(st["var"].to_numpy(),
                           np.round(X.var(0, ddof=1), 6))


class TestNgramJaccard:
    def test_doc_shingles_strict_and_distinct(self):
        import numpy as np
        import pyarrow as pa

        from tera_ray.dedup.ngram import doc_shingles

        texts = pa.array([
            "the cat sat on the mat",      # 6 tokens -> 4 shingles
            "too short",                   # < 3 tokens -> 0 shingles
            "a b c a b c a b c",           # repeats -> distinct shingles
            "",
        ])
        doc_idx, sh, sizes = doc_shingles(texts, n=3)
        assert sizes.tolist() == [4, 0, 3, 0]
        # distinct within doc: 'a b c a b c a b c' has 7 positional
        # 3-grams but only 3 distinct ('a b c','b c a','c a b')
        assert len(np.unique(sh[doc_idx == 2])) == 3

    def test_pairs_match_bruteforce(self):
        import pyarrow as pa

        from tera_ray.dedup.ngram import ngram_jaccard_pairs

        texts = [
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon eta",   # near-dup of 0
            "one two three four five six",
            "alpha beta gamma delta epsilon zeta",  # exact dup of 0
        ]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "text": pa.array(texts)})
        got = {}
        for r in ngram_jaccard_pairs(
                ray.data.from_arrow(t), threshold=0.2).take_all():
            got[(r["a"], r["b"])] = r["jaccard"]

        def shingles(s):
            toks = s.split()
            return {" ".join(toks[i:i+3]) for i in range(len(toks) - 2)}

        want = {}
        for i in range(4):
            for j in range(i + 1, 4):
                a, b = shingles(texts[i]), shingles(texts[j])
                if not a or not b:
                    continue
                jac = len(a & b) / len(a | b)
                if jac >= 0.2:
                    want[(i, j)] = jac
        assert got == want
        assert got[(0, 3)] == 1.0


@pytest.mark.usefixtures("ray_session")
class TestMinhashDistributedVerify:
    def test_matches_driver_verify(self):
        import pyarrow.parquet as pq

        from tera_ray.dedup.minhash import minhash_dedup

        ds = ray.data.read_parquet(
            "/root/testdata/sf0.01/documents.parquet",
            columns=["doc_id", "text"])
        drv = sorted((r["src"], r["dst"])
                     for r in minhash_dedup(ds, threshold=0.8).take_all())
        dst = sorted((r["src"], r["dst"])
                     for r in minhash_dedup(ds, threshold=0.8,
                                            verify="distributed").take_all())
        assert drv == dst and len(drv) > 0


@pytest.mark.usefixtures("ray_session")
class TestTanimotoBanding:
    def test_banded_equals_broadcast(self):
        """Property: popcount-band blocking loses no pair >= threshold
        (and adds none) vs the exact broadcast all-pairs scorer."""
        import numpy as np
        import pyarrow as pa

        from tera_ray.dedup.fingerprint import tanimoto_pairs

        rng = np.random.RandomState(7)
        n = 400
        # mixed-density fingerprints incl. exact dup groups and sparse rows
        fps = rng.randint(0, 1 << 62, size=n, dtype=np.int64).astype(np.uint64)
        fps[:40] = fps[40:80]                  # forced duplicates
        fps[80:100] &= np.uint64(0xFF)         # very sparse
        fps[100] = 0                           # empty fingerprint
        t = pa.table({
            "cas_number": pa.array([f"c{i:04d}" for i in range(n)]),
            "fp": pa.array(fps, pa.uint64()),
        })
        ds = ray.data.from_arrow(t).repartition(7)

        def rows(out):
            return sorted((r["a"], r["b"], r["tanimoto"])
                          for r in out.take_all())

        for thr in (0.5, 0.8, 1.0):
            banded = rows(tanimoto_pairs(ds, threshold=thr))
            broad = rows(tanimoto_pairs(ds, threshold=thr, mode="broadcast"))
            assert banded == broad, f"threshold={thr}"
        assert len(rows(tanimoto_pairs(ds, threshold=0.5))) > 0


@pytest.mark.usefixtures("ray_session")
class TestChemEnrich:
    def test_features_join_and_missing_keys(self):
        import pyarrow as pa

        from tera_ray.pipelines.chemistry import enrich_chemicals

        chems = ray.data.from_arrow(pa.table({
            "cas_number": ["c1", "c2", "c3"],
            "chemical_name": ["alpha, alpha technical", "beta", None],
        }))
        snap = pa.table({"cas_number": ["c1", "c2"],
                         "fp": pa.array([0b1011, 0], pa.int64())})
        rows = {r["cas_number"]: r
                for r in enrich_chemicals(chems, snap).take_all()}
        assert rows["c1"]["fp_bits"] == 3 and rows["c1"]["fp_hex"] == "0xb"
        assert rows["c1"]["n_synonyms"] == 2
        assert rows["c2"]["fp_bits"] == 0 and rows["c2"]["fp_hex"] == "0x0"
        assert rows["c2"]["n_synonyms"] == 1
        # c3 missing from the snapshot -> null features (reference
        # prints-and-skips on PubChem NotFound)
        assert rows["c3"]["fp_bits"] is None and rows["c3"]["fp_hex"] is None
        assert rows["c3"]["chemical"].endswith("cas/c3")


class TestIncrementalDedup:
    def test_probe_finds_cross_side_pairs_only(self, ray_session):
        from tera_ray.dedup.minhash import minhash_index, minhash_probe

        t = _docs()
        docs = ray.data.from_arrow(t)
        # corpus = ids 0-2, new shard = ids 3-5 (4 duplicates 0 exactly,
        # 5 is unrelated); probe must return ONLY new×corpus pairs
        corpus = docs.filter(lambda r: r["doc_id"] < 3)
        new = docs.filter(lambda r: r["doc_id"] >= 3)
        idx = minhash_index(corpus)
        out = minhash_probe(new, idx, docs, threshold=0.8).take_all()
        pairs = sorted((r["a"], r["b"]) for r in out)
        # 4 == 0 byte-identical (J=1); 1 differs from 4 by one token
        # (J = 11/13 ≈ 0.846); NO corpus×corpus pair (0,1) in the output
        assert pairs == [(4, 0), (4, 1)]
        assert {(r["a"], r["b"]): r["jaccard"] for r in out}[(4, 0)] == 1.0

    def test_index_roundtrips_through_parquet(self, ray_session, tmp_path):
        from tera_ray.dedup.minhash import minhash_index, minhash_probe

        docs = ray.data.from_arrow(_docs())
        corpus = docs.filter(lambda r: r["doc_id"] < 3)
        minhash_index(corpus).write_parquet(str(tmp_path / "idx"))
        idx = ray.data.read_parquet(str(tmp_path / "idx"))
        new = docs.filter(lambda r: r["doc_id"] >= 3)
        out = minhash_probe(new, idx, docs, threshold=0.8).take_all()
        assert sorted((r["a"], r["b"]) for r in out) == [(4, 0), (4, 1)]


class TestTokenEncoding:
    def test_vocab_rank_and_encode(self, ray_session):
        from tera_ray.text.analysis import build_vocab, encode_token_ids

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["aa bb aa cc", "bb aa, dd!", ""],
        })
        ds = ray.data.from_arrow(t)
        vocab = build_vocab(ds, size=3)
        # counts: aa=3, bb=2, cc=1, dd=1 → ids aa=1, bb=2, cc=3 (tie
        # cc<dd by token); dd falls out of the size-3 vocab → unk 0
        assert dict(zip(vocab["token"].to_pylist(),
                        vocab["token_id"].to_pylist())) == \
            {"aa": 1, "bb": 2, "cc": 3}
        out = {r["doc_id"]: r["token_ids"]
               for r in encode_token_ids(ds, vocab).take_all()}
        assert out == {0: [1, 2, 1, 3], 1: [2, 1, 0], 2: []}

    def test_encode_partition_invariance(self, ray_session):
        from tera_ray.text.analysis import build_vocab, encode_token_ids

        t = pa.table({
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "text": [f"tok{i % 7} tok{i % 3} filler" for i in range(40)],
        })
        vocab = build_vocab(ray.data.from_arrow(t), size=5)

        def run(parts):
            ds = ray.data.from_arrow(t).repartition(parts)
            return sorted((r["doc_id"], tuple(r["token_ids"]))
                          for r in encode_token_ids(ds, vocab).take_all())

        assert run(1) == run(8)


class TestBigramFluency:
    def test_hand_computed_scores(self, ray_session):
        from tera_ray.text.analysis import bigram_fluency

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["a b a b", "a b", "x y", "solo"],
        })
        out = {r["doc_id"]: (r["n_bigrams"], r["score"])
               for r in bigram_fluency(ray.data.from_arrow(t)).take_all()}
        # corpus counts: (a,b)=3, (b,a)=1, (x,y)=1
        assert out == {0: (3, (3 + 1 + 3) / 3), 1: (1, 3.0), 2: (1, 1.0)}
        # "solo" has < 2 tokens → absent
        assert 3 not in out

    def test_partition_invariance(self, ray_session):
        from tera_ray.text.analysis import bigram_fluency

        t = pa.table({
            "doc_id": pa.array(list(range(30)), pa.int64()),
            "text": [f"w{i % 4} w{i % 5} w{i % 4} end" for i in range(30)],
        })

        def run(parts):
            ds = ray.data.from_arrow(t).repartition(parts)
            return sorted((r["doc_id"], r["n_bigrams"], round(r["score"], 9))
                          for r in bigram_fluency(ds).take_all())

        assert run(1) == run(7)  # cross-batch bigrams never leak


@pytest.mark.usefixtures("ray_session")
def test_minhash_hot_band_cap_end_to_end():
    """Skew torture (SURVEY 7.5 item 2): 3000 IDENTICAL docs collide in
    every LSH band (far beyond max_bucket=256); the star cap must keep
    the pair blowup bounded while transitive clustering still maps all
    copies to one canonical id."""
    import ray.data

    from tera_ray.dedup.minhash import minhash_dedup

    n = 3000
    docs = ["the quick brown fox jumps over the lazy dog again"] * n \
        + [f"unique filler document number {i} with extra words {i*7}"
           for i in range(50)]
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(docs))), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)
    mapping = pa.concat_tables(list(
        minhash_dedup(ds, threshold=0.8).iter_batches(
            batch_format="pyarrow", batch_size=None)))
    # all 3000 copies collapse to ONE canonical id (the min, "0")
    srcs = set(mapping["src"].to_pylist())
    dsts = set(mapping["dst"].to_pylist())
    assert len(srcs) == n - 1                  # every copy except canon
    assert dsts == {"0"}
    assert not any(int(s) >= n for s in srcs)  # fillers untouched


@pytest.mark.usefixtures("ray_session")
def test_quantized_topk_recall():
    """int8-dequantized candidate search must keep recall@10 >= 0.9 vs
    exact float search on the sf0.01 embeddings."""
    import numpy as np

    import ray.data

    from tera_ray.ann.quantize import dequantized_topk
    from tera_ray.ann.search import brute_topk

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet",
        columns=["vec_id", "embedding"])
    rows = ds.take(8)
    qids = np.array([r["vec_id"] for r in rows], np.int64)
    Q = np.array([r["embedding"] for r in rows], np.float64)

    def topk_sets(res):
        out: dict[int, set] = {}
        for b in res.iter_batches(batch_format="pyarrow", batch_size=None):
            for q, v in zip(b["query_id"].to_pylist(),
                            b["vec_id"].to_pylist()):
                out.setdefault(q, set()).add(v)
        return out

    exact = topk_sets(brute_topk(ds, qids, Q, k=10, dtype=np.float64))
    quant = topk_sets(dequantized_topk(ds, qids, Q, k=10))
    recalls = [len(exact[q] & quant[q]) / len(exact[q]) for q in exact]
    assert min(recalls) >= 0.9, recalls


@pytest.mark.usefixtures("ray_session")
class TestDupSpans:
    def test_planted_shared_span_counts(self):
        from tera_ray.dedup.ngram import dup_spans

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                f"{shared} unique one tail",    # shared span + own spans
                f"lead in text {shared}",       # same span, different doc
                "completely different words with no overlap at all here",
                "too short",                    # < 8 tokens -> no row
            ], pa.string()),
        }))
        rows = {r["doc_id"]: r for b in dup_spans(docs, n=8).iter_batches(
            batch_format="pyarrow", batch_size=None) for r in b.to_pylist()}
        assert set(rows) == {1, 2, 3}           # doc 4 emits no spans
        # doc1: 11 tokens -> 4 spans; exactly one (the shared span) dups
        assert rows[1]["n_spans"] == 4 and rows[1]["n_dup_spans"] == 1
        # doc2: 11 tokens -> 4 spans, one shared
        assert rows[2]["n_spans"] == 4 and rows[2]["n_dup_spans"] == 1
        assert rows[3]["n_dup_spans"] == 0 and rows[3]["n_spans"] == 2

    def test_identical_docs_all_spans_dup(self):
        from tera_ray.dedup.ngram import dup_spans

        text = "one two three four five six seven eight nine ten"
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([10, 20], pa.int64()),
            "text": pa.array([text, text], pa.string()),
        }))
        rows = [r for b in dup_spans(docs, n=8).iter_batches(
            batch_format="pyarrow", batch_size=None) for r in b.to_pylist()]
        assert all(r["n_spans"] == 3 and r["n_dup_spans"] == 3 for r in rows)
        assert len(rows) == 2
