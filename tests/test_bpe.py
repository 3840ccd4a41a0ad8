"""Distributed BPE training vs an independent pure-Python reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray


def _naive_bpe(texts, n_merges, lowercase=True):
    """Reference BPE (Sennrich-style, word-frequency dict): max-count
    pair, ties broken by lexicographically smallest (left, right)
    resolved strings; leftmost-first within a word."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in (t.lower() if lowercase else t).split():
            words[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append((best[0], best[1], top))
        new_words = Counter()
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += f
        words = new_words
    return merges, words


TEXTS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat on the cat",
    "aaa aaaa the the the",
    "low lower lowest slow slower",
]


@pytest.mark.usefixtures("ray_session")
class TestBpe:
    def test_merges_match_reference(self):
        from tera_ray.text.bpe import bpe_train

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string())}))
        got = bpe_train(ds, n_merges=12)
        ref, _ = _naive_bpe(TEXTS, 12)
        assert [(r["left"], r["right"], r["count"])
                for r in got.to_pylist()] == ref

    def test_merges_partition_invariant(self):
        from tera_ray.text.bpe import bpe_train

        t = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                      "text": pa.array(TEXTS, pa.string())})
        a = bpe_train(ray.data.from_arrow(t), n_merges=6).to_pylist()
        b = bpe_train(ray.data.from_arrow(t).repartition(7),
                      n_merges=6).to_pylist()
        assert a == b

    def test_encode_matches_reference_segmentation(self):
        from tera_ray.text.bpe import bpe_encode, bpe_train

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string())}))
        merges = bpe_train(ds, n_merges=10)
        enc = {r["doc_id"]: r["tokens"]
               for r in bpe_encode(ds, merges).take_all()}
        # reference segmentation: replay the same merges per word
        _, ref_words = _naive_bpe(TEXTS, 10)
        seg = {"".join(k): list(k) for k in ref_words}
        for i, text in enumerate(TEXTS):
            want = [s for w in text.lower().split() for s in seg[w]]
            assert enc[i] == want, (i, enc[i], want)

    def test_early_stop_and_overlap(self):
        from tera_ray.text.bpe import bpe_train

        ds = ray.data.from_arrow(pa.table({
            "text": pa.array(["aaaa"], pa.string())}))
        got = bpe_train(ds, n_merges=50).to_pylist()
        # 'aaaa' → merge (a,a)=2 (leftmost-first non-overlap), then
        # (aa,aa)=1, then nothing repeats → early stop well before 50
        assert [(r["left"], r["right"]) for r in got[:2]] == \
            [("a", "a"), ("aa", "aa")]
        assert len(got) < 50
