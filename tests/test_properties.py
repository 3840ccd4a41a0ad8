"""Property-based tests (hypothesis) for the PURE kernels under the
distributed operators — the pieces whose correctness every shuffle plan
inherits.  No Ray session needed: these run the per-batch kernels
directly against naive references on randomized inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from tera_ray.dedup.minhash import shingle_hashes
from tera_ray.sketch.hll import _registers_batch
from tera_ray.stages.base import dedup_table, hash_column
from tera_ray.state.lexicon import _pack_spans, levenshtein, levenshtein_batch

_words = st.text(alphabet="abcdef gh", min_size=0, max_size=30)
_keys = st.text(alphabet="abc", min_size=0, max_size=4)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcdefg", min_size=0, max_size=12),
       st.lists(st.text(alphabet="abcdefg", min_size=0, max_size=12),
                min_size=1, max_size=8))
def test_levenshtein_batch_matches_scalar(query, cands):
    mat, lens = _pack_spans(cands)
    got = levenshtein_batch(query, mat, lens, 2)
    for g, c in zip(got, cands):
        want = levenshtein(query, c, 2)
        # both clamp above maxd=2; compare the clamped values
        assert min(int(g), 3) == min(want, 3), (query, c, g, want)


@settings(max_examples=40, deadline=None)
@given(st.lists(_words, min_size=1, max_size=10),
       st.integers(min_value=1, max_value=9))
def test_shingle_sets_are_batch_layout_invariant(texts, split_at):
    """A doc's shingle SET must not depend on which batch it rides in
    (the round-1 advisor's cross-doc contamination bug class)."""
    def per_doc_sets(docs):
        arr = pa.array(docs, pa.string())
        off, sh, n = shingle_hashes(arr, 3)
        return [frozenset(sh[off[i]: off[i + 1]].tolist())
                for i in range(n)]

    whole = per_doc_sets(texts)
    cut = min(split_at, len(texts))
    split = per_doc_sets(texts[:cut]) + per_doc_sets(texts[cut:])
    assert whole == split


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_keys, _keys, st.integers(0, 5)),
                min_size=0, max_size=40))
def test_dedup_table_keeps_first_per_key(rows):
    t = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([str(r[2]) for r in rows], pa.string()),
    })
    out = dedup_table(t)
    got = list(zip(out["subj"].to_pylist(), out["pred"].to_pylist(),
                   out["obj"].to_pylist()))
    seen, want = set(), []
    for r in rows:
        key = (r[0], r[1], str(r[2]))
        if key not in seen:
            seen.add(key)
            want.append(key)
    assert sorted(got) == sorted(want)
    assert len(got) == len(set(got))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="xyz0123", min_size=1, max_size=8),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5))
def test_hll_registers_merge_invariant(vals, nsplits):
    """Register partials merged by max must equal the single-pass
    registers, regardless of how the values are batched (the merge
    contract every shuffle plan relies on)."""
    arr = np.array(vals, dtype=object)
    idx_all, rho_all = _registers_batch(arr, 14)
    whole = dict(zip(idx_all.tolist(), rho_all.tolist()))
    merged: dict[int, int] = {}
    for chunk in np.array_split(arr, nsplits):
        if len(chunk) == 0:
            continue
        i, r = _registers_batch(chunk, 14)
        for ii, rr in zip(i.tolist(), r.tolist()):
            merged[ii] = max(merged.get(ii, 0), rr)
    assert merged == whole


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.floats(min_value=-100, max_value=100,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=4),
                min_size=1, max_size=20))
def test_quantize_roundtrip_error_bound(vecs):
    """Dequantized values stay within scale/2 of the originals (the
    int8 quantizer's defining guarantee)."""
    from tera_ray.ann.quantize import quantize_batch

    t = pa.table({
        "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32(), 4)),
    })
    out = quantize_batch(t)
    q = (out["q"].combine_chunks().values.to_numpy(zero_copy_only=False)
         .reshape(len(vecs), 4).astype(np.float64))
    scale = out["scale"].to_numpy(zero_copy_only=False)
    orig = np.array(vecs, np.float32).astype(np.float64)
    deq = q * scale[:, None]
    tol = np.maximum(scale[:, None] / 2, 1e-12) * (1 + 1e-9)
    assert (np.abs(deq - orig) <= tol).all()
    assert (np.abs(q) <= 127).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_keys, _keys, _keys), min_size=1, max_size=30),
       st.integers(min_value=1, max_value=4))
def test_hash_column_is_chunking_invariant(rows, nchunks):
    """Bucket assignment must not depend on block boundaries — the
    invariant every hash-bucket shuffle relies on."""
    t = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    })
    whole = hash_column(t).to_pylist()
    pieces = []
    step = max(1, len(rows) // nchunks)
    for s in range(0, len(rows), step):
        pieces.extend(hash_column(t.slice(s, step)).to_pylist())
    assert whole == pieces
