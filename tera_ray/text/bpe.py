"""Distributed BPE tokenizer training (engine-first addition).

Classic byte-pair-encoding training loops "count adjacent symbol pairs
→ merge the most frequent" over a WORD-FREQUENCY table, not the raw
corpus — the standard trick (Sennrich et al. 2016, arXiv:1508.07909)
that makes each round O(distinct words), and the reason this scales:
at 100 TB the corpus never participates in the loop, only the
aggregated pretoken table does.

Decomposition per merge round:

1. **Pair counting** — ``map_batches`` over the word table emits
   per-batch partial ``(pair_key, count)`` rows (numpy: one flat id
   array + word-boundary mask + ``np.unique`` fold, weighted by word
   frequency); a combiner-first ``grouped_agg`` sums them.  Shuffle
   volume = distinct pairs per batch, never word rows.
2. **Argmax** — each result batch forwards ONLY its rows tied at the
   batch max (any global-max row has count ≥ its batch's max, so it is
   always forwarded); the driver resolves the global max and breaks
   ties deterministically by the pair's resolved strings (lexicographic
   smallest), so training is reproducible regardless of partitioning.
3. **Merge application** — one vectorized pass over the word table:
   hits = adjacent (a, b) within word boundaries; overlapping hits
   (only possible in runs like ``aaa``) resolve leftmost-first by
   run-parity; merged positions collapse in a single ``np.delete``.
   The table is re-``materialize``d每 round so round *t* never re-runs
   the previous *t−1* passes (the loop state is the word table —
   O(distinct pretokens), object-store resident).

Symbols are integer ids: initial symbols are Unicode CODEPOINTS (no
driver-side alphabet discovery pass needed); merge *r* mints id
``0x110000 + r``.  A pair key packs ``left << 32 | right`` into int64.

``bpe_train`` returns the ordered merge table (rank, left, right,
merged string, count); ``bpe_encode`` applies it to any text column
(broadcast merges, same vectorized kernel per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERGE_BASE = 0x110000          # first id past valid Unicode codepoints


# ---------------------------------------------------------------------------
# word table

def word_counts(ds, text_col: str = "text", lowercase: bool = True):
    """corpus → (word, freq) Dataset: per-batch partial counts + one
    combiner-first grouped sum (the distinct-word shuffle)."""
    from ..query.relational import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        if lowercase:
            text = pc.utf8_lower(text)
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text),
                                      r"\s+").flatten()
        toks = toks.filter(pc.not_equal(toks, ""))
        vals = toks.to_numpy(zero_copy_only=False).astype(object)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table({"word": pa.array(uniq.astype(str), pa.string()),
                         "freq": pa.array(cnt.astype(np.int64))})

    return grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["word"], [("freq", "sum", "freq")])


# ---------------------------------------------------------------------------
# vectorized symbol kernels

def _to_symbols(t: pa.Table) -> pa.Table:
    """(word, freq) → (freq, syms list<int32>): codepoint ids."""
    words = t["word"]
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    w = words.to_numpy(zero_copy_only=False)
    lens = np.fromiter((len(x) for x in w), np.int64, len(w))
    flat = np.empty(int(lens.sum()), np.int64)
    pos = 0
    for x in w:                  # once per DISTINCT word, not per token
        n = len(x)
        flat[pos:pos + n] = np.frombuffer(x.encode("utf-32-le"),
                                          np.uint32).astype(np.int64)
        pos += n
    offsets = np.zeros(len(w) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    syms = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), pa.array(flat, pa.int64()))
    return pa.table({"freq": t["freq"], "syms": syms})


def _flat_syms(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """syms column → (flat ids, offsets, per-position word index)."""
    col = t["syms"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    word_of = np.repeat(np.arange(len(lens)), lens)
    return flat, offsets, word_of


def _pair_partials(t: pa.Table) -> pa.Table:
    """per-batch (pair_key, cnt) partial counts, freq-weighted."""
    empty = pa.table({"pair": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    flat, offsets, word_of = _flat_syms(t)
    n = len(flat)
    if n < 2:
        return empty
    freq = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
    same_word = word_of[1:] == word_of[:-1]
    if not same_word.any():
        return empty
    left = flat[:-1][same_word]
    right = flat[1:][same_word]
    w = freq[word_of[:-1][same_word]]
    key = (left << np.int64(32)) | right
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
    return pa.table({"pair": pa.array(uniq, pa.int64()),
                     "cnt": pa.array(cnt, pa.int64())})


def _batch_max_rows(t: pa.Table) -> pa.Table:
    """Forward only the rows tied at this batch's max count — the only
    possible global-argmax candidates from this batch."""
    if t.num_rows == 0:
        return t
    m = pc.max(t["cnt"])
    return t.filter(pc.equal(t["cnt"], m))


def _apply_merge(flat: np.ndarray, offsets: np.ndarray, word_of: np.ndarray,
                 a: int, b: int, z: int):
    """One merge (a, b) → z over the flat symbol array; returns the new
    (flat, offsets).  Leftmost-first on overlapping runs (``aaa`` with
    pair (a, a) → ``[z, a]``) via run-parity."""
    n = len(flat)
    if n < 2:
        return flat, offsets
    hits = (flat[:-1] == a) & (flat[1:] == b) & (word_of[1:] == word_of[:-1])
    if not hits.any():
        return flat, offsets
    # overlap = consecutive hit positions sharing a symbol; keep even
    # offsets within each maximal run of consecutive hits
    hpos = np.flatnonzero(hits)
    run_start = np.ones(len(hpos), dtype=bool)
    run_start[1:] = np.diff(hpos) > 1
    run_id = np.cumsum(run_start) - 1
    pos_in_run = np.arange(len(hpos)) - np.flatnonzero(run_start)[run_id]
    keep_hit = hpos[pos_in_run % 2 == 0]
    out = flat.copy()
    out[keep_hit] = z
    removed = keep_hit + 1
    keep_mask = np.ones(n, dtype=bool)
    keep_mask[removed] = False
    new_flat = out[keep_mask]
    # new word lengths → offsets
    lens = np.diff(offsets)
    drop_per_word = np.bincount(word_of[removed], minlength=len(lens))
    new_lens = lens - drop_per_word
    new_offsets = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(new_lens, out=new_offsets[1:])
    return new_flat, new_offsets


def _sym_str(sym: int, merged_str: dict) -> str:
    return merged_str[sym] if sym >= _MERGE_BASE else chr(sym)


def pair_counts(ds, text_col: str = "text", lowercase: bool = True):
    """FIRST-round BPE pair statistics: freq-weighted counts of
    adjacent codepoint pairs over the distinct-word table — the
    SQL-oracleable face of :func:`bpe_train` (r2 verdict item #7: the
    iterative argmax is non-SQL, but the pair-count table every round
    reduces over IS).  ``pair`` packs ``left_codepoint << 32 | right``
    (mirror oracles with DuckDB ``unicode(substring(word, g, 1))``)."""
    from ..query.relational import grouped_agg

    wc = word_counts(ds, text_col=text_col, lowercase=lowercase)
    sy = wc.map_batches(_to_symbols, batch_format="pyarrow")
    parts = sy.map_batches(_pair_partials, batch_format="pyarrow")
    return grouped_agg(parts, ["pair"], [("cnt", "sum", "cnt")])


# ---------------------------------------------------------------------------
# training loop

def bpe_train(ds, text_col: str = "text", n_merges: int = 32,
              lowercase: bool = True, min_count: int = 1) -> pa.Table:
    """Train ``n_merges`` BPE merges over the corpus; returns the merge
    table ``(rank, left, right, merged, count)`` with left/right/merged
    as resolved strings.  Stops early when no pair reaches
    ``min_count``.  See module docstring for the per-round shape."""
    from ..query.relational import grouped_agg

    words = word_counts(ds, text_col=text_col, lowercase=lowercase)
    table = words.map_batches(_to_symbols,
                              batch_format="pyarrow").materialize()

    merged_str: dict[int, str] = {}
    rows = []
    for r in range(n_merges):
        sums = grouped_agg(
            table.map_batches(_pair_partials, batch_format="pyarrow"),
            ["pair"], [("cnt", "sum", "cnt")])
        parts = list(
            sums.map_batches(_batch_max_rows, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None))
        cand = pa.concat_tables(parts) if parts else None
        if cand is None or cand.num_rows == 0:
            break
        keys = cand["pair"].to_numpy(zero_copy_only=False)
        cnts = cand["cnt"].to_numpy(zero_copy_only=False)
        top = cnts.max()
        if top < min_count:
            break
        tied = keys[cnts == top]
        # deterministic tie-break: lexicographically smallest resolved
        # (left, right) string pair
        def pair_strs(k):
            return (_sym_str(int(k) >> 32, merged_str),
                    _sym_str(int(k) & 0xFFFFFFFF, merged_str))
        best = min(tied.tolist(), key=pair_strs)
        a, b = int(best) >> 32, int(best) & 0xFFFFFFFF
        z = _MERGE_BASE + r
        ls, rs = _sym_str(a, merged_str), _sym_str(b, merged_str)
        merged_str[z] = ls + rs
        rows.append({"rank": r, "left": ls, "right": rs,
                     "merged": ls + rs, "count": int(top),
                     "left_id": a, "right_id": b, "new_id": z})

        def apply(t: pa.Table, a=a, b=b, z=z) -> pa.Table:
            if t.num_rows == 0:
                return t
            flat, offsets, word_of = _flat_syms(t)
            nf, no = _apply_merge(flat, offsets, word_of, a, b, z)
            syms = pa.LargeListArray.from_arrays(
                pa.array(no, pa.int64()), pa.array(nf, pa.int64()))
            return pa.table({"freq": t["freq"], "syms": syms})

        table = table.map_batches(apply,
                                  batch_format="pyarrow").materialize()

    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("rank", pa.int64()), ("left", pa.string()),
        ("right", pa.string()), ("merged", pa.string()),
        ("count", pa.int64()), ("left_id", pa.int64()),
        ("right_id", pa.int64()), ("new_id", pa.int64())]))


# ---------------------------------------------------------------------------
# encoding

class BpeEncodeStage:
    """Actor-pool stage: apply a trained merge table to a text column →
    per-document token-STRING lists (merges fetched once per actor)."""

    def __init__(self, merges_ref, text_col: str = "text",
                 lowercase: bool = True):
        import ray

        m = ray.get(merges_ref) if isinstance(
            merges_ref, ray.ObjectRef) else merges_ref
        self.merges = [(int(a), int(b), int(z)) for a, b, z in zip(
            m["left_id"].to_pylist(), m["right_id"].to_pylist(),
            m["new_id"].to_pylist())]
        self.sym = {int(z): s for z, s in zip(m["new_id"].to_pylist(),
                                              m["merged"].to_pylist())}
        self.text_col = text_col
        self.lowercase = lowercase

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        if self.lowercase:
            text = pc.utf8_lower(text)
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text),
                                      r"\s+")
        toks = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        flat_words = toks.values.to_numpy(zero_copy_only=False)
        # word-level symbol arrays (the same kernel as training)
        lens = np.fromiter((len(x) for x in flat_words), np.int64,
                           len(flat_words))
        flat = np.empty(int(lens.sum()), np.int64)
        pos = 0
        for x in flat_words:
            k = len(x)
            flat[pos:pos + k] = np.frombuffer(
                x.encode("utf-32-le"), np.uint32).astype(np.int64)
            pos += k
        offsets = np.zeros(len(flat_words) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        for a, b, z in self.merges:
            word_of = np.repeat(np.arange(len(offsets) - 1),
                                np.diff(offsets))
            flat, offsets = _apply_merge(flat, offsets, word_of, a, b, z)
        # resolve ids → strings (distinct ids only)
        uniq, inv = np.unique(flat, return_inverse=True)
        strs = np.array([self.sym.get(int(u), None) or chr(int(u))
                         for u in uniq], dtype=object)
        tok_strs = pa.array(strs[inv].astype(str), pa.string()) \
            if len(flat) else pa.array([], pa.string())
        # per-document token-list offsets: words per doc → symbols per doc
        doc_off = toks.offsets.to_numpy(zero_copy_only=False)
        syms_per_word = np.diff(offsets)
        cum = np.concatenate([[0], np.cumsum(syms_per_word)])
        doc_sym_off = cum[doc_off]
        out_list = pa.LargeListArray.from_arrays(
            pa.array(doc_sym_off, pa.int64()), tok_strs)
        keep = [c for c in t.schema.names if c != self.text_col]
        cols = {c: t[c] for c in keep}
        cols["tokens"] = out_list
        return pa.table(cols)


def bpe_encode(ds, merges: pa.Table, text_col: str = "text",
               lowercase: bool = True, concurrency=(1, 8)):
    """Apply a trained merge table to the corpus → ``tokens``
    (list<string>) per document; merges broadcast once per actor."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(
        BpeEncodeStage,
        fn_constructor_kwargs={"merges_ref": ref, "text_col": text_col,
                               "lowercase": lowercase},
        batch_format="pyarrow", concurrency=concurrency)
