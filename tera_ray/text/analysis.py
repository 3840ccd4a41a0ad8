"""Text-analysis stages for large-scale training-data pipelines.

These are engine-first additions (not in the reference, which only does
whole-field label matching — ``tera/DataIntegration.py:293-329``): the
operations a 100 TB document-corpus pipeline needs before/next to KG
construction.  All are pure ``map_batches`` transforms over zero-copy
Arrow batches; everything vectorized via pyarrow.compute / numpy — no
per-row Python in the hot path except where a C-backed kernel does the
row loop for us.

Stages
------
- :func:`token_stats` — whitespace + BPE-ish regex token counts.
- :func:`quality_stats` — length / punctuation / stopword / alpha ratios
  and a composite ``quality`` score in [0, 1].
- :func:`langid` — character/stopword n-gram heuristic language ID.
- :func:`fingerprint` — 64-bit rolling-hash document fingerprint over
  normalized text (stable across runs and workers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: GPT-2 style contraction/word/number/punct split,
# simplified to re2-compatible syntax (no lookahead).
BPE_RE = r"'[sdmt]|'ll|'ve|'re| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

# Tiny per-language stopword profiles (public common-word lists); the
# heuristic is hit-rate of each profile over the document's token set.
_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for",
           "on", "with", "as", "was", "at", "by", "be", "this", "are", "or"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "ein", "eine",
           "zu", "den", "nicht", "im", "auf", "für", "dem", "des", "sich"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
           "en", "que", "qui", "dans", "pour", "pas", "sur", "au", "avec"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "un", "una", "del",
           "en", "que", "no", "por", "con", "para", "su", "al", "se", "lo"},
}


def _text_col(batch: pa.Table, column: str) -> pa.Array:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(col, "")


def token_stats(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``n_tokens_ws`` (whitespace tokens) and ``n_tokens_bpe``
    (BPE-ish regex pieces) to the batch.  Both counts are computed with
    Arrow C kernels (split + list_value_length), no Python loop."""
    text = _text_col(batch, column)
    # count of non-whitespace runs == whitespace-token count, exactly
    # (and exactly mirrors SQL `len(regexp_extract_all(text, '\S+'))`)
    ws = pc.count_substring_regex(text, r"\S+")
    bpe = pc.count_substring_regex(text, BPE_RE)
    return batch.append_column(
        "n_tokens_ws", ws.cast(pa.int64())
    ).append_column("n_tokens_bpe", bpe.cast(pa.int64()))


def quality_stats(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append quality signals + composite ``quality`` in [0,1].

    Signals (all vectorized):
      - ``n_chars``/``n_words``: length features
      - ``alpha_ratio``: alphabetic chars / all chars
      - ``punct_ratio``: punctuation chars / all chars
      - ``stopword_ratio``: English-stopword tokens / tokens
      - ``mean_word_len``
    Composite ``quality`` mirrors common heuristic filters (Gopher/C4
    style: prefer moderate length, low punct, some stopwords).
    """
    text = _text_col(batch, column)
    n_chars = pc.utf8_length(text).cast(pa.float64())
    n_alpha = pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.float64())
    n_punct = pc.count_substring_regex(
        text, r"[!-/:-@\[-`{-~]").cast(pa.float64())
    n_words = pc.count_substring_regex(text, r"\S+").cast(pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_words = pc.max_element_wise(n_words, pa.scalar(1.0))
    alpha_ratio = pc.divide(n_alpha, safe_chars)
    punct_ratio = pc.divide(n_punct, safe_chars)
    # stopword hits: count of occurrences of any EN stopword as a word
    sw_re = r"(?i)\b(" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"
    n_sw = pc.count_substring_regex(text, sw_re).cast(pa.float64())
    stopword_ratio = pc.min_element_wise(
        pc.divide(n_sw, safe_words), pa.scalar(1.0))
    mean_word_len = pc.divide(n_alpha, safe_words)

    # Composite: product of clamped sub-scores.
    def clamp01(x):
        return pc.min_element_wise(
            pc.max_element_wise(x, pa.scalar(0.0)), pa.scalar(1.0))

    len_score = clamp01(pc.divide(n_chars, pa.scalar(200.0)))
    punct_score = clamp01(pc.subtract(pa.scalar(1.0),
                                      pc.multiply(punct_ratio, pa.scalar(3.0))))
    sw_score = clamp01(pc.multiply(stopword_ratio, pa.scalar(4.0)))
    quality = pc.multiply(pc.multiply(len_score, punct_score),
                          pc.max_element_wise(sw_score, pa.scalar(0.1)))
    out = batch
    for name, col in [
        ("alpha_ratio", alpha_ratio), ("punct_ratio", punct_ratio),
        ("stopword_ratio", stopword_ratio), ("mean_word_len", mean_word_len),
        ("quality", quality),
    ]:
        # explicit scale → round-half-even → unscale: the exact IEEE
        # sequence SQL engines reproduce (``round_even(x*1e6, 0)/1e6``),
        # so oracle comparisons agree to the bit; ``pc.round(ndigits=6)``
        # takes a different internal path and drifts by 1 ulp on values
        # like 0.086
        scaled = pc.round(pc.multiply(col, pa.scalar(1e6)), ndigits=0)
        out = out.append_column(name, pc.divide(scaled, pa.scalar(1e6)))
    return out


def langid(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``lang_pred`` — argmax stopword-profile hit rate, with an
    ``und`` fallback when nothing matches (or non-Latin script dominates,
    detected via non-ASCII ratio → ``zh`` bucket for CJK).

    One pass per language profile, each a single vectorized
    ``count_substring_regex`` over the batch — O(|langs|) kernels total.
    """
    text = _text_col(batch, column)
    n = len(text)
    n_words = pc.max_element_wise(
        pc.count_substring_regex(text, r"\S+").cast(pa.float64()),
        pa.scalar(1.0))
    scores = np.zeros((len(_STOPWORDS), n), dtype=np.float64)
    langs = list(_STOPWORDS)
    for i, lang in enumerate(langs):
        sw_re = r"(?i)\b(" + "|".join(sorted(_STOPWORDS[lang])) + r")\b"
        hits = pc.count_substring_regex(text, sw_re).cast(pa.float64())
        scores[i] = pc.divide(hits, n_words).to_numpy(zero_copy_only=False)
    best = scores.argmax(axis=0)
    best_score = scores.max(axis=0)
    # CJK detection: ratio of non-ASCII chars
    n_chars = pc.max_element_wise(
        pc.utf8_length(text).cast(pa.float64()), pa.scalar(1.0))
    non_ascii = pc.count_substring_regex(text, r"[^\x00-\x7F]").cast(pa.float64())
    cjk = (pc.divide(non_ascii, n_chars).to_numpy(zero_copy_only=False) > 0.3)
    pred = np.array([langs[b] for b in best], dtype=object)
    pred[best_score < 0.02] = "und"
    pred[cjk] = "zh"
    return batch.append_column("lang_pred", pa.array(pred, pa.string()))


# --- rolling-hash fingerprint ------------------------------------------------

_FP_BASE = np.uint64(1099511628211)       # FNV prime as multiplier
_FP_OFFSET = np.uint64(14695981039346656037)


def _fnv1a_u64(strings: np.ndarray) -> np.ndarray:
    """Vectorized-ish FNV-1a over an object array of strings.  The per-
    string loop is unavoidable without a C hash; cost is amortized by
    hashing distinct tokens once per batch (see fingerprint)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        h = _FP_OFFSET
        for b in s.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def hash_tokens_batch(texts: pa.Array, lowercase: bool = True):
    """texts → (list-offsets, flat uint64 token hashes).

    Tokenization + distinct-token hashing: Arrow does the split; Python
    hashes each *distinct* token once (documents repeat tokens heavily),
    then an integer take maps back — keeps the Python loop off the hot
    dimension.
    """
    if lowercase:
        texts = pc.utf8_lower(texts)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(texts), r"[^a-z0-9]+" if lowercase else r"\W+")
    flat = toks.flatten()
    offsets = toks.offsets if hasattr(toks, "offsets") else toks.combine_chunks().offsets
    vals = flat.to_numpy(zero_copy_only=False).astype(object)
    uniq, inv = np.unique(vals, return_inverse=True)
    hu = _fnv1a_u64(uniq)
    return offsets.to_numpy(zero_copy_only=False), hu[inv]


def fingerprint(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``fp64`` — order-sensitive rolling hash over token hashes
    (Rabin-Karp style: ``h = h * B + tok_hash`` per token).  Identical
    normalized token sequences ⇒ identical fingerprints; deterministic
    across processes (no PYTHONHASHSEED dependence)."""
    text = _text_col(batch, column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    offsets, tok_h = hash_tokens_batch(text)
    offsets = offsets.astype(np.int64)
    fp = np.zeros(batch.num_rows, dtype=np.uint64)
    total = len(tok_h)
    if total:
        # h = Σ tok_h[i] · B^(L-1-i)  (mod 2^64) — equivalent to the
        # rolling h = h·B + tok recurrence, but fully vectorized:
        # weights via a precomputed power table, segment sums via a
        # cumulative-sum difference (uint64 wraparound is exact mod 2^64).
        seg_len = np.diff(offsets)
        max_len = int(seg_len.max(initial=0))
        with np.errstate(over="ignore"):
            powB = np.empty(max_len + 1, dtype=np.uint64)
            powB[0] = np.uint64(1)
            for k in range(1, max_len + 1):      # O(max tokens/doc), tiny
                powB[k] = powB[k - 1] * _FP_BASE
            within = np.arange(total, dtype=np.int64) - np.repeat(
                offsets[:-1], seg_len)
            expo = np.repeat(seg_len, seg_len) - 1 - within
            prod = tok_h * powB[expo]
            csum = np.concatenate(
                [np.zeros(1, np.uint64), np.cumsum(prod, dtype=np.uint64)])
            fp = csum[offsets[1:]] - csum[offsets[:-1]]
    return batch.append_column("fp64", pa.array(fp, pa.uint64()))


# ---------------------------------------------------------------------------
# Vocabulary build + token-id encoding (the LLM-prep transform)

def build_vocab(ds, text_col: str = "text", size: int = 1000) -> pa.Table:
    """Corpus vocabulary: the top-``size`` tokens by global count (ties
    by token string) as an Arrow table ``(token, token_id)`` with ids
    1..size in rank order; id 0 is reserved for unknown.

    Tokenization is the engine-wide convention: lowercase ``\\W+``
    split, empty tokens dropped.  Counting is the Zipf-bounded
    combiner→grouped-sum plan of ``docs_top_tokens`` — the shuffle
    carries per-batch DISTINCT tokens, never the corpus; only the final
    vocab-sized count table (``size`` rows) is materialized, so the
    driver never holds corpus-scale state.
    """
    from ..query.relational import grouped_agg

    def toks(t: pa.Table) -> pa.Table:
        s = t[text_col]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(s, "")),
                                   r"\W+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "cnt": vc.field("counts")})

    counts = grouped_agg(ds.map_batches(toks, batch_format="pyarrow"),
                         ["token"], [("cnt", "sum", "cnt")])
    top = pa.concat_tables(list(
        counts.sort(["cnt", "token"], descending=[True, False]).limit(size)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    # re-sort: block order after limit() is not guaranteed
    top = top.sort_by([("cnt", "descending"), ("token", "ascending")])
    return pa.table({
        "token": top["token"],
        "token_id": pa.array(np.arange(1, top.num_rows + 1,
                                       dtype=np.int32))})


class TokenEncodeStage:
    """Actor-pool stage: text → ``list<int64>`` token-id sequences.

    The vocab dict is fetched from the object store ONCE per actor in
    ``__init__`` (``vocab_ref`` is a ``ray.put`` handle — broadcast,
    never re-shipped per batch).  Per batch the lookup runs over the
    batch's DISTINCT tokens only (np.unique + inverse), so the Python
    dict probes are Zipf-bounded, not O(tokens).
    """

    def __init__(self, vocab_ref, id_col: str = "doc_id",
                 text_col: str = "text", unk_id: int = 0):
        import ray

        vt = ray.get(vocab_ref)
        self.vocab = dict(zip(vt["token"].to_pylist(),
                              vt["token_id"].to_pylist()))
        self.id_col = id_col
        self.text_col = text_col
        self.unk = unk_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        lst = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(s, "")), r"\W+")
        flat = pc.list_flatten(lst)
        parents = pc.list_parent_indices(lst)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask).to_numpy(zero_copy_only=False)
        par = parents.filter(mask).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if len(flat):
            uniq, inv = np.unique(flat.astype(object), return_inverse=True)
            ids_u = np.fromiter((self.vocab.get(u, self.unk) for u in uniq),
                                dtype=np.int64, count=len(uniq))
            ids_flat = ids_u[inv]
        else:
            ids_flat = np.array([], np.int64)
        lens = np.bincount(par, minlength=n) if len(par) else np.zeros(n, np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        # int64 ids: the SQL-oracle side (DuckDB row_number()) is BIGINT
        # and a dtype drift would change the driver's value hash
        arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       pa.array(ids_flat, pa.int64()))
        return pa.table({self.id_col: batch[self.id_col],
                         "token_ids": arr})


def encode_token_ids(ds, vocab: pa.Table, id_col: str = "doc_id",
                     text_col: str = "text", concurrency=None):
    """documents → ``(id, token_ids list<int64>)`` using a broadcast
    vocab (see :class:`TokenEncodeStage`).  Map-side only: no shuffle,
    output row count equals input."""
    import ray

    ref = ray.put(vocab)
    return ds.map_batches(
        TokenEncodeStage,
        fn_constructor_kwargs={"vocab_ref": ref, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency if concurrency is not None else (1, 8))


def bigram_fluency(ds, id_col: str = "doc_id", text_col: str = "text",
                   num_buckets: int = 64):
    """LM-free fluency proxy: score(doc) = mean corpus frequency of the
    doc's token bigrams (occurrence multiplicity kept) — rote/templated
    text scores high, token soup scores low, without shipping a model.

    Plan: one tokenize pass emits per-doc bigram-hash OCCURRENCES and,
    separately, per-batch (hash, cnt) combiner partials; corpus counts
    are a grouped sum (shuffle = per-batch distinct bigrams,
    Zipf-bounded); occurrences ⋈ counts is ONE bucketed hash join on
    the 8-byte hash (never the string); a final per-doc grouped sum
    yields ``(id, n_bigrams, score)`` with ``score`` an exact integer
    ratio (sum of counts / n_bigrams), so the pipeline is reproducible
    in SQL on string bigrams (hash collisions aside — 2^-64 per pair).
    Docs with < 2 tokens emit nothing and are absent from the output.
    """
    from ..query.relational import grouped_agg, hash_join

    def occurrences(t: pa.Table) -> pa.Table:
        s = t[text_col]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        lst = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(s, "")), r"\W+")
        flat = pc.list_flatten(lst)
        parents = pc.list_parent_indices(lst)
        mask = pc.not_equal(flat, "")
        toks = flat.filter(mask).to_numpy(zero_copy_only=False)
        par = parents.filter(mask).to_numpy(zero_copy_only=False)
        if len(toks) < 2:
            return pa.table({id_col: t[id_col].slice(0, 0),
                             "bh": pa.array([], pa.uint64())})
        uniq, inv = np.unique(toks.astype(object), return_inverse=True)
        th = _fnv1a_u64(uniq)[inv]
        same = par[1:] == par[:-1]
        with np.errstate(over="ignore"):
            bh = th[:-1] * _FP_BASE + th[1:]
        ids = t[id_col].combine_chunks().take(
            pa.array(par[:-1][same], pa.int64()))
        return pa.table({id_col: ids, "bh": pa.array(bh[same], pa.uint64())})

    occ = ds.map_batches(occurrences, batch_format="pyarrow")

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["bh"].combine_chunks())
        return pa.table({"bh": vc.field("values"),
                         "cnt": vc.field("counts")})

    counts = grouped_agg(occ.map_batches(partial_counts,
                                         batch_format="pyarrow"),
                         ["bh"], [("cnt", "sum", "cnt")])
    joined = hash_join(occ, counts, on="bh", num_buckets=num_buckets)
    per_doc = grouped_agg(
        joined.map_batches(
            lambda t: pa.table({id_col: t[id_col], "cnt": t["cnt"],
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        [id_col], [("cnt", "sum", "sum_cnt"), ("one", "sum", "n_bigrams")])

    def finish(t: pa.Table) -> pa.Table:
        sc = pc.divide(pc.cast(t["sum_cnt"], pa.float64()),
                       pc.cast(t["n_bigrams"], pa.float64()))
        return pa.table({id_col: t[id_col], "n_bigrams": t["n_bigrams"],
                         "score": sc})

    return per_doc.map_batches(finish, batch_format="pyarrow")


def hash_embed(batch: pa.Table, column: str = "text",
               id_col: str = "doc_id", dim: int = 16, norm: bool = True,
               round_digits: int | None = 6) -> pa.Table:
    """Feature-hashing bag-of-words embedding (the "hashing trick"):
    every token occurrence adds ``sign(h)`` to slot ``h % dim`` of the
    document vector, where ``h`` is the same FNV-1a the fingerprint
    uses (deterministic, SQL-reproducible); optional L2 normalization.

    Turns raw text into fixed-width ``list<double>`` vectors with NO
    model weights, so the whole ANN stack (brute/IVF search, k-means,
    PCA, SemDeDup) runs on text corpora in-engine.  Pure per-batch map
    — no shuffle, no state.  Zero-token documents embed as the zero
    vector."""
    text = _text_col(batch, column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    offsets, tok_h = hash_tokens_batch(text)
    offsets = offsets.astype(np.int64)
    n = batch.num_rows
    V = np.zeros((n, dim), np.float64)
    if len(tok_h):
        seg_len = np.diff(offsets)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), seg_len)
        # drop EMPTY tokens (the split of "" is [''], whose FNV is the
        # offset basis) so zero-token docs embed as the zero vector
        keep = tok_h != _FP_OFFSET
        doc_of, tok_h = doc_of[keep], tok_h[keep]
        slot = (tok_h % np.uint64(dim)).astype(np.int64)
        sign = np.where((tok_h >> np.uint64(63)) == 0, 1.0, -1.0)
        np.add.at(V, (doc_of, slot), sign)
    if norm:
        nn = np.sqrt((V * V).sum(axis=1))
        nz = nn > 0
        V[nz] /= nn[nz, None]
    if round_digits is not None:
        V = np.round(V, round_digits)
    return pa.table({
        id_col: batch[id_col],
        "embedding": pa.array(V.tolist(), pa.list_(pa.float64())),
    })
