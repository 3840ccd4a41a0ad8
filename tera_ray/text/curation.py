"""Training-data curation operators: PII scrubbing, deterministic
train/val/test splits, stratified sampling, benchmark-contamination
checking, and intra-document repetition scoring.

Engine-first additions for the LLM-pipeline surface (the reference has
no document curation at all — its closest analogue is the regex scrub
in ``tera/DataAggregation.py``'s literal cleaning).  Every operator is
a stateless vectorized ``map_batches`` stage (Arrow / numpy kernels,
no shuffle) except ``contamination_check``, which broadcasts the
benchmark shingle set once via ``ray.put``.

Determinism contract: the split / sample operators hash entity ids
with FNV-1a over a salted decimal string — reproducible bit-for-bit in
SQL (see the ``_fnv_sql`` oracle helper in ``__ray_entry__.py``) and
independent of row order, partitioning, and PYTHONHASHSEED, so a rerun
or a resumed job assigns every row the same way.  At 100 TB this is
the property that matters: membership is a pure function of the id,
never of which block a row landed in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _fnv1a_u64

# ---------------------------------------------------------------------------
# PII scrubbing

# Ordered redaction chain: URLs first (they may embed '@' and dotted
# hosts that the later patterns would half-match), then emails, dotted
# quads, phone-shaped digit runs.  RE2 syntax only (no lookaround) so
# Arrow's and DuckDB's regex engines agree exactly.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_scrub(batch: pa.Table, column: str = "text",
              out_col: str = "clean") -> pa.Table:
    """Redact PII-shaped spans, appending ``out_col`` plus one
    ``n_<kind>`` count per pattern and the total ``n_redactions``.

    Counts are taken on the text as it stands at that point in the
    chain (post previous replacements), mirroring a nested
    ``regexp_replace`` oracle.  One C-kernel pass per pattern — no
    Python-level row loop.
    """
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    counts = {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = pc.count_substring_regex(text, pat).cast(pa.int64())
        text = pc.replace_substring_regex(text, pat, token)
    out = batch.append_column(out_col, text)
    total = None
    for name, _, _ in PII_PATTERNS:
        out = out.append_column(f"n_{name}", counts[name])
        total = counts[name] if total is None else pc.add(total, counts[name])
    return out.append_column("n_redactions", total)


C4_BANNED = ("javascript", "lorem ipsum", "cookie", "{")
_C4_TERMINAL = ('.', '!', '?', '"')


def c4_line_filter(batch: pa.Table, column: str = "text",
                   min_words: int = 5, min_lines: int = 1,
                   banned: tuple = C4_BANNED,
                   out_col: str = "clean") -> pa.Table:
    """C4-style LINE-level cleaning (Raffel et al. 2020, arXiv:1910.10683
    §2.2 heuristics — public rules, fresh implementation): split each
    doc on newlines, keep only lines that (a) end in terminal
    punctuation, (b) have ≥ ``min_words`` whitespace-separated words,
    and (c) contain none of the ``banned`` markers (case-insensitive);
    docs with fewer than ``min_lines`` surviving lines are DROPPED.

    Map-side and fully vectorized: the per-line predicates run as Arrow
    C kernels over the FLAT line array of the whole batch, and docs are
    rebuilt with one ``binary_join`` over a re-offset ListArray — no
    Python row or line loop.  Output: input columns + ``out_col``
    (kept lines re-joined with newlines, each line space-trimmed to
    mirror a SQL ``trim``), ``n_lines``, ``n_kept``.
    """
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if batch.num_rows == 0:
        return (batch.append_column(out_col, pa.array([], pa.string()))
                .append_column("n_lines", pa.array([], pa.int64()))
                .append_column("n_kept", pa.array([], pa.int64())))
    lines = pc.split_pattern(pc.fill_null(text, ""), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    flat = pc.utf8_trim(lines.flatten(), " ")
    keep = pc.greater_equal(
        pc.count_substring_regex(flat, r"\S+"), min_words)
    term = pc.ends_with(flat, _C4_TERMINAL[0])
    for ch in _C4_TERMINAL[1:]:
        term = pc.or_(term, pc.ends_with(flat, ch))
    keep = pc.and_(keep, term)
    lower = pc.utf8_lower(flat)
    for marker in banned:
        keep = pc.and_(keep, pc.invert(pc.match_substring(lower, marker)))
    keep_np = keep.to_numpy(zero_copy_only=False)
    # rebuild: per-doc counts of kept lines → new offsets over the
    # filtered flat array, then one vectorized join
    kept_per_doc = np.add.reduceat(
        np.concatenate([keep_np, [False]]), offsets[:-1])
    kept_per_doc = np.where(np.diff(offsets) == 0, 0, kept_per_doc)
    new_offsets = np.zeros(len(kept_per_doc) + 1, np.int64)
    np.cumsum(kept_per_doc, out=new_offsets[1:])
    rebuilt = pa.LargeListArray.from_arrays(
        pa.array(new_offsets, pa.int64()),
        flat.filter(keep).cast(pa.large_string()))
    joined = pc.binary_join(rebuilt, "\n")
    out = (batch.append_column(out_col, joined.cast(pa.string()))
           .append_column("n_lines", pa.array(
               np.diff(offsets).astype(np.int64)))
           .append_column("n_kept", pa.array(kept_per_doc.astype(np.int64))))
    return out.filter(pc.greater_equal(out["n_kept"], min_lines))


# ---------------------------------------------------------------------------
# Deterministic splits / sampling

def _salted_fnv(ids: pa.Array | pa.ChunkedArray, salt: str) -> np.ndarray:
    """FNV-1a over ``salt + str(id)`` per row → uint64.  Distinct salts
    give independent assignments (the split hash and the sample hash
    must not correlate, or val/test would oversample kept strata)."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    s = pc.cast(ids, pa.string())
    vals = s.to_numpy(zero_copy_only=False).astype(object)
    uniq, inv = np.unique(vals, return_inverse=True)
    hashed = _fnv1a_u64(np.array([salt + u for u in uniq], dtype=object))
    return hashed[inv]


def deterministic_split(batch: pa.Table, id_col: str = "doc_id",
                        splits: tuple[tuple[str, float], ...] = (
                            ("train", 0.90), ("val", 0.05), ("test", 0.05)),
                        mod: int = 10_000, salt: str = "split:") -> pa.Table:
    """Append ``split`` — a deterministic train/val/test label.

    ``bucket = fnv1a(salt + id) % mod``; labels fill cumulative weight
    ranges in order (train: [0, 9000), val: [9000, 9500), …).  Pure
    function of the id: stable under reruns, re-partitioning, and
    incremental appends — a new document never flips an old one's
    split.
    """
    h = _salted_fnv(batch[id_col], salt)
    bucket = (h % np.uint64(mod)).astype(np.int64)
    labels = np.empty(len(bucket), dtype=object)
    lo = 0
    for name, w in splits:
        hi = lo + int(round(w * mod))
        labels[(bucket >= lo) & (bucket < hi)] = name
        lo = hi
    labels[bucket >= lo] = splits[-1][0]   # rounding slack → last split
    return batch.append_column("split", pa.array(labels, pa.string()))


def stratified_sample(batch: pa.Table, strata_col: str,
                      rates: dict[str, float], id_col: str = "doc_id",
                      default_rate: float = 0.0, mod: int = 1_000_000,
                      salt: str = "sample:") -> pa.Table:
    """Filter to a per-stratum deterministic sample — the data-mixing
    primitive (e.g. keep 10% of crawl, 100% of curated sources).

    A row survives iff ``fnv1a(salt + id) % mod < rate[stratum] * mod``.
    Map-side only: no shuffle, no driver state, and the kept set is
    reproducible row-for-row across runs and cluster sizes.
    """
    h = _salted_fnv(batch[id_col], salt) % np.uint64(mod)
    strata = batch[strata_col]
    if isinstance(strata, pa.ChunkedArray):
        strata = strata.combine_chunks()
    sv = strata.to_numpy(zero_copy_only=False).astype(object)
    thresh = np.fromiter(
        (int(round(rates.get(s, default_rate) * mod)) for s in sv),
        dtype=np.uint64, count=len(sv))
    return batch.filter(pa.array(h < thresh))


def stratified_cap(ds, strata_col: str, k: int, id_col: str = "doc_id",
                   salt: str = "cap:", num_buckets: int = 64):
    """Keep AT MOST ``k`` rows per stratum — the fixed-quota companion
    to ``stratified_sample``'s rate-based filter (e.g. "cap every crawl
    domain at 10k documents" so one hot domain cannot dominate the mix).

    The kept rows are the ``k`` with the smallest ``fnv1a(salt + id)``
    (ties broken by id): a deterministic uniform-without-replacement
    draw that is stable across runs, re-partitioning, and cluster
    sizes, and — because the priority is a pure function of the id —
    incremental: re-running after appending documents only ever evicts
    rows in favour of lower-priority newcomers, never reshuffles the
    whole quota.

    Rides ``topk_per_key``'s combiner: each block contributes ≤ k rows
    per stratum to the shuffle, so the exchange is O(blocks · strata ·
    k), not O(rows).  SQL-reproducible (``row_number() OVER (PARTITION
    BY stratum ORDER BY fnv, id)`` with the ``_fnv_sql`` helper).
    """
    from ..query.relational import topk_per_key

    def add_priority(t: pa.Table) -> pa.Table:
        h = _salted_fnv(t[id_col], salt)
        # int64 view keeps Arrow sort happy; the reinterpret is order-
        # preserving only on the low 63 bits, so shift out the top bit
        # (uniformity is unaffected, SQL mirrors with % 2^63).
        pri = (h >> np.uint64(1)).astype(np.int64)
        return t.append_column("__pri", pa.array(pri))

    capped = topk_per_key(
        ds.map_batches(add_priority, batch_format="pyarrow"),
        strata_col, [("__pri", "ascending"), (id_col, "ascending")],
        k, num_buckets=num_buckets)
    return capped.map_batches(lambda t: t.drop_columns(["__pri"]),
                              batch_format="pyarrow")


def proportional_mix(ds, strata_col: str, fractions: dict,
                     total: int, id_col: str = "doc_id",
                     salt: str = "mix:", num_buckets: int = 64):
    """Domain-mixing sampler: draw a corpus of ~``total`` rows whose
    stratum composition matches ``fractions`` (``{stratum: fraction}``;
    e.g. DoReMi-style static mixing weights applied at corpus build
    time).  Per-stratum quota = ``floor(total × fraction)``; strata
    absent from ``fractions`` are dropped; a stratum smaller than its
    quota contributes everything it has (the mix is then best-effort,
    as in any finite corpus).

    The kept rows per stratum are the quota-many with the smallest
    ``fnv1a(salt + id)`` (ties by id) — the same deterministic
    uniform-without-replacement draw as :func:`stratified_cap`, so the
    selection is stable across runs/partitioning and incremental under
    appends.

    Shape: a per-batch LOCAL rank-filter first (a row outside its
    block's per-stratum top-quota cannot be in the global top-quota),
    so the single hash(stratum) shuffle moves ≤ blocks × Σ quota rows,
    never the corpus; the per-bucket pass applies the identical
    rank-filter exactly.  SQL-reproducible (``row_number() OVER
    (PARTITION BY stratum ORDER BY fnv, id) <= quota``).
    """
    import polars as pl

    from ..stages.base import bucketed_map_groups

    quotas = {s: int(total * f) for s, f in fractions.items()}
    quotas = {s: q for s, q in quotas.items() if q > 0}

    def rank_filter(t: pa.Table, exact: bool) -> pa.Table:
        # __pri is appended BEFORE any early return so empty and
        # non-empty blocks always union to the same schema
        if "__pri" not in t.schema.names:
            pri = (_salted_fnv(t[id_col], salt) >> np.uint64(1))\
                .astype(np.int64)
            t = t.append_column("__pri", pa.array(pri, pa.int64()))

        def finish(tbl: pa.Table) -> pa.Table:
            if not exact:
                return tbl
            return tbl.drop_columns(
                [c for c in ("__pri", "__b") if c in tbl.schema.names])

        if t.num_rows == 0:
            return finish(t)
        df = pl.from_arrow(t)
        df = df.filter(pl.col(strata_col).is_in(list(quotas)))
        if df.height == 0:
            return finish(t.slice(0, 0))
        df = df.sort(["__pri", id_col])
        q = pl.col(strata_col).replace_strict(
            quotas, default=0, return_dtype=pl.Int64)
        df = df.filter(
            pl.int_range(pl.len()).over(strata_col) < q)
        # cast normalizes polars' large_string back to the input schema
        return finish(pa.table(df.to_arrow()).cast(t.schema))

    def local(t: pa.Table) -> pa.Table:
        t = rank_filter(t, exact=False)
        from ..stages.base import hash_column

        h = hash_column(t, keys=(strata_col,)).to_numpy(
            zero_copy_only=False)
        return t.append_column(
            "__b", pa.array((h % num_buckets).astype(np.int32)))

    return bucketed_map_groups(
        ds.map_batches(local, batch_format="pyarrow"), "__b",
        lambda t: rank_filter(t, exact=True))


def shuffle_shards(ds, id_col: str = "doc_id", n_shards: int = 16,
                   salt: str = "shuffle:"):
    """Deterministic global shuffle + shard assignment — the terminal
    step of a training-data pipeline ("shuffle the corpus, write N
    shards").  Appends ``(shard, pos)``: ``shard = fnv1a(salt+id) %
    n_shards`` and ``pos`` = dense rank of the hash within the shard
    (ties by id) — together a reproducible random permutation that is a
    pure function of the ids: stable across runs, partitionings, and
    cluster sizes, so a resumed job re-derives identical shards.

    One shuffle keyed on the shard id; each group is exactly one output
    shard, so the per-group materialization equals the size of the file
    a writer must hold anyway — pick ``n_shards`` ≈ corpus_bytes /
    target_file_bytes (at 100 TB with 1 GB shards that is ~10⁵ groups,
    far above any worker heap's group size).  SQL-reproducible
    (``row_number() OVER (PARTITION BY shard ORDER BY fnv, id)``).
    """
    from ..stages.base import bucketed_map_groups

    def assign(t: pa.Table) -> pa.Table:
        h = _salted_fnv(t[id_col], salt)
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        pri = (h >> np.uint64(1)).astype(np.int64)  # order-preserving low-63
        return (t.append_column("__shard", pa.array(shard))
                 .append_column("__pri", pa.array(pri)))

    def rank_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("__pri", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        out = (t.append_column("shard", t["__shard"])
                .append_column("pos", pa.array(
                    np.arange(t.num_rows, dtype=np.int64))))
        return out.drop_columns(["__shard", "__pri"])

    return bucketed_map_groups(
        ds.map_batches(assign, batch_format="pyarrow"), "__shard",
        rank_group)


# ---------------------------------------------------------------------------
# Benchmark contamination

class ContaminationStage:
    """Flag documents sharing word-``n``-gram shingles with a benchmark
    set (train/test contamination screening).

    The benchmark shingle set is built ONCE driver-side (benchmarks are
    eval sets — thousands of rows, not corpus-scale; documented
    assumption) and shipped to every actor via ``ray.put``; each batch
    then scores with one ``np.isin`` against the sorted hash array.
    Use as ``ds.map_batches(ContaminationStage,
    fn_constructor_kwargs={"bench_ref": ref}, concurrency=...)``.
    """

    def __init__(self, bench_ref, n: int = 3, column: str = "text",
                 min_overlap: int = 1):
        import ray

        from ..dedup.ngram import doc_shingles

        self._doc_shingles = doc_shingles
        self.n, self.column, self.min_overlap = n, column, min_overlap
        bench = ray.get(bench_ref)
        _, sh, _ = doc_shingles(bench, n=n)
        self.bench_set = np.unique(sh)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_of, sh, sizes = self._doc_shingles(batch[self.column], n=self.n)
        hit = np.isin(sh, self.bench_set)
        overlap = np.bincount(doc_of[hit], minlength=batch.num_rows)
        return batch.append_column(
            "n_shingles", pa.array(sizes, pa.int64())
        ).append_column(
            "n_overlap", pa.array(overlap.astype(np.int64))
        ).append_column(
            "contaminated", pa.array(overlap >= self.min_overlap))


def contamination_check(ds, bench_texts: pa.Array | pa.ChunkedArray,
                        n: int = 3, column: str = "text",
                        min_overlap: int = 1, concurrency=(1, 8)):
    """Dataset wrapper: broadcast ``bench_texts`` once, score every
    batch.  Output = input columns + (n_shingles, n_overlap,
    contaminated)."""
    import ray

    if isinstance(bench_texts, pa.ChunkedArray):
        bench_texts = bench_texts.combine_chunks()
    ref = ray.put(bench_texts)
    return ds.map_batches(
        ContaminationStage,
        fn_constructor_kwargs={"bench_ref": ref, "n": n, "column": column,
                               "min_overlap": min_overlap},
        batch_format="pyarrow", concurrency=concurrency)


# ---------------------------------------------------------------------------
# Intra-document repetition

def repetition_stats(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append repetition signals: ``n_tokens``, ``n_distinct``,
    ``dup_frac`` (1 − distinct/total) and ``top_frac`` (most frequent
    token's share) — the standard boilerplate/spam filters (C4/Gopher
    style "repetition ratio" signals).

    Tokenization matches the oracle exactly: ``[a-z0-9]+`` runs of the
    lowercased text.  Per-doc distinct/top counts come from one global
    ``np.unique`` over (doc, token-id) pairs — vectorized across the
    whole batch, no per-row loop.
    """
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(text, "")), r"[^a-z0-9]+")
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = batch.num_rows
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    seg_len = np.diff(offsets)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), seg_len)[nonempty]
    vals = flat.to_numpy(zero_copy_only=False).astype(object)[nonempty]
    n_tokens = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    if len(vals):
        _, inv = np.unique(vals, return_inverse=True)
        pair, counts = np.unique(
            doc_of * np.int64(len(vals) + 1) + inv, return_counts=True)
        pair_doc = pair // np.int64(len(vals) + 1)
        n_distinct = np.bincount(pair_doc, minlength=n_docs).astype(np.int64)
        top = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top, pair_doc, counts)
    else:
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        top = np.zeros(n_docs, dtype=np.int64)
    safe = np.maximum(n_tokens, 1).astype(np.float64)
    # round-half-even at 1e-6, the exact sequence SQL reproduces (see
    # quality_stats for why pc.round(ndigits=) drifts by 1 ulp)
    def r6(x):
        return np.round(x * 1e6) / 1e6

    # empty docs have no repetition (not 1 − 0/1 = 1)
    dup_frac = r6(np.where(n_tokens > 0, 1.0 - n_distinct / safe, 0.0))
    top_frac = r6(top / safe)
    out = batch
    for name, arr in [("n_tokens", n_tokens), ("n_distinct", n_distinct)]:
        out = out.append_column(name, pa.array(arr))
    for name, arr in [("dup_frac", dup_frac), ("top_frac", top_frac)]:
        out = out.append_column(name, pa.array(arr, pa.float64()))
    return out


def leakage_safe_split(docs, dedup_mapping, id_col: str = "doc_id",
                       splits: tuple[tuple[str, float], ...] = (
                           ("train", 0.90), ("val", 0.05), ("test", 0.05)),
                       mod: int = 10_000, salt: str = "split:",
                       max_mapping_bytes: int = 1 << 28):
    """Near-dup-aware train/val/test split: every member of a near-dup
    cluster lands on the SAME side, so no training example leaks an
    eval example's near-copy.

    ``dedup_mapping``: the ``(src, dst, score)`` canonical mapping from
    :func:`tera_ray.dedup.minhash.minhash_dedup` (non-singleton members
    only — by construction a small fraction of the corpus, broadcast
    once via ``ray.put``; at extreme duplication rates use
    ``state/linkage.rewrite_triples``'s shuffle path instead, same
    contract).  Each document resolves to ``canon_id`` (its cluster's
    min id, itself when unclustered); the split label is the standard
    :func:`deterministic_split` hash OF THE CANON id.  Output:
    ``(doc_id, canon_id, split)``.
    """
    import ray

    import pyarrow.compute as pc

    m = pa.concat_tables(
        [b for b in dedup_mapping.iter_batches(batch_format="pyarrow",
                                               batch_size=None)]
        or [pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})])
    m = pa.table({"__src": m["src"].cast(pa.string()),
                  "__dst": m["dst"].cast(pa.string())})
    assert m.nbytes <= max_mapping_bytes, (
        f"dedup mapping {m.nbytes}B exceeds broadcast bound; use the "
        "shuffle rewrite path")
    ref = ray.put(m)

    def label(t: pa.Table) -> pa.Table:
        mm = ray.get(ref)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        s = pa.table({id_col: ids, "__src": ids.cast(pa.string())})
        j = s.join(mm, keys=["__src"], join_type="left outer")
        # join may reorder; restore input order via the id column is not
        # enough (ids unique per input contract) — sort back on id_col
        canon = pc.coalesce(j["__dst"], j["__src"])
        out = pa.table({id_col: j[id_col], "canon_id": canon})
        return deterministic_split(out, id_col="canon_id", splits=splits,
                                   mod=mod, salt=salt)

    return docs.select_columns([id_col]).map_batches(
        label, batch_format="pyarrow")


def weighted_sample_per_key(ds, key: str, weight_col: str, k: int,
                            id_col: str = "doc_id",
                            salt: str = "wsample:",
                            round_digits: int = 9):
    """Deterministic weighted sampling WITHOUT replacement, per key —
    the quality-weighted data-mixing primitive (Efraimidis–Spirakis
    A-ES): each row draws priority ``u^(1/w)`` with ``u`` a salted-FNV
    uniform in (0, 1]; the k highest priorities per key win, so a row's
    inclusion probability scales with its weight yet the draw is a pure
    function of (salt, id) — stable across reruns, partitionings and
    appends.  Distributed via the :func:`topk_per_key` combiner
    (shuffle ≤ k rows per (batch, key)).  Rows with weight ≤ 0 never
    win.  Priorities are rounded to ``round_digits`` so a SQL
    ``pow(u, 1/w)`` oracle orders identically.
    """
    from ..query.relational import topk_per_key

    mod = np.uint64(1 << 53)

    def prio(t: pa.Table) -> pa.Table:
        # rows with weight <= 0 are dropped BEFORE ranking (mirroring
        # the oracle's WHERE w > 0) — a post-rank sentinel filter would
        # also drop legitimate rows whose rounded priority is exactly
        # 0.0 (u^(1/w) underflows the rounding for tiny u), a real
        # occurrence at 10^12-row scale (round-2 review finding)
        w = t[weight_col]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        wv = pc.cast(w, pa.float64())
        t = t.filter(pc.fill_null(pc.greater(wv, pa.scalar(0.0)), False))
        h = _salted_fnv(t[id_col], salt)
        u = (h % mod + np.uint64(1)).astype(np.float64) / float(1 << 53)
        w2 = t[weight_col]
        if isinstance(w2, pa.ChunkedArray):
            w2 = w2.combine_chunks()
        wv2 = w2.cast(pa.float64()).to_numpy(zero_copy_only=False)
        p = np.round(u ** (1.0 / wv2), round_digits)
        return t.append_column("__prio", pa.array(p, pa.float64()))

    out = topk_per_key(
        ds.map_batches(prio, batch_format="pyarrow"), key,
        order=[("__prio", "descending"), (id_col, "ascending")], k=k)
    return out.map_batches(lambda t: t.drop_columns(["__prio"]),
                           batch_format="pyarrow")


def chunk_windows(ds, size: int = 32, stride: int = 24,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Overlapping token-window chunking (RAG / context-window prep):
    whitespace tokens, windows of ``size`` tokens starting every
    ``stride`` (starts 0, stride, 2·stride, … < n_tokens; the final
    window is shorter).  Output one row per chunk:
    ``(id, chunk_idx, n_tokens, chunk_text)`` with tokens re-joined by
    single spaces.

    Fully map-side (no shuffle); the window fan-out is a vectorized
    polars list-slice + join, never a per-chunk Python loop.  Contrast
    with ``docs_pack_chunks`` (which PACKS many docs into fixed
    budgets); this SPLITS one doc into overlapping windows.
    """
    import polars as pl

    assert 0 < stride <= size

    def split(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(text, ""), r"\s+")
        df = pl.DataFrame({
            "id": pl.from_arrow(t[id_col].combine_chunks()
                                if isinstance(t[id_col], pa.ChunkedArray)
                                else t[id_col]),
            "toks": pl.from_arrow(toks),
        })
        # drop empty tokens (leading/trailing whitespace artifacts)
        df = df.with_columns(
            pl.col("toks").list.eval(
                pl.element().filter(pl.element() != "")).alias("toks"))
        df = df.with_columns(pl.col("toks").list.len().cast(pl.Int64)
                             .alias("__n")).filter(pl.col("__n") > 0)
        if df.height == 0:
            return pa.table({id_col: t[id_col].slice(0, 0),
                             "chunk_idx": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        df = df.with_columns(
            pl.int_ranges(0, pl.col("__n"), stride).alias("__start"))
        ex = df.explode("__start")
        ex = ex.with_columns(
            (pl.col("__start") // stride).alias("chunk_idx"),
            pl.col("toks").list.slice(pl.col("__start"), size)
            .alias("__w"))
        out = ex.select(
            pl.col("id"),
            pl.col("chunk_idx"),
            pl.col("__w").list.len().cast(pl.Int64).alias("n_tokens"),
            pl.col("__w").list.join(" ").alias("chunk_text"),
        ).to_arrow().rename_columns([id_col, "chunk_idx", "n_tokens",
                                     "chunk_text"])
        return out.cast(pa.schema([
            (id_col, t.schema.field(id_col).type),
            ("chunk_idx", pa.int64()), ("n_tokens", pa.int64()),
            ("chunk_text", pa.string())]))

    return ds.select_columns([id_col, text_col]).map_batches(
        split, batch_format="pyarrow")
