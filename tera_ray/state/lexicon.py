"""Entity lexicons and the in-text mention linker (SURVEY T2).

The reference aligns whole label fields (``tera/DataIntegration.py:293-329``);
the transcript graft needs in-text mention detection against the same
lexicons (latin/common/synonym species names from
``tera/DataAggregation.py:509-527,700-704`` and chemical aliases from
``:777-794``).  The lexicon is a token-span index — a hash trie keyed on
the first token with full-span continuation lookups — built ONCE per
linker actor in ``__init__`` (north rule: "dictionary/trie lexicons
pinned per actor") and broadcast to workers via ``ray.put``.

Misspelled mentions (no exact span hit) fall back to a blocked fuzzy
lookup: candidates bucketed by (first-2-chars, token-count), scored with
a banded Levenshtein (max distance 2) — the distributed analog of the
reference's fuzzywuzzy ``extractOne`` (``DataIntegration.py:263-272``),
but bounded by blocking instead of O(N×M).
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute

_WORD_SPLIT = re.compile(r"\s+")
_STRIP_PUNCT = ".,;:()[]{}\"'!?"
# RE2 class equivalent to Python's Unicode \s (pc.split_pattern_regex
# runs RE2, where \s is ASCII-only): C0 controls \t-\r and \x1c-\x1f,
# NEL, and the Unicode separator category (Zs/Zl/Zp).
_WS_RE2 = r"[\t-\r\x1c-\x1f\x85\p{Z}]+"


def tokenize(text: str) -> list[str]:
    """Whitespace tokens with surrounding punctuation stripped.

    Keeps unit-internal characters (``mg/L``, ``12.3``, ``^2``) intact —
    the same vocabulary ``unit_parser`` consumes (``tera/utils.py:52-99``).
    """
    out = []
    for tok in _WORD_SPLIT.split(text):
        tok = tok.strip(_STRIP_PUNCT)
        if tok:
            out.append(tok)
    return out


def normalize(span: str) -> str:
    return span.lower()


def flat_token_arrays(texts: pa.Array):
    """Vectorized :func:`tokenize` over a whole string column.

    Arrow kernels do the splitting / punctuation-trimming / lowering
    (split_pattern_regex → list_flatten → utf8_trim → utf8_lower), so no
    per-token Python runs.  Returns ``(orig, low, starts)``: flat token
    arrays (original-case and lowered) plus an ``int64`` offset vector —
    document ``d``'s tokens live at ``starts[d]:starts[d+1]``.  Null /
    empty texts contribute zero tokens, matching the row-wise path's
    ``if not text: continue``.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pa.compute.split_pattern_regex(texts, pattern=_WS_RE2)
    flat = pa.compute.list_flatten(toks)
    parents = pa.compute.list_parent_indices(toks)
    trimmed = pa.compute.utf8_trim(flat, characters=_STRIP_PUNCT)
    keep = pa.compute.greater(pa.compute.utf8_length(trimmed), 0)
    orig = trimmed.filter(keep)
    par = parents.filter(keep)
    low = pa.compute.utf8_lower(orig)
    starts = np.zeros(n_docs + 1, np.int64)
    if len(par):
        counts = np.bincount(
            par.to_numpy(zero_copy_only=False).astype(np.int64),
            minlength=n_docs)
        np.cumsum(counts, out=starts[1:])
    return orig, low, starts


def levenshtein(a: str, b: str, maxd: int = 2) -> int:
    """Banded Levenshtein distance, early-exit above ``maxd``."""
    la, lb = len(a), len(b)
    if abs(la - lb) > maxd:
        return maxd + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        best = j
        bj = b[j - 1]
        for i in range(1, la + 1):
            c = prev[i - 1] + (a[i - 1] != bj)
            c2 = min(prev[i] + 1, cur[i - 1] + 1)
            cur[i] = c if c < c2 else c2
            if cur[i] < best:
                best = cur[i]
        if best > maxd:
            return maxd + 1
        prev = cur
    return prev[la]


def levenshtein_batch(a: str, mat: np.ndarray, lens: np.ndarray,
                      maxd: int = 2) -> np.ndarray:
    """Levenshtein distance of ``a`` against K padded candidates at once.

    ``mat``: (K, Lmax) uint32 codepoints, 0-padded; ``lens``: true
    lengths.  One vectorized DP row per char of ``a``; the serial
    insertion dependency becomes a min-plus prefix scan
    (``min_k(cur_k + (j-k))`` = ``minimum.accumulate(cur - j) + j``).
    Early-exits when every lane's row minimum exceeds ``maxd``.
    Returns distances clipped to ``maxd + 1``.
    """
    K, Lmax = mat.shape
    la = len(a)
    big = np.int32(maxd + 1)
    out = np.full(K, big, np.int32)
    feasible = np.abs(lens - la) <= maxd
    if not feasible.any() or la == 0:
        if la == 0:
            out[lens <= maxd] = lens[lens <= maxd].astype(np.int32)
        return out
    # DP only over the length-feasible lanes (|len-la| <= maxd), with
    # columns clipped to their max length — blocks mix lengths freely
    # (key is a 2-char prefix + token count), so this cuts both DP
    # dimensions: measured ~4x on the fixture's largest block
    idx = np.flatnonzero(feasible)
    lens_f = lens[idx]
    lmax = int(lens_f.max())
    mat_f = mat[idx, :lmax]
    kf = len(idx)
    acodes = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    j_idx = np.arange(lmax + 1, dtype=np.int32)
    prev = np.broadcast_to(j_idx, (kf, lmax + 1)).copy()
    for i in range(1, la + 1):
        sub = prev[:, :-1] + (mat_f != acodes[i - 1])
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cur[:, 1:] = np.minimum(prev[:, 1:] + 1, sub)
        # insertion via min-plus prefix scan along j
        t = cur - j_idx
        np.minimum.accumulate(t, axis=1, out=t)
        cur = t + j_idx
        if cur.min() > maxd:
            return out
        prev = cur
    d = prev[np.arange(kf), lens_f]
    np.minimum(d, big, out=d)
    out[idx] = d
    return out


def _pack_spans(spans: list[str]):
    """Candidate list → (codepoint matrix, lengths) for levenshtein_batch."""
    lens = np.array([len(s) for s in spans], np.int64)
    lmax = int(lens.max(initial=1))
    mat = np.zeros((len(spans), lmax), np.uint32)
    for k, s in enumerate(spans):
        mat[k, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


@dataclass
class Lexicon:
    """Alias → entity-URI index over token spans.

    ``spans``: first-token → {full normalized span → (entity_uri, kind)};
    ``max_len``: longest alias token count (bounds span probing);
    ``fuzzy_blocks``: (first-2-chars, n_tokens) → [(span, uri, kind)].
    """

    spans: dict[str, dict[str, tuple[str, str]]] = field(default_factory=dict)
    max_len: int = 1
    # (prefix2, n_tokens) → (sorted [(span, uri, kind)], packed codepoint
    # matrix, lengths, lower-origin mask) — see build_fuzzy
    fuzzy_blocks: dict = field(default_factory=dict)

    def __post_init__(self):
        self._fuzzy_memo: dict[tuple[str, bool], tuple[str, str] | None] = {}
        self._first_set: pa.Array | None = None
        self._len_sets: dict[int, pa.Array] | None = None
        self._fuzzy_pfx_set: pa.Array | None = None
        self._fuzzy_pfx_low_set: pa.Array | None = None
        self._lower_spans: set[str] = set()
        self._lower_pfx: set[str] = set()

    def add(self, alias: str, uri: str, kind: str) -> None:
        toks = tokenize(normalize(alias))
        if not toks:
            return
        span = " ".join(toks)
        self.spans.setdefault(toks[0], {}).setdefault(span, (uri, kind))
        if alias.lstrip()[:1].islower():
            # lowercase-ORIGIN alias (a common name, not a proper noun):
            # lowercase text tokens may fuzzy-match it — see build_fuzzy
            self._lower_spans.add(span)
        self._first_set = None
        self._len_sets = None
        if len(toks) > self.max_len:
            self.max_len = len(toks)

    def _span_len_sets(self) -> dict[int, pa.Array]:
        """Per-token-count span value-sets for the vectorized n-gram
        ``is_in`` probe (lazy; rebuilt per actor after broadcast)."""
        if self._len_sets is None:
            by_len: dict[int, list[str]] = defaultdict(list)
            for d in self.spans.values():
                for span in d:
                    by_len[span.count(" ") + 1].append(span)
            self._len_sets = {ln: pa.array(sorted(vs), pa.string())
                              for ln, vs in by_len.items()}
        return self._len_sets

    def build_fuzzy(self) -> None:
        """Blocking index for misspelling fallback.  Block key =
        (2-char prefix, token count); fixture misspellings mutate at
        char position >= 2 (``sources/synthetic.py``), so the prefix
        block retains recall — the blocking-recall assumption is tested
        in tests/test_linker.py.

        Each block is packed once into a codepoint matrix so a query
        span scores ALL block candidates in one vectorized
        ``levenshtein_batch`` call instead of K Python DP runs — this is
        the cold-path cost (distinct misspelled spans never hit the
        memo, and with dump-scale lexicons a block holds hundreds of
        candidates).

        Case-aware gating (the recall path for misspelled COMMON
        names): an uppercase-starting text token may fuzzy-match any
        alias; a lowercase-starting one only aliases whose ORIGINAL
        surface form started lowercase (common names — "zebrafish",
        "water flea").  Ordinary lowercase words stay excluded by the
        2-char-prefix block plus the lower-origin candidate mask, so
        precision doesn't pay for the recall.
        """
        blocks: dict[tuple[str, int], list[tuple[str, str, str]]] = defaultdict(list)
        for first, d in self.spans.items():
            for span, (uri, kind) in d.items():
                blocks[(span[:2], span.count(" ") + 1)].append((span, uri, kind))
        packed = {}
        low = self._lower_spans
        lower_pfx = set()
        for key, items in blocks.items():
            items.sort()  # deterministic candidate order
            spans = [s for s, _, _ in items]
            mat, lens = _pack_spans(spans)
            low_mask = np.array([s in low for s in spans], bool)
            if low_mask.any():
                lower_pfx.add(key[0])
            packed[key] = (items, mat, lens, low_mask)
        self.fuzzy_blocks = packed
        self._lower_pfx = lower_pfx
        self._fuzzy_pfx_set = None
        self._fuzzy_pfx_low_set = None

    # --- matching ---
    def match_tokens(
        self, tokens: list[str], fuzzy: bool = True
    ) -> list[tuple[int, int, str, str]]:
        """Longest-match scan: returns (start, n_tokens, uri, kind)."""
        norm = [t.lower() for t in tokens]
        out = []
        i, n = 0, len(tokens)
        while i < n:
            first = norm[i]
            d = self.spans.get(first)
            hit = None
            if d is not None:
                for ln in range(min(self.max_len, n - i), 0, -1):
                    span = " ".join(norm[i : i + ln])
                    ent = d.get(span)
                    if ent is not None:
                        hit = (i, ln, ent[0], ent[1])
                        break
            if hit is None and fuzzy and len(first) >= 4:
                upper = tokens[i][:1].isupper()
                if upper or first[:2] in self._lower_pfx:
                    hit = self._fuzzy_at(norm, i, n, upper)
            if hit is not None:
                out.append(hit)
                i += hit[1]
            else:
                i += 1
        return out

    def _fuzzy_span(self, span: str, ln: int, upper: bool = True):
        """Memoized blocked-fuzzy lookup of one normalized span.

        ``upper``: the TEXT token started uppercase — it may match any
        alias; lowercase tokens only lower-origin aliases (build_fuzzy).
        Transcripts repeat surface forms constantly (both real aliases
        and common capitalized words), so the banded-Levenshtein block
        scan runs once per distinct (span, case) per actor, not per
        occurrence.
        """
        memo = self._fuzzy_memo
        mkey = (span, upper)
        if mkey in memo:
            return memo[mkey]
        res = None
        blk = self.fuzzy_blocks.get((span[:2], ln))
        if blk is not None:
            items, mat, lens, low_mask = blk
            if upper or low_mask.any():
                dists = levenshtein_batch(span, mat, lens, 2)
                ok = dists <= 2
                if not upper:
                    ok &= low_mask
                if ok.any():
                    bkey = None
                    for k in np.flatnonzero(ok):
                        cspan, uri, kind = items[k]
                        key = (int(dists[k]), cspan, uri)  # deterministic
                        if bkey is None or key < bkey:
                            bkey, res = key, (uri, kind)
        if len(memo) < 1_000_000:
            memo[mkey] = res
        return res

    def _fuzzy_at(self, norm, i: int, n: int, upper: bool = True):
        # block key = (first-2-chars, token count) and the fuzzy gate
        # guarantees len(norm[i]) >= 4, so block existence is decidable
        # from the first token alone — skip span construction (join) and
        # memo churn for the (common) absent-block probes
        pfx = norm[i][:2]
        blocks = self.fuzzy_blocks
        for ln in range(min(self.max_len, n - i), 0, -1):
            if (pfx, ln) not in blocks:
                continue
            span = " ".join(norm[i : i + ln])
            res = self._fuzzy_span(span, ln, upper)
            if res is not None:
                # longest span wins (loop order)
                return (i, ln, res[0], res[1])
        return None

    def match_flat(self, orig: pa.Array, low: pa.Array, starts: np.ndarray,
                   fuzzy: bool = True):
        """Batch equivalent of per-document :meth:`match_tokens` over the
        flat token arrays of :func:`flat_token_arrays`.

        Exact matching is fully vectorized: for every span length ``ln``
        the lexicon holds, an n-gram key array is built with ONE Arrow
        ``binary_join_element_wise`` over shifted views of ``low`` and
        probed with ``is_in`` against the per-length span set — the
        whole batch's phrase lookups run as C++ kernels, and Python
        touches only the actual hit positions (longest ``ln`` wins,
        doc-boundary-masked).  The greedy non-overlap resolution and the
        blocked-fuzzy fallback (uppercase-start + length≥4 misses) then
        scan just ``hits ∪ fuzzy-candidates``.  Returns ``(doc_ids,
        uris, kinds)`` in per-document scan order — the same hit
        sequence ``match_tokens`` yields row-wise (asserted in
        tests/test_transcripts.py).
        """
        doc_ids: list[int] = []
        uris: list[str] = []
        kinds: list[str] = []
        n_tok = len(low)
        if n_tok == 0:
            return doc_ids, uris, kinds
        pcm = pa.compute
        low_np = None
        # token → owning doc (counts-repeat; O(n_tok), no search)
        counts = np.diff(starts)
        tok_doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        # exact n-gram probe, ascending ln so the longest span wins
        best: dict[int, tuple[int, str, str]] = {}
        for ln, sset in sorted(self._span_len_sets().items()):
            if ln > n_tok:
                continue
            if ln == 1:
                keys = low
                mask = pcm.is_in(low, value_set=sset).to_numpy(
                    zero_copy_only=False)
            else:
                parts = [low.slice(i, n_tok - ln + 1) for i in range(ln)]
                keys = pcm.binary_join_element_wise(*parts, " ")
                mask = pcm.is_in(keys, value_set=sset).to_numpy(
                    zero_copy_only=False)
                # doc-boundary mask: all ln tokens in the same doc
                mask &= tok_doc[: n_tok - ln + 1] == tok_doc[ln - 1:]
            hp = np.flatnonzero(mask)
            if hp.size == 0:
                continue
            if low_np is None:
                low_np = low.to_numpy(zero_copy_only=False)
            kstr = (low_np[hp] if ln == 1
                    else keys.take(pa.array(hp)).to_pylist())
            spans_d = self.spans
            for p, k in zip(hp.tolist(), kstr):
                uri, kind = spans_d[low_np[p]][k]
                best[p] = (ln, uri, kind)
        if fuzzy:
            # a fuzzy candidate can only hit if its 2-char prefix keys
            # SOME block — vectorized prefilter kills the (dominant)
            # capitalized-but-unmatchable positions before the scan.
            # Case-aware: uppercase tokens probe any block; lowercase
            # tokens only prefixes owning a lower-origin alias (common
            # names), so ordinary words stay out (see build_fuzzy).
            if self._fuzzy_pfx_set is None:
                self._fuzzy_pfx_set = pa.array(
                    sorted({p for p, _ in self.fuzzy_blocks}), pa.string())
            if self._fuzzy_pfx_low_set is None:
                self._fuzzy_pfx_low_set = pa.array(
                    sorted(self._lower_pfx), pa.string())
            len_ok = pcm.greater_equal(pcm.utf8_length(low), 4)
            pfx2 = pcm.utf8_slice_codeunits(low, 0, 2)
            up_np = pcm.and_(
                pcm.and_(pcm.match_substring_regex(orig, r"^\p{Lu}"),
                         len_ok),
                pcm.is_in(pfx2, value_set=self._fuzzy_pfx_set),
            ).to_numpy(zero_copy_only=False)
            lo_np = (pcm.and_(
                pcm.and_(pcm.invert(pcm.match_substring_regex(
                    orig, r"^\p{Lu}")), len_ok),
                pcm.is_in(pfx2, value_set=self._fuzzy_pfx_low_set),
            ).to_numpy(zero_copy_only=False)
                if len(self._fuzzy_pfx_low_set) else None)
            fz_np = up_np if lo_np is None else (up_np | lo_np)
            cand = np.union1d(np.fromiter(best, np.int64, len(best)),
                              np.flatnonzero(fz_np))
        else:
            fz_np = up_np = None
            cand = np.sort(np.fromiter(best, np.int64, len(best)))
        if cand.size == 0:
            return doc_ids, uris, kinds
        if low_np is None:
            low_np = low.to_numpy(zero_copy_only=False)
        max_len = self.max_len
        cur_doc, next_allowed = -1, -1
        for p, dc in zip(cand.tolist(), tok_doc[cand].tolist()):
            if dc != cur_doc:
                cur_doc, next_allowed = dc, -1
            if p < next_allowed:
                continue
            hit = best.get(p)
            if hit is None and fz_np is not None and fz_np[p]:
                end = int(starts[dc + 1])
                pfx = low_np[p][:2]
                upper = bool(up_np[p])
                for ln in range(min(max_len, end - p), 0, -1):
                    if (pfx, ln) not in self.fuzzy_blocks:
                        continue
                    res = self._fuzzy_span(" ".join(low_np[p: p + ln]),
                                           ln, upper)
                    if res is not None:
                        hit = (ln, res[0], res[1])
                        break
            if hit is not None:
                doc_ids.append(dc)
                uris.append(hit[1])
                kinds.append(hit[2])
                next_allowed = p + hit[0]
        return doc_ids, uris, kinds


def lexicon_from_tables(
    species: pa.Table | None = None,
    synonyms: pa.Table | None = None,
    chemicals: pa.Table | None = None,
    endpoints: list[str] = (),
    effects: list[str] = (),
    ns: str = "https://cfpub.epa.gov/ecotox/",
) -> Lexicon:
    """Build the mention lexicon from the same tables the label emitters
    consume (``emit_taxa``/``emit_synonyms``/``emit_chemicals``), so the
    linker and the KG agree on entity URIs.
    """
    lex = Lexicon()
    if species is not None:
        nums = species["species_number"].to_pylist()
        for col, kind in [("latin_name", "species"), ("common_name", "species")]:
            for num, alias in zip(nums, species[col].to_pylist()):
                if alias:
                    lex.add(alias, ns + "taxon/" + num, kind)
    if synonyms is not None:
        for num, alias in zip(
            synonyms["species_number"].to_pylist(), synonyms["latin_name"].to_pylist()
        ):
            if alias:
                lex.add(alias, ns + "taxon/" + num, "species")
    if chemicals is not None:
        for cas, names in zip(
            chemicals["cas_number"].to_pylist(), chemicals["chemical_name"].to_pylist()
        ):
            if not names:
                continue
            for alias in names.split(", "):
                lex.add(alias, ns + "cas/" + cas, "chemical")
    for ep in endpoints:
        lex.add(ep, ns + "endpoint/" + ep, "endpoint")
    for ef in effects:
        lex.add(ef, ns + "effect/" + ef, "effect")
    lex.build_fuzzy()
    return lex
