"""Tests for the golden (oracle) build / call / distance implementations."""

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import BuildConfig, CallConfig, DistanceConfig
from signature_kmers_tpu.core.function_map import UNDEFINED_FUNCTION
from signature_kmers_tpu.golden.build import GoldenSignatureBuilder
from signature_kmers_tpu.golden import call as gcall
from signature_kmers_tpu.golden.call import (
    BestCall, GoldenFunctionCaller, KmerCall, KmerHit, find_best_call,
    process_hits)
from signature_kmers_tpu.golden.distance import compute_distance
from signature_kmers_tpu.io import fasta
from signature_kmers_tpu.utils import paths


def H(pos, fi, mean=300, median=300, var=0, avg=100):
    return KmerHit(pos, avg, fi, mean, median, var)


CFG = CallConfig()


class TestAutomaton:
    def test_simple_run(self):
        hits = [H(p, 3) for p in range(0, 50, 10)]  # 5 hits, same func
        calls = process_hits(hits, 300.0, CFG, hypo_index=0)
        assert len(calls) == 1
        c = calls[0]
        assert (c.start, c.end, c.count, c.function_index) == (0, 47, 5, 3)
        assert c.protein_length_median == 300
        assert c.protein_length_med_avg_dev == 30.0  # MAD==0 -> floor

    def test_too_few_hits(self):
        hits = [H(p, 3) for p in range(0, 40, 10)]  # 4 < min_hits
        assert process_hits(hits, 300.0, CFG, 0) == []

    def test_length_window_rejects(self):
        # mean=300, MAD floor 30 -> window [240, 360]; seqlen 500 fails
        hits = [H(p, 3) for p in range(0, 50, 10)]
        assert process_hits(hits, 500.0, CFG, 0) == []

    def test_gap_flush(self):
        hits = [H(p, 3) for p in range(0, 50, 10)]
        hits += [H(p, 3) for p in range(300, 350, 10)]  # gap 253 > 200
        calls = process_hits(hits, 300.0, CFG, 0)
        assert len(calls) == 2
        assert calls[0].end == 47
        assert calls[1].start == 300

    def test_gap_flush_small_buffer_cleared(self):
        hits = [H(0, 3), H(10, 3)]          # only 2 hits, then a big gap
        hits += [H(400 + p, 4) for p in range(0, 50, 10)]
        calls = process_hits(hits, 300.0, CFG, 0)
        assert len(calls) == 1
        assert calls[0].function_index == 4

    def test_function_switch_keeps_last_two(self):
        # 5 hits of func 3, then hits of func 4; pair of 4s triggers the
        # switch and the two pair hits seed the next run
        hits = [H(p, 3) for p in range(0, 50, 10)]
        hits += [H(50 + p, 4) for p in range(0, 40, 10)]
        calls = process_hits(hits, 300.0, CFG, 0)
        # func-3 call emitted at the switch; func-4 run has 4+? hits:
        # pair (50,60) kept + (70,80) appended -> 4 hits < 5 at the tail
        assert len(calls) == 1
        assert calls[0].function_index == 3
        assert calls[0].count == 5
        # single extra hit of 4 makes it 5
        hits += [H(100, 4)]
        calls = process_hits(hits, 300.0, CFG, 0)
        assert len(calls) == 2
        assert calls[1].function_index == 4
        assert calls[1].count == 5
        assert calls[1].start == 50  # pair kept from before the switch

    def test_interleaved_other_function_not_counted(self):
        # noise hits of another function inside a run are buffered but not
        # counted toward fI_count and do not trigger a switch (no pair)
        hits = []
        for p in range(0, 100, 10):
            hits.append(H(p, 3))
            hits.append(H(p + 5, 4 + (p // 10) % 2))  # alternating noise
        calls = process_hits(hits, 300.0, CFG, 0)
        assert any(c.function_index == 3 and c.count == 10 for c in calls)

    def test_ignore_hypothetical(self):
        hits = [H(p, 7) for p in range(0, 50, 10)]
        cfg = CallConfig(ignore_hypothetical=True)
        assert process_hits(hits, 300.0, cfg, hypo_index=7) == []
        assert len(process_hits(hits, 300.0, cfg, hypo_index=1)) == 1

    def test_start_is_first_buffered_hit(self):
        # buffer starts with a lone func-4 hit, then 5 func-3 hits arrive;
        # current_fI was set to 4 (first hit) then switches via the pair rule
        hits = [H(0, 4)] + [H(10 + p, 3) for p in range(0, 50, 10)]
        calls = process_hits(hits, 300.0, CFG, 0)
        assert len(calls) == 1
        assert calls[0].function_index == 3
        assert calls[0].count == 5
        # start = first hit of the buffer at the time of process()
        assert calls[0].start == 10


def C(fi, count, start=0, end=100, med=300, mad=30.0):
    return KmerCall(start, end, count, fi, med, mad)


FUNCS = ["hypothetical protein", "Alpha", "Beta", "Alpha / Beta", "Gamma"]


def fat(i):
    if i == UNDEFINED_FUNCTION:
        return ""
    return FUNCS[i]


class TestBestCall:
    def test_empty(self):
        b = find_best_call([], fat, CFG)
        assert b.function_index == UNDEFINED_FUNCTION
        assert b.function == ""
        assert b.score == 0.0

    def test_single_clear_winner(self):
        b = find_best_call([C(1, 12)], fat, CFG)
        assert (b.function_index, b.function, b.score) == (1, "Alpha", 12.0)
        assert b.score_offset == 12.0

    def test_collapse_adjacent(self):
        b = find_best_call([C(1, 4), C(1, 4), C(1, 4)], fat, CFG)
        assert b.score == 12.0

    def test_margin_ambiguous(self):
        b = find_best_call([C(1, 10), C(2, 8)], fat, CFG)
        assert b.function_index == UNDEFINED_FUNCTION
        # fallback names both, larger string first
        assert b.function == "Beta ?? Alpha"
        assert b.score == 10.0

    def test_margin_clear(self):
        b = find_best_call([C(1, 10), C(2, 4)], fat, CFG)
        assert b.function_index == 1
        assert b.score == 10.0
        assert b.score_offset == 6.0

    def test_bridge_merge(self):
        # A(6) x(2) A(6): interior < 5, exterior sum >= 10 -> merged A;
        # the interior count is discarded (ref: call_functions.tcc:424-433)
        b = find_best_call([C(1, 6), C(2, 2), C(1, 6)], fat, CFG)
        assert b.function_index == 1
        assert b.score == 12.0
        assert b.score_offset == 12.0  # func 2 disappeared entirely

    def test_no_bridge_when_interior_large(self):
        b = find_best_call([C(1, 6), C(2, 5), C(1, 6)], fat, CFG)
        assert b.function_index == 1
        assert b.score == 12.0
        assert b.score_offset == 7.0

    def test_fusion_called(self):
        # A-part median 200, B-part median 210, fused W median 400:
        # |((200+210)-400)|/400 = 0.025 < 0.1 -> fusion called
        calls = [C(1, 6, med=200), C(3, 6, med=400), C(2, 6, med=210)]
        b = find_best_call(calls, fat, CFG)
        assert b.function_index == 3
        assert b.function == "Alpha / Beta"
        assert b.score == 18.0  # sum of all scores

    def test_fusion_rejected_on_length(self):
        calls = [C(1, 6, med=200), C(3, 6, med=900), C(2, 6, med=210)]
        b = find_best_call(calls, fat, CFG)
        assert b.function_index != 3 or b.function != "Alpha / Beta"

    def test_three_way_pair_fallback(self):
        b = find_best_call([C(1, 10), C(2, 8), C(4, 2)], fat, CFG)
        assert b.function_index == UNDEFINED_FUNCTION
        assert b.function == "Beta ?? Alpha"
        assert b.score == 10.0
        assert b.score_offset == 6.0

    def test_three_way_no_fallback(self):
        b = find_best_call([C(1, 10), C(2, 8), C(4, 7)], fat, CFG)
        assert b.function == ""
        assert b.score == 0.0


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_golden")
    generate_corpus(root)
    builder = GoldenSignatureBuilder(BuildConfig())
    defs = paths.populate_path_list([root / "Annotations"])
    fas = paths.populate_path_list([root / "Seqs"])
    builder.load_function_data([], [], defs)
    builder.load_fasta(fas, False, set())
    builder.process_kept_functions(set())
    builder.extract_kmers(set())
    builder.process_kmers()
    return root, builder


class TestGoldenBuild:
    def test_functions_kept(self, built):
        _, builder = built
        from tests.fixtures.gen_corpus import FUNCTIONS
        for fn in FUNCTIONS:
            assert fn in builder.fm.function_index_map, fn

    def test_signatures_exist_and_dominant(self, built):
        _, builder = built
        assert len(builder.kept_kmers) > 500
        # invariant: every kept k-mer satisfies the 80% rule
        for key, kk in builder.kept_kmers.items():
            attrs = builder.kmer_attributes[key]
            best = sum(1 for a in attrs if a[0] == kk.function_index)
            assert best >= 0.8 * len(attrs) - 1e-9

    def test_stats_fields(self, built):
        _, builder = built
        for kk in builder.kept_kmers.values():
            assert 0 <= kk.mean <= 0xFFFF
            assert 0 <= kk.avg_from_end <= 0xFFFF
            assert kk.function_index != UNDEFINED_FUNCTION

    def test_recall_training_set(self, built):
        root, builder = built
        store = builder.kept_kmers
        funcs = [builder.fm.index_function_map[i]
                 for i in sorted(builder.fm.index_function_map)]
        caller = GoldenFunctionCaller(store.get, funcs)
        ok = 0
        total = 0
        for f in paths.populate_path_list([root / "Seqs"]):
            for rec in fasta.iter_fasta(f):
                want = builder.fm.lookup_function(rec.id)
                _, best, _ = caller.call_sequence(rec.seq)
                total += 1
                if best.function == want:
                    ok += 1
        assert total > 0
        # conserved cores -> recall should be essentially perfect
        assert ok / total > 0.95, f"recall {ok}/{total}"

    def test_query_calls(self, built):
        root, builder = built
        store = builder.kept_kmers
        funcs = [builder.fm.index_function_map[i]
                 for i in sorted(builder.fm.index_function_map)]
        caller = GoldenFunctionCaller(store.get, funcs)
        from tests.fixtures.gen_corpus import FUNCTIONS
        results = {}
        for rec in fasta.iter_fasta(root / "Queries" / "queries.fa"):
            _, best, _ = caller.call_sequence(rec.seq)
            results[rec.id] = best
        for qi, fn in enumerate(FUNCTIONS):
            assert results[f"query.{qi}"].function == fn
        for d in range(3):
            assert results[f"decoy.{d}"].function_index == UNDEFINED_FUNCTION

    def test_distance(self, built):
        root, builder = built
        store = builder.kept_kmers
        funcs = [builder.fm.index_function_map[i]
                 for i in sorted(builder.fm.index_function_map)]
        caller = GoldenFunctionCaller(store.get, funcs,
                                      CallConfig(ignore_hypothetical=True))
        batch = fasta.SequenceBatch.from_file(root / "Queries" / "queries.fa")
        res = compute_distance(caller, [batch])
        # queries of the same family share many k-mers; different families
        # share essentially none.  The 7 family queries are distinct
        # families so only decoys/queries with shared k-mers pair up; at
        # minimum the result is well-formed and symmetric-free.
        for i1, i2, count in res.pairs:
            assert i1 < i2
            assert count > 0
