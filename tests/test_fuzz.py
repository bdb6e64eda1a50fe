"""Differential fuzzing: device/native pipeline vs the golden oracle on
randomized workloads."""

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import CallConfig
from signature_kmers_tpu.golden.call import (GoldenFunctionCaller, KmerCall,
                                             find_best_call)
from signature_kmers_tpu.models.function_caller import FunctionCaller
from signature_kmers_tpu.runtime import host
from signature_kmers_tpu.table.bucket_table import BucketKmerTable


FUNCS = (["hypothetical protein", "Alpha", "Beta", "Gamma / Delta",
          "Gamma", "Delta", "Zeta protein"]
         + [f"Fn {i}" for i in range(30)])


class TestNativeBestCallFuzz:
    @pytest.mark.skipif(not host.available(), reason="no native runtime")
    def test_random_call_lists(self):
        rng = np.random.default_rng(17)
        cfg = CallConfig()
        is_multipart = np.asarray([" / " in n for n in FUNCS], np.uint8)
        order = sorted(range(len(FUNCS)), key=lambda i: FUNCS[i])
        lex_rank = np.empty(len(FUNCS), np.int32)
        for r, i in enumerate(order):
            lex_rank[i] = r

        def fat(i):
            return "" if i == 0xFFFF else FUNCS[i]

        all_fI, all_count, offs = [], [], [0]
        call_lists = []
        for _ in range(3000):
            n = int(rng.integers(0, 7))
            fIs = rng.integers(0, len(FUNCS), n)
            counts = rng.integers(1, 15, n)
            calls = [KmerCall(i * 100, i * 100 + 50, int(c), int(f),
                              300, 30.0)
                     for i, (f, c) in enumerate(zip(fIs, counts))]
            call_lists.append(calls)
            all_fI.extend(int(f) for f in fIs)
            all_count.extend(int(c) for c in counts)
            offs.append(len(all_fI))

        kind, func, score, offset, f1, f2 = host.run_best_call(
            np.asarray(all_fI, np.int32), np.asarray(all_count, np.int32),
            np.asarray(offs, np.int64), is_multipart, lex_rank,
            cfg.merge_interior_thresh, cfg.merge_exterior_thresh,
            cfg.call_margin, cfg.pair_margin)

        n_fusion_fallback = 0
        for i, calls in enumerate(call_lists):
            want = find_best_call(calls, fat, cfg)
            if kind[i] == 3:
                n_fusion_fallback += 1
                continue  # python path used in production; skip here
            if kind[i] == 0:
                assert want.function_index == int(func[i]), i
                assert want.score == float(score[i])
                assert want.score_offset == float(offset[i])
            elif kind[i] == 2:
                assert want.function_index == 0xFFFF, i
                assert want.function == f"{FUNCS[int(f1[i])]} ?? {FUNCS[int(f2[i])]}", i
                assert want.score == float(score[i])
            else:
                assert want.function_index == 0xFFFF, i
                assert want.function == "", i
                assert want.score == 0.0, i
        # fuzz actually exercised the fusion fallback path too
        assert n_fusion_fallback > 50


class TestDeviceVsGoldenFuzz:
    def test_random_tables_and_queries(self):
        rng = np.random.default_rng(23)
        aa = alphabet.encode_seq(alphabet.AA20)
        # random corpus; random subsets stored with random stats
        corpus = aa[rng.integers(0, 20, 30000)].astype(np.uint8)
        hi, lo = alphabet.pack_codes_np(corpus)
        pk = (hi.astype(np.uint64) << 24) | lo
        _, idx = np.unique(pk, return_index=True)
        keep = rng.random(idx.shape[0]) < 0.4
        idx = idx[keep]
        n = idx.shape[0]
        avg = rng.integers(0, 500, n).astype(np.uint16)
        fn = rng.integers(0, len(FUNCS), n).astype(np.uint16)
        mean = rng.integers(100, 500, n).astype(np.uint16)
        med = rng.integers(100, 500, n).astype(np.uint16)
        var = rng.integers(0, 4000, n).astype(np.uint16)
        table = BucketKmerTable.from_stats(hi[idx], lo[idx], avg, fn, mean,
                                           med, var)
        store = {(int(hi[i]), int(lo[i])):
                 _KD(int(avg[j]), int(fn[j]), int(mean[j]), int(med[j]),
                     int(var[j]))
                 for j, i in enumerate(idx)}

        caller = FunctionCaller(table, FUNCS)
        gcaller = GoldenFunctionCaller(store.get, FUNCS)

        from signature_kmers_tpu.io.fasta import FastaRecord, SequenceBatch

        recs = []
        seqs = []
        for q in range(120):
            ln = int(rng.integers(8, 400))
            start = int(rng.integers(0, 30000 - ln))
            s = alphabet.decode_codes(corpus[start:start + ln])
            if rng.random() < 0.3:  # sprinkle ambiguity chars
                s = list(s)
                for _ in range(int(rng.integers(1, 4))):
                    s[int(rng.integers(0, ln))] = "*" if rng.random() < 0.5 else "X"
                s = "".join(s)
            seqs.append(s)
            recs.append(FastaRecord(f"q{q}", "", s))
        batch = SequenceBatch.from_records(recs)

        results = caller.call_batch(batch)
        for i, res in enumerate(results):
            calls, best, _ = gcaller.call_sequence(seqs[i])
            assert res.best.function_index == best.function_index, i
            assert res.best.function == best.function, i
            assert res.best.score == best.score, i
            assert len(res.calls) == len(calls), i
            for c, gc in zip(res.calls, calls):
                assert (c.start, c.end, c.count, c.function_index,
                        c.protein_length_median) == \
                    (gc.start, gc.end, gc.count, gc.function_index,
                     gc.protein_length_median), i


class _KD:
    def __init__(self, avg, fn, mean, med, var):
        self.avg_from_end = avg
        self.function_index = fn
        self.mean = mean
        self.median = med
        self.var = var


class TestDistanceFuzz:
    def test_matrix_distance_random(self):
        from signature_kmers_tpu.core.config import CallConfig
        from signature_kmers_tpu.golden.distance import compute_distance
        from signature_kmers_tpu.io.fasta import FastaRecord, SequenceBatch
        from signature_kmers_tpu.models.matrix_distance import MatrixDistance

        rng = np.random.default_rng(31)
        aa = alphabet.encode_seq(alphabet.AA20)
        corpus = aa[rng.integers(0, 20, 20000)].astype(np.uint8)
        hi, lo = alphabet.pack_codes_np(corpus)
        pk = (hi.astype(np.uint64) << 24) | lo
        _, idx = np.unique(pk, return_index=True)
        idx = idx[rng.random(idx.shape[0]) < 0.5]
        n = idx.shape[0]
        fn = rng.integers(0, len(FUNCS), n).astype(np.uint16)
        mean = rng.integers(100, 400, n).astype(np.uint16)
        var = np.where(rng.random(n) < 0.3, 0,
                       rng.integers(1, 20000, n)).astype(np.uint16)
        avg = rng.integers(0, 400, n).astype(np.uint16)
        med = rng.integers(100, 400, n).astype(np.uint16)
        table = BucketKmerTable.from_stats(hi[idx], lo[idx], avg, fn, mean,
                                           med, var)
        store = {(int(hi[i]), int(lo[i])):
                 _KD(int(avg[j]), int(fn[j]), int(mean[j]), int(med[j]),
                     int(var[j]))
                 for j, i in enumerate(idx)}

        recs = []
        for q in range(60):
            ln = int(rng.integers(50, 350))
            start = int(rng.integers(0, 20000 - ln))
            recs.append(FastaRecord(
                f"s{q}", "", alphabet.decode_codes(corpus[start:start + ln])))
        batch = SequenceBatch.from_records(recs)

        md = MatrixDistance(table, FUNCS)
        got = md.compute([batch])

        from signature_kmers_tpu.golden.call import GoldenFunctionCaller

        gc = GoldenFunctionCaller(store.get, FUNCS,
                                  CallConfig(ignore_hypothetical=True))
        want = compute_distance(gc, [batch])
        assert got.pairs == want.pairs
        assert got.ids == want.ids


class TestBuildSelectFuzz:
    def test_select_vs_golden_random_attrs(self):
        """Device sort+segment selection vs the dict-based golden spec on
        random attribute multisets (incl. big variances that wrap uint16
        and tie-heavy function counts)."""
        from signature_kmers_tpu.golden.build import GoldenSignatureBuilder
        from signature_kmers_tpu.models.signature_builder import (
            SignatureBuilder)

        rng = np.random.default_rng(41)
        n = 60000
        hi = rng.integers(0, 800, n).astype(np.uint32)
        lo = (hi * 31 % 101).astype(np.uint32)
        func = rng.integers(0, 6, n).astype(np.int32)
        dominant = hi % 2 == 0
        func = np.where(dominant, (hi % 6).astype(np.int32), func)
        off = rng.integers(0, 60000, n).astype(np.int32)
        # bimodal lengths -> large variances that exceed uint16
        plen = np.where(rng.random(n) < 0.5,
                        rng.integers(50, 200, n),
                        rng.integers(40000, 65000, n)).astype(np.int32)
        sid = rng.integers(0, 5000, n).astype(np.int32)

        sb = SignatureBuilder()
        got = sb._select(hi, lo, func, off, plen, sid)

        gb = GoldenSignatureBuilder()
        for i in range(n):
            key = (int(hi[i]), int(lo[i]))
            gb.kmer_attributes.setdefault(key, []).append(
                (int(func[i]), int(off[i]), int(sid[i]), int(plen[i])))
        gb.process_kmers()
        g_hi, g_lo, g_avg, g_fn, g_mean, g_med, g_var = gb.kept_arrays()

        assert len(got) == g_hi.shape[0]
        np.testing.assert_array_equal(got.hi, g_hi)
        np.testing.assert_array_equal(got.lo, g_lo)
        np.testing.assert_array_equal(got.function_index, g_fn)
        np.testing.assert_array_equal(got.avg_from_end, g_avg)
        np.testing.assert_array_equal(got.mean, g_mean)
        np.testing.assert_array_equal(got.median, g_med)
        np.testing.assert_array_equal(got.var, g_var)
        assert sb.stats.seqs_with_a_signature == gb.stats.seqs_with_a_signature
