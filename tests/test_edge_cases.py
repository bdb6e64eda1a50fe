"""Edge cases: fusion calls end-to-end, empty inputs, long proteins,
order-constraint plumbing."""

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import CallConfig, DeviceConfig
from signature_kmers_tpu.golden.call import KmerHit, process_hits
from signature_kmers_tpu.io import fasta
from signature_kmers_tpu.models.function_caller import FunctionCaller
from signature_kmers_tpu.table.bucket_table import BucketKmerTable


def make_table(entries):
    """entries: list of (kmer_str, avg, func, mean, median, var)."""
    hi, lo, avg, fn, mean, med, var = [], [], [], [], [], [], []
    for k, a, f, me, md, v in entries:
        h, l = alphabet.pack_kmer_str(k)
        hi.append(h)
        lo.append(l)
        avg.append(a)
        fn.append(f)
        mean.append(me)
        med.append(md)
        var.append(v)
    return BucketKmerTable.from_stats(
        np.asarray(hi, np.uint32), np.asarray(lo, np.uint32),
        np.asarray(avg, np.uint16), np.asarray(fn, np.uint16),
        np.asarray(mean, np.uint16), np.asarray(med, np.uint16),
        np.asarray(var, np.uint16))


FUSION_FUNCS = ["Alpha part", "Beta part", "Alpha part / Beta part",
                "hypothetical protein"]


class TestFusionEndToEnd:
    def test_fusion_called_via_device_path(self):
        # Sequence with three regions: Alpha-only k-mers (part median 200),
        # fused k-mers (median 430), Beta-only k-mers (median 230).
        # (200+230-430)/430 = 0 -> fusion called with summed score.
        rng = np.random.default_rng(0)
        aa = alphabet.AA20
        seq = "".join(rng.choice(list(aa)) for _ in range(430))
        entries = []
        # alternating stored means give each part a wide MAD so the part
        # calls pass the seqlen window on the 430-residue fusion protein
        for i, p in enumerate(range(0, 60, 6)):     # Alpha: median 210
            entries.append((seq[p:p + 8], 100, 0,
                            100 if i % 2 else 320, 0, 0))
        for i, p in enumerate(range(150, 210, 6)):  # fused: median 430
            entries.append((seq[p:p + 8], 100, 2,
                            330 if i % 2 else 530, 0, 0))
        for i, p in enumerate(range(300, 360, 6)):  # Beta: median 230
            entries.append((seq[p:p + 8], 100, 1,
                            120 if i % 2 else 340, 0, 0))
        table = make_table(entries)
        caller = FunctionCaller(table, FUSION_FUNCS)
        batch = fasta.SequenceBatch.from_records(
            [fasta.FastaRecord("fuse1", "", seq)])
        res = caller.call_batch(batch)[0]
        # three calls, one per region
        assert len(res.calls) == 3
        assert res.best.function == "Alpha part / Beta part"
        assert res.best.function_index == 2
        assert res.best.score == sum(c.count for c in res.calls)

    def test_ambiguous_two_functions(self):
        rng = np.random.default_rng(1)
        seq = "".join(rng.choice(list(alphabet.AA20)) for _ in range(300))
        entries = []
        for p in range(0, 60, 6):
            entries.append((seq[p:p + 8], 0, 0, 300, 300, 0))
        for p in range(150, 204, 6):
            entries.append((seq[p:p + 8], 0, 1, 300, 300, 0))
        table = make_table(entries)
        caller = FunctionCaller(table, FUSION_FUNCS)
        batch = fasta.SequenceBatch.from_records(
            [fasta.FastaRecord("amb1", "", seq)])
        res = caller.call_batch(batch)[0]
        # 10 vs 9 hits -> margin 1 < 5 -> ambiguous fallback names both
        assert res.best.function_index == 0xFFFF
        assert "??" in res.best.function
        assert res.best.function == "Beta part ?? Alpha part"


class TestEmptyAndOddInputs:
    def test_empty_fasta(self, tmp_path):
        p = tmp_path / "empty.fa"
        p.write_text("")
        table = make_table([("MKLVVAGH", 1, 0, 100, 100, 0)])
        caller = FunctionCaller(table, FUSION_FUNCS)
        assert caller.call_file(p) == []

    def test_short_sequences(self):
        table = make_table([("MKLVVAGH", 1, 0, 100, 100, 0)])
        caller = FunctionCaller(table, FUSION_FUNCS)
        batch = fasta.SequenceBatch.from_records([
            fasta.FastaRecord("tiny", "", "MKLV"),       # < k
            fasta.FastaRecord("exact8", "", "MKLVVAGH"),  # one window
        ])
        res = caller.call_batch(batch)
        assert res[0].best.function_index == 0xFFFF
        assert res[1].best.function_index == 0xFFFF  # 1 hit < min_hits

    def test_empty_table(self):
        t = BucketKmerTable.build(
            np.zeros(0, np.uint32), np.zeros(0, np.uint32),
            np.zeros(0, np.uint32), np.zeros(0, np.uint32),
            np.zeros(0, np.uint32))
        f, _, _, _ = t.lookup_np(np.asarray([5], np.uint32),
                                 np.asarray([9], np.uint32))
        assert not f.any()

    def test_long_protein(self):
        # > 4096 residues exercises large L buckets end-to-end
        rng = np.random.default_rng(2)
        seq = "".join(rng.choice(list(alphabet.AA20)) for _ in range(5000))
        entries = [(seq[p:p + 8], 0, 0, 5000, 5000, 0)
                   for p in range(0, 120, 6)]
        table = make_table(entries)
        caller = FunctionCaller(table, FUSION_FUNCS)
        batch = fasta.SequenceBatch.from_records(
            [fasta.FastaRecord("long1", "", seq)])
        res = caller.call_batch(batch)[0]
        assert res.length == 5000
        assert res.best.function_index == 0
        assert res.calls[0].count == 20


class TestOrderConstraint:
    def test_gate_blocks_inconsistent_spacing(self):
        cfg = CallConfig(order_constraint=True)
        # second hit: spacing 10, avg_from_end delta 100 -> |10-100| > 20
        hits = [KmerHit(0, 200, 1, 300, 0, 0),
                KmerHit(10, 100, 1, 300, 0, 0)]
        hits += [KmerHit(30 + p, 200 - p, 1, 300, 0, 0)
                 for p in range(0, 40, 10)]
        calls = process_hits(hits, 300.0, cfg, -2)
        # gated hits never enter the buffer; consistent run of 5 calls
        assert len(calls) == 1 or calls == []

    def test_default_off_matches_reference(self):
        cfg = CallConfig()
        hits = [KmerHit(p, 0, 1, 300, 0, 0) for p in range(0, 50, 10)]
        assert len(process_hits(hits, 300.0, cfg, -2)) == 1


class TestOrderConstraintCaller:
    def test_caller_honors_order_constraint(self):
        # order_constraint gates hits whose spacing is inconsistent with
        # avg_from_end; the caller must take the exact Python path
        cfg = CallConfig(order_constraint=True)
        entries = []
        rng = np.random.default_rng(4)
        seq = "".join(rng.choice(list(alphabet.AA20)) for _ in range(300))
        # consistent run EXCEPT two hits with wildly wrong avg_from_end,
        # which the gate must drop (they would otherwise join the buffer)
        for i, p in enumerate(range(0, 60, 6)):
            a = 250 - p if i not in (3, 4) else 900
            entries.append((seq[p:p + 8], a, 1, 300, 300, 0))
        table = make_table(entries)
        caller = FunctionCaller(table, FUSION_FUNCS, cfg)
        batch = fasta.SequenceBatch.from_records(
            [fasta.FastaRecord("oc1", "", seq)])
        res = caller.call_batch(batch)[0]
        assert res.best.function_index == 1  # consistent spacing -> called

        # golden equivalence
        from signature_kmers_tpu.golden.call import GoldenFunctionCaller
        store = {}
        for k, a, f, me, md, v in entries:
            h, l = alphabet.pack_kmer_str(k)
            store[(h, l)] = type("KD", (), dict(
                avg_from_end=a, function_index=f, mean=me, median=md,
                var=v))()
        g = GoldenFunctionCaller(store.get, FUSION_FUNCS, cfg)
        _, gbest, _ = g.call_sequence(seq)
        assert res.best == gbest


class TestRecCapOverflow:
    def test_overflow_rows_fall_back_to_host_exactly(self):
        # craft > REC_CAP flush events: many gap-separated runs
        from signature_kmers_tpu.golden.call import GoldenFunctionCaller
        from signature_kmers_tpu.ops.automaton import REC_CAP

        rng = np.random.default_rng(8)
        L = 2560
        seq = "".join(rng.choice(list(alphabet.AA20)) for _ in range(L))
        entries = []
        n_runs = REC_CAP + 3
        for r in range(n_runs):
            base = r * 300  # gaps of ~250 > max_gap=200
            for p in range(base, base + 36, 6):
                entries.append((seq[p:p + 8], 0, 1 + (r % 2), L, L, 0))
        table = make_table(entries)
        caller = FunctionCaller(table, FUSION_FUNCS + ["Extra"])
        batch = fasta.SequenceBatch.from_records(
            [fasta.FastaRecord("ovf", "", seq)])
        res = caller.call_batch(batch)[0]

        store = {}
        for k, a, f, me, md, v in entries:
            h, l = alphabet.pack_kmer_str(k)
            store[(h, l)] = type("KD", (), dict(
                avg_from_end=a, function_index=f, mean=me, median=md,
                var=v))()
        g = GoldenFunctionCaller(store.get, FUSION_FUNCS + ["Extra"])
        gcalls, gbest, _ = g.call_sequence(seq)
        assert len(gcalls) > REC_CAP  # really overflows
        assert len(res.calls) == len(gcalls)
        assert res.best == gbest


class TestDuplicateKeys:
    def test_build_rejects_duplicates(self):
        import pytest
        with pytest.raises(ValueError):
            BucketKmerTable.build(
                np.asarray([5, 5], np.uint32), np.asarray([9, 9], np.uint32),
                np.zeros(2, np.uint32), np.zeros(2, np.uint32),
                np.zeros(2, np.uint32))
