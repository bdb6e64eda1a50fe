"""Device pipeline vs golden oracle: table, probe, pack, build, call."""

import numpy as np
import pytest

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import BuildConfig, CallConfig, TableConfig
from signature_kmers_tpu.golden.build import GoldenSignatureBuilder
from signature_kmers_tpu.golden.call import GoldenFunctionCaller
from signature_kmers_tpu.io import fasta
from signature_kmers_tpu.models.function_caller import FunctionCaller
from signature_kmers_tpu.models.signature_builder import SignatureBuilder
from signature_kmers_tpu.ops import kmer_pack
from signature_kmers_tpu.table.kmer_table import KmerTable
from signature_kmers_tpu.utils import paths


def random_keys(rng, n):
    hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    # dedupe
    packed = (hi.astype(np.uint64) << 24) | lo.astype(np.uint64)
    _, idx = np.unique(packed, return_index=True)
    return hi[idx], lo[idx]


class TestKmerTable:
    def test_build_and_lookup(self):
        rng = np.random.default_rng(0)
        hi, lo = random_keys(rng, 5000)
        n = hi.shape[0]
        v0 = np.arange(n, dtype=np.uint32)
        v1 = np.arange(n, dtype=np.uint32) * 7
        v2 = np.arange(n, dtype=np.uint32) * 13
        t = KmerTable.build(hi, lo, v0, v1, v2)
        found, r0, r1, r2 = t.lookup_np(hi, lo)
        assert found.all()
        np.testing.assert_array_equal(r0, v0)
        np.testing.assert_array_equal(r1, v1)
        np.testing.assert_array_equal(r2, v2)
        # misses are exact (no CMPH-style aliasing)
        mh, ml = random_keys(rng, 3000)
        packed = set(zip(hi.tolist(), lo.tolist()))
        miss = np.array([(h, l) not in packed
                         for h, l in zip(mh.tolist(), ml.tolist())])
        f2, *_ = t.lookup_np(mh, ml)
        assert not f2[miss].any()

    def test_device_probe_matches_host(self):
        from signature_kmers_tpu.ops import probe

        rng = np.random.default_rng(1)
        hi, lo = random_keys(rng, 2000)
        n = hi.shape[0]
        v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v2 = rng.integers(0, 2**32, n, dtype=np.uint32)
        t = KmerTable.build(hi, lo, v0, v1, v2)
        qh, ql = random_keys(rng, 1000)
        qh = np.concatenate([qh, hi[:500]])
        ql = np.concatenate([ql, lo[:500]])
        import jax.numpy as jnp

        fd, d0, d1, d2 = probe.probe_table(
            *t.device_arrays(), jnp.asarray(qh), jnp.asarray(ql),
            t.max_probes)
        fh, h0, h1, h2 = t.lookup_np(qh, ql)
        np.testing.assert_array_equal(np.asarray(fd), fh)
        np.testing.assert_array_equal(np.asarray(d0), h0)
        np.testing.assert_array_equal(np.asarray(d1), h1)
        np.testing.assert_array_equal(np.asarray(d2), h2)

    def test_save_load(self, tmp_path):
        rng = np.random.default_rng(2)
        hi, lo = random_keys(rng, 500)
        n = hi.shape[0]
        t = KmerTable.build(hi, lo, np.arange(n, dtype=np.uint32),
                            np.zeros(n, np.uint32), np.zeros(n, np.uint32))
        t.save(tmp_path / "kmer_table")
        t2 = KmerTable.load(tmp_path / "kmer_table")
        assert t2.max_probes == t.max_probes
        np.testing.assert_array_equal(t2.key_hi, t.key_hi)
        f, r0, _, _ = t2.lookup_np(hi, lo)
        assert f.all()

    def test_value_packing(self):
        v0, v1, v2 = KmerTable.pack_values(100, 7, 300, 310, 99)
        a, f, me, md, v = KmerTable.unpack_values(v0, v1, v2)
        assert (int(a), int(f), int(me), int(md), int(v)) == (100, 7, 300, 310, 99)


class TestPackWindows:
    def test_matches_numpy(self):
        import jax.numpy as jnp

        seqs = ["MKLVVAGHACDEFG", "AC*DEFGHIKLMNP", "ACXDEFGHIKLMNPQ",
                "acdxfghiklmnpqr"]
        batch = fasta.SequenceBatch.from_records(
            [fasta.FastaRecord(f"s{i}", "", s) for i, s in enumerate(seqs)])
        codes, lens = kmer_pack.pad_batch(batch, multiple=16)
        out = kmer_pack.pack_windows(jnp.asarray(codes), jnp.asarray(lens))
        from signature_kmers_tpu.golden.call import valid_call_windows

        for i, s in enumerate(seqs):
            c = alphabet.encode_seq(s)
            hi, lo = alphabet.pack_codes_np(c)
            nw = hi.shape[0]
            np.testing.assert_array_equal(
                np.asarray(out["hi"])[i, :nw], hi)
            np.testing.assert_array_equal(
                np.asarray(out["lo"])[i, :nw], lo)
            cv = valid_call_windows(c)
            got_cv = np.asarray(out["call_valid"])[i]
            np.testing.assert_array_equal(got_cv[:nw], cv)
            assert not got_cv[nw:].any()
            bv = np.ones(nw, dtype=bool)
            ok = alphabet.CODE_IS_AA[c]
            for j in range(8):
                bv &= ok[j:len(c) - 7 + j]
            got_bv = np.asarray(out["build_valid"])[i]
            np.testing.assert_array_equal(got_bv[:nw], bv)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_dev")
    generate_corpus(root)
    return root


@pytest.fixture(scope="module")
def golden_built(corpus):
    b = GoldenSignatureBuilder(BuildConfig())
    defs = paths.populate_path_list([corpus / "Annotations"])
    fas = paths.populate_path_list([corpus / "Seqs"])
    b.load_function_data([], [], defs)
    b.load_fasta(fas, False, set())
    b.process_kept_functions(set())
    b.extract_kmers(set())
    b.process_kmers()
    return b


@pytest.fixture(scope="module")
def device_built(corpus):
    b = SignatureBuilder(BuildConfig())
    defs = paths.populate_path_list([corpus / "Annotations"])
    fas = paths.populate_path_list([corpus / "Seqs"])
    b.load_function_data([], [], defs)
    b.load_fasta(fas, False, set())
    b.process_kept_functions(set())
    b.extract_kmers(set())
    kept = b.process_kmers()
    return b, kept


class TestDeviceBuild:
    def test_kept_set_matches_golden(self, golden_built, device_built):
        _, kept = device_built
        g_hi, g_lo, g_avg, g_fn, g_mean, g_med, g_var = golden_built.kept_arrays()
        assert len(kept) == g_hi.shape[0]
        np.testing.assert_array_equal(kept.hi, g_hi)
        np.testing.assert_array_equal(kept.lo, g_lo)
        np.testing.assert_array_equal(kept.function_index, g_fn)
        np.testing.assert_array_equal(kept.avg_from_end, g_avg)
        np.testing.assert_array_equal(kept.mean, g_mean)
        np.testing.assert_array_equal(kept.median, g_med)
        np.testing.assert_array_equal(kept.var, g_var)

    def test_stats_match(self, golden_built, device_built):
        b, kept = device_built
        assert b.stats.distinct_signatures == golden_built.stats.distinct_signatures
        assert b.stats.distinct_functions == golden_built.stats.distinct_functions
        assert b.stats.seqs_with_a_signature == golden_built.stats.seqs_with_a_signature
        assert b.stats.seqs_with_func == golden_built.stats.seqs_with_func


class TestDeviceCall:
    def test_calls_match_golden(self, corpus, golden_built, device_built):
        b, kept = device_built
        funcs = [b.fm.index_function_map[i]
                 for i in sorted(b.fm.index_function_map)]
        table = kept.to_table()
        caller = FunctionCaller(table, funcs)
        gcaller = GoldenFunctionCaller(
            golden_built.kept_kmers.get, funcs)

        batch = fasta.SequenceBatch.from_file(corpus / "Queries" / "queries.fa")
        results = caller.call_batch(batch)
        assert len(results) == len(batch)
        for i, res in enumerate(results):
            seq = batch.seq_str(i)
            g_calls, g_best, g_hits = gcaller.call_sequence(seq)
            assert res.best.function_index == g_best.function_index, res.seq_id
            assert res.best.function == g_best.function
            assert res.best.score == g_best.score
            assert len(res.calls) == len(g_calls)
            for c, gc in zip(res.calls, g_calls):
                assert (c.start, c.end, c.count, c.function_index) == \
                    (gc.start, gc.end, gc.count, gc.function_index)

    def test_length_sorted_chunking_preserves_results(self, corpus,
                                                      device_built):
        """sort_by_length: chunks follow their own max length; results
        must come back in input order, identical to the unsorted path —
        including across chunk boundaries (tiny call_batch forces
        several chunks of very different (L, W) shapes)."""
        import dataclasses

        from signature_kmers_tpu.core.config import Config

        b, kept = device_built
        funcs = [b.fm.index_function_map[i]
                 for i in sorted(b.fm.index_function_map)]
        table = kept.to_table()
        base = fasta.SequenceBatch.from_file(
            corpus / "Queries" / "queries.fa")
        # mixed-length batch: original queries + truncated/extended forms
        # interleaved so input order is NOT length order
        recs = []
        rng = np.random.default_rng(5)
        for i in range(len(base)):
            s = base.seq_str(i)
            recs.append(fasta.FastaRecord(f"full.{i}", "", s))
            recs.append(fasta.FastaRecord(f"half.{i}", "", s[:len(s) // 2]))
            recs.append(fasta.FastaRecord(f"dbl.{i}", "", s + s))
            recs.append(fasta.FastaRecord(
                f"tiny.{i}", "", s[:int(rng.integers(9, 40))]))
        batch = fasta.SequenceBatch.from_records(recs)

        cfg = Config()
        dc_sorted = dataclasses.replace(cfg.device, call_batch=8,
                                        sort_by_length=True)
        dc_plain = dataclasses.replace(cfg.device, call_batch=8,
                                       sort_by_length=False)
        r1 = FunctionCaller(table, funcs, cfg.call, dc_sorted).call_batch(batch)
        r2 = FunctionCaller(table, funcs, cfg.call, dc_plain).call_batch(batch)
        assert len(r1) == len(r2) == len(batch)
        assert [r.seq_id for r in r1] == [r.seq_id for r in r2]
        assert [r.seq_id for r in r1] == [b_id for b_id in batch.ids]
        for a, c in zip(r1, r2):
            assert a.seq_id == c.seq_id
            assert (a.best.function_index, a.best.function,
                    a.best.score) == (c.best.function_index,
                                      c.best.function, c.best.score)
            assert [(x.start, x.end, x.count, x.function_index)
                    for x in a.calls] \
                == [(x.start, x.end, x.count, x.function_index)
                    for x in c.calls]

    def test_probe_waste_splitting_preserves_results(self, corpus,
                                                     device_built):
        """Adaptive probe-waste splitting (round 5): sorted chunks are
        cut (1024-row floor) when the chunk-max W would probe >15%
        padding windows.  A wide-length-range batch big enough to
        trigger the cut must return results identical to the unsorted
        single-chunk path, in input order."""
        import dataclasses

        from signature_kmers_tpu.core.config import Config

        b, kept = device_built
        funcs = [b.fm.index_function_map[i]
                 for i in sorted(b.fm.index_function_map)]
        table = kept.to_table()
        base = fasta.SequenceBatch.from_file(
            corpus / "Queries" / "queries.fa")
        rng = np.random.default_rng(9)
        recs = []
        for i in range(2200):
            s = base.seq_str(int(rng.integers(0, len(base))))
            ln = int(rng.integers(20, max(21, len(s))))
            recs.append(fasta.FastaRecord(f"m{i}", "", s[:ln]))
        batch = fasta.SequenceBatch.from_records(recs)

        cfg = Config()
        dc_sorted = dataclasses.replace(cfg.device, call_batch=4096,
                                        sort_by_length=True)
        dc_plain = dataclasses.replace(cfg.device, call_batch=4096,
                                       sort_by_length=False)
        r1 = FunctionCaller(table, funcs, cfg.call,
                            dc_sorted).call_batch(batch)
        r2 = FunctionCaller(table, funcs, cfg.call,
                            dc_plain).call_batch(batch)
        assert [r.seq_id for r in r1] == batch.ids
        for a, c in zip(r1, r2):
            assert (a.seq_id, a.best.function_index, a.best.function,
                    a.best.score) == (c.seq_id, c.best.function_index,
                                      c.best.function, c.best.score)

    def test_long_proteins(self, corpus, golden_built, device_built):
        """Device path vs golden at 5-10K aa (no truncation: the chunker
        pads each chunk to its own longest sequence under CELL_BUDGET,
        models/function_caller.py), and past 65,535 aa, where the device
        automaton's 16-bit length guard (ops/automaton.py) must route
        the row through the exact host fallback.  The reference handles
        arbitrary lengths (call_functions.tcc:259-338)."""
        b, kept = device_built
        funcs = [b.fm.index_function_map[i]
                 for i in sorted(b.fm.index_function_map)]
        table = kept.to_table()
        caller = FunctionCaller(table, funcs)
        gcaller = GoldenFunctionCaller(golden_built.kept_kmers.get, funcs)

        base = fasta.SequenceBatch.from_file(
            corpus / "Queries" / "queries.fa")
        s0, s1 = base.seq_str(0), base.seq_str(1)
        long5k = (s0 * (5000 // len(s0) + 1))[:5000]
        long10k = ((s0 + s1) * (10000 // (len(s0) + len(s1)) + 1))[:10000]
        # >65,535 aa: trips the uint16 guard -> exact host fallback
        giant = (s1 * (70000 // len(s1) + 1))[:70000]
        recs = [fasta.FastaRecord("long5k", "", long5k),
                fasta.FastaRecord("short", "", s1),
                fasta.FastaRecord("long10k", "", long10k),
                fasta.FastaRecord("giant66k", "", giant)]
        batch = fasta.SequenceBatch.from_records(recs)
        before = caller.rows_host_fallback
        results = caller.call_batch(batch)
        assert caller.rows_host_fallback >= before + 1  # the giant row
        assert [r.seq_id for r in results] == [r.id for r in recs]
        for res, rec in zip(results, recs):
            g_calls, g_best, _ = gcaller.call_sequence(rec.seq)
            assert res.best.function_index == g_best.function_index, res.seq_id
            assert res.best.function == g_best.function
            assert res.best.score == g_best.score
            assert [(c.start, c.end, c.count, c.function_index)
                    for c in res.calls] \
                == [(c.start, c.end, c.count, c.function_index)
                    for c in g_calls], res.seq_id

    def test_training_recall(self, corpus, device_built):
        b, kept = device_built
        funcs = [b.fm.index_function_map[i]
                 for i in sorted(b.fm.index_function_map)]
        caller = FunctionCaller(kept.to_table(), funcs)
        ok = total = 0
        for f in paths.populate_path_list([corpus / "Seqs"]):
            for res in caller.call_file(f):
                want = b.fm.lookup_function(res.seq_id)
                total += 1
                ok += res.best.function == want
        assert total and ok / total > 0.95
