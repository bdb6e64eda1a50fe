"""Native runtime (C++ scanner + automaton) vs the Python behavioral spec."""

import numpy as np
import pytest

from signature_kmers_tpu.core.config import CallConfig
from signature_kmers_tpu.golden.call import KmerHit, process_hits
from signature_kmers_tpu.io import fasta
from signature_kmers_tpu.runtime import host

pytestmark = pytest.mark.skipif(not host.available(),
                                reason="native runtime unavailable")


class TestScanner:
    def test_matches_python_parser(self, tmp_path):
        text = (">id1 some def line\nMKLVVAGH\nACDEFG\n"
                ">id2\nAC*DE\n*XYW\n"
                ">fig|123.4.peg.9 Protein kinase [123.4]\nmklv\n1ACD\n"
                ">empty_seq\n"
                ">last\nWYWY\n")
        p = tmp_path / "t.fa"
        p.write_text(text)
        py = list(fasta.iter_fasta(p))
        nat = host.read_fasta_batch(p)
        assert len(nat) == len([r for r in py if r.id])
        j = 0
        for rec in py:
            if not rec.id:
                continue
            assert nat.ids[j] == rec.id
            assert nat.deflines[j] == rec.defline
            assert nat.seq_str(j) == rec.seq
            j += 1

    def test_crlf_and_padding(self, tmp_path):
        p = tmp_path / "t.fa"
        p.write_bytes(b">a x\r\nMKLV\r\nACDE\r\n")
        nat = host.read_fasta_batch(p)
        assert nat.ids == ["a"]
        assert nat.deflines == [" x"]
        assert nat.seq_str(0) == "MKLVACDE"

    def test_corpus_files(self, fixture_dir):
        for f in sorted((fixture_dir / "Seqs").iterdir()):
            py = fasta.SequenceBatch.from_file(f)
            nat = host.read_fasta_batch(f)
            assert py.ids == nat.ids
            np.testing.assert_array_equal(py.codes, nat.codes)
            np.testing.assert_array_equal(py.offsets, nat.offsets)


class TestAutomaton:
    def _compare(self, hit_streams, seq_lens, cfg=CallConfig()):
        # python spec
        want = []
        for hits, slen in zip(hit_streams, seq_lens):
            want.append(process_hits(hits, float(slen), cfg, hypo_index=-2))
        # native
        pos = np.array([h.pos for hs in hit_streams for h in hs], np.int32)
        fns = np.array([h.function_index for hs in hit_streams for h in hs],
                       np.int32)
        means = np.array([h.mean for hs in hit_streams for h in hs], np.int32)
        off = np.cumsum([0] + [len(hs) for hs in hit_streams]).astype(np.int64)
        (call_off, cs, ce, cc, cf, cm, cmad) = host.run_automaton(
            pos, fns, means, off, np.asarray(seq_lens, np.int32),
            cfg.min_hits, cfg.max_gap, cfg.k, cfg.mad_floor,
            cfg.len_mad_window)
        for i, w in enumerate(want):
            got = list(range(call_off[i], call_off[i + 1]))
            assert len(got) == len(w), f"seq {i}"
            for j, c in zip(got, w):
                assert (int(cs[j]), int(ce[j]), int(cc[j]), int(cf[j])) == \
                    (c.start, c.end, c.count, c.function_index)
                assert int(cm[j]) == c.protein_length_median
                assert float(cmad[j]) == pytest.approx(
                    c.protein_length_med_avg_dev, rel=1e-6)

    def test_random_streams(self):
        rng = np.random.default_rng(3)
        streams = []
        lens = []
        for _ in range(300):
            n = int(rng.integers(0, 60))
            pos = np.sort(rng.choice(2000, size=n, replace=False)) \
                if n else np.zeros(0, int)
            hits = [KmerHit(int(p), 0, int(rng.integers(0, 4)),
                            int(rng.integers(200, 320)), 0, 0) for p in pos]
            streams.append(hits)
            lens.append(int(rng.integers(100, 500)))
        self._compare(streams, lens)

    def test_dense_single_function(self):
        hits = [KmerHit(p, 0, 2, 300, 0, 0) for p in range(0, 293)]
        self._compare([hits], [300])

    def test_gap_and_switch_cases(self):
        streams = [
            [KmerHit(p, 0, 1, 300, 0, 0) for p in range(0, 50, 10)]
            + [KmerHit(400 + p, 0, 2, 300, 0, 0) for p in range(0, 60, 10)],
            [KmerHit(0, 0, 1, 300, 0, 0), KmerHit(5, 0, 2, 300, 0, 0),
             KmerHit(9, 0, 2, 300, 0, 0)]
            + [KmerHit(20 + p, 0, 2, 300, 0, 0) for p in range(0, 30, 10)],
        ]
        self._compare(streams, [300, 300])


class TestEndToEndNative:
    def test_caller_uses_native(self, fixture_dir):
        from signature_kmers_tpu.core.config import BuildConfig
        from signature_kmers_tpu.models.function_caller import FunctionCaller
        from signature_kmers_tpu.models.signature_builder import SignatureBuilder
        from signature_kmers_tpu.utils import paths

        b = SignatureBuilder(BuildConfig())
        b.load_function_data([], [], paths.populate_path_list(
            [fixture_dir / "Annotations"]))
        b.load_fasta(paths.populate_path_list([fixture_dir / "Seqs"]),
                     False, set())
        b.process_kept_functions(set())
        b.extract_kmers(set())
        kept = b.process_kmers()
        funcs = [b.fm.index_function_map[i]
                 for i in sorted(b.fm.index_function_map)]
        caller = FunctionCaller(kept.to_table(), funcs)
        batch = host.read_fasta_batch(fixture_dir / "Queries" / "queries.fa")
        native_res = caller.call_batch(batch)
        python_res = caller.call_batch(batch, keep_hits=True)  # python path
        for a, b2 in zip(native_res, python_res):
            assert a.best == b2.best
            assert len(a.calls) == len(b2.calls)


class TestNativeCuckooBuild:
    def test_native_matches_numpy_semantics(self):
        """Native and numpy builds may place keys in different slots, but
        every lookup (hit or miss) must behave identically."""
        import numpy as np

        from signature_kmers_tpu.runtime import host
        from signature_kmers_tpu.table.bucket_table import BucketKmerTable

        if not host.available():
            import pytest

            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(11)
        n = 50_000
        keys = np.unique(rng.integers(0, 1 << 48, n, dtype=np.uint64))
        hi = (keys >> np.uint64(24)).astype(np.uint32)
        lo = (keys & np.uint64(0xFFFFFF)).astype(np.uint32)
        n = hi.shape[0]
        v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v2 = rng.integers(0, 2**32, n, dtype=np.uint32)

        t_native = BucketKmerTable.build(hi, lo, v0, v1, v2)
        out = BucketKmerTable._try_build(hi, lo, v0, v1, v2,
                                         t_native.n_buckets, t_native.salt)
        assert out is not None
        t_numpy = BucketKmerTable._finish(*out, t_native.salt, n)

        # hits: identical values from both tables
        qi = rng.integers(0, n, 20_000)
        for t in (t_native, t_numpy):
            f, r0, r1, r2 = t.lookup_np(hi[qi], lo[qi])
            assert f.all()
            assert (r0 == v0[qi]).all()
            assert (r1 == v1[qi]).all()
            assert (r2 == v2[qi]).all()
        # misses: identical found-mask
        mhi = hi[qi] ^ np.uint32(0x1)
        fa, *_ = t_native.lookup_np(mhi, lo[qi])
        fb, *_ = t_numpy.lookup_np(mhi, lo[qi])
        assert (fa == fb).all()
        # occupied() returns the same key/value multiset
        for a, b in zip(t_native.occupied(), t_numpy.occupied()):
            assert (a == b).all()


class TestNativePackU6Rows:
    def test_matches_numpy_spec(self):
        from signature_kmers_tpu.runtime import host
        from signature_kmers_tpu.ops import kmer_pack

        if not host.available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(21)
        for trial, L in ((0, 128), (1, 384), (2, 512)):
            # lengths exercise empty seqs, 16-multiples, tails, and > L
            # truncation; codes use the full 6-bit range incl. INVALID
            B = int(rng.integers(1, 40))
            lens_true = rng.integers(0, L + 100, B)
            lens_true[rng.integers(0, B)] = 0
            offsets = np.concatenate([[0], np.cumsum(lens_true)]).astype(
                np.int64)
            codes = rng.integers(0, 64, int(offsets[-1]),
                                  dtype=np.uint8)
            lens = np.minimum(lens_true, L).astype(np.int32)
            spans = -(-lens // kmer_pack.ALIGN)
            row_start = np.zeros(B + 1, dtype=np.int64)
            np.cumsum(spans, out=row_start[1:])
            R = int(row_start[-1]) + 8
            a = host.pack_u6_rows(codes, offsets, lens, row_start, R)
            b = kmer_pack._pack_u6_rows_np(codes, offsets, lens, row_start,
                                           R)
            np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")


class TestNativeFinalKmersWriter:
    def test_matches_python_formatter(self, tmp_path):
        """skt_write_final_kmers must be byte-identical to the Python
        formatter (io/formats.write_final_kmers fallback path)."""
        from signature_kmers_tpu.io import formats
        from signature_kmers_tpu.runtime import host

        if not host.available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(5)
        n = 20000
        hi = rng.integers(0, 1 << 24, n).astype(np.uint32)
        lo = rng.integers(0, 1 << 24, n).astype(np.uint32)
        avg = rng.integers(0, 65536, n).astype(np.uint16)
        fn = rng.integers(0, 65536, n).astype(np.uint16)
        a = tmp_path / "native.kmers"
        b = tmp_path / "python.kmers"
        formats.write_final_kmers(a, hi, lo, avg, fn)
        orig = host.available
        host.available = lambda: False
        try:
            formats.write_final_kmers(b, hi, lo, avg, fn)
        finally:
            host.available = orig
        assert a.read_bytes() == b.read_bytes()
