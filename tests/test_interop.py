"""Reference binary-store interop: CMPH BDZ .mph + value array and NuDB
.dat/.key (ref: cmph_kmer.h, perfect_hash.h, nudb_kmer_db.h)."""

import numpy as np
import pytest

from signature_kmers_tpu.interop import cmph as cmph_io
from signature_kmers_tpu.interop import nudb as nudb_io
from signature_kmers_tpu.interop.hashes import xxh64_bytes8
from signature_kmers_tpu.runtime import host

LETTERS = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)


def _rand_keys(rng, m):
    keys = LETTERS[rng.integers(0, 20, (int(m * 1.6) + 8, 8))]
    keys = np.unique(keys.view("S8"))[:m]
    rng.shuffle(keys)
    return keys.view(np.uint8).reshape(-1, 8)


class TestHashes:
    def test_xxh64_matches_real_xxhash(self):
        xxhash = pytest.importorskip("xxhash")
        rng = np.random.default_rng(9)
        keys = rng.integers(0, 256, (1000, 8)).astype(np.uint8)
        for seed in (0, 987654321, (1 << 63) + 5):
            mine = xxh64_bytes8(keys, seed)
            ref = np.asarray(
                [xxhash.xxh64_intdigest(k.tobytes(), seed) for k in keys],
                dtype=np.uint64)
            np.testing.assert_array_equal(mine, ref)


class TestJenkins:
    def test_python_matches_independent_cpp(self):
        """interop/hashes.py jenkins vs the independently transcribed C++
        lookup2 in skt_runtime.cpp (guards the mix shift constants — a
        wrong constant silently breaks real-libcmph interop while all
        self-round-trip tests keep passing)."""
        from signature_kmers_tpu.interop.hashes import jenkins_hash3_bytes
        from signature_kmers_tpu.runtime import host

        if not host.available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(11)
        keys = rng.integers(0, 256, (4096, 8)).astype(np.uint8)
        for seed in (0, 1, 0xDEADBEEF, (1 << 32) - 1):
            pa, pb, pc = jenkins_hash3_bytes(seed, keys)
            ca, cb, cc = host.jenkins3_k8(keys, seed)
            np.testing.assert_array_equal(pa, ca)
            np.testing.assert_array_equal(pb, cb)
            np.testing.assert_array_equal(pc, cc)


class TestBdzBaseline:
    def test_bdz_baseline_matches_cuckoo_on_member_queries(self):
        """The authentic-BDZ-read-path CPU baseline and the exact-membership
        cuckoo baseline agree on total calls when every query window is a
        table member (aliasing can then never fire)."""
        from signature_kmers_tpu.core import alphabet
        from signature_kmers_tpu.core.config import Config
        from signature_kmers_tpu.runtime import host
        from signature_kmers_tpu.table.bucket_table import BucketKmerTable
        from signature_kmers_tpu.table.kmer_table import KmerTable

        if not host.available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(5)
        aa = alphabet.encode_seq(alphabet.AA20)
        n_seqs, L = 64, 120
        codes = aa[rng.integers(0, 20, n_seqs * L)].astype(np.uint8)
        offsets = (np.arange(n_seqs + 1) * L).astype(np.int64)

        hi, lo = alphabet.pack_codes_np(codes)
        # windows crossing sequence boundaries are junk keys; harmless —
        # including them only grows the member set
        # function = source sequence's id, so every sequence yields a long
        # same-function hit run and real calls come out of both baselines
        fn_of_window = ((np.arange(hi.shape[0]) // L) % 37).astype(np.uint32)
        packed = (hi.astype(np.uint64) << 24) | lo
        _, idx = np.unique(packed, return_index=True)
        idx.sort()
        hi, lo = hi[idx], lo[idx]
        n = hi.shape[0]
        fn = fn_of_window[idx]
        mean = np.full(n, L, dtype=np.uint32)
        v0, v1, v2 = KmerTable.pack_values(
            np.zeros(n, np.uint32), fn, mean, mean, np.zeros(n, np.uint32))
        ctable = BucketKmerTable.build(hi, lo, v0.astype(np.uint32),
                                       v1.astype(np.uint32),
                                       v2.astype(np.uint32))
        mph = cmph_io.build_bdz(cmph_io.keys_from_packed(hi, lo))
        kidx = cmph_io.bdz_search(mph, cmph_io.keys_from_packed(hi, lo))
        vals = np.zeros(mph.m, dtype=cmph_io.STORED_KMER_DTYPE)
        vals["function_index"][kidx] = fn
        vals["mean"][kidx] = mean

        cfg = Config().call
        args = (cfg.min_hits, cfg.max_gap, cfg.k, cfg.mad_floor,
                cfg.len_mad_window)
        a = host.cpu_baseline_call(codes, offsets, ctable, *args)
        b = host.cpu_baseline_call_bdz(codes, offsets, mph, vals, *args)
        assert a == b
        assert a > 0


class TestBdz:
    @pytest.mark.parametrize("m", [1, 2, 7, 1000, 60000])
    def test_mph_is_minimal_perfect(self, m):
        keys = _rand_keys(np.random.default_rng(m), m)
        m = keys.shape[0]
        mph = cmph_io.build_bdz(keys)
        idx = cmph_io.bdz_search(mph, keys)
        assert idx.min() >= 0 and idx.max() < m
        assert np.unique(idx).shape[0] == m  # bijection onto [0, m)

    def test_mph_file_roundtrip(self, tmp_path):
        keys = _rand_keys(np.random.default_rng(5), 5000)
        mph = cmph_io.build_bdz(keys)
        p = tmp_path / "t.mph"
        cmph_io.save_mph(p, mph)
        m2 = cmph_io.load_mph(p)
        assert (m2.seed, m2.n, m2.m, m2.r, m2.k, m2.b) == \
            (mph.seed, mph.n, mph.m, mph.r, mph.k, mph.b)
        np.testing.assert_array_equal(m2.g, mph.g)
        np.testing.assert_array_equal(m2.ranktable, mph.ranktable)
        np.testing.assert_array_equal(cmph_io.bdz_search(m2, keys),
                                      cmph_io.bdz_search(mph, keys))

    @pytest.mark.parametrize("m", [1, 3, 500, 40000])
    def test_native_build_matches_numpy(self, m):
        """skt_bdz_build_try must be byte-identical to the numpy
        round-based peel/assign spec for the same (keys, seed, r)."""
        if not host.available():
            pytest.skip("native runtime unavailable")
        keys = _rand_keys(np.random.default_rng(100 + m), m)
        a = cmph_io.build_bdz(keys, native=False)
        b = cmph_io.build_bdz(keys, native=True)
        assert (a.seed, a.n, a.m, a.r) == (b.seed, b.n, b.m, b.r)
        np.testing.assert_array_equal(a.g, b.g)
        np.testing.assert_array_equal(a.ranktable, b.ranktable)

    def test_native_search_matches_numpy(self):
        """skt_bdz_search must match the numpy bdz_search on member AND
        alien keys (same aliasing semantics)."""
        if not host.available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(77)
        keys = _rand_keys(rng, 30000)
        mph = cmph_io.build_bdz(keys)
        alien = _rand_keys(np.random.default_rng(78), 2000)
        for kk in (keys, alien):
            np.testing.assert_array_equal(
                cmph_io.bdz_search(mph, kk, native=True),
                cmph_io.bdz_search(mph, kk, native=False))

    def test_mt_baseline_matches_single_thread(self):
        """The multi-thread authentic baseline partitions sequences only;
        total calls must equal the single-thread result."""
        if not host.available():
            pytest.skip("native runtime unavailable")
        from signature_kmers_tpu.core import alphabet
        from signature_kmers_tpu.core.config import Config

        rng = np.random.default_rng(9)
        aa = alphabet.encode_seq(alphabet.AA20)
        n_k, L, n_q = 40000, 120, 128
        corpus = aa[rng.integers(0, 20, n_k + 7)].astype(np.uint8)
        hi, lo = alphabet.pack_codes_np(corpus)
        pk = np.unique((hi.astype(np.uint64) << 24) | lo)
        hi = (pk >> 24).astype(np.uint32)
        lo = (pk & 0xFFFFFF).astype(np.uint32)
        keys = cmph_io.keys_from_packed(hi, lo)
        mph = cmph_io.build_bdz(keys)
        kidx = cmph_io.bdz_search(mph, keys)
        vals = np.zeros(mph.m, dtype=cmph_io.STORED_KMER_DTYPE)
        vals["function_index"][kidx] = (hi % 31).astype(np.uint16)
        vals["mean"][kidx] = np.uint16(L)
        starts = rng.integers(0, n_k - L, n_q)
        codes = np.concatenate([corpus[s:s + L] for s in starts])
        offsets = (np.arange(n_q + 1) * L).astype(np.int64)
        cfg = Config().call
        args = (cfg.min_hits, cfg.max_gap, cfg.k, cfg.mad_floor,
                cfg.len_mad_window)
        st = host.cpu_baseline_call_bdz(codes, offsets, mph, vals, *args)
        for nt in (2, 5, 8):
            assert host.cpu_baseline_call_bdz(
                codes, offsets, mph, vals, *args, n_threads=nt) == st
        assert st > 0

    def test_rank_matches_ranktable(self):
        """The stored rank table must agree with the exact rank array
        (bdz.c rank() = ranktable[v>>b] + popcount walk)."""
        keys = _rand_keys(np.random.default_rng(11), 20000)
        mph = cmph_io.build_bdz(keys)
        rank = mph.rank_array()
        k = mph.k
        for i in range(mph.ranktable.shape[0]):
            assert mph.ranktable[i] == rank[i * k]


class TestCmphStore:
    def _store(self, tmp_path, m=4000, seed=2):
        rng = np.random.default_rng(seed)
        keys = _rand_keys(rng, m)
        m = keys.shape[0]
        hi, lo = cmph_io.packed_from_keys(keys)
        stats = [rng.integers(0, 65536, m).astype(np.uint16)
                 for _ in range(5)]
        stats[1] = rng.integers(0, 300, m).astype(np.uint16)  # func idx
        base = tmp_path / "kmer_data"
        cmph_io.write_cmph_store(base, hi, lo, *stats)
        return keys, hi, lo, stats, base

    def test_store_roundtrip(self, tmp_path):
        keys, hi, lo, stats, base = self._store(tmp_path)
        mph = cmph_io.load_mph(str(base) + ".mph")
        vals = cmph_io.read_cmph_values(str(base) + ".dat")
        idx = cmph_io.bdz_search(mph, keys)
        np.testing.assert_array_equal(vals["avg_from_end"][idx], stats[0])
        np.testing.assert_array_equal(vals["function_index"][idx], stats[1])
        np.testing.assert_array_equal(vals["median"][idx], stats[3])

    def test_cmph_table_member_lookup(self, tmp_path):
        from signature_kmers_tpu.table.cmph_table import CmphKmerTable

        keys, hi, lo, stats, base = self._store(tmp_path)
        t = CmphKmerTable.load(base)
        found, r0, r1, r2 = t.lookup_np(hi, lo)
        assert found.all()
        np.testing.assert_array_equal(r0 & 0xFFFF, stats[0])
        np.testing.assert_array_equal(r0 >> 16, stats[1])
        np.testing.assert_array_equal(r1 & 0xFFFF, stats[2])
        np.testing.assert_array_equal(r1 >> 16, stats[3])
        np.testing.assert_array_equal(r2, stats[4])

    def test_cmph_table_aliasing_semantics(self, tmp_path):
        """Alien k-mers must alias onto REAL records with no membership
        check — the reference's fetch behavior (cmph_kmer.h:138-147)."""
        from signature_kmers_tpu.table.cmph_table import CmphKmerTable

        keys, hi, lo, stats, base = self._store(tmp_path)
        t = CmphKmerTable.load(base)
        rng = np.random.default_rng(77)
        alien = LETTERS[rng.integers(0, 20, (5000, 8))]
        member = set(np.asarray(keys).view("S8").ravel().tolist())
        alien = alien[~np.isin(alien.view("S8").ravel(),
                               np.asarray(list(member)))]
        ah, al = cmph_io.packed_from_keys(alien)
        found, r0, _r1, _r2 = t.lookup_np(ah, al)
        # almost every alien probe "hits" (rank == m corner is the only
        # miss), and returned records equal the aliased slot's record
        assert found.mean() > 0.9
        idx = cmph_io.bdz_search(t.mph, alien)
        inrange = idx < t.mph.m
        np.testing.assert_array_equal(
            r0[inrange] & 0xFFFF,
            t.values["avg_from_end"][idx[inrange]])
        assert (found == inrange).all()

    def test_cmph_table_device_probe_matches_host(self, tmp_path):
        from signature_kmers_tpu.ops import probe as probe_ops
        from signature_kmers_tpu.table.cmph_table import CmphKmerTable

        import jax

        keys, hi, lo, stats, base = self._store(tmp_path, m=2000)
        t = CmphKmerTable.load(base)
        rng = np.random.default_rng(5)
        alien = LETTERS[rng.integers(0, 20, (3000, 8))]
        qh = np.concatenate([hi, cmph_io.packed_from_keys(alien)[0]])
        ql = np.concatenate([lo, cmph_io.packed_from_keys(alien)[1]])
        hfound, h0, h1, h2 = t.lookup_np(qh, ql)
        for with_aux in (False, True):
            fn, arrays = probe_ops.table_probe(t, with_aux=with_aux)
            out = jax.jit(fn)(*arrays, qh, ql)
            np.testing.assert_array_equal(np.asarray(out[0]), hfound)
            fm = (h0 & 0xFFFF0000) | (h1 & 0xFFFF)
            np.testing.assert_array_equal(np.asarray(out[1]), fm)
            if with_aux:
                np.testing.assert_array_equal(np.asarray(out[2]), h0)
                np.testing.assert_array_equal(np.asarray(out[3]), h1)
                np.testing.assert_array_equal(np.asarray(out[4]), h2)


class TestNudb:
    def test_roundtrip_and_bucket_fetch(self, tmp_path):
        rng = np.random.default_rng(3)
        keys = _rand_keys(rng, 20000)
        n = keys.shape[0]
        vals = rng.integers(0, 256, (n, 10)).astype(np.uint8)
        base = tmp_path / "store"
        nudb_io.write_nudb(base, keys, vals, salt=424242)
        k2, v2 = nudb_io.read_nudb_dat(str(base) + ".dat")
        np.testing.assert_array_equal(k2, keys)
        np.testing.assert_array_equal(v2, vals)
        hdr = nudb_io.read_nudb_header(str(base) + ".key")
        assert hdr["key_size"] == 8 and hdr["appnum"] == 1
        assert abs(hdr["load_factor"] - 0.5) < 1e-3
        samp = rng.choice(n, 300, replace=False)
        found, v = nudb_io.fetch_nudb(base, keys[samp])
        assert found.all()
        np.testing.assert_array_equal(v, vals[samp])
        miss = np.frombuffer(b"x" * 8 * 5, np.uint8).reshape(5, 8).copy()
        miss[:, 0] = np.arange(5) + ord("p")
        fm, _ = nudb_io.fetch_nudb(base, miss)
        assert not fm.any()

    def test_spill_chains(self, tmp_path):
        """Overflowing buckets spill to chained dat records, and both the
        scan reader and the bucket-path fetch handle them."""
        rng = np.random.default_rng(8)
        keys = _rand_keys(rng, 2000)
        n = keys.shape[0]
        vals = rng.integers(0, 256, (n, 10)).astype(np.uint8)
        base = tmp_path / "sp"
        nudb_io.write_nudb(base, keys, vals, block_size=256,
                           load_factor=4.0, salt=7)
        k2, v2 = nudb_io.read_nudb_dat(str(base) + ".dat")
        assert sorted(k2.view("S8").ravel().tolist()) == \
            sorted(keys.view("S8").ravel().tolist())
        found, v = nudb_io.fetch_nudb(base, keys)
        assert found.all()
        np.testing.assert_array_equal(v, vals)


class TestDataDirIntegration:
    @pytest.fixture(scope="class")
    def built(self, tmp_path_factory, fixture_dir):
        """CLI build that also writes the reference-format stores."""
        from signature_kmers_tpu.cli.main import main as cli_main

        out = tmp_path_factory.mktemp("kd_interop")
        rc = cli_main([
            "build-signatures",
            "-D", str(fixture_dir / "Annotations"),
            "-F", str(fixture_dir / "Seqs"),
            "--kmer-data-dir", str(out),
            "--final-kmers", "final.kmers",
            "--nudb-file", "nudb_store",
            "--perfect-hash", "kmers.mph",
            "--perfect-hash-data", "kmers.mph.data",
            "--no-recall",
        ])
        assert rc == 0
        return out

    def test_build_writes_reference_stores(self, built):
        assert (built / "nudb_store.dat").is_file()
        assert (built / "nudb_store.key").is_file()
        assert (built / "kmers.mph").is_file()
        assert (built / "kmers.mph.data").is_file()

    def test_nudb_store_matches_table(self, built):
        from signature_kmers_tpu.io import formats

        keys, vals = nudb_io.read_nudb_dat(built / "nudb_store.dat")
        rec = np.ascontiguousarray(vals).view(
            cmph_io.STORED_KMER_DTYPE).reshape(-1)
        hi, lo = cmph_io.packed_from_keys(keys)
        fhi, flo, favg, ffn = formats.read_final_kmers(built / "final.kmers")
        order = np.lexsort((lo, hi))
        np.testing.assert_array_equal(hi[order], fhi)
        np.testing.assert_array_equal(lo[order], flo)
        np.testing.assert_array_equal(rec["avg_from_end"][order], favg)
        np.testing.assert_array_equal(rec["function_index"][order], ffn)

    def test_call_from_reference_format_dirs(self, built, fixture_dir,
                                             tmp_path):
        """Calling off a dir holding ONLY reference-format artifacts
        (CMPH or NuDB + function.index) matches the native store."""
        from signature_kmers_tpu.cli.main import main as cli_main

        q = str(fixture_dir / "Queries" / "queries.fa")

        def run(dd, *extra):
            out = tmp_path / f"calls_{len(list(tmp_path.iterdir()))}.tsv"
            rc = cli_main(["call-functions", "-d", str(dd), "-i", q,
                           "-o", str(out), *extra])
            assert rc == 0
            return out.read_text()

        native = run(built)

        cm = tmp_path / "cmph_dir"
        cm.mkdir()
        (cm / "kmer_data.mph").write_bytes((built / "kmers.mph").read_bytes())
        (cm / "kmer_data.dat").write_bytes(
            (built / "kmers.mph.data").read_bytes())
        (cm / "function.index").write_bytes(
            (built / "function.index").read_bytes())
        (cm / "final.kmers").write_bytes((built / "final.kmers").read_bytes())
        assert run(cm) == native               # exact import path
        # aliasing path: non-member probes may add stray hits (that IS the
        # reference behavior, cmph_kmer.h:138-147), so scores can shift —
        # but every query must still resolve to the same function
        alias = run(cm, "--cmph-aliasing")
        a_rows = [r.split("\t")[:2] for r in alias.splitlines()]
        n_rows = [r.split("\t")[:2] for r in native.splitlines()]
        assert a_rows == n_rows

        nd = tmp_path / "nudb_dir"
        nd.mkdir()
        (nd / "kmer_data.dat").write_bytes(
            (built / "nudb_store.dat").read_bytes())
        (nd / "kmer_data.key").write_bytes(
            (built / "nudb_store.key").read_bytes())
        (nd / "function.index").write_bytes(
            (built / "function.index").read_bytes())
        assert run(nd) == native

    def test_table_tool_import_export(self, built, tmp_path):
        from signature_kmers_tpu.cli.main import main as cli_main

        exp = tmp_path / "exported"
        rc = cli_main(["table-tool", "export-cmph", str(built),
                       str(exp / "kmer_data")])
        assert rc == 0
        rc = cli_main(["table-tool", "export-nudb", str(built),
                       str(exp / "nudb")])
        assert rc == 0
        # import the exported cmph store (with keys from final.kmers)
        src = tmp_path / "src_dir"
        src.mkdir()
        for name, dst in (("kmer_data.mph", "kmer_data.mph"),
                          ("kmer_data.dat", "kmer_data.dat")):
            (src / dst).write_bytes((exp / name).read_bytes())
        (src / "final.kmers").write_bytes(
            (built / "final.kmers").read_bytes())
        (src / "function.index").write_bytes(
            (built / "function.index").read_bytes())
        dst = tmp_path / "imported"
        rc = cli_main(["table-tool", "import", str(src), str(dst)])
        assert rc == 0
        from signature_kmers_tpu.table import open_table

        t1 = open_table(built / "kmer_data")
        t2 = open_table(dst / "kmer_data")
        o1 = t1.occupied()
        o2 = t2.occupied()
        s1 = np.lexsort((o1[1], o1[0]))
        s2 = np.lexsort((o2[1], o2[0]))
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(a[s1], b[s2])
