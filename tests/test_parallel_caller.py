"""ParallelFunctionCaller (dp x tp mesh) vs the single-device caller."""

import numpy as np
import pytest

from signature_kmers_tpu.core.config import BuildConfig, DeviceConfig
from signature_kmers_tpu.io import fasta
from signature_kmers_tpu.models.function_caller import FunctionCaller
from signature_kmers_tpu.models.signature_builder import SignatureBuilder
from signature_kmers_tpu.parallel import mesh as mesh_mod
from signature_kmers_tpu.parallel.parallel_caller import (
    ParallelFunctionCaller, ShardedBucketTable)
from signature_kmers_tpu.utils import paths


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus_pc")
    generate_corpus(root)
    b = SignatureBuilder(BuildConfig())
    b.load_function_data([], [], paths.populate_path_list(
        [root / "Annotations"]))
    b.load_fasta(paths.populate_path_list([root / "Seqs"]), False, set())
    b.process_kept_functions(set())
    b.extract_kmers(set())
    kept = b.process_kmers()
    funcs = [b.fm.index_function_map[i]
             for i in sorted(b.fm.index_function_map)]
    return root, kept.to_table(), funcs


class TestShardedBucketTable:
    def test_shard_probe_covers_all_keys(self, built):
        _, table, _ = built
        st = ShardedBucketTable.from_table(table, 2)
        hi, lo, v0, v1, v2 = table.occupied()
        # each key is found in exactly one shard with the right fm word
        from signature_kmers_tpu.table.bucket_table import BucketKmerTable

        hits = np.zeros(hi.shape[0], dtype=int)
        for s in range(st.n_shards):
            t = BucketKmerTable(st.packed[s],
                                np.zeros_like(st.packed[s]),
                                int(st.salts[s]), 0)
            f, _, _, _ = t.lookup_np(hi, lo)
            hits += f.astype(int)
        np.testing.assert_array_equal(hits, np.ones_like(hits))


class TestParallelCaller:
    def test_matches_single_device(self, built):
        root, table, funcs = built
        mesh = mesh_mod.make_mesh(8)  # 4 dp x 2 tp
        dc = DeviceConfig(call_batch=16)
        pc = ParallelFunctionCaller(table, funcs, device_config=dc,
                                    mesh=mesh)
        sc = FunctionCaller(table, funcs, device_config=dc)
        batch = fasta.SequenceBatch.from_file(root / "Queries" / "queries.fa")
        # several rounds: 10 seqs with 16*4=64 per round -> single round;
        # also exercise the multi-round path with a tiny call_batch
        got = pc.call_batch(batch)
        want = sc.call_batch(batch)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.seq_id == w.seq_id
            assert g.best == w.best
            assert len(g.calls) == len(w.calls)

    def test_matches_single_device_tp1_mesh(self, built):
        """Regression: a dp-only mesh (tp=1, e.g. 2 devices) used to fail
        to trace — without the psum the probe outputs stayed tp-varying
        while lengths was not, and the automaton scan's carry types
        mismatched under shard_map's vma check (found by
        benchmarks/scaling_bench.py at n in {1, 2})."""
        root, table, funcs = built
        mesh = mesh_mod.make_mesh(2)  # 2 dp x 1 tp
        assert mesh_mod.tp_size(mesh) == 1
        dc = DeviceConfig(call_batch=16)
        pc = ParallelFunctionCaller(table, funcs, device_config=dc,
                                    mesh=mesh)
        sc = FunctionCaller(table, funcs, device_config=dc)
        batch = fasta.SequenceBatch.from_file(root / "Queries" / "queries.fa")
        got = pc.call_batch(batch)
        want = sc.call_batch(batch)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.seq_id == w.seq_id
            assert g.best == w.best

    def test_sorted_rounds_match_input_order(self, built):
        """sort_by_length on the mesh caller: mixed-length batch must
        return results in input order, identical to the unsorted path."""
        import dataclasses

        root, table, funcs = built
        mesh = mesh_mod.make_mesh(8)
        base = fasta.SequenceBatch.from_file(root / "Queries" / "queries.fa")
        recs = []
        for i in range(len(base)):
            s = base.seq_str(i)
            recs.append(fasta.FastaRecord(f"f{i}", "", s))
            recs.append(fasta.FastaRecord(f"h{i}", "", s[:len(s) // 2]))
            recs.append(fasta.FastaRecord(f"d{i}", "", s + s))
        batch = fasta.SequenceBatch.from_records(recs)
        dc_s = DeviceConfig(call_batch=8, sort_by_length=True)
        dc_p = DeviceConfig(call_batch=8, sort_by_length=False)
        r1 = ParallelFunctionCaller(table, funcs, device_config=dc_s,
                                    mesh=mesh).call_batch(batch)
        r2 = ParallelFunctionCaller(table, funcs, device_config=dc_p,
                                    mesh=mesh).call_batch(batch)
        assert [r.seq_id for r in r1] == batch.ids
        for a, c in zip(r1, r2):
            assert a.seq_id == c.seq_id
            assert (a.best.function_index, a.best.function, a.best.score) \
                == (c.best.function_index, c.best.function, c.best.score)

    def test_multi_round(self, built):
        root, table, funcs = built
        mesh = mesh_mod.make_mesh(8)
        dc = DeviceConfig(call_batch=2)  # 2*4dp = 8 per round, 10 seqs
        pc = ParallelFunctionCaller(table, funcs, device_config=dc,
                                    mesh=mesh)
        sc = FunctionCaller(table, funcs, device_config=dc)
        batch = fasta.SequenceBatch.from_file(root / "Queries" / "queries.fa")
        got = pc.call_batch(batch)
        want = sc.call_batch(batch)
        assert [g.best for g in got] == [w.best for w in want]


class TestShardedWideTable:
    def test_shard_probe_covers_all_keys(self, built):
        import jax
        import jax.numpy as jnp

        from signature_kmers_tpu.parallel.parallel_caller import \
            ShardedWideTable
        from signature_kmers_tpu.table.wide_table import WideKmerTable

        _, table, _ = built
        assert isinstance(table, WideKmerTable)
        st = ShardedWideTable.from_table(table, 2)
        hi, lo, v0, v1, v2 = table.occupied()
        exp_fm = ((v0 >> 16) << 16) | (v1 & 0xFFFF)
        hits = np.zeros(hi.shape[0], dtype=int)
        fm_seen = np.zeros(hi.shape[0], dtype=np.uint32)
        probe = jax.jit(lambda *a: st.probe(a[:4], a[4], a[5]))
        for s in range(st.n_shards):
            f, fm = probe(jnp.asarray(st.packed[s:s + 1]),
                          jnp.asarray(st.ov_packed[s:s + 1]),
                          jnp.asarray(st.salts[s:s + 1]),
                          jnp.asarray(st.ov_salts[s:s + 1]),
                          jnp.asarray(hi), jnp.asarray(lo))
            f = np.asarray(f)
            hits += f.astype(int)
            fm_seen = np.where(f, np.asarray(fm), fm_seen)
        np.testing.assert_array_equal(hits, np.ones_like(hits))
        np.testing.assert_array_equal(fm_seen, exp_fm)


class TestShardedWideSmallOverflow:
    def test_small_overflow_set(self):
        """Regression: a sharded build whose per-shard overflow set is
        SMALL used to compute ov_bits = max(16, ...) — below the >=17
        tag/sentinel exactness floor — and raise ValueError (found by
        benchmarks/scaling_bench.py at 100K-500K keys)."""
        from signature_kmers_tpu.parallel.parallel_caller import \
            ShardedWideTable
        from signature_kmers_tpu.table.kmer_table import KmerTable
        from signature_kmers_tpu.table.wide_table import WideKmerTable

        rng = np.random.default_rng(4)
        n = 120_000
        hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
        lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
        pk = (hi.astype(np.uint64) << 24) | lo
        _, idx = np.unique(pk, return_index=True)
        hi, lo = hi[idx], lo[idx]
        n = hi.shape[0]
        v0, v1, v2 = KmerTable.pack_values(
            rng.integers(0, 300, n), rng.integers(0, 50, n),
            np.full(n, 300, np.uint32), np.full(n, 300, np.uint32),
            np.full(n, 900, np.uint32))
        table = WideKmerTable.build(hi, lo, v0.astype(np.uint32),
                                    v1.astype(np.uint32),
                                    v2.astype(np.uint32))
        st = ShardedWideTable.from_table(table, 2)
        assert st.ov_bits >= 17
        if st.ov_any:
            # every key still found in exactly one shard
            found = np.zeros(n, dtype=int)
            for s in range(st.n_shards):
                s_main = st.packed.shape[2] // 2
                s_ov = st.ov_packed.shape[2] // 2
                sub = WideKmerTable(
                    st.packed[s],
                    np.zeros((st.packed[s].shape[0], 3 * s_main), np.uint32),
                    st.ov_packed[s],
                    np.zeros((st.ov_packed[s].shape[0], 3 * s_ov), np.uint32),
                    int(st.salts[s]), st.bits, int(st.ov_salts[s]),
                    st.ov_bits, 0, 1)
                f, _, _, _ = sub.lookup_np(hi, lo)
                found += f.astype(int)
            np.testing.assert_array_equal(found, np.ones_like(found))


class TestMeshGatherHits:
    @pytest.mark.parametrize("layout", ["wide", "cuckoo"])
    @pytest.mark.parametrize("need_aux", [False, True])
    def test_matches_single_device(self, built, layout, need_aux):
        """The mesh gather_hits_batch override — the /lookup (keep_hits)
        path probing the TP-SHARDED table, with full value words when
        need_aux — is bit-identical to the single-device gather on both
        production layouts (ref surface: kser_request.cc:446-467
        LookupRequest)."""
        from signature_kmers_tpu.models.function_caller import pad_bucketed

        root, table, funcs = built
        if layout == "cuckoo":
            from signature_kmers_tpu.table.bucket_table import \
                BucketKmerTable

            table = BucketKmerTable.build(*table.occupied())
        mesh = mesh_mod.make_mesh(8)  # 4 dp x 2 tp
        dc = DeviceConfig(call_batch=16)
        pc = ParallelFunctionCaller(table, funcs, device_config=dc,
                                    mesh=mesh)
        sc = FunctionCaller(table, funcs, device_config=dc)
        batch = fasta.SequenceBatch.from_file(
            root / "Queries" / "queries.fa")
        codes, lengths = pad_bucketed(batch, 16)
        got = pc.gather_hits_batch(codes, lengths, need_aux=need_aux)
        exp = sc.gather_hits_batch(codes, lengths, need_aux=need_aux)
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(e))
        assert np.asarray(got[0]).any()  # some hits actually gathered


class TestParallelCallerCuckoo:
    def test_matches_single_device_cuckoo_layout(self, built):
        from signature_kmers_tpu.table.bucket_table import BucketKmerTable

        root, table, funcs = built
        ctable = BucketKmerTable.build(*table.occupied())
        mesh = mesh_mod.make_mesh(8)
        dc = DeviceConfig(call_batch=16)
        pc = ParallelFunctionCaller(ctable, funcs, device_config=dc,
                                    mesh=mesh)
        sc = FunctionCaller(ctable, funcs, device_config=dc)
        batch = fasta.SequenceBatch.from_file(root / "Queries" / "queries.fa")
        got = pc.call_batch(batch)
        want = sc.call_batch(batch)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.seq_id == w.seq_id and g.best == w.best


class TestSharding16:
    """tp=16 sharded builds (the pre-sizing two-pass builder must
    converge without the old restart-all loop)."""

    def test_bucket_tp16_covers_all_keys(self, built):
        from signature_kmers_tpu.table.bucket_table import BucketKmerTable

        _, table, _ = built
        st = ShardedBucketTable.from_table(table, 16)
        assert st.n_shards == 16
        hi, lo, v0, v1, v2 = table.occupied()
        hits = np.zeros(hi.shape[0], dtype=int)
        for s in range(st.n_shards):
            t = BucketKmerTable(st.packed[s], np.zeros_like(st.packed[s]),
                                int(st.salts[s]), 0)
            f, _, _, _ = t.lookup_np(hi, lo)
            hits += f.astype(int)
        np.testing.assert_array_equal(hits, np.ones_like(hits))

    def test_wide_tp16_covers_all_keys(self, built):
        import jax
        import jax.numpy as jnp

        from signature_kmers_tpu.parallel.parallel_caller import \
            ShardedWideTable

        _, table, _ = built
        st = ShardedWideTable.from_table(table, 16)
        hi, lo, v0, v1, v2 = table.occupied()
        exp_fm = ((v0 >> 16) << 16) | (v1 & 0xFFFF)
        hits = np.zeros(hi.shape[0], dtype=int)
        fm_seen = np.zeros(hi.shape[0], dtype=np.uint32)
        probe = jax.jit(lambda *a: st.probe(a[:4], a[4], a[5]))
        for s in range(st.n_shards):
            f, fm = probe(jnp.asarray(st.packed[s:s + 1]),
                          jnp.asarray(st.ov_packed[s:s + 1]),
                          jnp.asarray(st.salts[s:s + 1]),
                          jnp.asarray(st.ov_salts[s:s + 1]),
                          jnp.asarray(hi), jnp.asarray(lo))
            f = np.asarray(f)
            hits += f.astype(int)
            fm_seen = np.where(f, np.asarray(fm), fm_seen)
        np.testing.assert_array_equal(hits, np.ones_like(hits))
        np.testing.assert_array_equal(fm_seen, exp_fm)
