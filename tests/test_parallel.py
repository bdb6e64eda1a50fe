"""Multi-device tests on the virtual 8-CPU mesh: tp-sharded table probing
and the dp-sharded all-to-all build step, validated against single-device
results."""

import numpy as np
import pytest

from signature_kmers_tpu.core.config import TableConfig
from signature_kmers_tpu.parallel import build_step, mesh as mesh_mod
from signature_kmers_tpu.parallel.sharded_table import (ShardedKmerTable,
                                                        probe_sharded)
from signature_kmers_tpu.table.kmer_table import KmerTable


def random_keys(rng, n):
    hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    packed = (hi.astype(np.uint64) << 24) | lo.astype(np.uint64)
    _, idx = np.unique(packed, return_index=True)
    return hi[idx], lo[idx]


@pytest.fixture(scope="module")
def mesh8():
    import jax

    assert len(jax.devices()) == 8
    return mesh_mod.make_mesh(8)  # 4 dp x 2 tp


class TestShardedTable:
    def test_probe_matches_flat(self, mesh8):
        rng = np.random.default_rng(7)
        hi, lo = random_keys(rng, 4000)
        n = hi.shape[0]
        v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
        v2 = rng.integers(0, 2**32, n, dtype=np.uint32)
        flat = KmerTable.build(hi, lo, v0, v1, v2)
        sharded = ShardedKmerTable.build(hi, lo, v0, v1, v2,
                                         mesh_mod.tp_size(mesh8))
        qh, ql = random_keys(rng, 1500)
        qh = np.concatenate([qh, hi[:500]])[:1024 * 2]
        ql = np.concatenate([ql, lo[:500]])[:1024 * 2]
        # dp-divisible flat query vector
        m = (qh.shape[0] // mesh_mod.dp_size(mesh8)) * mesh_mod.dp_size(mesh8)
        qh, ql = qh[:m], ql[:m]

        arrays = sharded.device_put(mesh8)
        fd, r0, r1, r2 = probe_sharded(mesh8, arrays, qh, ql,
                                       sharded.max_probes)
        fh, h0, h1, h2 = flat.lookup_np(qh, ql)
        np.testing.assert_array_equal(np.asarray(fd), fh)
        np.testing.assert_array_equal(np.asarray(r0), h0)
        np.testing.assert_array_equal(np.asarray(r1), h1)
        np.testing.assert_array_equal(np.asarray(r2), h2)


class TestShardedBuild:
    def test_matches_single_device_select(self, mesh8):
        from signature_kmers_tpu.models.signature_builder import (
            SignatureBuilder)

        rng = np.random.default_rng(11)
        ndp = mesh_mod.dp_size(mesh8)
        n = 4096  # divisible by dp
        # synthetic attribute set: ~300 distinct kmers, 5 functions
        hi = rng.integers(0, 300, n).astype(np.uint32)
        lo = (hi * 77 % 997).astype(np.uint32)
        func = rng.integers(0, 5, n).astype(np.int32)
        # make some kmers dominant-function so they pass the 80% rule
        dominant = hi % 3 == 0
        func = np.where(dominant, (hi % 5).astype(np.int32), func)
        off = rng.integers(0, 400, n).astype(np.int32)
        plen = rng.integers(50, 800, n).astype(np.int32)
        sid = rng.integers(0, 200, n).astype(np.int32)

        # single-device reference result
        sb = SignatureBuilder()
        single = sb._select(hi, lo, func, off, plen, sid)

        outs = build_step.build_step_sharded(mesh8, hi, lo, func, off,
                                             plen, sid)
        kept = build_step.finalize_sharded(outs)

        np.testing.assert_array_equal(kept["hi"], single.hi)
        np.testing.assert_array_equal(kept["lo"], single.lo)
        np.testing.assert_array_equal(kept["function_index"],
                                      single.function_index)
        np.testing.assert_array_equal(kept["avg_from_end"],
                                      single.avg_from_end)
        np.testing.assert_array_equal(kept["mean"], single.mean)
        np.testing.assert_array_equal(kept["median"], single.median)
        np.testing.assert_array_equal(kept["var"], single.var)
        assert len(kept["hi"]) > 50


class TestShardedBuildFromSeqs:
    def test_matches_single_device_from_seqs(self, mesh8):
        """Corpus-sharded mesh build (device extraction per dp shard +
        all-to-all routing) vs the single-device fused path, from the
        same raw sequences."""
        from signature_kmers_tpu.core import alphabet
        from signature_kmers_tpu.models.signature_builder import (
            SignatureBuilder)

        rng = np.random.default_rng(23)
        B = 160
        aa = alphabet.encode_seq(alphabet.AA20)
        plens = rng.integers(8, 300, B).astype(np.int32)
        # small alphabet slice -> heavy k-mer sharing across sequences
        codes = aa[rng.integers(0, 6, int(plens.sum()))].astype(np.uint8)
        sids = np.arange(B, dtype=np.int32)
        fidxs = ((np.arange(B) // 8) % 7).astype(np.int32)
        chunk = (codes, sids, fidxs, plens)

        sb = SignatureBuilder()
        sb._seq_chunks.append(chunk)
        single = sb.process_kmers()

        sb2 = SignatureBuilder()
        sb2._seq_chunks.append(chunk)
        kept = sb2.process_kmers(mesh=mesh8)

        np.testing.assert_array_equal(kept.hi, single.hi)
        np.testing.assert_array_equal(kept.lo, single.lo)
        np.testing.assert_array_equal(kept.function_index,
                                      single.function_index)
        np.testing.assert_array_equal(kept.avg_from_end,
                                      single.avg_from_end)
        np.testing.assert_array_equal(kept.mean, single.mean)
        np.testing.assert_array_equal(kept.median, single.median)
        np.testing.assert_array_equal(kept.var, single.var)
        assert len(kept) > 0
        assert (sb2.stats.seqs_with_a_signature
                == sb.stats.seqs_with_a_signature)


class TestShardedNaturalBreaks:
    def test_matches_single_device_cutoff(self, mesh8):
        from signature_kmers_tpu.stats.natural_breaks import (
            score_cutoff, sharded_score_cutoff)

        rng = np.random.default_rng(3)
        scores = np.concatenate([rng.normal(0.1, 0.01, 4000),
                                 rng.normal(0.9, 0.01, 4000)]).astype(
            np.float32)
        rng.shuffle(scores)
        got = sharded_score_cutoff(mesh8, scores)
        want = score_cutoff(scores.tolist())
        # binned cutoff within one bin width of the exact cutoff
        assert abs(got - want) < (scores.max() - scores.min()) / 1024


class TestMeshMatrixDistance:
    def test_pair_counts_match_single_device(self, mesh8):
        """Pair-count blocks sharded over all 8 devices + psum must equal
        the single-device incidence matmul exactly (integer-valued f32
        partial sums are order-invariant)."""
        from signature_kmers_tpu.models.matrix_distance import MatrixDistance

        rng = np.random.default_rng(11)
        n_seqs = 40
        n_kmers = 3000
        # ~20 hits per kmer -> heavy pair sharing
        kmer_id = np.repeat(np.arange(n_kmers), 4)
        seqs = rng.integers(0, n_seqs, kmer_id.size)
        # distinct (kmer, seq) pairs, as compute() guarantees
        pk = kmer_id.astype(np.int64) * n_seqs + seqs
        pk = np.unique(pk)
        kmer_id = (pk // n_seqs).astype(np.int64)
        seqs = (pk % n_seqs).astype(np.int64)

        md = MatrixDistance.__new__(MatrixDistance)
        md.use_device = True
        single = md._pair_counts(kmer_id, seqs, n_seqs)
        sharded = md._pair_counts(kmer_id, seqs, n_seqs, mesh=mesh8)
        np.testing.assert_array_equal(single, sharded)
        assert single.sum() > 0
