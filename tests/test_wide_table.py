"""Wide-bucket table: Feistel key permutation, build, probe, caller parity.

The wide layout stores only a tag per slot; exactness rests on the 48-bit
Feistel permutation being injective and (bucket, tag) covering all of it.
These tests fuzz that end to end against brute force, the host probe, the
device probe, and the full caller against the cuckoo-table path.
"""

import numpy as np
import pytest

from signature_kmers_tpu.ops import hashing
from signature_kmers_tpu.table.bucket_table import BucketKmerTable
from signature_kmers_tpu.table.wide_table import WideKmerTable, WideTableConfig


def random_keys(rng, n):
    hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    packed = (hi.astype(np.uint64) << 24) | lo.astype(np.uint64)
    _, idx = np.unique(packed, return_index=True)
    return hi[idx], lo[idx]


def random_values(rng, n):
    return (rng.integers(0, 2**32, n, dtype=np.uint32),
            rng.integers(0, 2**32, n, dtype=np.uint32),
            rng.integers(0, 2**32, n, dtype=np.uint32))


class TestPerm48:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        hi, lo = random_keys(rng, 20000)
        for salt in (0, 0x51DE0000, 0xDEADBEEF):
            L, R = hashing.perm48(hi, lo, salt)
            assert (L <= 0xFFFFFF).all() and (R <= 0xFFFFFF).all()
            h2, l2 = hashing.perm48_inv(L, R, salt)
            np.testing.assert_array_equal(h2, hi)
            np.testing.assert_array_equal(l2, lo)

    def test_bucket_tag_bijection(self):
        rng = np.random.default_rng(1)
        hi, lo = random_keys(rng, 30000)
        L, R = hashing.perm48(hi, lo, 7)
        for bits in (17, 20, 24, 26):
            b, t = hashing.wide_bucket_tag(L, R, bits)
            assert (t <= (1 << (48 - bits)) - 1).all()
            key = (b.astype(np.uint64) << 32) | t
            assert np.unique(key).shape[0] == hi.shape[0]

    def test_bucket_tag_inverse_above_24_bits(self):
        # the bits > 24 split (and its inverse used by occupied()) without
        # allocating a 2^26-bucket table
        rng = np.random.default_rng(12)
        hi, lo = random_keys(rng, 20000)
        L, R = hashing.perm48(hi, lo, 99)
        for bits in (25, 26, 30):
            b, t = hashing.wide_bucket_tag(L, R, bits)
            L2 = ((t << np.uint32(bits - 24))
                  | (b >> np.uint32(24))).astype(np.uint32)
            R2 = b & np.uint32(0xFFFFFF)
            np.testing.assert_array_equal(L2, L)
            np.testing.assert_array_equal(R2, R)

    def test_bits_bounds(self):
        # 16 is excluded: the tag would use all 32 bits, so an arbitrary
        # QUERY key's tag could equal the 0xFFFFFFFF empty-slot sentinel
        # and falsely match empty slots (build-side re-salting can't fix
        # a query-side collision)
        for bad in (15, 16, 31):
            with pytest.raises(ValueError):
                hashing.wide_bucket_tag(np.uint32(0), np.uint32(0), bad)
        with pytest.raises(ValueError, match="min_bits"):
            z = np.zeros(0, dtype=np.uint32)
            WideKmerTable.build(z, z, z, z, z, WideTableConfig(min_bits=16))


class TestWideTable:
    def _build(self, rng, n, **cfg):
        hi, lo = random_keys(rng, n)
        n = hi.shape[0]
        v0, v1, v2 = random_values(rng, n)
        t = WideKmerTable.build(hi, lo, v0, v1, v2,
                                WideTableConfig(**cfg) if cfg
                                else WideTableConfig())
        return t, hi, lo, v0, v1, v2

    def test_build_and_lookup(self):
        rng = np.random.default_rng(2)
        t, hi, lo, v0, v1, v2 = self._build(rng, 40000)
        found, r0, r1, r2 = t.lookup_np(hi, lo)
        assert found.all()
        np.testing.assert_array_equal(r0, v0)
        np.testing.assert_array_equal(r1, v1)
        np.testing.assert_array_equal(r2, v2)
        mh, ml = random_keys(rng, 20000)
        member = set(zip(hi.tolist(), lo.tolist()))
        miss = np.array([(h, l) not in member
                         for h, l in zip(mh.tolist(), ml.tolist())])
        f2, m0, m1, m2 = t.lookup_np(mh, ml)
        assert not f2[miss].any()
        assert (m0[miss] == 0).all() and (m2[miss] == 0).all()

    def test_overflow_path_exercised(self):
        # slots=1 at high load forces a large Poisson tail into overflow
        rng = np.random.default_rng(3)
        t, hi, lo, v0, v1, v2 = self._build(
            rng, 200000, slots=1, main_load=1.5, min_bits=17)
        assert t.ov_items > 1000
        found, r0, r1, r2 = t.lookup_np(hi, lo)
        assert found.all()
        np.testing.assert_array_equal(r0, v0)
        np.testing.assert_array_equal(r2, v2)

    def test_sub_cliff_auto_sizing_boundary(self):
        """Medium tables auto-size the main store to the largest
        sub-cliff bucket count (arrays <= sub_cliff_bytes gather in the
        chip's fast state, docs/PERF.md r4); keys that no longer fit a
        sub-cliff main at the load cap keep the default sizing.  Scaled
        budget (8 MB) so the test builds in seconds; the boundary
        arithmetic is identical at the production 64 MB."""
        SUB = 8 << 20  # bits_cap = 18 at the 4-slot rows (2^18*32B = 8MB)
        cap_keys = (1 << 18) * 4 * 0.6  # 629,145 at the 0.6 load cap

        rng = np.random.default_rng(11)
        t, hi, lo, v0, v1, v2 = self._build(
            rng, 600_000, sub_cliff_bytes=SUB)
        assert t.bits == 18  # sub-cliff chosen (default sizing => 21)
        assert t.slots == 4  # sub-cliff variant widens to 32 B rows
        assert t.packed.nbytes <= SUB
        assert t.ov_packed.nbytes <= SUB  # leaf stays sub-cliff too
        assert t.n_items <= cap_keys
        # exactness is untouched by the denser layout
        found, r0, r1, r2 = t.lookup_np(hi, lo)
        assert found.all()
        np.testing.assert_array_equal(r0, v0)
        np.testing.assert_array_equal(r2, v2)
        mh, ml = random_keys(rng, 20000)
        member = set(zip(hi.tolist(), lo.tolist()))
        miss = np.array([(h, l) not in member
                         for h, l in zip(mh.tolist(), ml.tolist())])
        f2, _m0, _m1, _m2 = t.lookup_np(mh, ml)
        assert not f2[miss].any()

        # just OVER the load cap: default sizing retained
        t2, hi2, lo2, _v0, _v1, _v2 = self._build(
            rng, 700_000, sub_cliff_bytes=SUB)
        assert t2.bits > 19
        f3, _r0, _r1, _r2 = t2.lookup_np(hi2, lo2)
        assert f3.all()

    def test_sub_cliff_save_load_preserves_layout(self, tmp_path):
        """The compact format records bits: a sub-cliff table reloads
        into the SAME geometry (probe-image determinism across load
        cycles)."""
        rng = np.random.default_rng(12)
        t, hi, lo, v0, v1, v2 = self._build(
            rng, 600_000, sub_cliff_bytes=8 << 20)
        assert t.bits == 18 and t.slots == 4
        t.save(tmp_path / "kd")
        t2 = WideKmerTable.load(tmp_path / "kd")
        assert t2.bits == t.bits
        np.testing.assert_array_equal(t2.packed, t.packed)

    def test_occupied_reconstructs_keys(self):
        rng = np.random.default_rng(4)
        t, hi, lo, v0, v1, v2 = self._build(
            rng, 50000, slots=2, main_load=1.0)
        assert t.ov_items > 0  # both stores contribute
        oh, ol, o0, o1, o2 = t.occupied()
        order = np.lexsort((lo, hi))
        np.testing.assert_array_equal(oh, hi[order])
        np.testing.assert_array_equal(ol, lo[order])
        np.testing.assert_array_equal(o0, v0[order])
        np.testing.assert_array_equal(o1, v1[order])
        np.testing.assert_array_equal(o2, v2[order])

    def test_save_load(self, tmp_path):
        rng = np.random.default_rng(5)
        t, hi, lo, v0, v1, v2 = self._build(rng, 3000)
        # both persistence formats: compact (default; entries only,
        # re-placed on load) and placed (probe image verbatim)
        for tag, kwargs in (("compact", {}), ("placed", {"compact": False})):
            base = tmp_path / f"wide_{tag}"
            t.save(base, **kwargs)
            assert WideKmerTable.exists(base)
            assert not BucketKmerTable.exists(base)
            t2 = WideKmerTable.load(base)
            assert t2.n_items == t.n_items
            f, r0, r1, r2 = t2.lookup_np(hi, lo)
            assert f.all()
            np.testing.assert_array_equal(r1, v1)
            # misses stay misses after a round trip (exact membership)
            miss_hi = (hi ^ np.uint32(0x5A5A5A)) % np.uint32(1 << 24)
            fm, *_ = t2.lookup_np(miss_hi, lo)
            pk = (hi.astype(np.uint64) << 24) | lo
            mk = (miss_hi.astype(np.uint64) << 24) | lo
            real = np.isin(mk, pk)
            assert not fm[~real].any()

    def test_empty_and_single(self):
        z = np.zeros(0, dtype=np.uint32)
        t = WideKmerTable.build(z, z, z, z, z)
        f, *_ = t.lookup_np(np.asarray([5], np.uint32),
                            np.asarray([9], np.uint32))
        assert not f.any()
        one = np.asarray([12345], np.uint32)
        t1 = WideKmerTable.build(one, one, one, one, one)
        f, r0, _, _ = t1.lookup_np(one, one)
        assert f.all() and r0[0] == 12345

    def test_device_probe_matches_host(self):
        import jax
        import jax.numpy as jnp

        from signature_kmers_tpu.ops import probe

        rng = np.random.default_rng(6)
        t, hi, lo, v0, v1, v2 = self._build(rng, 30000, slots=4,
                                            main_load=1.2)
        assert t.ov_items > 0
        qh, ql = random_keys(rng, 4000)
        qh = np.concatenate([qh, hi[:4000]]).reshape(2, -1)
        ql = np.concatenate([ql, lo[:4000]]).reshape(2, -1)

        pfn, arrays = probe.table_probe(t, with_aux=False)
        fd, fm = jax.jit(pfn)(*arrays, jnp.asarray(qh), jnp.asarray(ql))
        fh, h0, h1, h2 = t.lookup_np(qh, ql)
        np.testing.assert_array_equal(np.asarray(fd), fh)
        exp_fm = ((h0 >> 16) << 16) | (h1 & 0xFFFF)
        np.testing.assert_array_equal(np.asarray(fm), exp_fm)

        pfn, arrays = probe.table_probe(t, with_aux=True)
        fd, fm, d0, d1, d2 = jax.jit(pfn)(*arrays, jnp.asarray(qh),
                                          jnp.asarray(ql))
        np.testing.assert_array_equal(np.asarray(fd), fh)
        np.testing.assert_array_equal(np.asarray(d0), h0)
        np.testing.assert_array_equal(np.asarray(d1), h1)
        np.testing.assert_array_equal(np.asarray(d2), h2)


class TestCallerParity:
    def test_caller_identical_across_layouts(self):
        """Full caller pipeline: wide table == cuckoo table, row for row."""
        from signature_kmers_tpu.core import alphabet
        from signature_kmers_tpu.core.config import CallConfig, DeviceConfig
        from signature_kmers_tpu.io.fasta import SequenceBatch
        from signature_kmers_tpu.models.function_caller import FunctionCaller
        from signature_kmers_tpu.table.kmer_table import KmerTable

        rng = np.random.default_rng(7)
        aa = alphabet.encode_seq(alphabet.AA20)
        corpus = aa[rng.integers(0, 20, 60000 + 7)].astype(np.uint8)
        hi, lo = alphabet.pack_codes_np(corpus)
        fn = ((np.arange(hi.shape[0]) // 120) % 300).astype(np.uint32)
        packed = (hi.astype(np.uint64) << 24) | lo
        _, idx = np.unique(packed, return_index=True)
        idx.sort()
        hi, lo, fn = hi[idx], lo[idx], fn[idx]
        n = hi.shape[0]
        v0, v1, v2 = KmerTable.pack_values(
            rng.integers(0, 120, n), fn,
            np.full(n, 120, np.uint32), np.full(n, 120, np.uint32),
            np.full(n, 400, np.uint32))
        tb = BucketKmerTable.build(hi, lo, v0, v1, v2)
        tw = WideKmerTable.build(hi, lo, v0, v1, v2,
                                 WideTableConfig(slots=2, main_load=1.0))
        assert tw.ov_items > 0

        nq, slen = 96, 120
        starts = rng.integers(0, 60000 - slen, nq)
        codes = np.stack([corpus[s:s + slen] for s in starts]).copy()
        for q in range(nq):  # mutations + an ambiguous residue
            pos = rng.integers(0, slen, 4)
            codes[q, pos] = aa[rng.integers(0, 20, 4)]
        codes[5, 60] = alphabet.INVALID_CODE
        flat = codes.reshape(-1)
        offs = (np.arange(nq + 1) * slen).astype(np.int32)
        batch = SequenceBatch(flat, offs, [f"q{i}" for i in range(nq)],
                              [""] * nq)
        findex = [f"fn{i}" for i in range(300)] + ["hypothetical protein"]

        res = []
        for table in (tb, tw):
            caller = FunctionCaller(table, findex, CallConfig(),
                                    DeviceConfig(call_batch=64))
            res.append(caller.call_batch(batch))
        a, b = res
        assert len(a) == len(b) == nq
        for ra, rb in zip(a, b):
            assert ra.seq_id == rb.seq_id
            assert ra.best.function_index == rb.best.function_index
            assert ra.best.function == rb.best.function
            assert ra.best.score == rb.best.score
            assert [(c.start, c.end, c.count, c.function_index)
                    for c in ra.calls] == \
                   [(c.start, c.end, c.count, c.function_index)
                    for c in rb.calls]


class TestNativeBuild:
    def test_native_matches_numpy_placement(self):
        from signature_kmers_tpu.runtime import host
        from signature_kmers_tpu.table import wide_table as wt

        if not host.available():
            pytest.skip("native runtime unavailable")
        rng = np.random.default_rng(8)
        hi, lo = random_keys(rng, 30000)
        n = hi.shape[0]
        v0, v1, v2 = random_values(rng, n)
        for bits, S in ((17, 2), (18, 1), (20, 4)):
            a = host.build_wide_place(hi, lo, v0, v1, v2, bits, 0x5EED, S)
            b = wt._place_tagged_np(hi, lo, v0, v1, v2, bits, 0x5EED, S)
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])
            np.testing.assert_array_equal(a[2], b[2])

    def test_duplicate_detection(self):
        rng = np.random.default_rng(9)
        hi, lo = random_keys(rng, 5000)
        hi = np.concatenate([hi, hi[:1]])
        lo = np.concatenate([lo, lo[:1]])
        n = hi.shape[0]
        v = np.zeros(n, np.uint32)
        with pytest.raises(ValueError, match="duplicate"):
            WideKmerTable.build(hi, lo, v, v, v)


def test_all_layouts_satisfy_table_protocol():
    """Every layout (and the CMPH emulation table) implements the
    KmerTableProtocol surface (table/__init__.py)."""
    from signature_kmers_tpu.table import (BucketKmerTable, KmerTable,
                                           KmerTableProtocol, WideKmerTable)
    from signature_kmers_tpu.table.cmph_table import CmphKmerTable

    for cls in (WideKmerTable, BucketKmerTable, KmerTable, CmphKmerTable):
        for name in ("lookup_np", "device_arrays", "save", "load", "exists"):
            assert hasattr(cls, name), (cls.__name__, name)
    import numpy as np

    hi = np.arange(64, dtype=np.uint32)
    lo = np.arange(64, dtype=np.uint32)
    v = np.arange(64, dtype=np.uint32)
    t = WideKmerTable.build(hi, lo, v, v, v)
    assert isinstance(t, KmerTableProtocol)
