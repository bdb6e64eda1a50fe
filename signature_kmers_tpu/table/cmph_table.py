"""Reference-format CMPH table: probe a .mph + .dat pair directly.

Bug-compatible emulation of the reference's production read path
(cmph_kmer.h:139-147): ``fetch`` = cmph_search + flat array read with NO
membership verification, so k-mers outside the signature set alias onto
arbitrary real records (every slot holds some key's record — the MPH is
a bijection).  A query "misses" only in the rank corner case where
bdz_search returns m (cmph_kmer.h:141: ``kidx >= hash_size_``).

Use this layout to run inference off an existing PATRIC/reference data
dir without conversion, or to reproduce the reference's aliasing
behavior exactly.  For exact-membership semantics, import the store into
a native layout instead (pipeline.load_data_dir / table-tool import).

The device probe runs the full BDZ search on-chip: Jenkins hash (3 uint32
lanes), three 2-bit g lookups, rank gather, value-row gather.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core import alphabet
from ..interop import cmph as cmph_io
from ..interop.hashes import GOLDEN, jenkins_mix


class CmphKmerTable:
    """HBM-probeable view of a reference CMPH store (aliasing semantics)."""

    aliasing = True  # probes do NOT verify membership (cmph_kmer.h:138-147)

    def __init__(self, mph: cmph_io.BdzMph, values: np.ndarray):
        self.mph = mph
        if values.shape[0] < mph.m:
            raise ValueError(
                f"value array has {values.shape[0]} records, mph m={mph.m}")
        self.values = values
        self._rank = mph.rank_array()
        # packed value words in the shared (v0, v1, v2) layout
        v = values
        self.v0 = (v["avg_from_end"].astype(np.uint32)
                   | (v["function_index"].astype(np.uint32) << 16))
        self.v1 = (v["mean"].astype(np.uint32)
                   | (v["median"].astype(np.uint32) << 16))
        self.v2 = v["var"].astype(np.uint32)
        self._jnp_arrays = None

    # -- shape/introspection -------------------------------------------------

    @property
    def n_items(self) -> int:
        return self.mph.m

    def size(self) -> int:
        return self.mph.m

    def memory_bytes(self) -> int:
        return (self.mph.g.nbytes + self._rank.nbytes + self.v0.nbytes
                + self.v1.nbytes + self.v2.nbytes)

    # -- persistence (reference formats) -------------------------------------

    @staticmethod
    def exists(base) -> bool:
        base = str(base)
        return (Path(base + ".mph").is_file()
                and Path(base + ".dat").is_file())

    @staticmethod
    def load(base) -> "CmphKmerTable":
        base = str(base)
        mph = cmph_io.load_mph(base + ".mph")
        values = cmph_io.read_cmph_values(base + ".dat")
        return CmphKmerTable(mph, values)

    def save(self, base) -> None:
        base = str(base)
        cmph_io.save_mph(base + ".mph", self.mph)
        np.ascontiguousarray(self.values[:self.mph.m]).tofile(base + ".dat")

    # -- host probe ----------------------------------------------------------

    def _indices_np(self, qhi, qlo) -> np.ndarray:
        keys = cmph_io.keys_from_packed(np.asarray(qhi, np.uint32).reshape(-1),
                                        np.asarray(qlo, np.uint32).reshape(-1))
        h0, h1, h2 = cmph_io.jenkins_hash3_bytes(self.mph.seed, keys)
        r = np.uint32(self.mph.r)
        hl = np.stack([(h0 % r).astype(np.int64),
                       (h1 % r).astype(np.int64) + self.mph.r,
                       (h2 % r).astype(np.int64) + 2 * self.mph.r], axis=1)
        g = self.mph.g
        gv = (g[hl >> 2] >> ((hl & 3) << 1)) & 3
        sel = gv.sum(axis=1) % 3
        vertex = hl[np.arange(hl.shape[0]), sel]
        return self._rank[vertex].astype(np.int64)

    def lookup_np(self, qhi, qlo, with_aux: bool = True):
        """Vectorized host probe with ALIASING semantics.

        Returns (found, v0, v1, v2); found is False only for the
        rank == m corner (the reference's only miss path)."""
        shape = np.asarray(qhi).shape
        idx = self._indices_np(qhi, qlo)
        found = idx < self.mph.m
        idxc = np.minimum(idx, self.mph.m - 1)
        z = np.uint32(0)
        r0 = np.where(found, self.v0[idxc], z).reshape(shape)
        r1 = np.where(found, self.v1[idxc], z).reshape(shape)
        r2 = np.where(found, self.v2[idxc], z).reshape(shape)
        return found.reshape(shape), r0, r1, r2

    # -- device probe --------------------------------------------------------

    def device_arrays(self, with_aux: bool = False):
        import jax.numpy as jnp

        if self._jnp_arrays is None:
            self._jnp_arrays = (
                jnp.asarray(self.mph.g),
                jnp.asarray(self._rank.astype(np.int32)),
                jnp.asarray(self.v0), jnp.asarray(self.v1),
                jnp.asarray(self.v2))
        g, rank, v0, v1, v2 = self._jnp_arrays
        if with_aux:
            return (g, rank, v0, v1, v2)
        return (g, rank, v0, v1)

    def probe(self, with_aux: bool):
        """Device probe fn matching ops.probe.table_probe's contract:
        fn(*device_arrays, qhi, qlo) -> (found, fm[, r0, r1, r2])."""
        seed, r, m = self.mph.seed, self.mph.r, self.mph.m

        def search(g, rank, qhi, qlo):
            import jax.numpy as jnp

            qhi = qhi.astype(jnp.uint32)
            qlo = qlo.astype(jnp.uint32)
            lut = jnp.asarray(alphabet.CODE_TO_BYTE.astype(np.uint32))
            m6 = jnp.uint32(63)

            def word_le(w):
                # chars c0..c3 at bits 18/12/6/0 -> k[0] | k[1]<<8 | ...
                b0 = lut[(w >> jnp.uint32(18)) & m6]
                b1 = lut[(w >> jnp.uint32(12)) & m6]
                b2 = lut[(w >> jnp.uint32(6)) & m6]
                b3 = lut[w & m6]
                return b0 | (b1 << jnp.uint32(8)) | (b2 << jnp.uint32(16)) \
                    | (b3 << jnp.uint32(24))

            a = word_le(qhi) + jnp.uint32(GOLDEN)
            b = word_le(qlo) + jnp.uint32(GOLDEN)
            c = jnp.full(qhi.shape, (seed + 8) & 0xFFFFFFFF, jnp.uint32)
            h0, h1, h2 = jenkins_mix(a, b, c, jnp)

            ru = jnp.uint32(r)
            hl0 = (h0 % ru).astype(jnp.int32)
            hl1 = (h1 % ru).astype(jnp.int32) + jnp.int32(r)
            hl2 = (h2 % ru).astype(jnp.int32) + jnp.int32(2 * r)

            def gval(v):
                byte = g[v >> 2].astype(jnp.uint32)
                return (byte >> ((v & 3).astype(jnp.uint32)
                                 << jnp.uint32(1))) & jnp.uint32(3)

            g0, g1, g2 = gval(hl0), gval(hl1), gval(hl2)
            sel = (g0 + g1 + g2) % jnp.uint32(3)
            vertex = jnp.where(sel == 0, hl0,
                               jnp.where(sel == 1, hl1, hl2))
            idx = rank[vertex]
            found = idx < jnp.int32(m)
            return found, jnp.minimum(idx, jnp.int32(m - 1))

        if with_aux:
            def fn(g, rank, v0, v1, v2, qhi, qlo):
                import jax.numpy as jnp

                found, idx = search(g, rank, qhi, qlo)
                z = jnp.uint32(0)
                r0 = jnp.where(found, v0[idx], z)
                r1 = jnp.where(found, v1[idx], z)
                r2 = jnp.where(found, v2[idx], z)
                fm = (r0 & jnp.uint32(0xFFFF0000)) | (r1 & jnp.uint32(0xFFFF))
                return found, fm, r0, r1, r2
        else:
            def fn(g, rank, v0, v1, qhi, qlo):
                import jax.numpy as jnp

                found, idx = search(g, rank, qhi, qlo)
                z = jnp.uint32(0)
                r0 = jnp.where(found, v0[idx], z)
                r1 = jnp.where(found, v1[idx], z)
                fm = (r0 & jnp.uint32(0xFFFF0000)) | (r1 & jnp.uint32(0xFFFF))
                return found, fm
        return fn

    # -- conversion ----------------------------------------------------------

    def occupied(self):
        """The MPH stores no keys, so the k-mer set cannot be enumerated
        from the store alone (use final.kmers for the keys)."""
        raise NotImplementedError(
            "a CMPH store holds values only; supply keys (e.g. final.kmers) "
            "to enumerate entries")
