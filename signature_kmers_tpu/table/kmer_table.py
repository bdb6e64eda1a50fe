"""HBM-resident static open-addressing signature k-mer table.

The TPU-native replacement for the reference's three storage backends
(kept_kmer_db.h in-memory multimap, nudb_kmer_db.h NuDB store, cmph_kmer.h
CMPH MPH + mmap array).  Design:

- power-of-two slot count, linear probing, murmur-mixed slot hash;
- five uint32 words per slot:
    key_hi, key_lo                      (24-bit packed k-mer halves)
    v0 = function_index<<16 | avg_from_end
    v1 = median<<16 | mean
    v2 = var
  i.e. the 10-byte StoredKmerData (ref: kmer_data.h:114-128) in 12 bytes,
  plus an 8-byte verified key;
- keys are stored, so membership is exact.  The reference's production
  read path (CmphKmerDb) aliases unknown k-mers onto arbitrary slots
  (ref: cmph_kmer.h:138-147); exact membership is this framework's spec.

The table is built host-side with a vectorized claim-loop and lives in HBM
as plain JAX arrays; probing is a batched device kernel
(signature_kmers_tpu.ops.probe).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from ..core.config import TableConfig
from ..ops import hashing

EMPTY = np.uint32(0xFFFFFFFF)  # impossible key word (keys use 24 bits)


@dataclasses.dataclass
class KmerTable:
    """Host-side table image; ``device_arrays`` ships it to HBM."""

    key_hi: np.ndarray
    key_lo: np.ndarray
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    n_items: int
    max_probes: int

    @property
    def size(self) -> int:
        return int(self.key_hi.shape[0])

    @property
    def mask(self) -> int:
        return self.size - 1

    # -- construction ------------------------------------------------------

    @staticmethod
    def pack_values(avg_from_end, function_index, mean, median, var):
        a = np.asarray(avg_from_end, dtype=np.uint32)
        f = np.asarray(function_index, dtype=np.uint32)
        me = np.asarray(mean, dtype=np.uint32)
        md = np.asarray(median, dtype=np.uint32)
        v = np.asarray(var, dtype=np.uint32)
        return (f << 16) | a, (md << 16) | me, v

    @staticmethod
    def unpack_values(v0, v1, v2):
        """-> (avg_from_end, function_index, mean, median, var)"""
        v0 = np.asarray(v0)
        v1 = np.asarray(v1)
        return (v0 & 0xFFFF, v0 >> 16, v1 & 0xFFFF, v1 >> 16,
                np.asarray(v2) & 0xFFFF)

    @staticmethod
    def build(hi, lo, v0, v1, v2, config: TableConfig = TableConfig()) -> "KmerTable":
        """Vectorized host build by iterative slot claiming.

        Each round, every unplaced key attempts its current slot; the first
        contender for an empty slot wins, losers advance one slot (linear
        probe).  Round count equals the longest probe chain, which the
        probe kernel then uses as its static bound.
        """
        hi = np.asarray(hi, dtype=np.uint32)
        lo = np.asarray(lo, dtype=np.uint32)
        v0 = np.asarray(v0, dtype=np.uint32)
        v1 = np.asarray(v1, dtype=np.uint32)
        v2 = np.asarray(v2, dtype=np.uint32)
        n = hi.shape[0]
        size = max(config.min_size,
                   hashing.next_pow2(int(n / config.load_factor) + 1))
        mask = np.uint32(size - 1)

        key_hi = np.full(size, EMPTY, dtype=np.uint32)
        key_lo = np.full(size, EMPTY, dtype=np.uint32)
        tv0 = np.zeros(size, dtype=np.uint32)
        tv1 = np.zeros(size, dtype=np.uint32)
        tv2 = np.zeros(size, dtype=np.uint32)

        pending = np.arange(n)
        cur = hashing.hash_kmer(hi, lo) & mask
        max_probes = 0
        while pending.size:
            max_probes += 1
            if max_probes > max(config.max_probes_cap, size):
                raise RuntimeError("hash table build did not converge")
            slots = cur[pending]
            empty = key_hi[slots] == EMPTY
            # first pending contender per slot wins
            uniq, first_idx = np.unique(slots, return_index=True)
            winner = np.zeros(pending.size, dtype=bool)
            winner[first_idx] = True
            place = winner & empty
            idx = pending[place]
            s = slots[place]
            key_hi[s] = hi[idx]
            key_lo[s] = lo[idx]
            tv0[s] = v0[idx]
            tv1[s] = v1[idx]
            tv2[s] = v2[idx]
            lose = ~place
            pending = pending[lose]
            cur[pending] = (cur[pending] + np.uint32(1)) & mask
        return KmerTable(key_hi, key_lo, tv0, tv1, tv2, n, max_probes)

    @staticmethod
    def from_stats(hi, lo, avg_from_end, function_index, mean, median, var,
                   config: TableConfig = TableConfig()) -> "KmerTable":
        v0, v1, v2 = KmerTable.pack_values(avg_from_end, function_index,
                                           mean, median, var)
        return KmerTable.build(hi, lo, v0, v1, v2, config)

    # -- host lookup (exact spec; small-scale / tests) ---------------------

    def lookup_np(self, qhi, qlo):
        """Vectorized host probe.  Returns (found, v0, v1, v2)."""
        qhi = np.asarray(qhi, dtype=np.uint32)
        qlo = np.asarray(qlo, dtype=np.uint32)
        mask = np.uint32(self.mask)
        cur = hashing.hash_kmer(qhi, qlo) & mask
        found = np.zeros(qhi.shape, dtype=bool)
        done = np.zeros(qhi.shape, dtype=bool)
        r0 = np.zeros(qhi.shape, dtype=np.uint32)
        r1 = np.zeros(qhi.shape, dtype=np.uint32)
        r2 = np.zeros(qhi.shape, dtype=np.uint32)
        for _ in range(self.max_probes):
            khi = self.key_hi[cur]
            klo = self.key_lo[cur]
            hit = (khi == qhi) & (klo == qlo) & ~done
            empty = (khi == EMPTY) & ~done
            r0 = np.where(hit, self.v0[cur], r0)
            r1 = np.where(hit, self.v1[cur], r1)
            r2 = np.where(hit, self.v2[cur], r2)
            found |= hit
            done |= hit | empty
            if done.all():
                break
            cur = (cur + np.uint32(1)) & mask
        return found, r0, r1, r2

    # -- persistence -------------------------------------------------------

    def save(self, path):
        """Persist as one .npz plus a small json sidecar (single
        host->HBM copy on load; replaces NuDB/CMPH artifact pairs)."""
        path = Path(path)
        np.savez(path.with_suffix(".npz"),
                 key_hi=self.key_hi, key_lo=self.key_lo,
                 v0=self.v0, v1=self.v1, v2=self.v2)
        meta = {"n_items": self.n_items, "max_probes": self.max_probes,
                "size": self.size, "format": "skt-v1"}
        path.with_suffix(".json").write_text(json.dumps(meta))

    @staticmethod
    def load(path) -> "KmerTable":
        path = Path(path)
        z = np.load(path.with_suffix(".npz"))
        meta = json.loads(path.with_suffix(".json").read_text())
        return KmerTable(z["key_hi"], z["key_lo"], z["v0"], z["v1"], z["v2"],
                         int(meta["n_items"]), int(meta["max_probes"]))

    @staticmethod
    def exists(path) -> bool:
        path = Path(path)
        if not (path.with_suffix(".npz").is_file()
                and path.with_suffix(".json").is_file()):
            return False
        meta = json.loads(path.with_suffix(".json").read_text())
        return meta.get("format") == "skt-v1"

    # -- device ------------------------------------------------------------

    def device_arrays(self):
        """Ship the five word arrays to the default device (HBM)."""
        import jax.numpy as jnp

        return (jnp.asarray(self.key_hi), jnp.asarray(self.key_lo),
                jnp.asarray(self.v0), jnp.asarray(self.v1),
                jnp.asarray(self.v2))

    # -- interop -----------------------------------------------------------

    def occupied(self):
        """(hi, lo, v0, v1, v2) of occupied slots, sorted by key."""
        occ = self.key_hi != EMPTY
        hi = self.key_hi[occ]
        lo = self.key_lo[occ]
        order = np.lexsort((lo, hi))
        return (hi[order], lo[order], self.v0[occ][order],
                self.v1[occ][order], self.v2[occ][order])
