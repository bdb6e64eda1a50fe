"""Table-parallel (tp) sharded signature table.

When the signature set exceeds one device's HBM, keys are partitioned by
the top bits of their slot hash into independent per-shard open-addressing
sub-tables.  Queries stay data-parallel (replicated over tp); every shard
probes its local sub-table, and results combine with a psum over tp — for
any key at most one shard can report a hit, so the sum is exact.

This replaces the reference's always-fully-resident mmap table
(ref: cmph_kmer.h:71-83; the reference has no table sharding at all).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.config import TableConfig
from ..ops import hashing
from ..table.kmer_table import KmerTable


def owner_of(hi, lo, n_shards: int, xp=np):
    """Key-owner shard = top log2(n_shards) bits of the slot hash."""
    h = hashing.hash_kmer(hi, lo, xp)
    if n_shards == 1:
        return xp.zeros_like(h, dtype=xp.uint32)
    bits = int(n_shards).bit_length() - 1
    return h >> xp.uint32(32 - bits)


@dataclasses.dataclass
class ShardedKmerTable:
    """Stacked per-shard tables: arrays of shape (n_shards, S_shard)."""

    key_hi: np.ndarray
    key_lo: np.ndarray
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    n_items: int
    max_probes: int

    @property
    def n_shards(self) -> int:
        return int(self.key_hi.shape[0])

    @staticmethod
    def build(hi, lo, v0, v1, v2, n_shards: int,
              config: TableConfig = TableConfig()) -> "ShardedKmerTable":
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"
        hi = np.asarray(hi, dtype=np.uint32)
        lo = np.asarray(lo, dtype=np.uint32)
        owner = owner_of(hi, lo, n_shards)
        counts = np.bincount(owner, minlength=n_shards)
        shard_size = max(config.min_size,
                         hashing.next_pow2(int(counts.max() / config.load_factor) + 1))
        sub_cfg = dataclasses.replace(config, min_size=shard_size)
        parts = []
        max_probes = 1
        for s in range(n_shards):
            m = owner == s
            t = KmerTable.build(hi[m], lo[m], np.asarray(v0)[m],
                                np.asarray(v1)[m], np.asarray(v2)[m], sub_cfg)
            assert t.size == shard_size
            parts.append(t)
            max_probes = max(max_probes, t.max_probes)
        return ShardedKmerTable(
            key_hi=np.stack([t.key_hi for t in parts]),
            key_lo=np.stack([t.key_lo for t in parts]),
            v0=np.stack([t.v0 for t in parts]),
            v1=np.stack([t.v1 for t in parts]),
            v2=np.stack([t.v2 for t in parts]),
            n_items=int(hi.shape[0]),
            max_probes=max_probes,
        )

    @staticmethod
    def from_table(table: KmerTable, n_shards: int,
                   config: TableConfig = TableConfig()) -> "ShardedKmerTable":
        hi, lo, v0, v1, v2 = table.occupied()
        return ShardedKmerTable.build(hi, lo, v0, v1, v2, n_shards, config)

    def device_put(self, mesh):
        """Place the stacked arrays sharded over the 'tp' mesh axis."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("tp", None))
        return tuple(jax.device_put(a, sh)
                     for a in (self.key_hi, self.key_lo, self.v0, self.v1,
                               self.v2))


def probe_sharded(mesh, table_arrays, qhi, qlo, max_probes: int):
    """Probe a tp-sharded table with dp-sharded flat queries.

    qhi/qlo: flat (M,) arrays (M divisible by dp size).  Returns
    (found, r0, r1, r2) with the same dp sharding.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.probe import probe_table

    def local(khi, klo, v0, v1, v2, qh, ql):
        # khi etc: (1, S) local shard view; qh/ql: local query rows
        found, r0, r1, r2 = probe_table(khi[0], klo[0], v0[0], v1[0], v2[0],
                                        qh, ql, max_probes)
        # exactly one shard can hit a key -> psum combines exactly
        found_i = jax.lax.psum(found.astype(jnp.uint32), "tp")
        r0 = jax.lax.psum(jnp.where(found, r0, 0), "tp")
        r1 = jax.lax.psum(jnp.where(found, r1, 0), "tp")
        r2 = jax.lax.psum(jnp.where(found, r2, 0), "tp")
        return found_i > 0, r0, r1, r2

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("tp", None),) * 5 + (P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
    )
    return fn(*table_arrays, qhi, qlo)
