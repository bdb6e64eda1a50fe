"""Multi-device function caller: dp-sharded queries x tp-sharded table.

The full fused call step (device padding -> k-mer pack -> bucket probe ->
scan automaton) runs under shard_map on a (dp, tp) mesh:

- query batches are sharded across dp (each shard processes its rows
  end-to-end — the automaton is per-sequence, so no cross-shard state);
- the bucketed table is sharded across tp by key owner
  (parallel/sharded_table.py); every tp shard probes its sub-table and
  the results combine with a psum (exactly one shard can hit a key);
- host-side scoring reuses FunctionCaller's finalize (find_best_call).

This is the in-process, collective replacement for the reference's
"run many binaries on disjoint files" scaling (SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np

from ..core import alphabet
from ..core.config import CallConfig, DeviceConfig
from ..io import fasta as fasta_io
from ..models.function_caller import FunctionCaller
from ..table.bucket_table import BucketKmerTable
from . import mesh as mesh_mod


class ShardedBucketTable:
    """Per-shard BucketKmerTables stacked (tp, n_buckets, 3*slots).

    Each shard carries its own cuckoo salt (builds converge
    independently); probes read the local shard's salt."""

    def __init__(self, packed, salts, n_items: int):
        self.packed = packed  # (tp, nb, 3*slots)
        self.salts = salts    # (tp,) uint32
        self.n_items = n_items

    @property
    def n_shards(self):
        return int(self.packed.shape[0])

    @property
    def n_buckets(self):
        return int(self.packed.shape[1])

    @staticmethod
    def from_table(table: BucketKmerTable, n_shards: int) -> "ShardedBucketTable":
        assert n_shards & (n_shards - 1) == 0
        hi, lo, v0, v1, v2 = table.occupied()
        if n_shards == 1:
            return ShardedBucketTable(
                table.packed[None],
                np.asarray([table.salt], dtype=np.uint32), table.n_items)
        bits = n_shards.bit_length() - 1
        from ..ops import hashing

        owner = hashing.hash_kmer(hi, lo) >> np.uint32(32 - bits)
        from ..core.config import TableConfig

        # common bucket count across shards (sized for the fullest shard)
        counts = np.bincount(owner, minlength=n_shards)
        from ..ops import hashing as hashing_mod

        SLOTS = TableConfig().slots
        nb = max(TableConfig().min_size // SLOTS,
                 hashing_mod.next_pow2(-(-int(counts.max()) // 3)))
        while True:
            parts = []
            ok = True
            for s in range(n_shards):
                m = owner == s
                cfg = TableConfig(min_size=nb * SLOTS)
                t = BucketKmerTable.build(hi[m], lo[m], v0[m], v1[m],
                                          v2[m], cfg)
                if t.n_buckets != nb:
                    nb = max(nb, t.n_buckets)
                    ok = False
                    break
                parts.append(t)
            if ok:
                break
        return ShardedBucketTable(
            np.stack([t.packed for t in parts]),
            np.asarray([t.salt for t in parts], dtype=np.uint32),
            int(hi.shape[0]))


class ParallelFunctionCaller(FunctionCaller):
    """FunctionCaller whose fused device step runs over a (dp, tp) mesh."""

    def __init__(self, table: BucketKmerTable, function_index,
                 config: CallConfig = CallConfig(),
                 device_config: DeviceConfig = DeviceConfig(),
                 mesh=None):
        super().__init__(table, function_index, config, device_config,
                         use_device=True)
        self.mesh = mesh if mesh is not None else mesh_mod.make_mesh()
        self.ndp = mesh_mod.dp_size(self.mesh)
        self.ntp = mesh_mod.tp_size(self.mesh)
        self.stable = ShardedBucketTable.from_table(table, self.ntp)
        self._pjit = {}

    def _parallel_fn(self, L: int, F: int):
        key = (L, F)
        if key not in self._pjit:
            import jax
            import jax.numpy as jnp
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..ops import automaton as automaton_ops
            from ..ops import kmer_pack, probe as probe_ops

            cfg = self.config
            hypo = self.hypo_index
            ignore_hypo = cfg.ignore_hypothetical
            ntp = self.ntp
            rows = self.device_config.call_batch  # rows per dp shard

            def shard_fn(tpacked, tsalt, flat_l, off_l):
                # tpacked: (1, nb, 3*slots) local tp shard; tsalt: (1,)
                # flat_l: (1, F); off_l: (1, rows+1)
                codes, lengths = kmer_pack.expand_flat(
                    flat_l[0], off_l[0], L)
                whi, wlo, call_valid = kmer_pack.pack_call_windows(
                    codes, lengths)
                found, fm = probe_ops.probe_bucket(
                    tpacked[0], whi, wlo, tsalt[0], None)
                if ntp > 1:
                    found_i = jax.lax.psum(found.astype(jnp.uint32), "tp")
                    fm = jax.lax.psum(jnp.where(found, fm, 0), "tp")
                    found = found_i > 0
                found = found & call_valid
                func = (fm >> 16).astype(jnp.int32)
                mean = (fm & jnp.uint32(0xFFFF)).astype(jnp.int32)
                if ignore_hypo:
                    found = found & (func != hypo)
                out = automaton_ops.device_automaton(
                    found, func, mean, lengths,
                    cfg.min_hits, cfg.max_gap, cfg.k,
                    mad_floor=cfg.mad_floor, len_window=cfg.len_mad_window)
                packed_out = jnp.concatenate([
                    out["n_recs"][:, None],
                    out["call_valid"].astype(jnp.int32),
                    out["start"], out["end"], out["count"], out["fI"],
                    out["median"],
                    jax.lax.bitcast_convert_type(out["mad"], jnp.int32),
                ], axis=1)
                return packed_out[None]  # (1, rows, 29)

            fn = shard_map(
                shard_fn, mesh=self.mesh,
                in_specs=(P("tp", None, None), P("tp"), P("dp", None),
                          P("dp", None)),
                out_specs=P("dp", None, None),
            )
            self._pjit[key] = jax.jit(fn)
        return self._pjit[key]

    def call_batch(self, batch: fasta_io.SequenceBatch,
                   keep_hits: bool = False):
        if keep_hits:
            return super().call_batch(batch, keep_hits=True)
        import jax.numpy as jnp

        rows = self.device_config.call_batch
        per_round = rows * self.ndp
        n = len(batch)
        results = []
        pending = []
        for s in range(0, max(n, 1), per_round):
            e = min(s + per_round, n)
            subs = []
            flats = []
            offs = []
            Lmax = 128
            for d in range(self.ndp):
                ds = min(s + d * rows, e)
                de = min(ds + rows, e)
                sub = fasta_io.SequenceBatch(
                    codes=batch.codes[batch.offsets[ds]:batch.offsets[de]],
                    offsets=batch.offsets[ds:de + 1] - batch.offsets[ds],
                    ids=batch.ids[ds:de],
                    deflines=batch.deflines[ds:de],
                )
                subs.append(sub)
                if len(sub):
                    Lmax = max(Lmax, int(sub.lengths.max()))
            L = -(-Lmax // 128) * 128
            F = 1 << 14
            for sub in subs:
                while F < max(1, sub.codes.shape[0]):
                    F <<= 1
            for sub in subs:
                flat = np.full(F, alphabet.INVALID_CODE, dtype=np.uint8)
                flat[:sub.codes.shape[0]] = sub.codes
                off = np.full(rows + 1, sub.codes.shape[0], dtype=np.int32)
                off[:len(sub) + 1] = sub.offsets
                flats.append(flat)
                offs.append(off)
            fn = self._parallel_fn(L, F)
            out = fn(jnp.asarray(self.stable.packed),
                     jnp.asarray(self.stable.salts),
                     jnp.asarray(np.stack(flats)),
                     jnp.asarray(np.stack(offs)))
            pending.append((subs, out))
        for subs, out in pending:
            m = np.asarray(out)  # (dp, rows, 29)
            for d, sub in enumerate(subs):
                if len(sub):
                    results.extend(self._finalize_device(sub, m[d]))
        return results
