"""Multi-device function caller: dp-sharded queries x tp-sharded table.

The full fused call step (device padding -> k-mer pack -> table probe ->
scan automaton) runs under shard_map on a (dp, tp) mesh:

- query batches are sharded across dp (each shard processes its rows
  end-to-end — the automaton is per-sequence, so no cross-shard state);
- the table is sharded across tp by key owner; every tp shard probes its
  sub-table and the results combine with a psum (exactly one shard can
  hit a key).  Both production layouts shard (ShardedWideTable /
  ShardedBucketTable below);
- host-side scoring reuses FunctionCaller's finalize (find_best_call).

This is the in-process, collective replacement for the reference's
"run many binaries on disjoint files" scaling (SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np

from ..core.config import CallConfig, DeviceConfig
from ..io import fasta as fasta_io
from ..models.function_caller import FunctionCaller
from ..table.bucket_table import BucketKmerTable
from ..table.wide_table import WideKmerTable
from . import mesh as mesh_mod


def _shard_owner(hi, lo, n_shards: int):
    from ..ops import hashing

    bits = n_shards.bit_length() - 1
    return hashing.hash_kmer(hi, lo) >> np.uint32(32 - bits)


class ShardedBucketTable:
    """Per-shard BucketKmerTables stacked (tp, n_buckets, 3*slots).

    Each shard carries its own cuckoo salt (builds converge
    independently); probes read the local shard's salt."""

    def __init__(self, packed, salts, n_items: int, aux=None):
        self.packed = packed  # (tp, nb, 3*slots)
        self.salts = salts    # (tp,) uint32
        self.n_items = n_items
        self.aux = aux        # (tp, nb, 3*slots) value words (lookup path)

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
                np.asarray([table.salt], dtype=np.uint32), table.n_items,
                aux=table.aux[None])
        bits = n_shards.bit_length() - 1
        from ..core.config import TableConfig
        from ..ops import hashing

        owner = hashing.hash_kmer(hi, lo) >> np.uint32(32 - bits)

        # two-pass sizing: build every shard once unconstrained, then
        # rebuild ONLY the shards below the common (max) bucket count —
        # at most 2 builds per shard, vs the old restart-all loop
        # (worst case O(shards^2) rebuilds)
        SLOTS = TableConfig().slots
        counts = np.bincount(owner, minlength=n_shards)
        nb0 = max(TableConfig().min_size // SLOTS,
                  hashing.next_pow2(-(-int(counts.max()) // 3)))
        masks = [owner == s for s in range(n_shards)]

        def build(s, nb):
            m = masks[s]
            cfg = TableConfig(min_size=nb * SLOTS)
            return BucketKmerTable.build(hi[m], lo[m], v0[m], v1[m],
                                         v2[m], cfg)

        parts = [build(s, nb0) for s in range(n_shards)]
        nb = max(t.n_buckets for t in parts)
        parts = [t if t.n_buckets == nb else build(s, nb)
                 for s, t in enumerate(parts)]
        # a constrained rebuild can itself outgrow nb (cuckoo bad luck);
        # repeat the equalization — each iteration strictly raises nb
        while any(t.n_buckets != nb for t in parts):
            nb = max(t.n_buckets for t in parts)
            parts = [t if t.n_buckets == nb else build(s, nb)
                     for s, t in enumerate(parts)]
        return ShardedBucketTable(
            np.stack([t.packed for t in parts]),
            np.asarray([t.salt for t in parts], dtype=np.uint32),
            int(hi.shape[0]),
            aux=np.stack([t.aux for t in parts]))

    # -- uniform sharded-probe interface ------------------------------------

    def arrays(self):
        return (self.packed, self.salts)

    def in_specs(self, P):
        return (P("tp", None, None), P("tp"))

    def probe(self, tabs, whi, wlo):
        from ..ops import probe as probe_ops

        tpacked, tsalt = tabs
        return probe_ops.probe_bucket(tpacked[0], whi, wlo, tsalt[0], None)

    # full-value probe (lookup path: /lookup needs median/var words too)

    def aux_arrays(self):
        return (self.packed, self.aux, self.salts)

    def aux_in_specs(self, P):
        return (P("tp", None, None), P("tp", None, None), P("tp"))

    def probe_aux(self, tabs, whi, wlo):
        from ..ops import probe as probe_ops

        tpacked, taux, tsalt = tabs
        return probe_ops.probe_bucket(tpacked[0], whi, wlo, tsalt[0],
                                      taux[0])


class ShardedWideTable:
    """Per-shard WideKmerTables stacked for shard_map (production layout).

    Shards share static (bits, ov_bits, slot widths) so the per-shard
    arrays stack; salts vary per shard.  Overflow stores are forced to a
    common (ov_bits, max-occupancy-across-shards) shape."""

    def __init__(self, packed, ov_packed, salts, ov_salts,
                 bits: int, ov_bits: int, n_items: int, ov_any: bool,
                 aux=None, ov_aux=None):
        self.packed = packed        # (tp, nb, 2*S)
        self.ov_packed = ov_packed  # (tp, nbo, 2*So)
        self.salts = salts          # (tp,) uint32
        self.ov_salts = ov_salts    # (tp,) uint32
        self.bits = bits
        self.ov_bits = ov_bits
        self.n_items = n_items
        self.ov_any = ov_any
        self.aux = aux              # (tp, nb, 3*S) value words (lookup)
        self.ov_aux = ov_aux        # (tp, nbo, 3*So)

    @property
    def n_shards(self):
        return int(self.packed.shape[0])

    @staticmethod
    def from_table(table: WideKmerTable, n_shards: int) -> "ShardedWideTable":
        assert n_shards & (n_shards - 1) == 0
        if n_shards == 1:
            return ShardedWideTable(
                table.packed[None], table.ov_packed[None],
                np.asarray([table.salt], np.uint32),
                np.asarray([table.ov_salt], np.uint32),
                table.bits, table.ov_bits, table.n_items,
                table.ov_items > 0,
                aux=table.aux[None], ov_aux=table.ov_aux[None])
        from ..ops import hashing
        from ..table import wide_table as wt

        hi, lo, v0, v1, v2 = table.occupied()
        owner = _shard_owner(hi, lo, n_shards)
        counts = np.bincount(owner, minlength=n_shards)
        cfg = wt.WideTableConfig()
        S_def = cfg.slots
        want = int(int(counts.max()) / (S_def * cfg.main_load)) + 1
        bits_def = max(cfg.min_bits,
                       hashing.next_pow2(want).bit_length() - 1)
        # per-SHARD sub-cliff sizing (same rule as WideKmerTable.build,
        # including the leaf acceptance check below): a 20M-key table
        # that cannot fit one sub-cliff store CAN at tp >= 4 — each
        # shard's main store then gathers in the fast state (4-slot
        # 32 B rows, measured 2x at the 4.4M-key scale)
        sub = cfg.sub_cliff_bytes
        S, bits = S_def, bits_def
        chose_sub = False
        if sub and (1 << bits_def) * 8 * S_def > sub:
            S_sub = max(S_def, 4)
            bits_cap = max(cfg.min_bits,
                           (sub // (8 * S_sub)).bit_length() - 1)
            if int(counts.max()) <= ((1 << bits_cap) * S_sub
                                     * cfg.sub_cliff_max_load):
                S, bits, chose_sub = S_sub, bits_cap, True

        def build_at(S, bits):
            mains, main_auxes, leftovers = [], [], []
            for s in range(n_shards):
                m = owner == s
                packed_s, aux_s, lx = wt._place_tagged(
                    hi[m], lo[m], v0[m], v1[m], v2[m], bits,
                    wt._SALT_BASE, S)
                mains.append(packed_s)
                main_auxes.append(aux_s)
                leftovers.append((hi[m][lx], lo[m][lx], v0[m][lx],
                                  v1[m][lx], v2[m][lx]))
            salts = np.full(n_shards, wt._SALT_BASE, dtype=np.uint32)

            nmax = max(l[0].shape[0] for l in leftovers)
            ov_any = nmax > 0
            if not ov_any:
                ovs = [np.full((1, 2), wt.EMPTY, np.uint32)] * n_shards
                ov_auxes = [np.zeros((1, 3), np.uint32)] * n_shards
                ov_salts = np.full(n_shards, wt._SALT_BASE,
                                   dtype=np.uint32)
                ov_bits = 17
            else:
                # >= 17: wide_bucket_tag's tag/sentinel exactness bound
                # (ops/hashing.py) — 16 raised ValueError whenever a
                # sharded build had a small overflow set
                ov_bits = max(17, int(np.ceil(np.log2(
                    max(nmax / wt._OV_LAMBDA, 1)))))
                chosen = []
                for l in leftovers:
                    r = wt.leaf_salt(l[0], l[1], ov_bits) \
                        if l[0].shape[0] else (wt._SALT_BASE, 1)
                    if r is None:  # sentinel collision: widen
                        ov_bits += 1
                        return ShardedWideTable._with_leaves(
                            mains, main_auxes, salts, leftovers, bits,
                            ov_bits, int(hi.shape[0]))
                    chosen.append(r)
                S_ov = max(1, max(mx for _, mx in chosen))
                ovs, ov_auxes = [], []
                for (l, (salt_s, _mx)) in zip(leftovers, chosen):
                    p, a, rest = wt._place_tagged(*l, ov_bits, salt_s,
                                                  S_ov)
                    assert rest.shape[0] == 0
                    ovs.append(p)
                    ov_auxes.append(a)
                ov_salts = np.asarray([s for s, _ in chosen],
                                      dtype=np.uint32)
            return ShardedWideTable(
                np.stack(mains), np.stack(ovs), salts, ov_salts, bits,
                ov_bits, int(hi.shape[0]), ov_any,
                aux=np.stack(main_auxes), ov_aux=np.stack(ov_auxes))

        t = build_at(S, bits)
        if chose_sub and t.ov_packed[0].nbytes > sub:
            # the shrunken main fed an oversized leaf — the regime
            # probe_bits measured as a LOSS; fall back to default sizing
            t = build_at(S_def, bits_def)
        return t

    @staticmethod
    def _with_leaves(mains, main_auxes, salts, leftovers, bits, ov_bits,
                     n_items):
        from ..table import wide_table as wt

        chosen = [wt.leaf_salt(l[0], l[1], ov_bits)
                  if l[0].shape[0] else (wt._SALT_BASE, 1)
                  for l in leftovers]
        S_ov = max(1, max(mx for _, mx in chosen))
        ovs, ov_auxes = [], []
        for (l, (salt_s, _mx)) in zip(leftovers, chosen):
            p, a, rest = wt._place_tagged(*l, ov_bits, salt_s, S_ov)
            assert rest.shape[0] == 0
            ovs.append(p)
            ov_auxes.append(a)
        return ShardedWideTable(
            np.stack(mains), np.stack(ovs), salts,
            np.asarray([s for s, _ in chosen], dtype=np.uint32),
            bits, ov_bits, n_items, True, aux=np.stack(main_auxes),
            ov_aux=np.stack(ov_auxes))

    # -- uniform sharded-probe interface ------------------------------------

    def arrays(self):
        return (self.packed, self.ov_packed, self.salts, self.ov_salts)

    def in_specs(self, P):
        return (P("tp", None, None), P("tp", None, None), P("tp"), P("tp"))

    def probe(self, tabs, whi, wlo):
        from ..ops import probe as probe_ops

        packed, ovp, salts, ov_salts = tabs
        return probe_ops.probe_wide(
            packed[0], ovp[0], whi, wlo, salts[0], ov_salts[0],
            self.bits, self.ov_bits, ov_empty=not self.ov_any)

    # full-value probe (lookup path: /lookup needs median/var words too)

    def aux_arrays(self):
        return (self.packed, self.ov_packed, self.aux, self.ov_aux,
                self.salts, self.ov_salts)

    def aux_in_specs(self, P):
        return (P("tp", None, None),) * 4 + (P("tp"), P("tp"))

    def probe_aux(self, tabs, whi, wlo):
        from ..ops import probe as probe_ops

        packed, ovp, aux, ov_aux, salts, ov_salts = tabs
        return probe_ops.probe_wide(
            packed[0], ovp[0], whi, wlo, salts[0], ov_salts[0],
            self.bits, self.ov_bits, aux=aux[0], ov_aux=ov_aux[0],
            ov_empty=not self.ov_any)


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
        if isinstance(table, WideKmerTable):
            self.stable = ShardedWideTable.from_table(table, self.ntp)
        else:
            self.stable = ShardedBucketTable.from_table(table, self.ntp)
        self._pjit = {}
        self._tab_in = None      # device placement cache (table immutable)
        self._tab_aux_in = None  # + value words (lookup path), lazy

    def _parallel_fn(self, L: int, F: int, W: int | None = None):
        W = L if W is None else W
        key = (L, F, W)
        if key in self._pjit:
            return self._pjit[key]
        with self._cache_lock:  # concurrent executor dispatches (serve)
            if key in self._pjit:
                return self._pjit[key]
            import jax
            import jax.numpy as jnp
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..ops import automaton as automaton_ops
            from ..ops import kmer_pack, probe as probe_ops

            cfg = self.config
            hypo = self.hypo_index
            ignore_hypo = cfg.ignore_hypothetical
            rows = self.device_config.call_batch  # rows per dp shard
            stable = self.stable
            n_tab = len(stable.arrays())
            ndp = self.ndp

            def shard_fn(*args):
                # args[:n_tab]: local tp shard of the table arrays
                # rows_l: (1, R, 3) uint32; start_l/lens_l: (1, rows)
                tabs = args[:n_tab]
                rows_l, start_l, lens_l = args[n_tab:]
                lengths = lens_l[0]
                codes = kmer_pack.expand_rows16(rows_l[0], start_l[0],
                                                lengths, L)
                whi, wlo, call_valid = kmer_pack.pack_call_windows(
                    codes, lengths)
                if W < L:  # drop padding windows before the probe
                    whi = whi[:, :W]
                    wlo = wlo[:, :W]
                    call_valid = call_valid[:, :W]
                found, fm = stable.probe(tabs, whi, wlo)
                # psum UNCONDITIONALLY (XLA elides the size-1 collective):
                # it also normalizes the values' varying-axes type — at
                # ntp == 1 the un-psummed probe outputs stay tp-varying
                # while lengths is not, and the automaton scan's carry
                # types mismatch (shard_map vma check rejects the jit)
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
                packed_out = automaton_ops.pack_records(out, lengths)
                # gather the dp shards IN-PROGRAM: the output is then
                # replicated on every device, so reading results is a
                # purely LOCAL replica read on every process — no
                # process_allgather collective after the launch.  That
                # is what lets multihost serve overlap dispatches: all
                # collectives of a call live in this one program,
                # enqueued in ticket order under the broadcast lock,
                # while result collection happens lock-free
                # (service/multihost.py).  Records are small
                # (PACKED_WORDS = 49 int32/row), so replication costs
                # ~n_dp x rows x 196 B per device.  scatter + psum
                # rather than all_gather: psum's result is statically
                # replication-typed (all_gather output stays
                # axis-varying under shard_map's vma check).
                full = jnp.zeros((ndp,) + packed_out.shape,
                                 packed_out.dtype)
                full = full.at[jax.lax.axis_index("dp")].set(packed_out)
                return jax.lax.psum(full, "dp")

            fn = shard_map(
                shard_fn, mesh=self.mesh,
                in_specs=(*stable.in_specs(P), P("dp", None, None),
                          P("dp", None), P("dp", None)),
                out_specs=P(None, None, None),
            )
            self._pjit[key] = jax.jit(fn)
        return self._pjit[key]

    def call_batch(self, batch: fasta_io.SequenceBatch,
                   keep_hits: bool = False):
        """Sharded call over the mesh.  On a process-spanning mesh every
        process passes the same batch (device_put fills the local
        shards) and reads the full result from its local replica (the
        program all-gathers the dp shards on-device) — exercised by
        tests/test_multiprocess.py over real jax.distributed processes.

        Split into :meth:`dispatch_batch` (every collective: input
        placement + program launches) and :meth:`collect_batch` (local
        replica reads + host scoring) so multihost serve can issue
        dispatches in ticket order under its broadcast lock while
        earlier batches' results are still being read."""
        return self.collect_batch(self.dispatch_batch(batch, keep_hits))

    def _placed_tables(self, aux: bool):
        """Device placement of the sharded table arrays, once per CALLER
        (the sharded table is immutable; /add swaps in a whole new
        caller) — re-uploading GBs per batch would dominate serve --mesh
        request latency.  Double-checked under the cache lock: concurrent
        first dispatches (serve depth > 1) must not upload twice.  The
        aux (full value words) placement is separate and lazy: only the
        /lookup path needs it."""
        from jax.sharding import PartitionSpec as P

        from . import distributed

        attr = "_tab_aux_in" if aux else "_tab_in"
        if getattr(self, attr) is None:
            with self._cache_lock:
                if getattr(self, attr) is None:
                    specs = (self.stable.aux_in_specs(P) if aux
                             else self.stable.in_specs(P))
                    arrs = (self.stable.aux_arrays() if aux
                            else self.stable.arrays())
                    setattr(self, attr, [
                        distributed.put_global(self.mesh, spec, a)
                        for spec, a in zip(specs, arrs)])
        return getattr(self, attr)

    def _lookup_fn(self, L: int, need_aux: bool):
        """Mesh-sharded hit-gather program for the /lookup path: codes
        dp-sharded, table tp-sharded, outputs replicated in-program (one
        collective program; collection is a local replica read).  Unlike
        the call program this returns the per-window hit mask + value
        words, so rank 0 can emit per-hit rows
        (ref: kser_request.cc:446-467 LookupRequest)."""
        key = ("lookup", L, need_aux)
        if key in self._pjit:
            return self._pjit[key]
        with self._cache_lock:
            if key in self._pjit:
                return self._pjit[key]
            import jax
            import jax.numpy as jnp
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..ops import kmer_pack

            stable = self.stable
            n_tab = len(stable.aux_arrays() if need_aux
                        else stable.arrays())
            ndp = self.ndp

            def shard_fn(*args):
                tabs = args[:n_tab]
                codes_l, lens_l = args[n_tab:]
                win = kmer_pack.pack_windows(codes_l, lens_l)
                if need_aux:
                    found, fm, r0, r1, r2 = stable.probe_aux(
                        tabs, win["hi"], win["lo"])
                    extras = (r0, r1, r2)
                else:
                    found, fm = stable.probe(tabs, win["hi"], win["lo"])
                    extras = ()
                found_u = jax.lax.psum(found.astype(jnp.uint32), "tp")
                fm = jax.lax.psum(jnp.where(found, fm, 0), "tp")
                extras = tuple(
                    jax.lax.psum(jnp.where(found, x, 0), "tp")
                    for x in extras)
                found = ((found_u > 0) & win["call_valid"]).astype(
                    jnp.uint8)
                outs = (found, fm) + extras

                def repl(x):  # scatter + psum: statically replicated
                    full = jnp.zeros((ndp,) + x.shape, x.dtype)
                    full = full.at[jax.lax.axis_index("dp")].set(x)
                    return jax.lax.psum(full, "dp")

                return tuple(repl(o) for o in outs)

            specs = (stable.aux_in_specs(P) if need_aux
                     else stable.in_specs(P))
            n_out = 5 if need_aux else 2
            fn = shard_map(
                shard_fn, mesh=self.mesh,
                in_specs=(*specs, P("dp", None), P("dp")),
                out_specs=(P(None, None, None),) * n_out)
            self._pjit[key] = jax.jit(fn)
        return self._pjit[key]

    def gather_hits_batch(self, codes: np.ndarray, lengths: np.ndarray,
                          need_aux: bool = False):
        """Mesh-sharded override of FunctionCaller.gather_hits_batch:
        the /lookup (keep_hits) path probes the TP-SHARDED table instead
        of falling back to one local device — a table big enough to
        need sharding (the motivating case for the mesh service) can
        now serve /lookup and /matrix hit-gathering too."""
        from jax.sharding import PartitionSpec as P  # noqa: F401

        from ..core import alphabet
        from ..models.function_caller import unpack_value_words
        from . import distributed

        B0, L = codes.shape
        pad = (-B0) % self.ndp
        if pad:
            codes = np.concatenate([
                codes, np.full((pad, L), alphabet.INVALID_CODE, np.uint8)])
            lengths = np.concatenate([
                np.asarray(lengths),
                np.zeros(pad, np.asarray(lengths).dtype)])
        fn = self._lookup_fn(L, need_aux)
        tab_in = self._placed_tables(need_aux)
        mesh = self.mesh
        outs = fn(*tab_in,
                  distributed.put_global(mesh, P("dp", None),
                                         np.ascontiguousarray(codes)),
                  distributed.put_global(mesh, P("dp"),
                                         np.ascontiguousarray(lengths)))
        host = [distributed.fetch_replicated(o) for o in outs]
        # (ndp, B/ndp, L) -> (B, L), drop padding rows
        host = [h.reshape(-1, h.shape[-1])[:B0] for h in host]
        found = host[0].astype(bool)
        fm = host[1]
        func = (fm >> 16).astype(np.int32)
        mean = (fm & 0xFFFF).astype(np.int32)
        if not need_aux:
            return found, func, mean
        avg, _f, _m, median, var = unpack_value_words(
            host[2], host[3], host[4])
        return found, func, mean, avg, median, var

    def gather_found_filtered(self, codes: np.ndarray,
                              lengths: np.ndarray, hypo_index: int,
                              len_sigma_window: float,
                              zero_var_len_frac: float) -> np.ndarray:
        """Mesh hit-gather for the DISTANCE path: the hypothetical and
        length filters run IN-PROGRAM and only the (B, L) uint8 mask is
        replicated and shipped — the single-device matrix gather ships
        just the mask for exactly this reason (the value words are ~20x
        its bytes and the link is the bottleneck).  Filter forms mirror
        models/matrix_distance.py's device program exactly (the integer
        branch at the reference defaults)."""
        import jax
        from jax.sharding import PartitionSpec as P

        from ..core import alphabet
        from . import distributed

        B0, L = codes.shape
        pad = (-B0) % self.ndp
        if pad:
            codes = np.concatenate([
                codes, np.full((pad, L), alphabet.INVALID_CODE, np.uint8)])
            lengths = np.concatenate([
                np.asarray(lengths),
                np.zeros(pad, np.asarray(lengths).dtype)])

        key = ("matrix_mask", L, hypo_index, float(len_sigma_window),
               float(zero_var_len_frac))
        if key not in self._pjit:
            with self._cache_lock:
                if key not in self._pjit:
                    import jax.numpy as jnp
                    from jax import shard_map

                    from ..ops import kmer_pack

                    stable = self.stable
                    n_tab = len(stable.aux_arrays())
                    ndp = self.ndp
                    hypo = hypo_index
                    w = float(len_sigma_window)
                    frac = float(zero_var_len_frac)
                    exact = (w == 2.0 and frac == 0.1)

                    def shard_fn(*args):
                        tabs = args[:n_tab]
                        codes_l, lens_l = args[n_tab:]
                        win = kmer_pack.pack_windows(codes_l, lens_l)
                        found, _fm, r0, r1, r2 = stable.probe_aux(
                            tabs, win["hi"], win["lo"])
                        found_u = jax.lax.psum(
                            found.astype(jnp.uint32), "tp")
                        r0 = jax.lax.psum(jnp.where(found, r0, 0), "tp")
                        r1 = jax.lax.psum(jnp.where(found, r1, 0), "tp")
                        r2 = jax.lax.psum(jnp.where(found, r2, 0), "tp")
                        fnd = (found_u > 0) & win["call_valid"]
                        func = (r0 >> 16).astype(jnp.int32)
                        mean = (r1 & jnp.uint32(0xFFFF)).astype(jnp.int32)
                        var = (r2 & jnp.uint32(0xFFFF)).astype(jnp.int32)
                        fnd = fnd & (func != hypo)
                        seqlen = lens_l.astype(jnp.int32)[:, None]
                        d = seqlen - mean
                        if exact:
                            dc = jnp.minimum(jnp.abs(d), 1024)
                            okl = jnp.where(var == 0,
                                            5 * jnp.abs(d) <= seqlen,
                                            dc * dc <= 4 * var)
                        else:
                            sl = seqlen.astype(jnp.float32)
                            stddev = jnp.where(
                                var == 0, sl * jnp.float32(frac),
                                jnp.sqrt(var.astype(jnp.float32)))
                            okl = (jnp.abs(d.astype(jnp.float32))
                                   <= jnp.float32(w) * stddev)
                        res = (fnd & okl).astype(jnp.uint8)
                        full = jnp.zeros((ndp,) + res.shape, res.dtype)
                        full = full.at[jax.lax.axis_index("dp")].set(res)
                        return jax.lax.psum(full, "dp")

                    self._pjit[key] = jax.jit(shard_map(
                        shard_fn, mesh=self.mesh,
                        in_specs=(*stable.aux_in_specs(P),
                                  P("dp", None), P("dp")),
                        out_specs=P(None, None, None)))
        fn = self._pjit[key]
        tab_in = self._placed_tables(True)
        out = fn(*tab_in,
                 distributed.put_global(self.mesh, P("dp", None),
                                        np.ascontiguousarray(codes)),
                 distributed.put_global(self.mesh, P("dp"),
                                        np.ascontiguousarray(lengths)))
        m = distributed.fetch_replicated(out)
        return m.reshape(-1, m.shape[-1])[:B0].astype(bool)

    def dispatch_batch(self, batch: fasta_io.SequenceBatch,
                       keep_hits: bool = False):
        """Run every collective phase of a call: place inputs on the
        mesh and launch the fused per-round programs.  Returns an opaque
        handle for :meth:`collect_batch`.  On a process-spanning mesh
        every process must call this with the same batch, in the same
        dispatch order."""
        if keep_hits:
            # local fallback path (no collectives): results computed
            # eagerly, handle carries them through
            return ("local", super().call_batch(batch, keep_hits=True))
        from jax.sharding import PartitionSpec as P

        from . import distributed

        rows = self.device_config.call_batch
        per_round = rows * self.ndp
        n = len(batch)
        # length-sorted rounds, as in FunctionCaller.call_batch: each
        # round's (L, W) follows its own longest sequence
        lens_all = batch.lengths
        order = None
        # same gate as FunctionCaller.call_batch: order_constraint (were
        # the mesh path ever to implement it) consumes positional hit
        # order, so sorting must not reorder under it
        if (self.device_config.sort_by_length and n > 1
                and not self.config.order_constraint
                and np.any(lens_all[:-1] > lens_all[1:])):
            order = np.argsort(lens_all, kind="stable")
            batch = self._permute_batch(batch, order)
        results = []
        pending = []
        tab_in = self._placed_tables(False)
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
            from ..ops import kmer_pack

            packs = [kmer_pack.pack_u6_rows_host(sub.codes, sub.offsets,
                                                 rows, L)
                     for sub in subs]
            # common packed-row count across dp shards so they stack
            R = max(p[0].shape[0] for p in packs)
            for p, s_arr, l_arr in packs:
                pad = np.zeros((R - p.shape[0], 3), dtype=np.uint32)
                flats.append(np.concatenate([p, pad]) if pad.shape[0]
                             else p)
                offs.append((s_arr, l_arr))
            # probe-width trim, as in FunctionCaller._dispatch_device
            k = self.config.k
            W = min(L, max(16, -(-(max(Lmax, k) - k + 1) // 16) * 16))
            fn = self._parallel_fn(L, R, W)
            mesh = self.mesh
            out = fn(*tab_in,
                     distributed.put_global(mesh, P("dp", None, None),
                                            np.stack(flats)),
                     distributed.put_global(mesh, P("dp", None),
                                            np.stack([o[0] for o in offs])),
                     distributed.put_global(mesh, P("dp", None),
                                            np.stack([o[1] for o in offs])))
            pending.append((subs, out))
        return ("mesh", order, pending)

    def collect_batch(self, handle):
        """Read a dispatched call's results (local replica read — no
        collectives, safe outside any dispatch-order lock) and run the
        host scoring."""
        from . import distributed

        if handle[0] == "local":
            return handle[1]
        _tag, order, pending = handle
        results = []
        for subs, out in pending:
            # replicated output: every process holds the full value
            m = distributed.fetch_replicated(out)  # (dp, rows, WORDS)
            for d, sub in enumerate(subs):
                if len(sub):
                    results.extend(self._finalize_device(sub, m[d]))
        if order is not None:
            results = self._restore_order(results, order)
        return results
