"""Production matrix distance: shared-signature-k-mer pair counts on MXU.

The reference builds kmer -> {seq ids} sets and increments a nested map for
every id pair per k-mer — O(sum |set|^2) scalar work
(ref: matrix_distance.h:45-148, kmers-matrix-distance.cc:118-196).

TPU-native design: the (distinct k-mer x sequence) incidence matrix A is
processed in row blocks on the MXU: C = sum_b A_b^T A_b accumulates the
full pair-count matrix in one pass of dense f32 matmuls.  The hit

filter semantics match the reference exactly:
- ignore_hypothetical is forced on (matrix_distance.h:88);
- a hit is dropped when seqlen is outside mean +/- 2*stddev with
  stddev = sqrt(var), or 0.1*seqlen when var == 0 (matrix_distance.h:63-78);
- each (k-mer, sequence) pair counts once (set semantics).
"""

from __future__ import annotations

import numpy as np

from ..core.config import CallConfig, DeviceConfig, DistanceConfig
from ..golden.distance import DistanceResult
from ..io import fasta as fasta_io
from ..models import function_caller as function_caller_mod
from ..models.function_caller import FunctionCaller
from ..ops import kmer_pack
from ..table.kmer_table import KmerTable


def _mark_varying(x, axes):
    """Mark a shard_map value device-varying over `axes` (scan carries
    must match their xs' varying type).  jax >= 0.8 spells this
    lax.pcast(..., to="varying"); pvary is the deprecated name."""
    import jax

    try:
        return jax.lax.pcast(x, tuple(axes), to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, tuple(axes))


class MatrixDistance:
    def __init__(self, table: KmerTable, function_index: list[str],
                 config: DistanceConfig = DistanceConfig(),
                 device_config: DeviceConfig = DeviceConfig(),
                 use_device: bool = True):
        self.table = table
        self.config = config
        self.device_config = device_config
        self.use_device = use_device
        # distance always ignores hypothetical-protein k-mers
        self.caller = FunctionCaller(
            table, function_index,
            CallConfig(ignore_hypothetical=True),
            device_config, use_device=use_device)
        self.hypo_index = self.caller.hypo_index

    def compute(self, batches: list[fasta_io.SequenceBatch],
                mesh=None) -> DistanceResult:
        """All-vs-all shared-signature-k-mer counts.

        With `mesh`, the incidence blocks are sharded over every mesh
        device and the partial pair-count matrices combined with a psum —
        the in-process, collective-reduction replacement for the
        reference's run-many-jobs-and-merge-text-files scaling
        (ref: kmers-matrix-distance-folder.cc:108-116,
        kmers-matrix-distance-merge.cc:125-165).  Counts are exact at any
        device count: each block contributes integer-valued f32 partial
        sums, so the reduction order cannot change the result."""
        ids: list[str] = []
        id_to_idx: dict[str, int] = {}
        prot_sizes: dict[str, int] = {}
        kmer_keys: list[np.ndarray] = []
        kmer_seqs: list[np.ndarray] = []

        cfg = self.device_config
        for batch in batches:
            n = len(batch)
            for s in range(0, n, cfg.call_batch):
                e = min(s + cfg.call_batch, n)
                sub = fasta_io.SequenceBatch(
                    codes=batch.codes[batch.offsets[s]:batch.offsets[e]],
                    offsets=batch.offsets[s:e + 1] - batch.offsets[s],
                    ids=batch.ids[s:e],
                    deflines=batch.deflines[s:e],
                )
                codes, lengths = function_caller_mod.pad_bucketed(
                    sub, cfg.call_batch)
                found = self._gather(codes, lengths)
                found = found[:len(sub)]
                # host-side id interning (sequence order)
                row_idx = np.empty(len(sub), dtype=np.int64)
                for i, sid in enumerate(sub.ids):
                    if sid not in id_to_idx:
                        id_to_idx[sid] = len(ids)
                        ids.append(sid)
                    row_idx[i] = id_to_idx[sid]
                    prot_sizes[sid] = int(sub.lengths[i])
                b, l = np.nonzero(found)
                if b.size:
                    # reconstruct the hit windows' packed keys from codes
                    # (hit positions only — the device returns just the
                    # found mask)
                    c = codes.astype(np.uint64)
                    hi = ((c[b, l] << 18) | (c[b, l + 1] << 12)
                          | (c[b, l + 2] << 6) | c[b, l + 3])
                    lo = ((c[b, l + 4] << 18) | (c[b, l + 5] << 12)
                          | (c[b, l + 6] << 6) | c[b, l + 7])
                    kmer_keys.append((hi << np.uint64(24)) | lo)
                    kmer_seqs.append(row_idx[b])

        if not kmer_keys:
            return DistanceResult(ids=ids, prot_sizes=prot_sizes, pairs=[])

        keys = np.concatenate(kmer_keys)
        seqs = np.concatenate(kmer_seqs)
        # distinct (kmer, seq) pairs via lexsort (no packed-word overflow)
        order = np.lexsort((seqs, keys))
        keys = keys[order]
        seqs = seqs[order]
        first = np.ones(keys.size, dtype=bool)
        first[1:] = (keys[1:] != keys[:-1]) | (seqs[1:] != seqs[:-1])
        keys = keys[first]
        seqs = seqs[first]
        # dense k-mer ids
        _, kmer_id = np.unique(keys, return_inverse=True)
        pairs = self._pairs(kmer_id, seqs, len(ids), mesh=mesh)
        return DistanceResult(ids=ids, prot_sizes=prot_sizes, pairs=pairs)

    def _pairs(self, kmer_id, seqs, n_seqs, mesh=None):
        """(i, j, count) triples with i < j, sorted.

        Small batches use one dense (S, S) accumulator; past
        config.dense_pair_limit the output is computed in
        (tile_size x tile_size) blocks streamed to host as sparse pairs,
        so device and host memory stay bounded by the tile, not by S^2
        (the reference handles the same regime with nested sparse maps,
        matrix_distance.h:128-148)."""
        if (self.use_device and n_seqs >= 8
                and n_seqs > self.config.dense_pair_limit):
            return self._pairs_tiled(kmer_id, seqs, n_seqs, mesh=mesh)
        counts = self._pair_counts(kmer_id, seqs, n_seqs, mesh=mesh)
        # nonzero on the symmetric matrix + upper-triangle filter: avoids
        # materializing np.triu's full (S, S) int64 copy (0.5 GB at 8K)
        i1, i2 = np.nonzero(counts)
        m = i1 < i2
        i1, i2 = i1[m], i2[m]
        pairs = [(int(a), int(b), int(c))
                 for a, b, c in zip(i1, i2, counts[i1, i2])]
        pairs.sort()
        return pairs

    # -- internals ---------------------------------------------------------

    def _gather(self, codes, lengths):
        """Device hit gathering with the distance filters applied on
        device; only the (B, L) found mask returns to the host (the raw
        value words are ~20x the mask's bytes and the link is the
        bottleneck)."""
        mc = getattr(self, "mesh_caller", None)
        if mc is not None:
            return self._gather_mesh(mc, codes, lengths)
        if self.use_device:
            import jax
            import jax.numpy as jnp

            if not hasattr(self, "_jit_gather_cache"):
                self._jit_gather_cache = {}
            # probe-width trim (see FunctionCaller._full_device_fn):
            # gather cost is per-INDEX, and the aux probe gathers full
            # value rows — drop padding windows past the batch max length
            k = self.config.k
            B, L = codes.shape
            nat = int(lengths.max()) if lengths.size else k
            W = min(L, max(16, -(-(max(nat, k) - k + 1) // 16) * 16))
            if W not in self._jit_gather_cache:
                from ..ops import probe as probe_ops

                if not hasattr(self, "_dev_arrays"):
                    # one table upload shared by every W-keyed program
                    self._pfn, self._dev_arrays = probe_ops.table_probe(
                        self.table, with_aux=True)
                pfn = self._pfn
                n_tab = len(self._dev_arrays)
                hypo = self.hypo_index
                w = self.config.len_sigma_window
                frac = self.config.zero_var_len_frac
                exact = (w == 2.0 and frac == 0.1)

                # table arrays are call arguments, not jit constants
                @jax.jit
                def f(*args):
                    table_arrays = args[:n_tab]
                    codes, lengths = args[n_tab:]
                    Lc = codes.shape[1]
                    whi, wlo, call_valid = kmer_pack.pack_call_windows(
                        codes, lengths)
                    if W < Lc:
                        whi = whi[:, :W]
                        wlo = wlo[:, :W]
                        call_valid = call_valid[:, :W]
                    found, fm, r0, r1, r2 = pfn(*table_arrays, whi, wlo)
                    found = found & call_valid
                    func = (r0 >> 16).astype(jnp.int32)
                    mean = (r1 & jnp.uint32(0xFFFF)).astype(jnp.int32)
                    var = (r2 & jnp.uint32(0xFFFF)).astype(jnp.int32)
                    # hypothetical hits never count (matrix_distance.h:88)
                    found = found & (func != hypo)
                    # length filter (matrix_distance.h:63-78)
                    seqlen = lengths.astype(jnp.int32)[:, None]
                    d = seqlen - mean
                    if exact:
                        # exact integer forms of the float64 spec at the
                        # reference defaults (see golden/distance.py):
                        # var>0:  |d| <= 2*sqrt(var)  <=>  d^2 <= 4*var
                        #   (|d| capped: 4*var <= 262140 -> |d|>512 fails)
                        # var==0: |d| <= 0.2*seqlen   <=>  5*|d| <= seqlen
                        dc = jnp.minimum(jnp.abs(d), 1024)
                        okl = jnp.where(var == 0,
                                        5 * jnp.abs(d) <= seqlen,
                                        dc * dc <= 4 * var)
                    else:
                        sl = seqlen.astype(jnp.float32)
                        stddev = jnp.where(
                            var == 0, sl * jnp.float32(frac),
                            jnp.sqrt(var.astype(jnp.float32)))
                        df = d.astype(jnp.float32)
                        okl = jnp.abs(df) <= jnp.float32(w) * stddev
                    res = found & okl
                    Lc2 = args[n_tab].shape[1]
                    if W < Lc2:  # restore position alignment for the host
                        res = jnp.pad(res, ((0, 0), (0, Lc2 - W)))
                    return res

                self._jit_gather_cache[W] = f
            found = np.asarray(self._jit_gather_cache[W](
                *self._dev_arrays, jnp.asarray(codes),
                jnp.asarray(lengths)))
            return found

        from ..core import alphabet
        from ..golden.call import valid_call_windows

        B, L = codes.shape
        hi = np.zeros((B, L), dtype=np.uint32)
        lo = np.zeros((B, L), dtype=np.uint32)
        valid = np.zeros((B, L), dtype=bool)
        for i in range(B):
            nlen = int(lengths[i])
            row = codes[i, :nlen]
            h, l = alphabet.pack_codes_np(row)
            hi[i, :max(nlen - 7, 0)] = h
            lo[i, :max(nlen - 7, 0)] = l
            v = valid_call_windows(row)
            valid[i, :v.shape[0]] = v
        found, r0, r1, r2 = self.table.lookup_np(hi, lo)
        found &= valid
        avg, func, mean, median, var = KmerTable.unpack_values(r0, r1, r2)
        found = found & (func != self.hypo_index)
        seqlen = lengths.astype(np.float64)[:, None]
        stddev = np.where(var == 0, seqlen * self.config.zero_var_len_frac,
                          np.sqrt(var.astype(np.float64)))
        w = self.config.len_sigma_window
        okl = (seqlen >= mean - stddev * w) & (seqlen <= mean + stddev * w)
        return found & okl

    def _gather_mesh(self, mc, codes, lengths):
        """Hit gathering against the TP-SHARDED table via a
        ParallelFunctionCaller (`self.mesh_caller`, set by the mesh
        service): the /matrix endpoint then never requires the table to
        fit one device (ref surface: kser_request.cc:444-467
        MatrixRequest).  The hypothetical + length filters run
        IN-PROGRAM (same forms as this file's single-device program)
        and only the found MASK ships to the host — the value words are
        ~20x its bytes."""
        return mc.gather_found_filtered(
            codes, lengths, self.hypo_index,
            self.config.len_sigma_window, self.config.zero_var_len_frac)

    def _pack_seq_block(self, kk, sj, nkb: int, kblock: int, cap: int):
        """Entries of one sequence block (kmer-sorted) -> (nkb, cap)
        kmer-rel / seq-rel / valid arrays for the device scan."""
        kr = np.zeros((nkb, cap), np.int32)
        sr = np.zeros((nkb, cap), np.int32)
        v = np.zeros((nkb, cap), bool)
        if kk.size:
            bi = (kk // kblock).astype(np.int64)
            cell_start = np.searchsorted(kk, bi * kblock)
            pos = np.arange(kk.size, dtype=np.int64) - cell_start
            kr[bi, pos] = kk - bi * kblock
            sr[bi, pos] = sj
            v[bi, pos] = True
        return kr, sr, v

    def _tile_fn(self, kblock: int, sblk: int, mesh):
        """Jitted (I, J) output-tile accumulator: scan over kmer blocks,
        densify both blocks' incidence slices, C += A_I^T A_J on the MXU.

        f32 accumulation is exact while every pair count stays below
        2^24 — a pair's count is bounded by the number of shared k-mer
        windows, i.e. by protein length (< 2^16), far inside the bound."""
        import jax
        import jax.numpy as jnp

        key = ("tile", kblock, sblk, mesh is not None)
        if not hasattr(self, "_tile_jit"):
            self._tile_jit = {}
        if key in self._tile_jit:
            return self._tile_jit[key]

        def scan_tiles(krI, srI, vI, krJ, srJ, vJ, axes=()):
            def body(C, args):
                kI, sI, mI, kJ, sJ, mJ = args
                AI = jnp.zeros((kblock, sblk), jnp.float32).at[kI, sI].add(
                    mI.astype(jnp.float32), mode="drop")
                AJ = jnp.zeros((kblock, sblk), jnp.float32).at[kJ, sJ].add(
                    mJ.astype(jnp.float32), mode="drop")
                return C + jnp.dot(AI.T, AJ,
                                   preferred_element_type=jnp.float32), None

            init = jnp.zeros((sblk, sblk), dtype=jnp.float32)
            if axes:
                init = _mark_varying(init, axes)
            C, _ = jax.lax.scan(body, init, (krI, srI, vI, krJ, srJ, vJ))
            return C

        if mesh is None:
            fn = jax.jit(scan_tiles)
        else:
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            def local(*args):
                part = scan_tiles(*args, axes=("dp", "tp"))
                return jax.lax.psum(part, ("dp", "tp"))

            spec = P(("dp", "tp"))
            fn = jax.jit(shard_map(
                local, mesh=mesh, in_specs=(spec,) * 6, out_specs=P()))
        self._tile_jit[key] = fn
        return fn

    def _pairs_tiled(self, kmer_id: np.ndarray, seqs: np.ndarray,
                     n_seqs: int, mesh=None):
        """Tiled pair counting for large S: device and host memory are
        bounded by one (tile_size x tile_size) block; only the nonzero
        (i, j, count) triples of each upper-triangular tile reach the
        host (ref regime: matrix_distance.h:128-148 nested maps)."""
        import jax.numpy as jnp

        sblk = self.config.tile_size
        kblock = 4096
        n_kmers = int(kmer_id.max()) + 1 if kmer_id.size else 0
        if n_kmers == 0:
            return []
        nsb = -(-n_seqs // sblk)
        nkb = -(-n_kmers // kblock)
        ndev = int(mesh.devices.size) if mesh is not None else 1
        nkb_pad = -(-nkb // ndev) * ndev

        sb = (seqs // sblk).astype(np.int64)
        order = np.lexsort((kmer_id, sb))
        kk = kmer_id[order]
        ss = seqs[order]
        blk_start = np.searchsorted(sb[order], np.arange(nsb + 1))

        # one global cap keeps a single compiled tile program
        cap = 16
        for j in range(nsb):
            a, b = int(blk_start[j]), int(blk_start[j + 1])
            if a == b:
                continue
            cnt = np.bincount(kk[a:b] // kblock, minlength=nkb)
            cap = max(cap, int(cnt.max()))
        cap = 1 << (cap - 1).bit_length()

        if mesh is not None:
            # spanning-mesh-safe placement + replicated read (see
            # _pair_counts mesh branch)
            from jax.sharding import PartitionSpec as P

            from ..parallel import distributed

            spec = P(("dp", "tp"))

            def up(x):
                return distributed.put_global(mesh, spec, x)

            def down(c):
                return distributed.fetch_replicated(c)
        else:
            def up(x):
                return jnp.asarray(x)

            def down(c):
                return np.asarray(c)

        packs = []
        for j in range(nsb):
            a, b = int(blk_start[j]), int(blk_start[j + 1])
            kr, sr, v = self._pack_seq_block(
                kk[a:b], ss[a:b] - j * sblk, nkb_pad, kblock, cap)
            packs.append(tuple(up(x) for x in (kr, sr, v)))

        fn = self._tile_fn(kblock, sblk, mesh)
        pairs = []
        for i in range(nsb):
            for j in range(i, nsb):
                C = down(fn(*packs[i], *packs[j]))
                if i == j:
                    a1, a2 = np.nonzero(np.triu(C, k=1))
                else:
                    a1, a2 = np.nonzero(C)
                if a1.size:
                    ci = C[a1, a2].astype(np.int64)
                    gi = a1.astype(np.int64) + i * sblk
                    gj = a2.astype(np.int64) + j * sblk
                    pairs.extend(zip(gi.tolist(), gj.tolist(), ci.tolist()))
        pairs.sort()
        return pairs

    def _pair_counts(self, kmer_id: np.ndarray, seqs: np.ndarray,
                     n_seqs: int, mesh=None) -> np.ndarray:
        """Blocked incidence matmul: C = sum_b A_b^T A_b (dense (S, S)
        output; _pairs switches to the tiled path past
        config.dense_pair_limit).  f32 accumulation is exact while pair
        counts stay below 2^24; counts are bounded by protein length
        (< 2^16), far inside the bound."""
        n_kmers = int(kmer_id.max()) + 1 if kmer_id.size else 0
        if n_seqs == 0 or n_kmers == 0:
            return np.zeros((0, 0), dtype=np.int64)
        if mesh is not None and not (self.use_device and n_seqs >= 8):
            import sys

            print("matrix-distance: --mesh ignored (host fallback path: "
                  f"use_device={self.use_device}, n_seqs={n_seqs} < 8)",
                  file=sys.stderr)
            mesh = None
        if self.use_device and n_seqs >= 8:
            import jax
            import jax.numpy as jnp

            block = 8192
            S = n_seqs

            # densify each incidence block ON DEVICE from sparse
            # (kmer, seq) indices: shipping dense blocks costs
            # block*S*4 bytes each (tens of MB); the index form is
            # ~100x smaller.  (kmer, seq) pairs are already distinct,
            # so scatter-add builds an exact 0/1 matrix.  All blocks go
            # up in ONE transfer and a lax.scan accumulates C in one
            # dispatch (per-block dispatches pay the full link latency).
            order = np.argsort(kmer_id, kind="stable")
            kk = kmer_id[order]
            ss = seqs[order]
            bounds = np.searchsorted(
                kk, np.arange(0, n_kmers + block, block))
            counts = np.diff(bounds)
            cap = max(16, 1 << int(counts.max() - 1).bit_length()) \
                if counts.size else 16
            nb = counts.size
            kk_rel = np.zeros((nb, cap), dtype=np.int32)
            ssb = np.zeros((nb, cap), dtype=np.int32)
            val = np.zeros((nb, cap), dtype=bool)
            for bi in range(nb):
                a, b = int(bounds[bi]), int(bounds[bi + 1])
                kk_rel[bi, :b - a] = kk[a:b] - bi * block
                ssb[bi, :b - a] = ss[a:b]
                val[bi, :b - a] = True

            def scan_blocks(kk_rel, ssb, val, axes=()):
                def body(C, args):
                    kr, sb, v = args
                    A = jnp.zeros((block, S), dtype=jnp.float32)
                    A = A.at[kr, sb].add(v.astype(jnp.float32),
                                         mode="drop")
                    return C + jnp.dot(
                        A.T, A, preferred_element_type=jnp.float32), None

                init = jnp.zeros((S, S), dtype=jnp.float32)
                if axes:
                    # inside shard_map the xs are device-varying; the
                    # carry init must be marked varying too
                    init = _mark_varying(init, axes)
                C, _ = jax.lax.scan(body, init, (kk_rel, ssb, val))
                return C

            if mesh is not None:
                # blocks sharded over EVERY mesh device (the dp x tp grid
                # flattened into one reduction axis); each device scans
                # its block slice and the partial pair-count matrices
                # merge with one psum over ICI.
                from jax.sharding import PartitionSpec as P

                try:
                    from jax import shard_map
                except ImportError:  # older jax
                    from jax.experimental.shard_map import shard_map

                ndev = int(mesh.devices.size)
                pad = (-nb) % ndev
                if pad:
                    kk_rel = np.concatenate(
                        [kk_rel, np.zeros((pad, cap), np.int32)])
                    ssb = np.concatenate(
                        [ssb, np.zeros((pad, cap), np.int32)])
                    val = np.concatenate(
                        [val, np.zeros((pad, cap), bool)])

                def local(kk_rel, ssb, val):
                    part = scan_blocks(kk_rel, ssb, val,
                                       axes=("dp", "tp"))
                    return jax.lax.psum(part, ("dp", "tp"))

                fn = jax.jit(shard_map(
                    local, mesh=mesh,
                    in_specs=(P(("dp", "tp")), P(("dp", "tp")),
                              P(("dp", "tp"))),
                    out_specs=P()))
                # explicit global placement + replicated read: works on
                # process-SPANNING meshes too (each rank passes the same
                # host arrays; the psum'd result is replicated, so the
                # read is local — multihost /matrix runs this same
                # program on every rank, service/multihost.py OP_MATRIX)
                from ..parallel import distributed

                spec = P(("dp", "tp"))
                C = fn(distributed.put_global(mesh, spec, kk_rel),
                       distributed.put_global(mesh, spec, ssb),
                       distributed.put_global(mesh, spec, val))
                return distributed.fetch_replicated(C).astype(np.int64)

            C = jax.jit(scan_blocks)(jnp.asarray(kk_rel), jnp.asarray(ssb),
                                     jnp.asarray(val))
            return np.asarray(C).astype(np.int64)
        # host fallback
        C = np.zeros((n_seqs, n_seqs), dtype=np.int64)
        order = np.argsort(kmer_id, kind="stable")
        kk = kmer_id[order]
        ss = seqs[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(kk))[0] + 1, [kk.size]])
        for a, b in zip(starts[:-1], starts[1:]):
            members = ss[a:b]
            C[np.ix_(members, members)] += 1
        np.fill_diagonal(C, 0)
        return C
