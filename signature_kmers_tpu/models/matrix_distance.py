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

    def compute(self, batches: list[fasta_io.SequenceBatch]) -> DistanceResult:
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
                found, avg, func, mean, var = self._gather(codes, lengths)
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
                    # pack (hi, lo) into host uint64 keys for dedupe
                    hi = self._hi[b, l].astype(np.uint64)
                    lo = self._lo[b, l].astype(np.uint64)
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
        counts = self._pair_counts(kmer_id, seqs, len(ids))

        i1, i2 = np.nonzero(np.triu(counts, k=1))
        pairs = [(int(a), int(b), int(counts[a, b])) for a, b in zip(i1, i2)]
        pairs.sort()
        return DistanceResult(ids=ids, prot_sizes=prot_sizes, pairs=pairs)

    # -- internals ---------------------------------------------------------

    def _gather(self, codes, lengths):
        """Device hit gathering with the distance length filter applied.

        Also stashes the packed window words for host-side dedupe."""
        caller = self.caller
        if self.use_device:
            import jax
            import jax.numpy as jnp

            if not hasattr(self, "_jit_gather"):
                from ..ops import probe as probe_ops

                self._dev_arrays = self.table.device_arrays(with_aux=True)
                salt = self.table.salt

                # table arrays are call arguments, not jit constants
                @jax.jit
                def f(packed, aux, codes, lengths):
                    whi, wlo, call_valid = kmer_pack.pack_call_windows(
                        codes, lengths)
                    found, fm, r0, r1, r2 = probe_ops.probe_bucket(
                        packed, whi, wlo, salt, aux)
                    return found & call_valid, r0, r1, r2, whi, wlo

                self._jit_gather = f
            found, r0, r1, r2, whi, wlo = self._jit_gather(
                *self._dev_arrays, jnp.asarray(codes), jnp.asarray(lengths))
            self._hi = np.asarray(whi)
            self._lo = np.asarray(wlo)
            found, r0, r1, r2 = map(np.asarray, (found, r0, r1, r2))
        else:
            from ..core import alphabet

            B, L = codes.shape
            hi = np.zeros((B, L), dtype=np.uint32)
            lo = np.zeros((B, L), dtype=np.uint32)
            valid = np.zeros((B, L), dtype=bool)
            from ..golden.call import valid_call_windows

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
            self._hi, self._lo = hi, lo

        avg, func, mean, median, var = KmerTable.unpack_values(r0, r1, r2)
        # hypothetical-protein hits never count (matrix_distance.h:88)
        found = found & (func != self.hypo_index)
        # length filter (matrix_distance.h:63-78)
        seqlen = lengths.astype(np.float64)[:, None]
        stddev = np.where(var == 0, seqlen * self.config.zero_var_len_frac,
                          np.sqrt(var.astype(np.float64)))
        w = self.config.len_sigma_window
        okl = (seqlen >= mean - stddev * w) & (seqlen <= mean + stddev * w)
        found = found & okl
        return found, avg, func, mean, var

    def _pair_counts(self, kmer_id: np.ndarray, seqs: np.ndarray,
                     n_seqs: int) -> np.ndarray:
        """Blocked incidence matmul: C = sum_b A_b^T A_b."""
        n_kmers = int(kmer_id.max()) + 1 if kmer_id.size else 0
        if n_seqs == 0 or n_kmers == 0:
            return np.zeros((0, 0), dtype=np.int64)
        if self.use_device and n_seqs >= 8:
            import jax
            import jax.numpy as jnp

            block = 8192
            S = n_seqs
            C = jnp.zeros((S, S), dtype=jnp.float32)

            @jax.jit
            def accum(C, A):
                return C + jnp.dot(A.T, A, preferred_element_type=jnp.float32)

            order = np.argsort(kmer_id, kind="stable")
            kk = kmer_id[order]
            ss = seqs[order]
            for start in range(0, n_kmers, block):
                m = (kk >= start) & (kk < start + block)
                if not m.any():
                    continue
                A = np.zeros((block, S), dtype=np.float32)
                A[kk[m] - start, ss[m]] = 1.0
                C = accum(C, jnp.asarray(A))
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
