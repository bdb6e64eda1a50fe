"""Production function caller: device hit gathering + call scoring.

Pipeline (ref architecture: call_functions.tcc:259-338, redesigned TPU-first):

  FASTA -> padded (B, L) code batch            (host, native scanner)
        -> rolling k-mer pack + validity       (device, ops.kmer_pack)
        -> batched hash probe                  (device, ops.probe)
        -> per-sequence hit automaton          (host exact / device scan)
        -> find_best_call scoring              (host exact)

The automaton and scoring replicate the golden spec exactly; the device
path only accelerates the per-residue work (packing + table probes), which
is where the reference spends its time (one cmph_search + mmap read per
residue, cmph_kmer.h:139-147).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import numpy as np

from ..core import alphabet
from ..core.config import CallConfig, DeviceConfig
from ..core.function_map import UNDEFINED_FUNCTION
from ..golden.call import (BestCall, KmerCall, KmerHit, find_best_call,
                           process_hits)
from ..io import fasta as fasta_io
from ..ops import kmer_pack, probe
from ..table.kmer_table import KmerTable


def pad_bucketed(sub: fasta_io.SequenceBatch, rows: int):
    """Pad a sub-batch to a FIXED row count and a power-of-two sequence
    length bucket, so jit compiles once per (rows, bucket) pair instead of
    once per batch shape."""
    lens = sub.lengths
    nat = int(lens.max()) if len(sub) else 128
    L = 128
    while L < nat:
        L *= 2
    codes, lengths = kmer_pack.pad_batch(sub, max_len=L, multiple=L)
    if codes.shape[0] < rows:
        padc = np.full((rows - codes.shape[0], codes.shape[1]),
                       alphabet.INVALID_CODE, dtype=np.uint8)
        codes = np.concatenate([codes, padc], axis=0)
        lengths = np.concatenate(
            [lengths, np.zeros(rows - lengths.shape[0], dtype=np.int32)])
    return codes, lengths


@dataclasses.dataclass
class SequenceResult:
    seq_id: str
    length: int
    calls: list[KmerCall]
    best: BestCall
    hits: list[KmerHit] | None = None


class FunctionCaller:
    """Batched caller against a KmerTable."""

    def __init__(self, table: KmerTable, function_index: list[str],
                 config: CallConfig = CallConfig(),
                 device_config: DeviceConfig = DeviceConfig(),
                 use_device: bool = True):
        self.table = table
        self.function_index = function_index
        self.config = config
        self.device_config = device_config
        self.use_device = use_device
        try:
            self.hypo_index = function_index.index("hypothetical protein")
        except ValueError:
            self.hypo_index = -1
            if config.ignore_hypothetical:
                # the reference exits here (call_functions.tcc:269-274)
                raise ValueError("Cannot find hypothetical protein index")
        self._dev = None

    def _device_tables(self):
        if self._dev is None:
            self._dev = self.table.device_arrays()
        return self._dev

    def function_at_index(self, idx: int) -> str:
        if idx == UNDEFINED_FUNCTION:
            return ""
        return self.function_index[idx]

    # -- hit gathering -----------------------------------------------------

    def gather_hits_batch(self, codes: np.ndarray, lengths: np.ndarray):
        """(B, L) codes -> (found, avg, func, mean, median, var) numpy
        arrays of shape (B, L), position-aligned."""
        if self.use_device:
            import jax.numpy as jnp

            t = self._device_tables()
            win = kmer_pack.pack_windows(jnp.asarray(codes),
                                         jnp.asarray(lengths))
            found, r0, r1, r2 = probe.probe_table(
                *t, win["hi"], win["lo"], self.table.max_probes)
            found = found & win["call_valid"]
            found, r0, r1, r2 = map(np.asarray, (found, r0, r1, r2))
        else:
            B, L = codes.shape
            hi = np.zeros((B, L), dtype=np.uint32)
            lo = np.zeros((B, L), dtype=np.uint32)
            valid = np.zeros((B, L), dtype=bool)
            for i in range(B):
                n = int(lengths[i])
                row = codes[i, :n]
                h, l = alphabet.pack_codes_np(row)
                hi[i, :max(n - 7, 0)] = h
                lo[i, :max(n - 7, 0)] = l
                from ..golden.call import valid_call_windows
                v = valid_call_windows(row)
                valid[i, :v.shape[0]] = v
            found, r0, r1, r2 = self.table.lookup_np(hi, lo)
            found &= valid
        avg, func, mean, median, var = KmerTable.unpack_values(r0, r1, r2)
        return found, avg, func, mean, median, var

    # -- end-to-end --------------------------------------------------------

    def call_batch(self, batch: fasta_io.SequenceBatch,
                   keep_hits: bool = False) -> list[SequenceResult]:
        cfg = self.device_config
        results: list[SequenceResult] = []
        n = len(batch)
        for s in range(0, n, cfg.call_batch):
            e = min(s + cfg.call_batch, n)
            sub = fasta_io.SequenceBatch(
                codes=batch.codes[batch.offsets[s]:batch.offsets[e]],
                offsets=batch.offsets[s:e + 1] - batch.offsets[s],
                ids=batch.ids[s:e],
                deflines=batch.deflines[s:e],
            )
            codes, lengths = pad_bucketed(sub, cfg.call_batch)
            found, avg, func, mean, median, var = self.gather_hits_batch(
                codes, lengths)
            results.extend(self._score_batch(
                sub, found, avg, func, mean, median, var, keep_hits))
        return results

    def _score_batch(self, sub, found, avg, func, mean, median, var,
                     keep_hits: bool) -> list[SequenceResult]:
        """Automaton + best-call scoring over a gathered hit batch.

        Uses the native C++ automaton (runtime/csrc) when available; the
        exact Python spec otherwise."""
        B = len(sub)
        true_lens = sub.lengths.astype(np.int32)
        found = found[:B].copy()
        if self.config.ignore_hypothetical:
            # skipped before any automaton state change
            # (ref: call_functions.tcc:285-289)
            found &= func[:B] != self.hypo_index

        native = None
        if not keep_hits:
            from ..runtime import host
            if host.available():
                native = host

        results: list[SequenceResult] = []
        if native is not None:
            b_idx, l_idx = np.nonzero(found)
            counts = np.bincount(b_idx, minlength=B)
            hit_off = np.concatenate([[0], np.cumsum(counts)])
            (call_off, cs, ce, cc, cf, cm, cmad) = native.run_automaton(
                l_idx, func[b_idx, l_idx], mean[b_idx, l_idx], hit_off,
                true_lens, self.config.min_hits, self.config.max_gap,
                self.config.k, self.config.mad_floor,
                self.config.len_mad_window)
            for i in range(B):
                calls = [KmerCall(int(cs[j]), int(ce[j]), int(cc[j]),
                                  int(cf[j]), int(cm[j]), float(cmad[j]))
                         for j in range(call_off[i], call_off[i + 1])]
                best = find_best_call(calls, self.function_at_index,
                                      self.config)
                results.append(SequenceResult(
                    seq_id=sub.ids[i], length=int(true_lens[i]),
                    calls=calls, best=best))
            return results

        for i in range(B):
            true_len = int(true_lens[i])
            pos_list = np.nonzero(found[i])[0]
            hits = [KmerHit(int(p), int(avg[i, p]), int(func[i, p]),
                            int(mean[i, p]), int(median[i, p]),
                            int(var[i, p])) for p in pos_list]
            calls = process_hits(hits, float(true_len), self.config,
                                 self.hypo_index)
            best = find_best_call(calls, self.function_at_index,
                                  self.config)
            results.append(SequenceResult(
                seq_id=sub.ids[i], length=true_len, calls=calls,
                best=best, hits=hits if keep_hits else None))
        return results

    def call_file(self, path, keep_hits: bool = False) -> list[SequenceResult]:
        return self.call_batch(fasta_io.read_fasta_batch(path), keep_hits)
