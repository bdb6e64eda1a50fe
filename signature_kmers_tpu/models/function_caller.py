"""Production function caller: device hit gathering + call scoring.

Pipeline (ref architecture: call_functions.tcc:259-338, redesigned TPU-first):

  FASTA -> padded (B, L) code batch            (host, native scanner)
        -> rolling k-mer pack + validity       (device, ops.kmer_pack)
        -> table probe (layout-agnostic)       (device, ops.probe.table_probe;
                                                default: wide tagged-bucket,
                                                ONE row gather per window)
        -> per-sequence hit automaton          (native C++ / Python spec)
        -> find_best_call scoring              (host exact)

The reference spends its time doing one cmph_search + one random mmap read
per residue position (cmph_kmer.h:139-147); here that is one (or, for the
cuckoo layout, two) row gathers per window across the whole batch, and
only a found-mask plus a packed (function, mean) word per position returns
to the host — the full StoredKmerData is gathered only for debug/matrix
paths.  Any table.KmerTableProtocol layout works (wide/cuckoo/linear, or
the reference-format CMPH emulation table).
"""

from __future__ import annotations

import numpy as np

from ..core import alphabet
from ..core.config import CallConfig, DeviceConfig
from ..core.function_map import UNDEFINED_FUNCTION
from ..golden.call import (BestCall, KmerCall, KmerHit, find_best_call,
                           process_hits)
from ..io import fasta as fasta_io
from ..ops import kmer_pack
from ..table import KmerTableProtocol


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


class SequenceResult:
    """Per-sequence outcome.  `calls` may be a thunk: the production
    output path reads only `best`, so the KmerCall row objects (the
    dominant host cost per chunk) are materialized on first access."""

    __slots__ = ("seq_id", "length", "best", "hits", "_calls")

    def __init__(self, seq_id: str, length: int, calls, best: BestCall,
                 hits: list[KmerHit] | None = None):
        self.seq_id = seq_id
        self.length = length
        self.best = best
        self.hits = hits
        self._calls = calls

    @property
    def calls(self) -> list[KmerCall]:
        if callable(self._calls):
            self._calls = self._calls()
        return self._calls


class FunctionCaller:
    """Batched caller against any KmerTableProtocol layout."""

    def __init__(self, table: KmerTableProtocol, function_index: list[str],
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
        import threading

        self._gather_jit = {}
        # call_batch is invoked concurrently from executor threads (the
        # service's overlapped dispatch): serialize jit-cache fills — a
        # double miss would device_put the multi-hundred-MB table twice
        self._cache_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        # device-automaton fallback accounting: rows processed vs rows
        # re-called on the host (REC_CAP overflow / 16-bit packing guard,
        # ops/automaton.py).  An adversarial corpus (many function
        # switches per protein) could make the host path dominate
        # silently; bench.py reports host_fallback_frac from these.
        self.rows_processed = 0
        self.rows_host_fallback = 0

    @property
    def host_fallback_frac(self) -> float:
        return (self.rows_host_fallback / self.rows_processed
                if self.rows_processed else 0.0)

    def function_at_index(self, idx: int) -> str:
        if idx == UNDEFINED_FUNCTION:
            return ""
        return self.function_index[idx]

    # -- hit gathering -----------------------------------------------------

    def _full_device_fn(self, L: int, W: int | None = None):
        """Fused device expand + pack + probe + device automaton:
        16-code-aligned packed rows go up (see pack_u6_rows_host), only
        (B, REC_CAP) call records come back.

        W trims the window axis before the probe: gather cost is
        proportional to the INDEX COUNT (benchmarks/gather_width.py, ~10
        ns/row at any width), and the 128-bucketed code width L can
        carry up to ~25% padding windows past the chunk's true maximum
        sequence length.  W must satisfy W >= maxlen - k + 1 (all valid
        windows retained); callers pass the 16-bucketed value (16 = automaton UNROLL)."""
        W = L if W is None else W
        key = ("full", L, W)
        if key in self._gather_jit:
            return self._gather_jit[key]
        with self._cache_lock:
            if key in self._gather_jit:
                return self._gather_jit[key]
            import jax

            from ..ops import automaton as automaton_ops
            from ..ops import probe as probe_ops

            pfn, arrays = probe_ops.table_probe(self.table, with_aux=False)
            n_tab = len(arrays)
            cfg = self.config
            hypo = self.hypo_index
            ignore_hypo = cfg.ignore_hypothetical

            @jax.jit
            def f(*args):
                import jax.numpy as jnp

                table_arrays = args[:n_tab]
                packed_rows, start_row, lengths = args[n_tab:]
                codes = kmer_pack.expand_rows16(packed_rows, start_row,
                                                lengths, L)
                whi, wlo, call_valid = kmer_pack.pack_call_windows(
                    codes, lengths)
                if W < L:  # drop padding windows before the probe
                    whi = whi[:, :W]
                    wlo = wlo[:, :W]
                    call_valid = call_valid[:, :W]
                found, fm = pfn(*table_arrays, whi, wlo)
                found = found & call_valid
                func = (fm >> 16).astype(jnp.int32)
                mean = (fm & jnp.uint32(0xFFFF)).astype(jnp.int32)
                if ignore_hypo:
                    found = found & (func != hypo)
                out = automaton_ops.device_automaton(
                    found, func, mean, lengths,
                    cfg.min_hits, cfg.max_gap, cfg.k,
                    mad_floor=cfg.mad_floor,
                    len_window=cfg.len_mad_window)
                # ONE packed int32 result (3 words/record) -> one small
                # device->host transfer (per-array transfers each pay the
                # full link latency; see automaton.pack_records)
                return automaton_ops.pack_records(out, lengths)

            self._gather_jit[key] = (f, arrays)
        return self._gather_jit[key]

    def _dispatch_device(self, sub: fasta_io.SequenceBatch):
        """Asynchronously dispatch one sub-batch; returns device futures."""
        import jax.numpy as jnp

        rows = self.device_config.call_batch
        if len(sub) <= rows // 2:
            # undersized chunk (tail, or long-protein splitting): shrink to
            # the next power of two so padding work stays proportional
            rows = 64
            while rows < len(sub):
                rows <<= 1
        lens = sub.lengths
        nat = int(lens.max()) if len(sub) else 128
        L = 128
        while L < nat:
            L += 128
        # codes go up 6-bit packed in 16-code-aligned 12B rows (device
        # expands them with cheap ROW gathers; see pack_u6_rows_host),
        # row count on a pow2/1.5x grid and start_row/lengths at a fixed
        # row count -> few distinct compile shapes, minimal H2D bytes
        packed_rows, start_row, lengths = kmer_pack.pack_u6_rows_host(
            sub.codes, sub.offsets, rows, L)
        # probe width: smallest 16-multiple covering every valid window
        # (window p is valid iff p + k <= len; max p = nat - k)
        k = self.config.k
        W = min(L, max(16, -(-(max(nat, k) - k + 1) // 16) * 16))
        f, arrays = self._full_device_fn(L, W)
        out = f(*arrays, jnp.asarray(packed_rows),
                jnp.asarray(start_row), jnp.asarray(lengths))
        return out

    def _function_meta(self):
        """Per-function multipart flags and lexicographic ranks for the
        native best-call scorer (cached)."""
        if not hasattr(self, "_fmeta"):
            with self._cache_lock:
                if not hasattr(self, "_fmeta"):
                    names = self.function_index
                    is_multipart = np.asarray(
                        [" / " in n for n in names], dtype=np.uint8)
                    order = sorted(range(len(names)),
                                   key=lambda i: names[i])
                    lex_rank = np.empty(len(names), dtype=np.int32)
                    for r, i in enumerate(order):
                        lex_rank[i] = r
                    self._fmeta = (is_multipart, lex_rank)
        return self._fmeta

    def _native_best_call(self, valid, out, B, overflow):
        """Native margin-path scoring; returns list of BestCall | None
        (None = row needs the Python path), or None when unavailable."""
        from ..runtime import host

        if not host.available() or not self.function_index:
            return None
        is_multipart, lex_rank = self._function_meta()
        # overflow rows carry truncated/garbage record words (they are
        # re-called on the host); drop them so they can't trip the
        # function-range check below and stall the whole chunk
        valid = valid & ~overflow[:, None]
        counts_per_row = valid.sum(axis=1)
        flat_fI = out["fI"][:B][valid]
        flat_count = out["count"][:B][valid]
        if flat_fI.size and int(flat_fI.max()) >= len(self.function_index):
            return None  # defensive: function table mismatch
        call_off = np.concatenate(
            [[0], np.cumsum(counts_per_row)]).astype(np.int64)
        kind, func, score, offset, f1, f2 = host.run_best_call(
            flat_fI, flat_count, call_off, is_multipart, lex_rank,
            self.config.merge_interior_thresh,
            self.config.merge_exterior_thresh,
            self.config.call_margin, self.config.pair_margin)
        # .tolist() once: per-element numpy-scalar conversion inside the
        # row loop costs ~100ns each and dominates at 4096 rows/chunk
        kind_l = kind.tolist()
        func_l = func.tolist()
        score_l = score.tolist()
        offset_l = offset.tolist()
        f1_l, f2_l = f1.tolist(), f2.tolist()
        overflow_l = overflow.tolist()
        names = self.function_index
        res = []
        for i in range(B):
            k = kind_l[i]
            if overflow_l[i] or k == 3:
                res.append(None)
            elif k == 0:
                fi = func_l[i]
                res.append(BestCall(fi, names[fi], score_l[i], offset_l[i]))
            elif k == 2:
                res.append(BestCall(
                    UNDEFINED_FUNCTION, f"{names[f1_l[i]]} ?? {names[f2_l[i]]}",
                    score_l[i], offset_l[i]))
            else:
                res.append(BestCall(UNDEFINED_FUNCTION, "", 0.0, offset_l[i]))
        return res

    def _finalize_device(self, sub, packed_out) -> list[SequenceResult]:
        from ..ops.automaton import REC_CAP, unpack_records

        m = np.asarray(packed_out)  # single transfer
        out = unpack_records(m)
        B = len(sub)
        true_lens = sub.lengths.astype(np.int32)
        valid = out["call_valid"][:B]
        counts = np.where(valid, out["count"][:B], 0)
        fIs = np.where(valid, out["fI"][:B], -1)
        n_calls = valid.sum(axis=1)
        total_count = counts.sum(axis=1)
        overflow = out["n_recs"][:B] > REC_CAP

        # fast path: zero calls, or all calls share one function (collapse
        # folds them into a single entry; margin >= min score always holds
        # when any call exists with count >= min_hits)
        fs = np.sort(np.where(valid, fIs, np.int32(1 << 30)), axis=1)
        n_distinct = ((fs[:, :1] != (1 << 30)).astype(np.int64).ravel()
                      + ((fs[:, 1:] != fs[:, :-1])
                         & (fs[:, 1:] != (1 << 30))).sum(axis=1))
        margin = self.config.call_margin

        native_best = self._native_best_call(valid, out, B, overflow)

        def make_lazy(i):
            def build():
                return [KmerCall(int(out["start"][i, r]),
                                 int(out["end"][i, r]),
                                 int(out["count"][i, r]),
                                 int(out["fI"][i, r]),
                                 int(out["median"][i, r]),
                                 float(out["mad"][i, r]))
                        for r in range(REC_CAP) if valid[i, r]]
            return build

        # batch numpy->Python conversions (per-row scalar reads are ~100ns)
        overflow_l = overflow.tolist()
        n_calls_l = n_calls.tolist()
        true_lens_l = true_lens[:B].tolist()
        total_count_l = total_count.tolist()
        fs0_l = fs[:, 0].tolist()
        n_distinct_l = n_distinct.tolist()
        ids = sub.ids

        with self._stats_lock:
            self.rows_processed += B
        results: list[SequenceResult] = [None] * B
        slow_rows = []
        for i in range(B):
            if overflow_l[i]:
                slow_rows.append(i)
                continue
            if n_calls_l[i] == 0:
                results[i] = SequenceResult(
                    ids[i], true_lens_l[i], [],
                    BestCall(UNDEFINED_FUNCTION, "", 0.0, 0.0))
                continue
            calls = make_lazy(i)
            if native_best is not None and native_best[i] is not None:
                best = native_best[i]
            elif n_distinct_l[i] == 1:
                score = float(total_count_l[i])
                if score >= margin:
                    fi = fs0_l[i]
                    best = BestCall(fi, self.function_at_index(fi), score,
                                    score)
                else:
                    best = BestCall(UNDEFINED_FUNCTION, "", 0.0, score)
            else:
                calls = calls()  # find_best_call needs the records
                best = find_best_call(calls, self.function_at_index,
                                      self.config)
            results[i] = SequenceResult(ids[i], true_lens_l[i], calls, best)

        with self._stats_lock:
            self.rows_host_fallback += len(slow_rows)
        for i in slow_rows:
            # exact host fallback for flush-heavy sequences (rare)
            seq = sub.codes[sub.offsets[i]:sub.offsets[i + 1]]
            row = np.full((1, max(128, seq.shape[0])),
                          alphabet.INVALID_CODE, dtype=np.uint8)
            row[0, :seq.shape[0]] = seq
            ln = np.asarray([seq.shape[0]], dtype=np.int32)
            fo, fm = self._gather_host(row, ln, need_aux=False)
            func = (fm >> 16).astype(np.int32)
            mean = (fm & 0xFFFF).astype(np.int32)
            if self.config.ignore_hypothetical:
                fo &= func != self.hypo_index
            pos_list = np.nonzero(fo[0])[0]
            hits = [KmerHit(int(p), 0, int(func[0, p]),
                            int(mean[0, p]), 0, 0) for p in pos_list]
            calls = process_hits(hits, float(true_lens[i]), self.config,
                                 self.hypo_index)
            best = find_best_call(calls, self.function_at_index, self.config)
            results[i] = SequenceResult(sub.ids[i], int(true_lens[i]),
                                        calls, best)
        return results

    def _gather_fn(self, with_aux: bool):
        """jit gather step.  The table arrays are passed as ARGUMENTS, not
        closures — closing over them would embed hundreds of MB as
        compile-time constants."""
        if with_aux in self._gather_jit:
            return self._gather_jit[with_aux]
        with self._cache_lock:
            if with_aux in self._gather_jit:
                return self._gather_jit[with_aux]
            import jax

            from ..ops import probe as probe_ops

            pfn, arrays = probe_ops.table_probe(self.table, with_aux=with_aux)
            n_tab = len(arrays)

            @jax.jit
            def f(*args):
                table_arrays = args[:n_tab]
                codes, lengths = args[n_tab:]
                win = kmer_pack.pack_windows(codes, lengths)
                res = pfn(*table_arrays, win["hi"], win["lo"])
                return (res[0] & win["call_valid"],) + tuple(res[1:])

            self._gather_jit[with_aux] = (f, arrays)
        return self._gather_jit[with_aux]

    def gather_hits_batch(self, codes: np.ndarray, lengths: np.ndarray,
                          need_aux: bool = False):
        """(B, L) codes -> position-aligned hit arrays.

        Returns (found, func, mean) or
        (found, func, mean, avg, median, var) when need_aux."""
        if self.use_device:
            import jax.numpy as jnp

            f, arrays = self._gather_fn(need_aux)
            out = f(*arrays, jnp.asarray(codes), jnp.asarray(lengths))
            out = tuple(np.asarray(o) for o in out)
        else:
            out = self._gather_host(codes, lengths, need_aux)
        found, fm = out[0], out[1]
        func = (fm >> 16).astype(np.int32)
        mean = (fm & 0xFFFF).astype(np.int32)
        if not need_aux:
            return found, func, mean
        r0, r1, r2 = out[2], out[3], out[4]
        avg, _f2, _mean2, median, var = unpack_value_words(r0, r1, r2)
        return found, func, mean, avg, median, var

    def _gather_host(self, codes, lengths, need_aux):
        from ..golden.call import valid_call_windows

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
            v = valid_call_windows(row)
            valid[i, :v.shape[0]] = v
        found, r0, r1, r2 = self.table.lookup_np(hi, lo)
        found &= valid
        fm = ((r0 >> 16) << 16) | (r1 & 0xFFFF)
        if need_aux:
            return found, fm, r0, r1, r2
        return found, fm

    # -- end-to-end --------------------------------------------------------

    @staticmethod
    def _permute_batch(batch: fasta_io.SequenceBatch, order: np.ndarray
                       ) -> fasta_io.SequenceBatch:
        """Reorder a batch's sequences.

        Per-sequence slice + one concatenate: variable-count np.repeat
        index construction measured ~75x slower than this on the target
        host (260 ns/element) — keep the slice loop."""
        offs = np.asarray(batch.offsets, dtype=np.int64)
        lens = np.diff(offs)
        new_off = np.zeros(order.shape[0] + 1, np.int64)
        np.cumsum(lens[order], out=new_off[1:])
        codes = (np.concatenate(
            [batch.codes[offs[i]:offs[i + 1]] for i in order])
            if order.shape[0] else batch.codes[:0])
        return fasta_io.SequenceBatch(
            codes=codes,
            offsets=new_off.astype(batch.offsets.dtype),
            ids=[batch.ids[i] for i in order],
            deflines=[batch.deflines[i] for i in order])

    @staticmethod
    def _restore_order(results: list, order: np.ndarray) -> list:
        """Undo _permute_batch: results[j] belongs to input index
        order[j]; return them in input order."""
        n = order.shape[0]
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        return [results[inv[i]] for i in range(n)]

    def call_batch(self, batch: fasta_io.SequenceBatch,
                   keep_hits: bool = False) -> list[SequenceResult]:
        cfg = self.device_config
        results: list[SequenceResult] = []
        n = len(batch)

        # cap rows x padded-length cells per chunk: one long protein must
        # not inflate the whole chunk's padded width into OOM territory
        CELL_BUDGET = 8 << 20
        lens_all = batch.lengths

        # length-sorted chunking: every chunk's (L, W) follows its OWN
        # longest sequence and the probe pays per INDEX, so mixed-length
        # batches stop probing at the global max width.  Results are
        # restored to input order below.
        order = None
        if (cfg.sort_by_length and self.use_device and not keep_hits
                and not self.config.order_constraint and n > 1
                and np.any(lens_all[:-1] > lens_all[1:])):
            order = np.argsort(lens_all, kind="stable")
            batch = self._permute_batch(batch, order)
            lens_all = batch.lengths

        # probe-waste splitting (sorted batches only): the probe pays
        # per INDEX up to the chunk's W = maxlen-k+1, so a chunk whose
        # lengths span a wide range probes mostly padding (a U[60,600]
        # batch in 4096-seq chunks probes ~45% invalid windows).  Cut
        # chunks (floor 1024 rows, only when padding exceeds ~15%) so W
        # hugs each span's own maximum.
        useful = None
        if order is not None:
            k_ = self.config.k
            # per-row useful floored at 16 to MATCH Wc's floor: the
            # probed width never drops below 16, so sub-16-window rows
            # must not read as waste (uniformly short batches would
            # otherwise split to the row floor for zero benefit)
            useful = np.zeros(n + 1, np.int64)
            np.cumsum(np.maximum(lens_all.astype(np.int64) - (k_ - 1), 16),
                      out=useful[1:])

        def subs():
            s = 0
            while s < n:
                e = min(s + cfg.call_batch, n)
                while e - s > 1:
                    lmax = int(lens_all[s:e].max())
                    L = max(128, -(-lmax // 128) * 128)
                    if (e - s) * L <= CELL_BUDGET:
                        break
                    e = s + max(1, (e - s) // 2)
                if useful is not None:
                    while e - s > 1024:
                        Wc = max(16, int(lens_all[e - 1]) - self.config.k + 1)
                        if (e - s) * Wc <= 1.15 * (useful[e] - useful[s]):
                            break
                        e = s + max(1024, (e - s) // 2)
                yield fasta_io.SequenceBatch(
                    codes=batch.codes[batch.offsets[s]:batch.offsets[e]],
                    offsets=batch.offsets[s:e + 1] - batch.offsets[s],
                    ids=batch.ids[s:e],
                    deflines=batch.deflines[s:e],
                )
                s = e

        # the device/native automatons implement the production semantics;
        # the (reference-disabled) order_constraint gate lives only in the
        # exact Python path
        if self.use_device and not keep_hits and not self.config.order_constraint:
            # bounded async pipeline: keep a few chunks in flight so host
            # packing/scoring of chunk i overlaps device compute of chunks
            # i+1..i+DEPTH (dispatches are async; _finalize_device blocks
            # on chunk i's D2H), while capping in-flight device buffers —
            # dispatching a million-sequence batch all at once would pin
            # every chunk's input rows on device simultaneously
            from collections import deque

            DEPTH = 4
            pending: deque = deque()
            for sub in subs():
                pending.append((sub, self._dispatch_device(sub)))
                if len(pending) >= DEPTH:
                    s0, o0 = pending.popleft()
                    results.extend(self._finalize_device(s0, o0))
            while pending:
                s0, o0 = pending.popleft()
                results.extend(self._finalize_device(s0, o0))
            if order is not None:
                results = self._restore_order(results, order)
            return results

        # the order_constraint gate consumes avg_from_end -> needs aux
        need_aux = keep_hits or self.config.order_constraint
        for sub in subs():
            codes, lengths = pad_bucketed(sub, cfg.call_batch)
            out = self.gather_hits_batch(codes, lengths, need_aux=need_aux)
            results.extend(self._score_batch(sub, out, keep_hits))
        return results

    def _score_batch(self, sub, gathered, keep_hits: bool) -> list[SequenceResult]:
        """Automaton + best-call scoring over a gathered hit batch.

        Uses the native C++ automaton (runtime/csrc) when available; the
        exact Python spec otherwise."""
        B = len(sub)
        true_lens = sub.lengths.astype(np.int32)
        found = gathered[0][:B].copy()
        func, mean = gathered[1][:B], gathered[2][:B]
        if self.config.ignore_hypothetical:
            # skipped before any automaton state change
            # (ref: call_functions.tcc:285-289)
            found &= func != self.hypo_index

        native = None
        if not keep_hits and not self.config.order_constraint:
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

        have_aux = len(gathered) > 3
        if have_aux:
            avg, median, var = gathered[3][:B], gathered[4][:B], gathered[5][:B]
        for i in range(B):
            true_len = int(true_lens[i])
            pos_list = np.nonzero(found[i])[0]
            if have_aux:
                hits = [KmerHit(int(p), int(avg[i, p]), int(func[i, p]),
                                int(mean[i, p]), int(median[i, p]),
                                int(var[i, p])) for p in pos_list]
            else:
                hits = [KmerHit(int(p), 0, int(func[i, p]),
                                int(mean[i, p]), 0, 0) for p in pos_list]
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


def unpack_value_words(r0, r1, r2):
    """-> (avg_from_end, function_index, mean, median, var)"""
    r0 = np.asarray(r0)
    r1 = np.asarray(r1)
    return (r0 & 0xFFFF, r0 >> 16, r1 & 0xFFFF, r1 >> 16,
            np.asarray(r2) & 0xFFFF)
