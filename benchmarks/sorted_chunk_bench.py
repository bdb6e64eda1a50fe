"""Length-sorted chunking: probe-index savings on mixed-length batches.

Real query sets are length-heterogeneous; without sorting, every chunk
pays its padded width at the GLOBAL longest sequence of the chunk, and
gather cost is per probed index (docs/PERF.md).  This measures the same
16K mixed-length batch (Uniform[60, 600] aa) through call_batch with
DeviceConfig.sort_by_length on and off: probed-window counts and warm
end-to-end time.

Run on the target chip: python benchmarks/sorted_chunk_bench.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache

enable_cache()

from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import Config
from signature_kmers_tpu.io.fasta import SequenceBatch
from signature_kmers_tpu.models.function_caller import FunctionCaller
from signature_kmers_tpu.table.kmer_table import KmerTable
from signature_kmers_tpu.table.wide_table import WideKmerTable

N_KMERS = 2_000_000
N_Q = 16384

rng = np.random.default_rng(11)
aa = alphabet.encode_seq(alphabet.AA20)
corpus = aa[rng.integers(0, 20, N_KMERS + 7)].astype(np.uint8)
hi, lo = alphabet.pack_codes_np(corpus)
pk = (hi.astype(np.uint64) << 24) | lo
_, idx = np.unique(pk, return_index=True)
idx.sort()
hi, lo = hi[idx], lo[idx]
nk = hi.shape[0]
v0, v1, v2 = KmerTable.pack_values(
    rng.integers(0, 600, nk), ((np.arange(nk) // 300) % 1000),
    np.full(nk, 300, np.uint32), np.full(nk, 300, np.uint32),
    np.full(nk, 40000, np.uint32))
table = WideKmerTable.build(hi, lo, v0.astype(np.uint32),
                            v1.astype(np.uint32), v2.astype(np.uint32))
fidx = [f"fn{i}" for i in range(1000)] + ["hypothetical protein"]

lens = rng.integers(60, 601, N_Q)
starts = rng.integers(0, N_KMERS - 601, N_Q)
codes = np.concatenate([corpus[s:s + l] for s, l in zip(starts, lens)])
offs = np.zeros(N_Q + 1, np.int64)
np.cumsum(lens, out=offs[1:])
batch = SequenceBatch(codes, offs.astype(np.int32),
                      [f"q{i}" for i in range(N_Q)], [""] * N_Q)

cfg = Config()
for sort in (False, True):
    dc = dataclasses.replace(cfg.device, call_batch=4096,
                             sort_by_length=sort)
    caller = FunctionCaller(table, fidx, cfg.call, dc)
    # probed-window accounting: wrap _dispatch_device
    counts = {"win": 0, "chunks": 0}
    orig = caller._dispatch_device

    def counted(sub, _o=orig, _c=counts):
        lmax = int(sub.lengths.max())
        rows = dc.call_batch
        if len(sub) <= rows // 2:
            rows = 64
            while rows < len(sub):
                rows <<= 1
        L = max(128, -(-lmax // 128) * 128)
        W = min(L, max(16, -(-(lmax - 8 + 1) // 16) * 16))
        _c["win"] += rows * W
        _c["chunks"] += 1
        return _o(sub)

    caller._dispatch_device = counted
    res = caller.call_batch(batch)  # warm incl. compile
    n_called = sum(r.best.function_index != 0xFFFF for r in res)
    counts["win"] = 0
    counts["chunks"] = 0
    best = float("inf")
    for _ in range(3):
        counts["win"] = 0
        counts["chunks"] = 0
        t0 = time.perf_counter()
        caller.call_batch(batch)
        best = min(best, time.perf_counter() - t0)
    print(f"sort_by_length={sort}: probed windows "
          f"{counts['win']/1e6:.2f}M in {counts['chunks']} chunks, "
          f"best e2e {best:.2f}s -> {N_Q/best:,.0f} seqs/s "
          f"(called {n_called}/{N_Q})", flush=True)
