"""Matrix-distance throughput at growing S (dense and tiled regimes).

BASELINE config #3's compute core: all-vs-all shared-signature-k-mer
counting.  S <= DistanceConfig.dense_pair_limit uses one dense (S, S)
device pair-count; larger S streams (tile x tile) output blocks
(models/matrix_distance.py).  Reports warm seconds and pairs for each S.

Usage: python benchmarks/distance_bench.py [S ...]  (default 2048 8192 20000)
"""

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
from signature_kmers_tpu.models.matrix_distance import MatrixDistance
from signature_kmers_tpu.table.kmer_table import KmerTable
from signature_kmers_tpu.table.wide_table import WideKmerTable

SIG_KEYS = 600_000
L = 280

sizes = [int(a) for a in sys.argv[1:]] or [2048, 8192, 20000]
rng = np.random.default_rng(17)
aa = alphabet.encode_seq(alphabet.AA20)
corpus = aa[rng.integers(0, 20, SIG_KEYS + 7)].astype(np.uint8)
hi, lo = alphabet.pack_codes_np(corpus)
pk = (hi.astype(np.uint64) << 24) | lo
_, idx = np.unique(pk, return_index=True)
idx.sort()
hi, lo = hi[idx], lo[idx]
nk = hi.shape[0]
v0, v1, v2 = KmerTable.pack_values(
    rng.integers(0, L, nk), (np.arange(nk) % 5000),
    np.full(nk, L, np.uint32), np.full(nk, L, np.uint32),
    np.full(nk, 10000, np.uint32))
table = WideKmerTable.build(hi, lo, v0.astype(np.uint32),
                            v1.astype(np.uint32), v2.astype(np.uint32))
fidx = [f"fn{i}" for i in range(5000)] + ["hypothetical protein"]
cfg = Config()
md = MatrixDistance(table, fidx, cfg.distance, cfg.device)

for S in sizes:
    n_genes = S // 4  # 4 related sequences per gene on average
    gene_starts = rng.integers(0, SIG_KEYS - L, n_genes)
    picks = rng.choice(n_genes, S, replace=True)
    codes = np.empty((S, L), np.uint8)
    for i, g in enumerate(picks):
        codes[i] = corpus[gene_starts[g]:gene_starts[g] + L]
        pos = rng.integers(0, L, 4)
        codes[i, pos] = aa[rng.integers(0, 20, 4)]
    batch = SequenceBatch(codes.reshape(-1),
                          (np.arange(S + 1) * L).astype(np.int32),
                          [f"s{i}" for i in range(S)], [""] * S)
    res = md.compute([batch])  # warm incl. compile
    t0 = time.perf_counter()
    res = md.compute([batch])
    dt = time.perf_counter() - t0
    n_pairs = sum(1 for _ in res.rows(with_score=False))
    regime = "dense" if S <= cfg.distance.dense_pair_limit else "tiled"
    print(f"S={S:6d} ({regime}): {dt:7.2f}s warm, {n_pairs:,} pairs, "
          f"{S*S/2/dt/1e6:.1f}M pairwise cells/s", flush=True)
