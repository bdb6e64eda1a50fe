"""End-to-end build-pipeline benchmark at production scale.

Synthesizes a corpus (~300-aa proteins, default ~20M windows), stuffs
the builder's raw chunk store directly, and times process_kmers() —
native 6-bit row packing, the H2D transfer, device window extraction
fused with the selection pass (_extract_select_jax), and the compacted
fetch.  Run twice: cold (includes jit compile) and warm.

Run on the TPU: `python benchmarks/build_bench.py [n_residues]`.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_chunk(n_residues: int, seq_len: int = 300, n_funcs: int = 5000):
    rng = np.random.default_rng(7)
    B = n_residues // seq_len
    # 20-AA codes are 0..19 in the 6-bit alphabet; draw from a skewed
    # distribution so k-mers collide like real protein families do
    codes = rng.choice(
        np.arange(20, dtype=np.uint8), size=B * seq_len,
        p=np.linspace(2.0, 0.5, 20) / np.linspace(2.0, 0.5, 20).sum())
    # clone family cores: every 10th sequence shares its first half with
    # its family representative, giving repeated k-mers across functions
    codes = codes.reshape(B, seq_len)
    fam = (np.arange(B) // 10) * 10
    codes[:, :seq_len // 2] = codes[fam, :seq_len // 2]
    plens = np.full(B, seq_len, np.int32)
    sids = np.arange(B, dtype=np.int32)
    fidxs = (fam % n_funcs).astype(np.int32)
    return codes.reshape(-1), sids, fidxs, plens


def main():
    from signature_kmers_tpu.models.signature_builder import SignatureBuilder

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    chunk = make_chunk(n)
    print(f"corpus: {chunk[0].shape[0]} residues, {chunk[3].shape[0]} seqs",
          flush=True)

    for label in ("cold", "warm"):
        b = SignatureBuilder()
        b._seq_chunks.append(chunk)
        t0 = time.perf_counter()
        kept = b.process_kmers()
        dt = time.perf_counter() - t0
        nwin = chunk[0].shape[0] - chunk[3].shape[0] * 7
        print(f"{label}: {dt*1e3:8.1f} ms  ({nwin/dt/1e6:.1f} M windows/s)"
              f"  kept={len(kept)}", flush=True)


if __name__ == "__main__":
    main()
