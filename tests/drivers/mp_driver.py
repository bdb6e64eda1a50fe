"""Multi-process jax.distributed driver (launched by test_multiprocess.py).

Each process: initializes the real distributed runtime (coordinator +
Gloo CPU collectives), builds the same deterministic workload, computes
  1. the single-device expected call output (process-local), and
  2. the process-spanning (dp x tp) mesh output via ParallelFunctionCaller,
  3. the process-spanning sharded build step via SignatureBuilder(mesh=...),
asserts the mesh results are bit-identical to single-device, and writes a
digest file the launching test compares across processes.

Usage: python mp_driver.py <pid> <nproc> <port> <outdir>
"""

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    outdir = Path(sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from signature_kmers_tpu.parallel import distributed

    assert distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    info = distributed.process_info()
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == info["local_devices"] * nproc, info

    import numpy as np

    from signature_kmers_tpu.core import alphabet
    from signature_kmers_tpu.core.config import Config
    from signature_kmers_tpu.io import formats
    from signature_kmers_tpu.io.fasta import SequenceBatch
    from signature_kmers_tpu.models.function_caller import FunctionCaller
    from signature_kmers_tpu.parallel import build_step
    from signature_kmers_tpu.parallel.mesh import make_mesh
    from signature_kmers_tpu.parallel.parallel_caller import (
        ParallelFunctionCaller)
    from signature_kmers_tpu.table.kmer_table import KmerTable
    from signature_kmers_tpu.table.wide_table import WideKmerTable

    # -- work-list sharding helper behaves as documented ------------------
    items = list(range(10))
    mine = distributed.shard_inputs(items)
    assert mine == items[pid::nproc]
    distributed.barrier("after-shard-inputs")

    # -- deterministic workload (identical on every process) --------------
    rng = np.random.default_rng(42)
    aa = alphabet.encode_seq(alphabet.AA20)
    n_k = 30_000
    corpus = aa[rng.integers(0, 20, n_k + 7)].astype(np.uint8)
    hi, lo = alphabet.pack_codes_np(corpus)
    fn_of = ((np.arange(hi.shape[0]) // 200) % 50).astype(np.uint32)
    pk = (hi.astype(np.uint64) << 24) | lo
    _, idx = np.unique(pk, return_index=True)
    idx.sort()
    hi, lo, fn = hi[idx], lo[idx], fn_of[idx]
    n = hi.shape[0]
    v0, v1, v2 = KmerTable.pack_values(
        rng.integers(0, 200, n), fn,
        np.full(n, 200, np.uint32), np.full(n, 200, np.uint32),
        np.full(n, 400, np.uint32))
    table = WideKmerTable.build(hi, lo, v0.astype(np.uint32),
                                v1.astype(np.uint32), v2.astype(np.uint32))
    function_index = [f"fn{i}" for i in range(50)] + ["hypothetical protein"]

    n_q, L = 96, 200
    starts = rng.integers(0, n_k - L, n_q)
    codes = np.stack([corpus[s:s + L] for s in starts]).copy()
    for q in range(n_q):
        pos = rng.integers(0, L, 6)
        codes[q, pos] = aa[rng.integers(0, 20, 6)]
    batch = SequenceBatch(
        codes.reshape(-1), (np.arange(n_q + 1) * L).astype(np.int32),
        [f"q{i}" for i in range(n_q)], [""] * n_q)

    cfg = Config()

    # -- expected: single-device, process-local ---------------------------
    caller0 = FunctionCaller(table, function_index, cfg.call, cfg.device)
    exp = [formats.format_call_row(r.seq_id, r.best.function,
                                   r.best.function_index, r.best.score)
           for r in caller0.call_batch(batch)]

    # -- mesh: (dp, tp) spanning both processes ---------------------------
    mesh = make_mesh(tp=2)
    assert distributed.is_multiprocess_mesh(mesh), \
        "mesh does not span processes"
    pcaller = ParallelFunctionCaller(table, function_index, cfg.call,
                                     cfg.device, mesh=mesh)
    got = [formats.format_call_row(r.seq_id, r.best.function,
                                   r.best.function_index, r.best.score)
           for r in pcaller.call_batch(batch)]
    assert got == exp, (
        f"mesh call mismatch: {sum(a != b for a, b in zip(got, exp))} rows"
        f" of {len(exp)}")

    # -- sharded build step across processes ------------------------------
    from signature_kmers_tpu.models.signature_builder import SignatureBuilder

    B = 64
    plens = rng.integers(8, 120, B).astype(np.int32)
    bcodes = aa[rng.integers(0, 6, int(plens.sum()))].astype(np.uint8)
    chunk = (bcodes, np.arange(B, dtype=np.int32),
             ((np.arange(B) // 4) % 7).astype(np.int32), plens)
    sb1 = SignatureBuilder()
    sb1._seq_chunks.append(chunk)
    single = sb1.process_kmers()
    sb2 = SignatureBuilder()
    sb2._seq_chunks.append(chunk)
    kept = sb2.process_kmers(mesh=mesh)
    for field in ("hi", "lo", "function_index", "avg_from_end", "mean",
                  "median", "var"):
        np.testing.assert_array_equal(getattr(kept, field),
                                      getattr(single, field))
    assert len(kept) > 0

    distributed.barrier("before-digest")
    digest = hashlib.sha256(
        ("\n".join(got) + "|" + kept.hi.tobytes().hex()).encode()
    ).hexdigest()
    (outdir / f"ok.{pid}").write_text(digest + "\n")
    print(f"pid={pid} OK digest={digest[:16]}", flush=True)


if __name__ == "__main__":
    main()
