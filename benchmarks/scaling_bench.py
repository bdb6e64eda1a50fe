"""Virtual-mesh scaling benchmark: call + build steps at 1/2/4/8 devices.

WEAK scaling on the forced-CPU virtual mesh (per-device workload fixed;
ideal time is flat as devices grow).  Virtual devices share this host's
physical cores, so absolute times also reflect core contention — the
numbers bound the COLLECTIVE/SHARDING overhead of the dp all-to-all +
tp psum paths (are the collectives cheap and the work actually split?),
not real multi-chip speedup, which needs hardware this environment lacks
(SURVEY §6 targets >=80% efficiency at >=2 hosts).  Results table lives
in docs/PERF.md.

Usage: python benchmarks/scaling_bench.py            # parent: run 1,2,4,8
       python benchmarks/scaling_bench.py --child N  # one measurement
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQS_PER_DEV = 2048
SEQ_LEN = 256
TABLE_KEYS = 500_000
BUILD_RESIDUES_PER_DEV = 400_000


def child(n: int):
    sys.path.insert(0, REPO)
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")

    from signature_kmers_tpu.core import alphabet
    from signature_kmers_tpu.core.config import CallConfig, DeviceConfig
    from signature_kmers_tpu.io.fasta import SequenceBatch
    from signature_kmers_tpu.parallel import build_step, mesh as mesh_mod
    from signature_kmers_tpu.parallel.parallel_caller import (
        ParallelFunctionCaller)
    from signature_kmers_tpu.table.kmer_table import KmerTable
    from signature_kmers_tpu.table.wide_table import WideKmerTable
    from signature_kmers_tpu.utils.jaxcache import enable_cache

    enable_cache()
    assert len(jax.devices()) >= n, (len(jax.devices()), n)
    mesh = mesh_mod.make_mesh(n)
    ndp, ntp = mesh_mod.dp_size(mesh), mesh_mod.tp_size(mesh)

    rng = np.random.default_rng(3)
    aa = alphabet.encode_seq(alphabet.AA20)

    # ---- call step: dp-sharded queries x tp-sharded table --------------
    corpus = aa[rng.integers(0, 20, TABLE_KEYS + 7)].astype(np.uint8)
    hi, lo = alphabet.pack_codes_np(corpus)
    pk = (hi.astype(np.uint64) << 24) | lo
    _, idx = np.unique(pk, return_index=True)
    idx.sort()
    hi, lo = hi[idx], lo[idx]
    nk = hi.shape[0]
    v0, v1, v2 = KmerTable.pack_values(
        rng.integers(0, SEQ_LEN, nk), (np.arange(nk) % 1000),
        np.full(nk, SEQ_LEN, np.uint32), np.full(nk, SEQ_LEN, np.uint32),
        np.full(nk, 900, np.uint32))
    table = WideKmerTable.build(hi, lo, v0.astype(np.uint32),
                                v1.astype(np.uint32), v2.astype(np.uint32))
    fidx = [f"fn{i}" for i in range(1000)] + ["hypothetical protein"]

    nq = SEQS_PER_DEV * ndp
    starts = rng.integers(0, TABLE_KEYS - SEQ_LEN, nq)
    flat = np.concatenate([corpus[s:s + SEQ_LEN] for s in starts])
    batch = SequenceBatch(flat,
                          (np.arange(nq + 1) * SEQ_LEN).astype(np.int32),
                          [f"q{i}" for i in range(nq)], [""] * nq)
    pc = ParallelFunctionCaller(table, fidx, CallConfig(),
                                DeviceConfig(call_batch=SEQS_PER_DEV),
                                mesh=mesh)
    pc.call_batch(batch)  # warm/compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        pc.call_batch(batch)
    call_s = (time.perf_counter() - t0) / reps

    # ---- build step: dp-sharded corpus, all-to-all routing -------------
    nres = BUILD_RESIDUES_PER_DEV * ndp
    bcodes = aa[rng.integers(0, 16, nres)].astype(np.uint8)
    Lb = 200
    nb = nres // Lb
    plens = np.full(nb, Lb, np.int32)
    sids = np.arange(nb, dtype=np.int32)
    fidxs = ((np.arange(nb) // 8) % 300).astype(np.int32)

    def run_build():
        sel = build_step.build_step_from_seqs(
            mesh, bcodes, sids, fidxs, plens)
        return build_step.finalize_sharded(sel)

    kept = run_build()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        kept = run_build()
    build_s = (time.perf_counter() - t0) / reps

    print(json.dumps({
        "devices": n, "dp": ndp, "tp": ntp,
        "call_s": round(call_s, 4),
        "call_seqs_per_s": round(nq / call_s, 1),
        "build_s": round(build_s, 4),
        "build_windows_per_s": round(nres / build_s, 1),
        "kept": int(kept["hi"].shape[0]),
    }))


def parent():
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            env=env, capture_output=True, text=True, timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{out.stdout}\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1])
    if rows and rows[0]["devices"] == 1:
        t1c, t1b = rows[0]["call_s"], rows[0]["build_s"]
        print("\nweak-scaling efficiency (t1/tN; per-device work fixed):")
        for r in rows:
            print(f"  n={r['devices']} (dp={r['dp']} tp={r['tp']}): "
                  f"call {t1c / r['call_s'] * 100:5.1f}%   "
                  f"build {t1b / r['build_s'] * 100:5.1f}%")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        parent()
