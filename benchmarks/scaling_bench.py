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

    if os.environ.get("SKT_SCALING_CALL_ONLY"):
        build_s = float("nan")
        kept = {"hi": np.zeros(0)}
    else:
        kept = run_build()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            kept = run_build()
        build_s = (time.perf_counter() - t0) / reps

    # ---- call-step per-phase decomposition ------------------------------
    # Cumulative truncations of the EXACT mesh call program
    # (parallel_caller.ParallelFunctionCaller._parallel_fn body), so the
    # weak-scaling degradation decomposes into per-phase costs.  The only
    # collective in the call step is the tp psum of the probe outputs —
    # its cost is the stage "psum" marginal; everything else degrading
    # with n is core contention on the shared-host virtual mesh.
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from signature_kmers_tpu.ops import automaton as automaton_ops
    from signature_kmers_tpu.ops import kmer_pack

    stable = pc.stable
    cfg = CallConfig()
    rows = SEQS_PER_DEV
    L = -(-SEQ_LEN // 128) * 128
    W = min(L, max(16, -(-(SEQ_LEN - cfg.k + 1) // 16) * 16))
    n_tab = len(stable.arrays())
    STAGES = ["expand", "pack", "probe", "psum", "automaton",
              "pack_records"]

    def make_fn(stage: int):
        def shard_fn(*args):
            tabs = args[:n_tab]
            rows_l, start_l, lens_l = args[n_tab:]
            lengths = lens_l[0]
            codes = kmer_pack.expand_rows16(rows_l[0], start_l[0],
                                            lengths, L)
            if stage == 0:
                s = (codes & 1).sum(dtype=jnp.int32)
                return jax.lax.psum(s, "tp")[None]
            whi, wlo, call_valid = kmer_pack.pack_call_windows(
                codes, lengths)
            if W < L:
                whi, wlo = whi[:, :W], wlo[:, :W]
                call_valid = call_valid[:, :W]
            if stage == 1:
                s = ((whi & 1).sum() + (wlo & 1).sum()).astype(jnp.int32)
                return jax.lax.psum(s, "tp")[None]
            found, fm = stable.probe(tabs, whi, wlo)
            if stage == 2:
                s = (found.sum() + (fm & 1).sum()).astype(jnp.int32)
                return jax.lax.psum(s, "tp")[None]
            found_i = jax.lax.psum(found.astype(jnp.uint32), "tp")
            fm = jax.lax.psum(jnp.where(found, fm, 0), "tp")
            found = (found_i > 0) & call_valid
            func = (fm >> 16).astype(jnp.int32)
            mean = (fm & jnp.uint32(0xFFFF)).astype(jnp.int32)
            if stage == 3:
                return (found.sum() + (func & 1).sum()
                        + (mean & 1).sum()).astype(jnp.int32)[None]
            out = automaton_ops.device_automaton(
                found, func, mean, lengths, cfg.min_hits, cfg.max_gap,
                cfg.k, mad_floor=cfg.mad_floor,
                len_window=cfg.len_mad_window)
            if stage == 4:
                return sum(jnp.count_nonzero(o).astype(jnp.int32)
                           for o in jax.tree_util.tree_leaves(out))[None]
            packed_out = automaton_ops.pack_records(out, lengths)
            return (packed_out & 1).sum().astype(jnp.int32)[None]

        return jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(*stable.in_specs(P), P("dp", None, None),
                      P("dp", None), P("dp", None)),
            out_specs=P("dp")))

    flat_q = batch.codes
    offs_q = batch.offsets
    flats, startss, lenss = [], [], []
    R = 0
    packs = []
    for d in range(ndp):
        ds, de = d * rows, (d + 1) * rows
        sub_codes = flat_q[offs_q[ds]:offs_q[de]]
        sub_off = offs_q[ds:de + 1] - offs_q[ds]
        p, s_arr, l_arr = kmer_pack.pack_u6_rows_host(sub_codes, sub_off,
                                                      rows, L)
        packs.append((p, s_arr, l_arr))
        R = max(R, p.shape[0])
    for p, s_arr, l_arr in packs:
        pad = np.zeros((R - p.shape[0], 3), dtype=np.uint32)
        flats.append(np.concatenate([p, pad]) if pad.shape[0] else p)
        startss.append(s_arr)
        lenss.append(l_arr)
    put = lambda spec, a: jax.device_put(  # noqa: E731
        a, NamedSharding(mesh, spec))
    tab_in = [put(spec, a) for spec, a in zip(stable.in_specs(P),
                                              stable.arrays())]
    data_in = (put(P("dp", None, None), np.stack(flats)),
               put(P("dp", None), np.stack(startss)),
               put(P("dp", None), np.stack(lenss)))
    cum = []
    for st in range(len(STAGES)):
        fn = make_fn(st)
        np.asarray(fn(*tab_in, *data_in))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(*tab_in, *data_in))
        cum.append((time.perf_counter() - t0) / reps)
    phases = {STAGES[0]: round(cum[0], 4)}
    for i in range(1, len(STAGES)):
        phases[STAGES[i]] = round(max(cum[i] - cum[i - 1], 0.0), 4)
    phases["full_s"] = round(cum[-1], 4)

    print(json.dumps({
        "devices": n, "dp": ndp, "tp": ntp,
        "call_s": round(call_s, 4),
        "call_seqs_per_s": round(nq / call_s, 1),
        "build_s": round(build_s, 4),
        "build_windows_per_s": round(nres / build_s, 1),
        "kept": int(kept["hi"].shape[0]),
        "call_phases": phases,
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
        names = list(rows[0]["call_phases"].keys())
        print("\ncall-step phase decomposition (s; marginal per stage):")
        print("  n    " + "".join(f"{p:>13s}" for p in names))
        for r in rows:
            ph = r["call_phases"]
            print(f"  {r['devices']:<4d}"
                  + "".join(f"{ph[p]:13.4f}" for p in names))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        parent()
