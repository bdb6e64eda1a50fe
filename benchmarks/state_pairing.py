"""Pair full-chunk call timings with gather-state probes over time.

bench.py projects a fast-state headline from the gather microbenchmark
(~3.7 ns/row) whenever its one post-timing probe lands slow.  This run
interleaves the two measurements for several minutes to test whether a
fast GATHER state ever coincides with a fast CHUNK — i.e. whether the
projection is real or the microbenchmark's state does not transfer to
the full fused program's gathers.

Usage: python benchmarks/state_pairing.py [minutes]
Prints one line per iteration: chunk ms | gather ns/row | state.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from signature_kmers_tpu.core.config import Config, DeviceConfig
    from signature_kmers_tpu.models.function_caller import FunctionCaller
    from signature_kmers_tpu.ops import kmer_pack as kp
    from signature_kmers_tpu.utils.jaxcache import enable_cache

    enable_cache()
    table, _cpu, _bdz, function_index, codes = build_workload()
    n_queries, seq_len = codes.shape
    cfg = Config()
    caller = FunctionCaller(table, function_index, cfg.call,
                            DeviceConfig(call_batch=8192))

    flat = codes.reshape(-1)
    offsets = (np.arange(n_queries + 1) * seq_len).astype(np.int32)
    chunk = 4096
    L_pad = ((seq_len + 127) // 128) * 128
    pr, sr, ln = kp.pack_u6_rows_host(
        flat[:offsets[chunk]], offsets[:chunk + 1], chunk, L_pad)
    W = min(L_pad, max(16, -(-(seq_len - cfg.call.k + 1) // 16) * 16))
    f, arrays = caller._full_device_fn(L_pad, W)
    dev_in = [jax.device_put(a) for a in (pr, sr, ln)]
    _ = int(f(*arrays, *dev_in)[0, 0])  # compile + warm

    tab = max((a for a in arrays if hasattr(a, "nbytes")),
              key=lambda a: a.nbytes)
    n_idx = chunk * W
    rng = np.random.default_rng(5)
    jidx = jax.device_put(rng.integers(0, tab.shape[0], n_idx)
                          .astype(np.int32))
    jnull = jax.jit(lambda i: (i[:8] & 1).sum())
    jg = jax.jit(lambda t, i: (t[i] & 1).sum().astype(jnp.int32))
    _ = int(jnull(jidx))
    _ = int(jg(tab, jidx))

    def best_of(fn, *a, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = int(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    print("t_s\tchunk_ms\tgather_ns\tstate", flush=True)
    t_end = time.time() + minutes * 60
    t_start = time.time()
    pairs = []
    while time.time() < t_end:
        # chunk timing (3 reps, scalar-pull sync)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(*arrays, *dev_in)
        _ = int(out[0, 0])
        chunk_ms = (time.perf_counter() - t0) / 3 * 1e3
        # gather probe immediately after
        g_ns = max(0.0, (best_of(jg, tab, jidx) - best_of(jnull, jidx))
                   / n_idx * 1e9)
        state = "fast" if g_ns < 5.5 else "SLOW"
        pairs.append((chunk_ms, g_ns))
        print(f"{time.time()-t_start:6.1f}\t{chunk_ms:7.1f}\t"
              f"{g_ns:6.2f}\t{state}", flush=True)
        time.sleep(2.0)

    cm = np.array([p[0] for p in pairs])
    gn = np.array([p[1] for p in pairs])
    fast = gn < 5.5
    print(f"\nsummary: {fast.sum()}/{len(pairs)} fast-state probes; "
          f"chunk ms median fast={np.median(cm[fast]) if fast.any() else float('nan'):.1f} "
          f"slow={np.median(cm[~fast]) if (~fast).any() else float('nan'):.1f}",
          flush=True)


if __name__ == "__main__":
    main()
