"""Microbenchmark: probe-kernel layouts on the real device.

Compares per-window probe cost of the table layouts at production scale
(default 20M keys) plus the full fused call step, to guide the default
layout choice (docs/PERF.md).  Run on TPU:

    python benchmarks/probe_bench.py [n_kmers_millions]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def timed(f, *args, reps=5):
    """Time f including a scalar D2H fetch: block_until_ready does not
    actually wait for completion through the tunnel backend, so the sync
    is a 4-byte result pull (constant ~one link round trip, identical for
    every candidate)."""
    int(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from signature_kmers_tpu.table.bucket_table import BucketKmerTable
    from signature_kmers_tpu.table.wide_table import (WideKmerTable,
                                                      WideTableConfig)
    from signature_kmers_tpu.ops import probe
    from signature_kmers_tpu.utils.jaxcache import enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 20_000_000
    rng = np.random.default_rng(11)
    hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    packed = (hi.astype(np.uint64) << 24) | lo
    _, idx = np.unique(packed, return_index=True)
    hi, lo = hi[idx], lo[idx]
    n = hi.shape[0]
    v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
    v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    v2 = rng.integers(0, 2**32, n, dtype=np.uint32)

    # realistic query mix: ~80% members
    B, L = 4096, 384
    nq = B * L
    qh = rng.integers(0, 1 << 24, nq, dtype=np.uint32)
    ql = rng.integers(0, 1 << 24, nq, dtype=np.uint32)
    m = rng.random(nq) < 0.8
    pick = rng.integers(0, n, int(m.sum()))
    qh[m] = hi[pick]
    ql[m] = lo[pick]
    qh = qh.reshape(B, L)
    ql = ql.reshape(B, L)
    dqh, dql = jnp.asarray(qh), jnp.asarray(ql)

    layouts = []
    t0 = time.perf_counter()
    tb = BucketKmerTable.build(hi, lo, v0, v1, v2)
    print(f"cuckoo build {time.perf_counter()-t0:.1f}s "
          f"({tb.packed.nbytes/2**20:.0f} MB)", file=sys.stderr)
    layouts.append(("cuckoo-2x24B", tb))

    # wide-2x16B auto-selects the sub-cliff sizing when the key count
    # fits a <=64 MB main store (VERDICT r5); -nosubcliff pins the old
    # load-0.22 sizing for the side-by-side probe point
    for slots, load, sub, name in (
            (4, 1 / 3, 64 << 20, "wide-4x32B"),
            (2, 0.22, 64 << 20, "wide-2x16B"),
            (2, 0.22, 0, "wide-2x16B-nosubcliff"),
            (4, 0.45, 64 << 20, "wide-4x32B-dense")):
        t0 = time.perf_counter()
        tw = WideKmerTable.build(hi, lo, v0, v1, v2,
                                 WideTableConfig(slots=slots, main_load=load,
                                                 sub_cliff_bytes=sub))
        ovb = tw.ov_packed.nbytes / 2**20
        print(f"{name} build {time.perf_counter()-t0:.1f}s "
              f"(main {tw.packed.nbytes/2**20:.0f} MB, bits {tw.bits}, "
              f"overflow {tw.ov_items} keys / {ovb:.1f} MB, "
              f"{tw.ov_packed.shape[1] // 2} slots)",
              file=sys.stderr)
        layouts.append((name, tw))

    # constant overhead reference: same sync pattern, trivial kernel
    null = jax.jit(lambda a, b: (a[:8, :8].astype(jnp.uint32)
                                 + b[:8, :8]).sum())
    base = timed(null, dqh, dql)
    print(f"{'null kernel':>18}: {base*1e3:7.2f} ms (sync+link constant)")

    for name, table in layouts:
        pfn, arrays = probe.table_probe(table, with_aux=False)

        def fsum(*a):
            found, fm = pfn(*a)
            return found.sum().astype(jnp.int32) + (fm & 1).sum().astype(jnp.int32)

        f = jax.jit(fsum)
        dt = timed(f, *arrays, dqh, dql)
        print(f"{name:>18}: {dt*1e3:7.2f} ms/chunk  "
              f"{(dt-base)/nq*1e9:6.2f} ns/window (net)")


if __name__ == "__main__":
    main()
