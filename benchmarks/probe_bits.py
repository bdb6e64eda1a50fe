"""Microbenchmark: wide-probe cost vs main-table bits (20M keys).

gather_cliff.py shows a two-state gather regime (~3.7 vs ~10 ns/row)
tied to allocation placement, not size alone; the production table is
uploaded FIRST here (before query buffers), as the real caller does.
Compares bits=24/25/26 mains with interleaved remeasurement.

Run: python benchmarks/probe_bits.py
"""

import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache
enable_cache()
import jax, jax.numpy as jnp
from signature_kmers_tpu.ops import probe
from signature_kmers_tpu.table.wide_table import WideKmerTable

def timed(f, *args, reps=5):
    int(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); int(f(*args)); best = min(best, time.perf_counter()-t0)
    return best

B, L = 4096, 384; nq = B*L
rng = np.random.default_rng(11)

n = 20_000_000
hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
pk = (hi.astype(np.uint64) << 24) | lo
_, idx = np.unique(pk, return_index=True)
hi, lo = hi[idx], lo[idx]; n = hi.shape[0]
v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
v2 = rng.integers(0, 2**32, n, dtype=np.uint32)

# query mix ~80% members
m = rng.random(nq) < 0.8
sel = rng.integers(0, n, nq)
qhi_np = np.where(m, hi[sel], rng.integers(0, 1 << 24, nq)).astype(np.uint32).reshape(B, L)
qlo_np = np.where(m, lo[sel], rng.integers(0, 1 << 24, nq)).astype(np.uint32).reshape(B, L)

tabs = {}
for bits in (24, 25, 26):
    t0 = time.perf_counter()
    tab = WideKmerTable.build(hi, lo, v0, v1, v2, bits=bits)
    print(f"bits={bits}: build {time.perf_counter()-t0:.1f}s "
          f"main={tab.packed.nbytes/2**20:.0f}MB ov_items={tab.ov_items} "
          f"ov={tab.ov_packed.nbytes/2**20:.1f}MB "
          f"ov_slots={tab.ov_packed.shape[1]//2}", flush=True)
    tabs[bits] = tab

null = jax.jit(lambda a: (a[:8,:8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (B, L)), dtype=jnp.int32))
print(f"null: {base*1e3:.2f} ms", flush=True)

# upload each table FIRST (production order), then query arrays
dev = {}
for bits, tab in tabs.items():
    dev[bits] = (jnp.asarray(tab.packed), jnp.asarray(tab.ov_packed))
jqhi, jqlo = jnp.asarray(qhi_np), jnp.asarray(qlo_np)

def run(bits):
    tab = tabs[bits]
    packed, ovp = dev[bits]
    salt, ov_salt, tb, ovb = tab.salt, tab.ov_salt, tab.bits, tab.ov_bits
    ove = tab.ov_items == 0
    def full(packed, ovp, qhi, qlo):
        f, fm = probe.probe_wide(packed, ovp, qhi, qlo, salt, ov_salt,
                                 tb, ovb, ov_empty=ove)
        return f.sum().astype(jnp.int32) + (fm & 1).sum()
    dt = timed(jax.jit(full), packed, ovp, jqhi, jqlo)
    print(f"bits={bits} full probe: {(dt-base)*1e3:6.2f} ms  "
          f"{(dt-base)/nq*1e9:6.2f} ns/win", flush=True)

for bits in (24, 25, 26):
    run(bits)
for bits in (26, 25, 24):   # reversed: control for drift
    run(bits)
