"""Closing experiments for the two-state gather matrix (docs/PERF.md).

Tests the remaining in-program hypotheses for the slow gather state:
  1. op splitting — 16 chained gathers of NQ/16 each on the SAME 1 GB
     buffer (does per-op index count drive the regime, or buffer size?)
  2. separate half-buffers — two 512 MB buffers probed with NQ/2 each
     (does per-buffer footprint below 1 GB change anything? can two ops
     on different buffers overlap?)
  3. temporal tracking — the same 1 GB gather re-measured every ~15 s
     for ~4 minutes (does the state flip within a run, independent of
     anything the program does?)

Run on the target chip: python benchmarks/gather_matrix.py
"""

import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache
enable_cache()
import jax, jax.numpy as jnp

def timed(f, *args, reps=4):
    int(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); int(f(*args)); best = min(best, time.perf_counter()-t0)
    return best

NQ = 4096 * 320
rng = np.random.default_rng(7)
null = jax.jit(lambda a: (a[:8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (NQ,)), dtype=jnp.int32))
print(f"null: {base*1e3:.2f} ms  (NQ={NQ})", flush=True)

@jax.jit
def make_table(z):
    rows = z.shape[0]
    return (jnp.arange(rows * 4, dtype=jnp.uint32)
            * jnp.uint32(2654435761)).reshape(rows, 4)

R1G = (1 << 30) // 16
t1g = jax.block_until_ready(make_table(jnp.zeros((R1G,), jnp.uint8)))
idx = jnp.asarray(rng.integers(0, R1G, (NQ,)), dtype=jnp.int32)

def f(tab, idx):
    return (tab[idx] & 1).sum().astype(jnp.int32)
jf = jax.jit(f)
dt = timed(jf, t1g, idx)
print(f"1 GB single gather       : {(dt-base)/NQ*1e9:6.2f} ns/row", flush=True)

def split16(tab, idx2):
    s = jnp.int32(0)
    for i in range(16):
        s = s + (tab[idx2[i]] & 1).sum().astype(jnp.int32)
    return s
idx16 = idx.reshape(16, NQ // 16)
dt = timed(jax.jit(split16), t1g, idx16)
print(f"1 GB 16 chained sub-ops  : {(dt-base)/NQ*1e9:6.2f} ns/row", flush=True)

R512 = R1G // 2
ha = jax.block_until_ready(make_table(jnp.zeros((R512,), jnp.uint8)))
hb = jax.block_until_ready(make_table(jnp.zeros((R512,), jnp.uint8)))
ia = jnp.asarray(rng.integers(0, R512, (NQ // 2,)), dtype=jnp.int32)
ib = jnp.asarray(rng.integers(0, R512, (NQ // 2,)), dtype=jnp.int32)
def halves(a, b, ia, ib):
    return ((a[ia] & 1).sum() + (b[ib] & 1).sum()).astype(jnp.int32)
dt = timed(jax.jit(halves), ha, hb, ia, ib)
print(f"2 x 512 MB, NQ/2 each    : {(dt-base)/NQ*1e9:6.2f} ns/row-equiv",
      flush=True)
del ha, hb

print("-- temporal tracking (1 GB gather, ~4 min) --", flush=True)
t_start = time.perf_counter()
while time.perf_counter() - t_start < 240:
    dt = timed(jf, t1g, idx, reps=3)
    print(f"  t={time.perf_counter()-t_start:6.1f}s: "
          f"{(dt-base)/NQ*1e9:6.2f} ns/row", flush=True)
    time.sleep(12)
