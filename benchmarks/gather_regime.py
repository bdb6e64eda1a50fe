"""Microbenchmark: facts needed to design a binned sub-array probe.

If sub-64MB tables gather at ~2-3 ns/row even while a 1 GB table sits in
its slow (~8-10 ns) state, a two-level probe — bin each window's bucket
index by its high bits, compact bins with a scatter, sub-gather per
<=64MB shard, unpermute — could beat the single big gather in the slow
state.  Viability depends on: (1) today's size curve, (2) per-op
overhead when each sub-gather only carries ~1/16 of the indices,
(3) scatter cost for the compaction, (4) one-hot-cumsum bin-position
cost, (5) whether a reshaped 3D view of the same 1 GB buffer changes
anything (it shouldn't; control).

Run on the target chip: python benchmarks/gather_regime.py
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

def make(mb):
    rows = (mb << 20) // 16
    return jax.block_until_ready(make_table(jnp.zeros((rows,), jnp.uint8)))

def f(tab, idx):
    return (tab[idx] & 1).sum().astype(jnp.int32)
jf = jax.jit(f)

print("-- size curve (NQ indices each) --", flush=True)
tabs = {}
for mb in (16, 32, 64, 96, 128, 256, 512, 1024):
    tabs[mb] = make(mb)
    idx = jnp.asarray(rng.integers(0, tabs[mb].shape[0], (NQ,)), dtype=jnp.int32)
    dt = timed(jf, tabs[mb], idx)
    print(f"  {mb:5d} MB: {(dt-base)/NQ*1e9:6.2f} ns/row", flush=True)
    if mb not in (64, 1024):
        del tabs[mb]

print("-- per-op overhead: 64MB table, shrinking index counts --", flush=True)
t64 = tabs[64]
for n in (NQ, NQ // 4, NQ // 16, NQ // 64):
    idx = jnp.asarray(rng.integers(0, t64.shape[0], (n,)), dtype=jnp.int32)
    dt = timed(jf, t64, idx)
    print(f"  n={n:8d}: {(dt-base)*1e3:7.2f} ms  {(dt-base)/n*1e9:6.2f} ns/row",
          flush=True)

print("-- 16 chained sub-gathers (64MB each, NQ/16 idx each) --", flush=True)
def chain16(tab, idxs):
    s = jnp.int32(0)
    for i in range(16):
        s = s + (tab[idxs[i]] & 1).sum().astype(jnp.int32)
    return s
jc = jax.jit(chain16)
idxs = jnp.asarray(rng.integers(0, t64.shape[0], (16, NQ // 16)), dtype=jnp.int32)
dt = timed(jc, t64, idxs)
print(f"  total {(dt-base)*1e3:7.2f} ms  {(dt-base)/NQ*1e9:6.2f} ns/row-equivalent",
      flush=True)

print("-- scatter NQ int32 into 2M-slot buffer --", flush=True)
def scat(pos, val):
    out = jnp.zeros((2 * 1024 * 1024,), jnp.int32)
    return out.at[pos].set(val, mode="drop").sum() & 1
jp_pos = jnp.asarray(rng.permutation(2 * 1024 * 1024)[:NQ].astype(np.int32))
jp_val = jnp.asarray(rng.integers(0, 1 << 30, (NQ,)), dtype=jnp.int32)
dt = timed(jax.jit(scat), jp_pos, jp_val)
print(f"  {(dt-base)*1e3:7.2f} ms  {(dt-base)/NQ*1e9:6.2f} ns/elem", flush=True)

print("-- bin-position (16 bins) via masked cumsum --", flush=True)
def binpos(bins):
    oh = (bins[None, :] == jnp.arange(16, dtype=jnp.int32)[:, None])
    pos = jnp.cumsum(oh.astype(jnp.int32), axis=1)
    return (pos[-1, -1] + pos[0, 0]).astype(jnp.int32)
jb = jnp.asarray(rng.integers(0, 16, (NQ,)), dtype=jnp.int32)
dt = timed(jax.jit(binpos), jb)
print(f"  {(dt-base)*1e3:7.2f} ms", flush=True)

print("-- 3D reshaped view of the 1 GB buffer (control) --", flush=True)
t1g = tabs[1024]
rows = t1g.shape[0]
idx = jnp.asarray(rng.integers(0, rows, (NQ,)), dtype=jnp.int32)
def f3(tab, idx):
    t3 = tab.reshape(16, rows // 16, 4)
    return (t3[idx >> 27, idx & ((rows // 16) - 1)] & 1).sum().astype(jnp.int32)
dt = timed(jf, t1g, idx)
print(f"  2D gather 1GB: {(dt-base)/NQ*1e9:6.2f} ns/row", flush=True)
dt = timed(jax.jit(f3), t1g, idx)
print(f"  3D gather 1GB: {(dt-base)/NQ*1e9:6.2f} ns/row", flush=True)
