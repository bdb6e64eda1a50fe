"""Microbenchmark: is the two-state gather regime a PER-BUFFER property?

gather_cliff.py measured identical (N,4)-uint32 gathers at either ~3.7
or ~10 ns/row, with one early-allocated 768 MB buffer staying fast for a
whole run while fresh same-shape buffers measured slow.  If the state is
(a) fixed per buffer at allocation time and (b) variable across buffers
within one process, then a measure-and-retry allocation strategy
("allocate, microbench, keep the fastest copy") recovers the fast state
deterministically.  This experiment:

  1. allocates K on-device copies of the same 1 GB table,
  2. measures each buffer's gather cost with a cheap probe (400K rows),
  3. re-measures every buffer in 3 passes (stability over minutes),
  4. takes the slowest buffer and runs 60 consecutive gathers on it to
     test whether sustained use transitions it to the fast state.

Run on the target chip: python benchmarks/gather_copies.py
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

nq = 1024 * 384
rng = np.random.default_rng(7)
null = jax.jit(lambda a: (a[:8] & 1).sum())
idx_small = jnp.asarray(rng.integers(0, 1024, (nq,)), dtype=jnp.int32)
base = timed(null, idx_small)
print(f"null: {base*1e3:.2f} ms", flush=True)

ROWS = (1 << 30) // 16  # 1 GB of 16B rows

@jax.jit
def make_table(z):
    rows = z.shape[0]
    return (jnp.arange(rows * 4, dtype=jnp.uint32)
            * jnp.uint32(2654435761)).reshape(rows, 4)

@jax.jit
def copy_tab(t):
    return t ^ jnp.uint32(0)  # forces a fresh output buffer

def f(tab, idx):
    return (tab[idx] & 1).sum().astype(jnp.int32)
jf = jax.jit(f)

idx = jnp.asarray(rng.integers(0, ROWS, (nq,)), dtype=jnp.int32)

def measure(tab):
    return (timed(jf, tab, idx) - base) / nq * 1e9

K = 6
bufs = [jax.block_until_ready(make_table(jnp.zeros((ROWS,), jnp.uint8)))]
for i in range(1, K):
    bufs.append(jax.block_until_ready(copy_tab(bufs[0])))

for p in range(3):
    row = " ".join(f"{measure(b):6.2f}" for b in bufs)
    print(f"pass {p}: ns/row per buffer [0..{K-1}]: {row}", flush=True)

# warming test on the slowest buffer
costs = [measure(b) for b in bufs]
slow = bufs[int(np.argmax(costs))]
print(f"warming buffer {int(np.argmax(costs))} ({max(costs):.2f} ns/row): "
      "60 consecutive gathers...", flush=True)
t0 = time.perf_counter()
for _ in range(60):
    jf(slow, idx)
int(jf(slow, idx))
print(f"  done in {time.perf_counter()-t0:.1f}s; now {measure(slow):.2f} ns/row",
      flush=True)

# does freeing + reallocating change state?
del bufs, slow
re = jax.block_until_ready(make_table(jnp.zeros((ROWS,), jnp.uint8)))
print(f"fresh table after free-all: {measure(re):.2f} ns/row", flush=True)
