"""Microbenchmark: does HBM allocation ORDER change gather cost?

gather_cliff.py (fresh table per size, ascending) measured ~10 ns/row
from 128 MB up, while hot_gather.py (one 768 MB table allocated first)
measured ~3.7 ns/row on the same shape — suggesting the first/lowest
large allocation gathers fast.  Tables here are generated ON DEVICE (no
tunnel transfers) to test allocation order cheaply.

Run: python benchmarks/gather_order.py
"""

import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache
enable_cache()
import jax, jax.numpy as jnp

def timed(f, *args, reps=5):
    int(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); int(f(*args)); best = min(best, time.perf_counter()-t0)
    return best

B, L = 4096, 384; nq = B*L
rng = np.random.default_rng(3)
null = jax.jit(lambda a: (a[:8,:8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (B, L)), dtype=jnp.int32))
print(f"null: {base*1e3:.2f} ms")

@jax.jit
def make_table(rows_arr):
    rows = rows_arr.shape[0]
    v = (jnp.arange(rows * 4, dtype=jnp.uint32) * jnp.uint32(2654435761))
    return v.reshape(rows, 4)

def make(rows):
    return jax.block_until_ready(make_table(jnp.zeros((rows,), jnp.uint8)))

def f(tab, idx):
    return (tab[idx] & 1).sum().astype(jnp.int32)
jf = jax.jit(f)

def g(name, tab):
    rows = tab.shape[0]
    idx = jnp.asarray(rng.integers(0, rows, (B, L)), dtype=jnp.int32)
    dt = timed(jf, tab, idx)
    print(f"{name:42s}: {(dt-base)/nq*1e9:6.2f} ns/row")

R768 = 48 * (1 << 20) // 16
R128 = 8 * (1 << 20) // 16

t1 = make(R768)
g("t1 768MB (first alloc)", t1)
t2 = make(R768)
g("t2 768MB (second alloc)", t2)
g("t1 again", t1)
t3 = make(R128)
g("t3 128MB (third alloc)", t3)
del t2
t4 = make(R768)
g("t4 768MB (after freeing t2)", t4)
g("t1 again (2)", t1)
del t1, t3, t4
t5 = make(R768)
g("t5 768MB (after freeing all)", t5)
