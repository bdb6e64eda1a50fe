"""Microbenchmark: HBM row-gather cost grid (table size x row width).

Feeds the measured-cost tables in docs/PERF.md that drive the table
layout choices.  Run on the target chip: python benchmarks/gather_grid.py
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
didx_warm = jnp.asarray(rng.integers(0, 1024, (B, L)), dtype=jnp.int32)
base = timed(null, didx_warm)
print(f"null: {base*1e3:.2f} ms")

for mb in (1, 2, 4, 8, 16):
    for width_words in (8, 16, 24):
        nbytes = mb << 20
        rows = nbytes // (4*width_words)
        tab = jnp.asarray(rng.integers(0, 2**32, (rows, width_words), dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, rows, (B, L)), dtype=jnp.int32)
        def f(tab, idx):
            r = tab[idx]
            return (r & 1).sum().astype(jnp.int32)
        dt = timed(jax.jit(f), tab, idx)
        print(f"{mb:3d}MB {4*width_words:3d}B rows: {(dt-base)/nq*1e9:6.2f} ns/row")

# stacked-index: one gather op fetching 2 rows/window from a 3MB 24B-row table
rows = (3<<20)//24
tab = jnp.asarray(rng.integers(0, 2**32, (rows, 6), dtype=np.uint32))
i1 = jnp.asarray(rng.integers(0, rows, (B, L)), dtype=jnp.int32)
i2 = jnp.asarray(rng.integers(0, rows, (B, L)), dtype=jnp.int32)
def two_ops(tab, i1, i2):
    return ((tab[i1] & 1).sum() + (tab[i2] & 1).sum()).astype(jnp.int32)
def one_op(tab, i1, i2):
    idx = jnp.stack([i1, i2], axis=-1)   # (B, L, 2)
    r = tab[idx]                          # (B, L, 2, 6)
    return (r & 1).sum().astype(jnp.int32)
print(f"3MB 24B two ops:   {(timed(jax.jit(two_ops), tab, i1, i2)-base)/nq*1e9:6.2f} ns/win")
print(f"3MB 24B one op x2: {(timed(jax.jit(one_op), tab, i1, i2)-base)/nq*1e9:6.2f} ns/win")
