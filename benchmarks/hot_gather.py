"""Microbenchmark: does index LOCALITY change large-table gather cost?

Tests the hot-tier probe hypothesis (VERDICT round-1 next-step #2a): if
most probe indices are redirected to a single row (or a <=32MB hot
region) of a large table, does the gather get cheaper — i.e. is the
measured ~12 ns/row on multi-hundred-MB tables a caching effect that a
Zipf-skewed workload could exploit?

Run on the target chip: python benchmarks/hot_gather.py
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

B, L = 4096, 384; nq = B * L
rng = np.random.default_rng(3)
null = jax.jit(lambda a: (a[:8, :8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (B, L)), dtype=jnp.int32))
print(f"null: {base*1e3:.2f} ms")

ROWS = 48 * (1 << 20) // 16          # 48M x 16B = 768 MB
tab = jnp.asarray(
    rng.integers(0, 2**32, (ROWS, 4), dtype=np.uint32))
HOT_ROWS = (32 << 20) // 16          # 32MB worth of rows

def f(tab, idx):
    return (tab[idx] & 1).sum().astype(jnp.int32)
jf = jax.jit(f)

def run(name, idx_np):
    idx = jnp.asarray(idx_np, dtype=jnp.int32)
    dt = timed(jf, tab, idx)
    print(f"{name:34s}: {(dt-base)/nq*1e9:6.2f} ns/row")

uni = rng.integers(0, ROWS, (B, L))
run("uniform over 768MB", uni)
run("all index 0", np.zeros((B, L), dtype=np.int64))
for frac in (0.5, 0.8, 0.95):
    m = rng.random((B, L)) < frac
    run(f"{int(frac*100)}% index 0, rest uniform",
        np.where(m, 0, uni))
    run(f"{int(frac*100)}% in 32MB region, rest uniform",
        np.where(m, rng.integers(0, HOT_ROWS, (B, L)), uni))

# two-level: small hot table probed separately + main gather for the rest
hot = jnp.asarray(rng.integers(0, 2**32, (HOT_ROWS, 4), dtype=np.uint32))
def two_level(tab, hot, idx_main, idx_hot):
    return ((tab[idx_main] & 1).sum() + (hot[idx_hot] & 1).sum()).astype(jnp.int32)
m = rng.random((B, L)) < 0.8
im = np.where(m, 0, uni)
ih = rng.integers(0, HOT_ROWS, (B, L))
dt = timed(jax.jit(two_level), tab, hot, jnp.asarray(im, dtype=jnp.int32),
           jnp.asarray(ih, dtype=jnp.int32))
print(f"{'two-level 80%->row0 + hot gather':34s}: {(dt-base)/nq*1e9:6.2f} ns/win")
