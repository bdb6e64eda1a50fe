"""Microbenchmark: locate the large-table gather cost cliff (16B rows).

probe_decomp.py saw ~3.7 ns/row at 768 MB but ~10.3 ns/row at 1024 MB —
this maps table-size -> ns/row to pick the wide table's bits so the main
gather stays under the cliff.  Run: python benchmarks/gather_cliff.py
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

def f(tab, idx):
    return (tab[idx] & 1).sum().astype(jnp.int32)
jf = jax.jit(f)

for mb in (64, 128, 256, 384, 512, 640, 768, 832, 896, 960, 1024, 1152, 1536, 2048):
    rows = (mb << 20) // 16
    tab = jnp.asarray(rng.integers(0, 2**32, (rows, 4), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, rows, (B, L)), dtype=jnp.int32)
    dt = timed(jf, tab, idx)
    print(f"{mb:5d} MB: {(dt-base)/nq*1e9:6.2f} ns/row")
    del tab, idx
