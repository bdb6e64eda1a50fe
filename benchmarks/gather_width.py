"""Microbenchmark: does row-gather cost scale with the INDEX COUNT?

The caller probes a (B, L) window array where L is the 128-bucketed
sequence length; for 300-residue proteins at L=384 that is ~22% padding
windows.  If gather cost is proportional to the number of indices (not
the padded lane width), slicing the window array to a tighter static
width before the probe is a direct win.  Run: python benchmarks/gather_width.py
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

rng = np.random.default_rng(3)
rows = 64_000_000  # (N, 4) uint32 = 16B rows -> 1 GB, large-table regime
tab = jnp.asarray(rng.integers(0, 2**32, (rows, 4), dtype=np.uint32))

B = 4096
null = jax.jit(lambda a: (a[:8, :8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (B, 128)), dtype=jnp.int32))
print(f"null: {base*1e3:.2f} ms", flush=True)

for W in (384, 320, 300, 192):
    idx = jnp.asarray(rng.integers(0, rows, (B, W)), dtype=jnp.int32)
    g = jax.jit(lambda t, i: (t[i] & 1).sum().astype(jnp.int32))
    dt = timed(g, tab, idx) - base
    print(f"W={W:4d}: {dt*1e3:6.2f} ms  {dt/(B*W)*1e9:6.2f} ns/row", flush=True)
