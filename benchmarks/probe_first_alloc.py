"""Microbenchmark: is the FIRST-uploaded production table in the fast
gather state?

gather_cliff.py found a two-state gather regime (~3.7 vs ~10 ns/row).
Here the production wide table (20M keys, bits=26, 1 GB main) is the
first device allocation — exactly the real caller's order — then the
full probe and a precomputed-index main gather are measured, plus a
device-made same-shape decoy to separate allocation order from
executable effects.  Run: python benchmarks/probe_first_alloc.py
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
tab = WideKmerTable.build(hi, lo, v0, v1, v2, bits=26)
print(f"main={tab.packed.nbytes/2**20:.0f}MB ov_items={tab.ov_items}", flush=True)

# FIRST device allocations: the table, as the production caller uploads it
packed = jax.block_until_ready(jnp.asarray(tab.packed))
ovp = jax.block_until_ready(jnp.asarray(tab.ov_packed))

m = rng.random(nq) < 0.8
sel = rng.integers(0, n, nq)
jqhi = jnp.asarray(np.where(m, hi[sel], rng.integers(0, 1 << 24, nq))
                   .astype(np.uint32).reshape(B, L))
jqlo = jnp.asarray(np.where(m, lo[sel], rng.integers(0, 1 << 24, nq))
                   .astype(np.uint32).reshape(B, L))

null = jax.jit(lambda a: (a[:8,:8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (B, L)), dtype=jnp.int32))
print(f"null: {base*1e3:.2f} ms", flush=True)

def rep(name, dt):
    print(f"{name:40s}: {(dt-base)*1e3:6.2f} ms  {(dt-base)/nq*1e9:6.2f} ns/win",
          flush=True)

salt, ov_salt, bits, ov_bits = tab.salt, tab.ov_salt, tab.bits, tab.ov_bits
def full(packed, ovp, qhi, qlo):
    f, fm = probe.probe_wide(packed, ovp, qhi, qlo, salt, ov_salt,
                             bits, ov_bits, ov_empty=tab.ov_items == 0)
    return f.sum().astype(jnp.int32) + (fm & 1).sum()
jfull = jax.jit(full)
rep("full probe (table first-uploaded)", timed(jfull, packed, ovp, jqhi, jqlo))

bidx = jnp.asarray(rng.integers(0, tab.packed.shape[0], (B, L)), dtype=jnp.int32)
def gath(t, i):
    return (t[i] & 1).sum().astype(jnp.int32)
jg = jax.jit(gath)
rep("main gather (precomputed idx)", timed(jg, packed, bidx))

# decoy: same-shape device-made table, same gather executable
@jax.jit
def mk(z):
    rows = z.shape[0]
    return (jnp.arange(rows * 8, dtype=jnp.uint32)
            * jnp.uint32(2654435761)).reshape(rows, 8)
decoy = jax.block_until_ready(mk(jnp.zeros((tab.packed.shape[0],), jnp.uint8)))
rep("decoy gather (same shape, later alloc)", timed(jg, decoy, bidx))
rep("main gather again", timed(jg, packed, bidx))
rep("full probe again", timed(jfull, packed, ovp, jqhi, jqlo))
