"""Microbenchmark: decompose the wide-table probe cost on the chip.

hot_gather.py measures the raw 16B-row gather on a multi-hundred-MB table
at ~3.7 ns/row, while the full wide probe nets ~12.6 ns/window — this
script splits the difference into hash / gather / compare / overflow
terms to aim the next optimization.  Run: python benchmarks/probe_decomp.py
"""

import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache
enable_cache()
import jax, jax.numpy as jnp
from signature_kmers_tpu.ops import hashing, probe
from signature_kmers_tpu.table.wide_table import WideKmerTable

def timed(f, *args, reps=5):
    int(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); int(f(*args)); best = min(best, time.perf_counter()-t0)
    return best

B, L = 4096, 384; nq = B*L
rng = np.random.default_rng(11)
null = jax.jit(lambda a: (a[:8,:8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (B, L)), dtype=jnp.int32))
print(f"null: {base*1e3:.2f} ms")

n = 20_000_000
hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
pk = (hi.astype(np.uint64) << 24) | lo
_, idx = np.unique(pk, return_index=True)
hi, lo = hi[idx], lo[idx]; n = hi.shape[0]
v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
v2 = rng.integers(0, 2**32, n, dtype=np.uint32)
t0 = time.perf_counter()
tab = WideKmerTable.build(hi, lo, v0, v1, v2)
print(f"build: {time.perf_counter()-t0:.1f}s bits={tab.bits} ov_items={tab.ov_items} "
      f"slots={tab.packed.shape[1]//2} main={tab.packed.nbytes/2**20:.0f}MB")

# query mix ~80% members
m = rng.random(nq) < 0.8
sel = rng.integers(0, n, nq)
qhi = np.where(m, hi[sel], rng.integers(0, 1 << 24, nq)).astype(np.uint32).reshape(B, L)
qlo = np.where(m, lo[sel], rng.integers(0, 1 << 24, nq)).astype(np.uint32).reshape(B, L)
jqhi, jqlo = jnp.asarray(qhi), jnp.asarray(qlo)
packed = jnp.asarray(tab.packed); ovp = jnp.asarray(tab.ov_packed)
salt, ov_salt, bits, ov_bits = tab.salt, tab.ov_salt, tab.bits, tab.ov_bits

def report(name, dt):
    print(f"{name:40s}: {(dt-base)*1e3:6.2f} ms  {(dt-base)/nq*1e9:6.2f} ns/win")

# (a) hash only: perm48 + bucket/tag
def hash_only(qhi, qlo):
    L_, R_ = hashing.perm48(qhi, qlo, salt, jnp)
    b, t = hashing.wide_bucket_tag(L_, R_, bits, jnp)
    return (b & 1).sum() + (t & 1).sum()
report("perm48 + bucket/tag", timed(jax.jit(hash_only), jqhi, jqlo))

# (b) main gather only (precomputed indices)
bidx = jnp.asarray(rng.integers(0, tab.packed.shape[0], (B, L)), dtype=jnp.int32)
def gath(packed, bidx):
    return (packed[bidx] & 1).sum().astype(jnp.int32)
report("main row gather (precomputed idx)", timed(jax.jit(gath), packed, bidx))

# (c) main match: hash + gather + tag compare + masked sum
def main_match(packed, qhi, qlo):
    b, mu, f, fm = probe._tagged_match(packed, qhi, qlo, salt, bits)
    return f.sum().astype(jnp.int32) + (fm & 1).sum()
report("main match (hash+gather+compare)", timed(jax.jit(main_match), packed, jqhi, jqlo))

# (d) overflow match alone
def ov_match(ovp, qhi, qlo):
    b, mu, f, fm = probe._tagged_match(ovp, qhi, qlo, ov_salt, ov_bits)
    return f.sum().astype(jnp.int32) + (fm & 1).sum()
report("overflow match alone", timed(jax.jit(ov_match), ovp, jqhi, jqlo))

# (e) full probe
def full(packed, ovp, qhi, qlo):
    f, fm = probe.probe_wide(packed, ovp, qhi, qlo, salt, ov_salt,
                             bits, ov_bits, ov_empty=tab.ov_items == 0)
    return f.sum().astype(jnp.int32) + (fm & 1).sum()
report("full probe", timed(jax.jit(full), packed, ovp, jqhi, jqlo))
