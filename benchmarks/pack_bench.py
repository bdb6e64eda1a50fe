"""Microbenchmark: expand+pack stage — XLA vs Pallas on the chip.

The fused caller spends ~6 ms/chunk on 6-bit row expand + window pack
(vs ~26 ms probe).  Compares the XLA path (expand_rows16 +
pack_call_windows) against the Pallas kernel (pack_call_windows_pallas)
on real row-transfer inputs.  Run: python benchmarks/pack_bench.py
"""

import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache
enable_cache()
import jax, jax.numpy as jnp
from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.ops import kmer_pack as kp
from signature_kmers_tpu.ops.pallas_pack import pack_call_windows_pallas

def timed(f, *args, reps=10):
    # sync via a 4-byte scalar pull: block_until_ready does not actually
    # wait through this tunnel backend (see probe_bench.py)
    int(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best

B, L = 4096, 384
rng = np.random.default_rng(7)
aa = alphabet.encode_seq(alphabet.AA20)
flat = aa[rng.integers(0, 20, B * L)].astype(np.uint8)
offsets = (np.arange(B + 1) * L).astype(np.int64)
pr, sr, ln = kp.pack_u6_rows_host(flat, offsets, B, L)
jpr, jsr, jln = jnp.asarray(pr), jnp.asarray(sr), jnp.asarray(ln)

null = jax.jit(lambda a: (a[:8] & 1).sum())
base = timed(null, jsr)
print(f"null: {base*1e3:.2f} ms")

@jax.jit
def expand_only(pr, sr, ln):
    codes = kp.expand_rows16(pr, sr, ln, L)
    return (codes & 1).sum().astype(jnp.int32)

@jax.jit
def xla_full(pr, sr, ln):
    codes = kp.expand_rows16(pr, sr, ln, L)
    hi, lo, v = kp.pack_call_windows(codes, ln)
    return ((hi & 1).sum() + (lo & 1).sum() + v.sum()).astype(jnp.int32)

@jax.jit
def pallas_full(pr, sr, ln):
    codes = kp.expand_rows16(pr, sr, ln, L)
    hi, lo, v = pack_call_windows_pallas(codes, ln)
    return ((hi & 1).sum() + (lo & 1).sum() + v.sum()).astype(jnp.int32)

for name, f in (("expand_rows16 only", expand_only),
                ("expand + XLA pack_call_windows", xla_full),
                ("expand + PALLAS pack kernel", pallas_full)):
    dt = timed(f, jpr, jsr, jln)
    print(f"{name:34s}: {(dt-base)*1e3:6.2f} ms/chunk")
