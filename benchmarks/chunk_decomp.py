"""Microbenchmark: decompose the FULL fused caller chunk, stage by stage.

pack_bench.py showed expand+pack is ~0.2 ms and probe_decomp.py puts the
probe at ~25 ms, yet the production chunk costs ~37 ms — this measures
cumulative truncations of the exact `_full_device_fn` program (same
inputs, same table) to locate the remainder (automaton scan?
pack_records? probe-in-context?).  Run: python benchmarks/chunk_decomp.py
"""

import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache
enable_cache()
import jax, jax.numpy as jnp
from signature_kmers_tpu.core import alphabet
from signature_kmers_tpu.core.config import CallConfig
from signature_kmers_tpu.ops import kmer_pack as kp
from signature_kmers_tpu.ops import probe as probe_ops
from signature_kmers_tpu.ops import automaton as automaton_ops
from signature_kmers_tpu.table.wide_table import WideKmerTable

def timed(f, *args, reps=5):
    # scalar-pull sync: block_until_ready does not wait through this tunnel
    int(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); int(f(*args)); best = min(best, time.perf_counter()-t0)
    return best

B, L = 4096, 384
rng = np.random.default_rng(7)

# production-size table
n = 20_000_000
hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
pk = (hi.astype(np.uint64) << 24) | lo
_, idx = np.unique(pk, return_index=True)
hi, lo = hi[idx], lo[idx]; n = hi.shape[0]
v0 = rng.integers(0, 2**32, n, dtype=np.uint32)
v1 = rng.integers(0, 2**32, n, dtype=np.uint32)
v2 = rng.integers(0, 2**32, n, dtype=np.uint32)
tab = WideKmerTable.build(hi, lo, v0, v1, v2)
print(f"table: bits={tab.bits} main={tab.packed.nbytes/2**20:.0f}MB "
      f"ov_items={tab.ov_items}", flush=True)

pfn, arrays = probe_ops.table_probe(tab, with_aux=False)
arrays = tuple(jax.device_put(a) for a in arrays)
n_tab = len(arrays)
cfg = CallConfig()

# realistic corpus rows (random AA; hit rate vs this random table is low,
# so ALSO measure with a forced-hit variant below)
aa = alphabet.encode_seq(alphabet.AA20)
flat = aa[rng.integers(0, 20, B * L)].astype(np.uint8)
offsets = (np.arange(B + 1) * L).astype(np.int64)
pr, sr, ln = kp.pack_u6_rows_host(flat, offsets, B, L)
jpr, jsr, jln = jnp.asarray(pr), jnp.asarray(sr), jnp.asarray(ln)

null = jax.jit(lambda a: (a[:8] & 1).sum())
base = timed(null, jsr)
print(f"null: {base*1e3:.2f} ms")

def report(name, dt):
    print(f"{name:44s}: {(dt-base)*1e3:6.2f} ms", flush=True)

@jax.jit
def s1_expand(pr, sr, ln):
    codes = kp.expand_rows16(pr, sr, ln, L)
    return (codes & 1).sum().astype(jnp.int32)

@jax.jit
def s2_pack(pr, sr, ln):
    codes = kp.expand_rows16(pr, sr, ln, L)
    whi, wlo, cv = kp.pack_call_windows(codes, ln)
    return (whi & 1).sum().astype(jnp.int32) + cv.sum().astype(jnp.int32)

@jax.jit
def s3_probe(*args):
    ta = args[:n_tab]; pr, sr, ln = args[n_tab:]
    codes = kp.expand_rows16(pr, sr, ln, L)
    whi, wlo, cv = kp.pack_call_windows(codes, ln)
    found, fm = pfn(*ta, whi, wlo)
    return (found & cv).sum().astype(jnp.int32) + (fm & 1).sum().astype(jnp.int32)

@jax.jit
def s4_automaton(*args):
    ta = args[:n_tab]; pr, sr, ln = args[n_tab:]
    codes = kp.expand_rows16(pr, sr, ln, L)
    whi, wlo, cv = kp.pack_call_windows(codes, ln)
    found, fm = pfn(*ta, whi, wlo)
    found = found & cv
    func = (fm >> 16).astype(jnp.int32)
    mean = (fm & jnp.uint32(0xFFFF)).astype(jnp.int32)
    out = automaton_ops.device_automaton(
        found, func, mean, ln, cfg.min_hits, cfg.max_gap, cfg.k,
        mad_floor=cfg.mad_floor, len_window=cfg.len_mad_window)
    return out["count"].sum().astype(jnp.int32)

@jax.jit
def s5_full(*args):
    ta = args[:n_tab]; pr, sr, ln = args[n_tab:]
    codes = kp.expand_rows16(pr, sr, ln, L)
    whi, wlo, cv = kp.pack_call_windows(codes, ln)
    found, fm = pfn(*ta, whi, wlo)
    found = found & cv
    func = (fm >> 16).astype(jnp.int32)
    mean = (fm & jnp.uint32(0xFFFF)).astype(jnp.int32)
    out = automaton_ops.device_automaton(
        found, func, mean, ln, cfg.min_hits, cfg.max_gap, cfg.k,
        mad_floor=cfg.mad_floor, len_window=cfg.len_mad_window)
    return automaton_ops.pack_records(out, ln)[0, 0]

from signature_kmers_tpu.ops.pallas_pack import pack_call_windows_pallas

@jax.jit
def s2p_pack(pr, sr, ln):
    codes = kp.expand_rows16(pr, sr, ln, L)
    whi, wlo, cv = pack_call_windows_pallas(codes, ln)
    return (whi & 1).sum().astype(jnp.int32) + cv.sum().astype(jnp.int32)

@jax.jit
def s5p_full(*args):
    ta = args[:n_tab]; pr, sr, ln = args[n_tab:]
    codes = kp.expand_rows16(pr, sr, ln, L)
    whi, wlo, cv = pack_call_windows_pallas(codes, ln)
    found, fm = pfn(*ta, whi, wlo)
    found = found & cv
    func = (fm >> 16).astype(jnp.int32)
    mean = (fm & jnp.uint32(0xFFFF)).astype(jnp.int32)
    out = automaton_ops.device_automaton(
        found, func, mean, ln, cfg.min_hits, cfg.max_gap, cfg.k,
        mad_floor=cfg.mad_floor, len_window=cfg.len_mad_window)
    return automaton_ops.pack_records(out, ln)[0, 0]

report("expand only", timed(s1_expand, jpr, jsr, jln))
report("+ PALLAS pack windows", timed(s2p_pack, jpr, jsr, jln))
report("+ pack windows", timed(s2_pack, jpr, jsr, jln))
report("+ probe", timed(s3_probe, *arrays, jpr, jsr, jln))
report("+ automaton", timed(s4_automaton, *arrays, jpr, jsr, jln))
report("+ pack_records (full program)", timed(s5_full, *arrays, jpr, jsr, jln))
report("full program w/ PALLAS pack", timed(s5p_full, *arrays, jpr, jsr, jln))

# same program with a high-hit-rate corpus: windows drawn FROM the table
# keys so the automaton sees realistic hit density (~80%)
print("\nhigh-hit corpus (automaton under real load):", flush=True)
# build sequences whose every window hits: decode a table key into 8 codes
# is not invertible per-window once overlapped; instead use random codes
# but force `found` via a fake probe that marks 80% found with random funcs
@jax.jit
def s4_fakehits(pr, sr, ln, seed):
    codes = kp.expand_rows16(pr, sr, ln, L)
    whi, wlo, cv = kp.pack_call_windows(codes, ln)
    k = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    found = (jax.random.uniform(k1, whi.shape) < 0.8) & cv
    func = jax.random.randint(k2, whi.shape, 0, 700)
    mean = jax.random.randint(k3, whi.shape, 100, 500)
    out = automaton_ops.device_automaton(
        found, func, mean, ln, cfg.min_hits, cfg.max_gap, cfg.k,
        mad_floor=cfg.mad_floor, len_window=cfg.len_mad_window)
    return automaton_ops.pack_records(out, ln)[0, 0]

report("expand+pack+fake80%hits+automaton+pack", timed(s4_fakehits, jpr, jsr, jln, 3))
