"""Microbenchmark of the build-selection device pass and its primitives.

Times, at production scale (20M windows by default):
  - the full selection pass (_select_signatures_jax, segmented-scan based)
  - its two packed-key sorts in isolation
  - one scatter-based segment_sum + [seg_id] broadcast (the pattern the
    first version of the pass used ~12x before the segscan rewrite)
  - the scan primitives: cumsum/cummax and the log-doubling segmented
    scans (ops/segscan.py) at 1 and 4 value lanes
  - an n-from-n random gather (the med/avg rank-selection reads)

Run on the TPU: `python benchmarks/select_bench.py [n]`.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    """Fetch one element of one output leaf: block_until_ready is
    unreliable over the tunnel backend, a tiny D2H fetch is not (the
    executable must finish before any output is readable)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[:1])


def timeit(fn, *args, reps=3):
    _force(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / reps


print = functools.partial(print, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax, ops as jops

    from signature_kmers_tpu.models.signature_builder import (
        _select_signatures_jax)
    from signature_kmers_tpu.ops import segscan

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    func = rng.integers(0, 50_000, n).astype(np.int32)
    off = rng.integers(0, 1 << 16, n).astype(np.int32)
    plen = rng.integers(30, 5000, n).astype(np.int32)
    sid = rng.integers(0, 1 << 20, n).astype(np.int32)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; n = {n:,}")

    args = [jnp.asarray(a) for a in (hi, lo, func, off, plen, sid)]
    jhi, jlo, jfunc, joff, jplen, jsid = args

    full = jax.jit(_select_signatures_jax, static_argnames=("threshold",))
    t = timeit(lambda: full(*args, threshold=0.8))
    print(f"full selection pass:        {t*1e3:9.1f} ms  "
          f"({n/t/1e6:.1f}M windows/s)")

    k1 = (jhi << jnp.uint32(8)) | (jlo >> jnp.uint32(16))
    k2 = ((jlo & jnp.uint32(0xFFFF)) << jnp.uint32(16)) \
        | jfunc.astype(jnp.uint32)

    t = timeit(jax.jit(lambda a, b, c, d: lax.sort(
        (a, b, c, d), num_keys=3)), k1, k2, jplen, jsid)
    print(f"sort1 (3 keys, 1 payload):  {t*1e3:9.1f} ms")
    t = timeit(jax.jit(lambda a, b: lax.sort((a, b), num_keys=2)), k1, k2)
    print(f"sort2 (2 keys):             {t*1e3:9.1f} ms")

    seg = jnp.asarray(np.sort(rng.integers(0, n, n)).astype(np.int32))
    ones = jnp.ones(n, jnp.int32)

    t = timeit(jax.jit(lambda s: jops.segment_sum(
        ones, s, num_segments=n, indices_are_sorted=True)[s]), seg)
    print(f"segment_sum + [seg] bcast:  {t*1e3:9.1f} ms")

    t = timeit(jax.jit(lambda x: jnp.cumsum(x)), jplen)
    print(f"cumsum int32:               {t*1e3:9.1f} ms")
    t = timeit(jax.jit(lambda x: lax.cummax(x)), jplen)
    print(f"cummax int32:               {t*1e3:9.1f} ms")

    flags = jnp.asarray(rng.random(n) < 0.3)

    t = timeit(jax.jit(lambda f, x: segscan.seg_scan(
        (jnp.add,), f, x)), flags, jplen)
    print(f"segscan 1 lane:             {t*1e3:9.1f} ms")
    t = timeit(jax.jit(lambda f, a, b, c, d: segscan.seg_scan(
        (jnp.minimum, jnp.add, jnp.add, jnp.add), f, a, b, c, d,
        reverse=True)), flags, jplen, jplen, jplen, jplen)
    print(f"segscan 4 lanes reverse:    {t*1e3:9.1f} ms")
    t = timeit(jax.jit(lambda f, x: segscan.seg_bcast(jnp.maximum, f, x)),
               flags, jplen)
    print(f"seg_bcast (fwd+bwd):        {t*1e3:9.1f} ms")

    gidx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    t = timeit(jax.jit(lambda v, i: v[i]), jplen, gidx)
    print(f"gather n-from-n int32:      {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
