"""Pallas kernel-level facts for the probe-kernel decision (VERDICT r3 #1).

The production probe is an XLA gather of ~1.3M random 16B rows from the
~1 GB wide table (ops/probe.py); in the chip's slow gather state it costs
~10 ns/row = ~13.7 ms of a 25.7 ms chunk.  SURVEY §2.4 designed a
"batched probing Pallas kernel ... around HBM burst efficiency".  This
benchmark measures the primitives any such kernel would be built from,
on the real chip, so the build-or-reject decision is kernel-level
measured fact rather than architecture-level argument:

  1. XLA gather reference (1 GB + 64 MB) — which state is the chip in?
  2. Pallas HBM->VMEM streaming bandwidth (block DMA, double-buffered,
     repeated in-kernel to clear the ~23 ms tunnel dispatch floor):
     what a full-table sweep costs.
  3. Per-row DMA gather (Q outstanding copies, scalar-issued): the only
     random-access primitive Pallas has — ns/row vs the XLA gather.
  4. Rows-per-DMA curve: issue overhead vs transfer size (what "binned
     sub-table reads" would pay at any granularity).
  5. VMEM dynamic (per-lane) gather support probe: a sweep-style kernel
     needs to gather matched rows from a VMEM-resident bin.

Environment note: kernels must use pl.ANY (the deprecated pltpu.ANY
alias makes this tunnel's remote compile helper exit 1).

Run on the target chip:  python benchmarks/pallas_dma_bench.py
"""

import sys, time, os
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from signature_kmers_tpu.utils.jaxcache import enable_cache
enable_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(f, *args, reps=4):
    int(np.asarray(f(*args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(np.asarray(f(*args)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


NQ = 4096 * 320  # production probe count per 4096-seq chunk (W=320)
rng = np.random.default_rng(11)

null = jax.jit(lambda a: (a[:8] & 1).sum())
base = timed(null, jnp.asarray(rng.integers(0, 1024, (NQ,)), dtype=jnp.int32))
print(f"null dispatch: {base*1e3:.2f} ms  (NQ={NQ})", flush=True)


@jax.jit
def make_table_w(z):
    # (rows, 128) uint32 = 512 B rows
    rows = z.shape[0]
    return (jnp.arange(rows * 128, dtype=jnp.uint32)
            * jnp.uint32(2654435761)).reshape(rows, 128)


@jax.jit
def make_table_4(z):
    # (rows, 4) uint32 = 16 B rows (the production probe's row shape)
    rows = z.shape[0]
    return (jnp.arange(rows * 4, dtype=jnp.uint32)
            * jnp.uint32(2654435761)).reshape(rows, 4)


def make_w(mb):
    return jax.block_until_ready(
        make_table_w(jnp.zeros(((mb << 20) // 512,), jnp.uint8)))


def make_4(mb):
    return jax.block_until_ready(
        make_table_4(jnp.zeros(((mb << 20) // 16,), jnp.uint8)))


# -- 1. XLA gather reference ------------------------------------------------
print("-- 1. XLA gather reference (16B rows) --", flush=True)
t16 = make_4(1024)
R16 = t16.shape[0]
jf = jax.jit(lambda tab, idx: (tab[idx] & 1).sum().astype(jnp.int32))
idx1g = jnp.asarray(rng.integers(0, R16, (NQ,)), dtype=jnp.int32)
dt = timed(jf, t16, idx1g)
xla_1g_ns = (dt - base) / NQ * 1e9
print(f"  1 GB:  {xla_1g_ns:6.2f} ns/row  ({(dt-base)*1e3:.2f} ms)",
      flush=True)
t64 = make_4(64)
idx64 = jnp.asarray(rng.integers(0, t64.shape[0], (NQ,)), dtype=jnp.int32)
dt = timed(jf, t64, idx64)
print(f"  64 MB: {(dt-base)/NQ*1e9:6.2f} ns/row", flush=True)
del t64
t1g = make_w(1024)
R128 = t1g.shape[0]


# -- 2. Pallas streaming sweep bandwidth ------------------------------------
print("-- 2. Pallas HBM->VMEM streaming (double-buffered, x REPS in-kernel)"
      " --", flush=True)


def sweep_bw(tab, chunk_rows, reps_in_kernel):
    nchunks = tab.shape[0] // chunk_rows

    def kernel(tab_ref, out_ref):
        def body(scratch, sems):
            def get(slot, ci):
                return pltpu.make_async_copy(
                    tab_ref.at[pl.ds(ci * chunk_rows, chunk_rows)],
                    scratch.at[slot], sems.at[slot])

            def one_sweep(r, acc0):
                get(0, 0).start()

                def loop(ci, acc):
                    slot = jax.lax.rem(ci, 2)
                    @pl.when(ci + 1 < nchunks)
                    def _():
                        get(jax.lax.rem(ci + 1, 2), ci + 1).start()
                    get(slot, ci).wait()
                    return acc ^ scratch[slot, 0, 0]

                return jax.lax.fori_loop(0, nchunks, loop, acc0)

            acc = jax.lax.fori_loop(0, reps_in_kernel, one_sweep,
                                    jnp.uint32(0))
            out_ref[0, 0] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, chunk_rows, 128), jnp.uint32),
            sems=pltpu.SemaphoreType.DMA((2,)))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
    )(tab)


SWEEP_REPS = 8
for chunk_rows in (1024, 4096):
    try:
        f = jax.jit(lambda t, c=chunk_rows: sweep_bw(t, c, SWEEP_REPS))
        dt = timed(f, t1g, reps=3)
        gb = R128 * 512 * SWEEP_REPS / 1e9
        per_sweep_ms = (dt - base) * 1e3 / SWEEP_REPS
        print(f"  chunk {chunk_rows*512//1024:5d} KB: "
              f"{per_sweep_ms:8.2f} ms/GB-sweep -> {gb/(dt-base):7.1f} GB/s",
              flush=True)
    except Exception as e:
        print(f"  chunk_rows={chunk_rows}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


# -- 3. Per-row DMA gather --------------------------------------------------
# Measured outcome: Mosaic REJECTS DMA of (1, 4)-shaped slices (the
# 16B production row) — copies need the 128-lane dimension; the
# narrowest per-row DMA this hardware supports is exp 4's 512B row
# (rpd=1), so that entry doubles as the per-row-DMA probe cost.
print("-- 3. Pallas per-row 16B DMA gather (Q outstanding) --", flush=True)
N_DMA = 8192
idx_dev = jnp.asarray(rng.integers(0, R16, (N_DMA,)).astype(np.int32))


def row_dma_gather(tab, idx, q):
    def kernel(idx_ref, tab_ref, out_ref, scratch, sems):
        def get(j):
            slot = jax.lax.rem(j, q)
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[j], 1)],
                scratch.at[slot], sems.at[slot])

        def warm(j, _):
            get(j).start()
            return 0

        jax.lax.fori_loop(0, q, warm, 0)

        def loop(j, acc):
            get(j).wait()
            acc = acc ^ scratch[jax.lax.rem(j, q), 0, 0]
            @pl.when(j + q < N_DMA)
            def _():
                get(j + q).start()
            return acc

        acc = jax.lax.fori_loop(0, N_DMA, loop, jnp.uint32(0))
        out_ref[0, 0] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((q, 1, 4), jnp.uint32),
            pltpu.SemaphoreType.DMA((q,)),
        ])(idx, tab)


for q in (4, 16, 64):
    try:
        f = jax.jit(lambda t, i, q=q: row_dma_gather(t, i, q))
        dt = timed(f, t16, idx_dev, reps=3)
        print(f"  Q={q:3d}: {(dt-base)/N_DMA*1e9:8.1f} ns/row "
              f"({(dt-base)*1e3:.2f} ms / {N_DMA} rows)", flush=True)
    except Exception as e:
        print(f"  Q={q}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


# -- 4. Rows-per-DMA curve --------------------------------------------------
print("-- 4. rows-per-DMA curve (512B rows, random starts, Q=16) --",
      flush=True)


def block_dma_gather(tab, starts, rpd, n_dma, q=16):
    def kernel(st_ref, tab_ref, out_ref, scratch, sems):
        def get(j):
            slot = jax.lax.rem(j, q)
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(st_ref[j], rpd)],
                scratch.at[slot], sems.at[slot])

        def warm(j, _):
            get(j).start()
            return 0

        jax.lax.fori_loop(0, q, warm, 0)

        def loop(j, acc):
            get(j).wait()
            acc = acc ^ scratch[jax.lax.rem(j, q), 0, 0]
            @pl.when(j + q < n_dma)
            def _():
                get(j + q).start()
            return acc

        acc = jax.lax.fori_loop(0, n_dma, loop, jnp.uint32(0))
        out_ref[0, 0] = acc

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((q, rpd, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((q,)),
        ])(starts, tab)


for rpd in (1, 8, 64, 512):
    n_dma = 8192 if rpd <= 64 else 2048
    starts = jnp.asarray(
        rng.integers(0, R128 - rpd, (n_dma,)).astype(np.int32))
    try:
        f = jax.jit(lambda t, s, rpd=rpd, n=n_dma:
                    block_dma_gather(t, s, rpd, n))
        dt = timed(f, t1g, starts, reps=3)
        bytes_moved = n_dma * rpd * 512
        print(f"  rpd={rpd:4d} ({rpd*512//1024:4d} KB/DMA): "
              f"{(dt-base)/n_dma*1e9:9.1f} ns/DMA  "
              f"{bytes_moved/1e9/(dt-base):7.1f} GB/s", flush=True)
    except Exception as e:
        print(f"  rpd={rpd}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


# -- 5. VMEM dynamic gather support -----------------------------------------
print("-- 5. VMEM dynamic per-lane gather inside a kernel --", flush=True)
TV = 8192  # rows resident in VMEM (8192*128*4 = 4 MB)
NG = 4096  # gathered rows
tab_small = jax.block_until_ready(make_table_w(jnp.zeros((TV,), jnp.uint8)))
gidx_np = rng.integers(0, TV, (NG,)).astype(np.int32)


def try_variant(name, fn):
    try:
        ok, per_row_ns = fn()
        print(f"  {name}: COMPILES, correct={ok}"
              + (f", {per_row_ns:7.1f} ns/row" if per_row_ns else ""),
              flush=True)
    except Exception as e:
        print(f"  {name}: UNSUPPORTED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def v_take_axis0():
    # sublane-dimension gather: out[i, :] = tab[idx[i], :]
    def kernel(idx_ref, tab_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:, :1], (NG, 128))
        out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx, axis=0)

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG, 128), jnp.uint32))(i, t))
    idx2 = jnp.asarray(gidx_np[:, None])
    out = np.asarray(f(tab_small, idx2))
    ok = (out == np.asarray(tab_small)[gidx_np]).all()
    g = jax.jit(lambda t, i: f(t, i)[:1, :1].astype(jnp.int32))
    dt = timed(g, tab_small, idx2, reps=3)
    return ok, (dt - base) / NG * 1e9


def v_onehot_mxu():
    # gather via one-hot matmul on the MXU (int-safe via int32 cast);
    # cost scales as NG x TV x 128 MACs — only viable for tiny tables
    TVm, NGm = 512, 4096

    def kernel(idx_ref, tab_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NGm, TVm), 1)
        oh = (rows == idx_ref[:, 0][:, None]).astype(jnp.float32)
        tf = tab_ref[:, :].astype(jnp.int32).astype(jnp.float32)
        out_ref[:, :] = jnp.dot(
            oh, tf, preferred_element_type=jnp.float32).astype(jnp.int32)

    # 8-bit payload: the f32 MXU path truncates wider mantissas
    # (full 32-bit values would need 4x8-bit limb matmuls)
    small = jax.jit(lambda t: (t[:TVm].astype(jnp.int32)
                               & jnp.int32(0xFF)))(tab_small)
    small = jax.block_until_ready(small)
    midx_np = rng.integers(0, TVm, (NGm,)).astype(np.int32)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NGm, 128), jnp.int32))(i, t))
    idx2 = jnp.asarray(midx_np[:, None])
    out = np.asarray(f(small, idx2))
    ok = (out == np.asarray(small)[midx_np]).all()
    g = jax.jit(lambda t, i: f(t, i)[:1, :1])
    dt = timed(g, small, idx2, reps=3)
    return ok, (dt - base) / NGm * 1e9


def v_take_lanes():
    # lane-dimension gather: out[i, j] = tab[i, idx[i, j]] — per-lane
    # random access WITHIN each row of 128 lanes
    TVr, L = 4096, 128

    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :],
                                            axis=1)

    tabr = jax.block_until_ready(
        make_table_w(jnp.zeros((TVr,), jnp.uint8)))
    lidx_np = rng.integers(0, L, (TVr, L)).astype(np.int32)
    f = jax.jit(lambda i, t: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TVr, L), jnp.uint32))(i, t))
    out = np.asarray(f(jnp.asarray(lidx_np), tabr))
    ok = (out == np.take_along_axis(np.asarray(tabr), lidx_np, axis=1)).all()
    g = jax.jit(lambda i, t: f(i, t)[:1, :1].astype(jnp.int32))
    dt = timed(g, jnp.asarray(lidx_np), tabr, reps=3)
    return ok, (dt - base) / (TVr * L) * 1e9


try_variant("sublane gather (take_along_axis axis=0)", v_take_axis0)
try_variant("one-hot MXU gather (TV=512)", v_onehot_mxu)
try_variant("lane gather (take_along_axis axis=1)", v_take_lanes)

print("done.", flush=True)
