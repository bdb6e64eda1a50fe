"""Pallas TPU kernel: fused rolling k-mer pack + ambiguity window mask.

The fused elementwise pipeline (code shifts -> 6-bit packing -> ambiguity
window AND) is a pure VPU workload; this kernel keeps every intermediate
in VMEM and writes exactly three outputs, instead of letting XLA
materialize each shifted copy to HBM.  The (cheap) in-sequence bound mask
is applied outside the kernel, keeping all refs lane-aligned.

The companion hash-probe op intentionally stays on XLA gathers: a probe is
two data-dependent 48-byte row reads per window, and per-element dynamic
HBM access from a Pallas kernel lowers to per-element DMA — slower than
XLA's native gather engine on this hardware (measured ~4-7 ns/row via
XLA).  See ops/probe.py.

Grid: one program per row block of BLOCK_B sequences; L must be a
multiple of 128 (lane width).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import alphabet

K = alphabet.K
BLOCK_B = 256


def _kernel(codes_ref, hi_ref, lo_ref, w8_ref):
    codes = codes_ref[:, :]                     # (BLOCK_B, L) uint8
    c = codes.astype(jnp.uint32)
    B, L = codes.shape

    def shift_left(x, j, fill):
        pad = jnp.full((B, j), fill, x.dtype)
        return jnp.concatenate([x[:, j:], pad], axis=1)

    # 4-char words by log-doubling
    d2 = (c << 6) | shift_left(c, 1, jnp.uint32(alphabet.INVALID_CODE))
    d4 = (d2 << 12) | shift_left(d2, 2, jnp.uint32(0))
    hi_ref[:, :] = d4 & jnp.uint32(0xFFFFFF)
    lo_ref[:, :] = shift_left(d4, 4, jnp.uint32(0)) & jnp.uint32(0xFFFFFF)

    # call-side ambiguity: '*' or uppercase 'X' (ref: kmer_data.h:82).
    # NOTE: compare in uint32 — Mosaic rejects 8-bit compares.
    ok = ((c != jnp.uint32(alphabet.STAR_CODE))
          & (c != jnp.uint32(alphabet.X_UPPER_CODE))).astype(jnp.uint32)
    w2 = ok & shift_left(ok, 1, jnp.uint32(0))
    w4 = w2 & shift_left(w2, 2, jnp.uint32(0))
    w8 = w4 & shift_left(w4, 4, jnp.uint32(0))
    # K+1-wide exclusion (for_each_kmer's kend >= next_ambig jump,
    # kmer_data.h:88-90): a window ending AT an ambiguous char is skipped
    # too.  Fill 1: padding codes are INVALID, never ambiguous, so the
    # sequence-final window stays valid (see ops/kmer_pack).
    w8_ref[:, :] = w8 & shift_left(ok, K, jnp.uint32(1))


@jax.jit
def pack_call_windows_pallas(codes, lengths):
    """(B, L) uint8 codes, (B,) lengths -> (hi, lo, call_valid).

    B must be a multiple of BLOCK_B and L a multiple of 128."""
    B, L = codes.shape
    assert B % BLOCK_B == 0 and L % 128 == 0, (B, L)
    grid = (B // BLOCK_B,)

    def bspec():
        return pl.BlockSpec((BLOCK_B, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    hi, lo, w8 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[bspec()],
        out_specs=(bspec(), bspec(), bspec()),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, L), jnp.uint32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(codes)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    in_seq = pos + K <= lengths.astype(jnp.int32)[:, None]
    return hi, lo, (w8 != 0) & in_seq
