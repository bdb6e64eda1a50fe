"""Device hit automaton: the sequential calling state machine as a
`lax.scan` + batched broadcast statistics, entirely on device.

Replaces the host loop over per-position hit data (the reference walks
hits sequentially per protein, call_functions.tcc:259-338).  Two passes:

Pass A — a scan over positions with O(1) carry per sequence lane.  A
buffer's hits always form a CONTIGUOUS POSITION interval: hits append in
position order and a flush either clears the buffer or retains the last
two hits, so each buffer is fully described by (first_pos, last_pos).
The scan emits one record per flush: (function, pos_start, pos_end).

Pass B — per-record statistics WITHOUT gathers or sorts: membership is a
broadcast mask `found & pos in [ps, pe] & func == fI` over the original
(B, L) arrays; the exact median and MAD of matching hits' stored mean
lengths (ref: HitSet::process, call_functions.tcc:35-103) come from
counting binary search over the 16/17-bit integer value range (rank
selection by masked reductions — ~10x cheaper than last-axis sorts on
TPU), then the min-hits and length-window emission test.

Records per sequence are capped at REC_CAP; sequences that overflow are
flagged and re-run on the host path (exact, rare).

Statistics use float32 on device; the host/golden spec uses float64 —
divergence is possible only when seqlen sits exactly on a length-window
cutoff (see FIDELITY.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

REC_CAP = 4          # record slots per sequence (overflow -> host fallback)
UNDEF = 0xFFFF
UNROLL = 16          # positions per scan step (amortizes TPU loop overhead)


@functools.partial(jax.jit, static_argnames=(
    "min_hits", "max_gap", "k", "mad_floor", "len_window"))
def device_automaton(found, func, mean, seqlen,
                     min_hits: int, max_gap: int, k: int,
                     mad_floor: float = 30.0, len_window: float = 2.0):
    """Run the calling automaton for a batch.

    found: (B, L) bool; func/mean: (B, L) int32; seqlen: (B,) int32.

    Returns dict with (B, REC_CAP) arrays:
      call_valid bool, start/end/count/fI/median int32, mad f32,
    plus n_recs (B,) for overflow detection (> REC_CAP -> row incomplete).
    """
    B, L = found.shape
    func = func.astype(jnp.int32)
    mean = mean.astype(jnp.int32)

    # ---- pass A: scan over positions ------------------------------------
    def step(carry, xs):
        (cur, n, first, lpos, lfunc, l2func, l2pos, nrec) = carry
        h, f, p = xs

        # 1. gap flush (before append; ref tcc:295-301)
        gap = h & (n > 0) & (lpos + max_gap < p)
        gap_flush = gap & (n >= min_hits)
        gap_clear = gap & ~gap_flush
        r1_valid = gap_flush
        r1_fI, r1_ps, r1_pe = cur, first, lpos
        retain1 = gap_flush & (n >= 2) & (l2func != cur) & (l2func == lfunc)
        cur = jnp.where(retain1, lfunc, cur)
        first = jnp.where(retain1, l2pos, first)
        n = jnp.where(gap_flush, jnp.where(retain1, 2, 0), n)
        n = jnp.where(gap_clear, 0, n)
        nrec = nrec + r1_valid.astype(jnp.int32)

        # 2. empty buffer adopts the hit's function (ref tcc:302-305)
        fresh = h & (n == 0)
        cur = jnp.where(fresh, f, cur)
        first = jnp.where(fresh, p, first)

        # 3. append
        l2func_new = jnp.where(h, lfunc, l2func)
        l2pos_new = jnp.where(h, lpos, l2pos)
        lfunc = jnp.where(h, f, lfunc)
        lpos = jnp.where(h, p, lpos)
        l2func, l2pos = l2func_new, l2pos_new
        n = jnp.where(h, n + 1, n)

        # 4. same-function-pair switch (ref tcc:320-327)
        switch = h & (n > 1) & (cur != f) & (l2func == lfunc)
        r2_valid = switch
        r2_fI, r2_ps = cur, first
        r2_pe = jnp.broadcast_to(p, cur.shape)
        cur = jnp.where(switch, f, cur)
        first = jnp.where(switch, l2pos, first)
        n = jnp.where(switch, 2, n)
        nrec = nrec + r2_valid.astype(jnp.int32)

        carry = (cur, n, first, lpos, lfunc, l2func, l2pos, nrec)
        ys = (r1_valid, r1_fI, r1_ps, r1_pe,
              r2_valid, r2_fI, r2_ps, r2_pe)
        return carry, ys

    # derive the init from an input so it carries the same device-varying
    # axes under shard_map (a plain jnp.zeros init is cross-device
    # invariant and lax.scan rejects the carry type mismatch)
    z = jnp.zeros_like(seqlen, dtype=jnp.int32)
    init = (z + UNDEF, z, z, z - (1 << 30), z + UNDEF, z + UNDEF, z, z)

    assert L % UNROLL == 0
    posv = jnp.arange(L, dtype=jnp.int32)
    xs = (found.T.reshape(L // UNROLL, UNROLL, B),
          func.T.reshape(L // UNROLL, UNROLL, B),
          posv.reshape(L // UNROLL, UNROLL))

    def chunk_step(carry, chunk):
        hs, fs, ps = chunk
        ys_acc = []
        for u in range(UNROLL):
            carry, ys_u = step(carry, (hs[u], fs[u], ps[u]))
            ys_acc.append(ys_u)
        ys = tuple(jnp.stack([y[i] for y in ys_acc])
                   for i in range(len(ys_acc[0])))
        return carry, ys

    carry, ys = jax.lax.scan(chunk_step, init, xs)
    (cur, n, first, lpos, lfunc, l2func, l2pos, nrec) = carry
    ys = tuple(y.reshape(L, B) for y in ys)
    (r1v, r1f, r1ps, r1pe, r2v, r2f, r2ps, r2pe) = ys

    # tail flush (ref tcc:336-337)
    tail_valid = n >= min_hits
    n_recs = nrec + tail_valid.astype(jnp.int32)

    # ---- collect records: cumsum one-hot selection (a 4-payload sort of
    # the (B, 2L+1) streams costs ~10x more than these masked reductions
    # on TPU; slots beyond REC_CAP are dropped) ----------------------------
    def cat(a1, a2, tail_field):
        # (B, 2L+1): r1/r2 streams interleaved + the tail record
        m = jnp.stack([a1.T, a2.T], axis=2).reshape(B, 2 * L)
        return jnp.concatenate([m, tail_field[:, None]], axis=1)

    v = cat(r1v, r2v, tail_valid)
    c = jnp.cumsum(v.astype(jnp.int32), axis=1)
    slot1 = jax.lax.broadcasted_iota(jnp.int32, (1, REC_CAP, 1), 1) + 1
    oh = (v[:, None, :] & (c[:, None, :] == slot1)).astype(jnp.int32)
    rec_valid = oh.any(axis=2)

    def pick(field):
        return (field[:, None, :] * oh).sum(axis=2)

    rec_fI = pick(cat(r1f, r2f, cur))
    rec_ps = pick(cat(r1ps, r2ps, first))
    rec_pe = pick(cat(r1pe, r2pe, lpos))

    # ---- pass B: per-record statistics via broadcast masks --------------
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1, L), 2)
    member = (found[:, None, :]
              & (pos >= rec_ps[:, :, None]) & (pos <= rec_pe[:, :, None])
              & (func[:, None, :] == rec_fI[:, :, None])
              & rec_valid[:, :, None])
    cnt = member.sum(axis=2).astype(jnp.int32)
    msum = jnp.where(member, mean[:, None, :], 0).sum(axis=2)

    # Exact rank selection by counting binary search over the value range
    # (means and deviations are 16/18-bit integers) — each rank costs
    # `bits` masked reductions, far cheaper than a (B, REC_CAP, L) sort.
    # The two median ranks differ by at most one (hi_k is lo_k or
    # lo_k+1), so each pair shares ONE search: x2 = x1 when x1's
    # cumulative count already covers rank k2, else the smallest member
    # value above x1 — 2 extra reductions instead of a second full
    # search (the masked (B, REC_CAP, W) reductions are this pass's
    # entire cost; 68 -> 38 of them).
    def kth_pair(vals3, k1, k2, bits):
        # x1 = smallest x with |{member vals <= x}| >= k1 (garbage, later
        # masked, where k1 exceeds the member count)
        lo = jnp.zeros_like(k1)
        hi = jnp.full_like(k1, (1 << bits) - 1)
        for _ in range(bits):
            mid = (lo + hi) >> 1
            n_le = (member & (vals3 <= mid[:, :, None])).sum(axis=2)
            ge = n_le >= k1
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        x1 = hi
        n_le1 = (member & (vals3 <= x1[:, :, None])).sum(axis=2)
        big = jnp.int32(1 << 30)
        x_next = jnp.where(member & (vals3 > x1[:, :, None]), vals3,
                           big).min(axis=2)
        x2 = jnp.where(n_le1 >= k2, x1, x_next)
        return x1, x2

    safe_cnt = jnp.maximum(cnt, 1)
    lo_k = (safe_cnt - 1) // 2 + 1
    hi_k = safe_cnt // 2 + 1
    mean3 = jnp.broadcast_to(mean[:, None, :], member.shape)
    med_lo, med_hi = kth_pair(mean3, lo_k, hi_k, 16)
    med2 = med_lo + med_hi  # exact 2*median, int32
    median = med2.astype(jnp.float32) / 2.0

    dev2 = jnp.abs(2 * mean3 - med2[:, :, None])  # exact 2*|mean - median|
    d2_lo, d2_hi = kth_pair(dev2, lo_k, hi_k, 18)
    mad = (d2_lo + d2_hi).astype(jnp.float32) / 4.0
    mad = jnp.where(mad == 0.0, jnp.float32(mad_floor), mad)

    mean_len = msum.astype(jnp.float32) / safe_cnt.astype(jnp.float32)
    sl = seqlen.astype(jnp.float32)[:, None]
    in_window = ((sl >= mean_len - len_window * mad)
                 & (sl <= mean_len + len_window * mad))
    emit = rec_valid & (cnt >= min_hits) & in_window

    last_match_pos = jnp.where(member, pos, -1).max(axis=2)

    return {
        "call_valid": emit,
        "start": rec_ps,
        "end": last_match_pos + (k - 1),
        "count": cnt,
        "fI": rec_fI,
        "median": median.astype(jnp.int32),
        "mad": mad,
        "n_recs": n_recs,
    }


# -- D2H record packing -------------------------------------------------------
#
# The automaton result crosses device->host once per chunk; on a
# link-bound setup that transfer is a first-order cost.  All fields fit
# 16 bits for real proteins (positions/counts < seqlen, median/fI are
# uint16 by table construction, mad is a multiple of 0.25 well under
# 16384), so records pack 3 words each instead of 7.  Rows where any
# field would NOT fit exactly are flagged as overflow (n_recs > REC_CAP)
# and re-called exactly on the host — the same fallback path REC_CAP
# overflow already uses, so packing never changes results.

PACKED_WORDS = 1 + 3 * REC_CAP


def pack_records(out, lengths):
    """(B,) layout: [n_recs | start<<16|end ×C | count<<16|fI ×C |
    median<<16|mad*4 ×C], int32.  Invalid slots are zero (count==0 marks
    them: every emitted record has count >= 1)."""
    import jax.numpy as jnp

    valid = out["call_valid"]
    mad4f = out["mad"] * 4.0
    # exactness guards -> host fallback: sequence too long for 16-bit
    # positions/counts, mad*4 not integral (custom mad_floor) or too wide
    bad = (lengths.astype(jnp.int32) > 65535) | (
        valid & ((mad4f > 65535.0)
                 | (jnp.round(mad4f) != mad4f))).any(axis=1)
    # clip before the int cast: bad rows go to the host fallback and
    # never read these words, but the cast itself must stay in range
    mad4 = jnp.round(jnp.clip(mad4f, 0.0, 65535.0)).astype(jnp.int32)
    n_recs = jnp.where(bad, jnp.int32(REC_CAP + 1), out["n_recs"])

    def u16pair(hi, lo):
        w = (hi.astype(jnp.uint32) << 16) | (lo.astype(jnp.uint32)
                                             & jnp.uint32(0xFFFF))
        return jnp.where(valid, w, jnp.uint32(0)).astype(jnp.int32)

    return jnp.concatenate([
        n_recs[:, None],
        u16pair(out["start"], out["end"]),
        u16pair(out["count"], out["fI"]),
        u16pair(out["median"], mad4),
    ], axis=1)


def unpack_records(m: "np.ndarray"):
    """Inverse of pack_records on the host: (B, PACKED_WORDS) int32 ->
    dict of (B, REC_CAP) arrays matching device_automaton's output."""
    import numpy as np

    C = REC_CAP
    u = np.ascontiguousarray(m[:, 1:]).view(np.uint32)
    se = u[:, :C]
    cf = u[:, C:2 * C]
    mm = u[:, 2 * C:3 * C]
    count = (cf >> 16).astype(np.int32)
    return {
        "n_recs": m[:, 0],
        "call_valid": count > 0,
        "start": (se >> 16).astype(np.int32),
        "end": (se & 0xFFFF).astype(np.int32),
        "count": count,
        "fI": (cf & 0xFFFF).astype(np.int32),
        "median": (mm >> 16).astype(np.int32),
        "mad": (mm & 0xFFFF).astype(np.float32) / 4.0,
    }
