"""Device hit automaton: the sequential calling state machine as a
`lax.scan` + batched segment statistics, entirely on device.

Replaces the host loop over per-position hit data (the reference walks
hits sequentially per protein, call_functions.tcc:259-338).  Two passes:

Pass A — a scan over positions with O(1) carry per sequence lane.  A
buffer's hits always form a CONTIGUOUS range of the sequence's hit
indices: a flush either clears the buffer or retains the last two hits,
so the next buffer starts at e-1 or e+1.  The scan therefore only emits
per-flush records (function, first_pos, hit-range) — no hit duplication.

Pass B — per-record statistics by batched gather + last-axis sort over
each record's hit range: count, mean, exact median, exact MAD of the
stored per-k-mer mean lengths for hits matching the record's function
(ref: HitSet::process, call_functions.tcc:35-103), then the min-hits and
length-window emission test.

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
import numpy as np

REC_CAP = 8          # record slots per sequence (overflow -> host fallback)
I32_INF = jnp.int32(0x7FFFFFF0)
UNDEF = jnp.int32(0xFFFF)


@functools.partial(jax.jit, static_argnames=(
    "min_hits", "max_gap", "k", "mad_floor", "len_window"))
def device_automaton(found, func, mean, seqlen,
                     min_hits: int, max_gap: int, k: int,
                     mad_floor: float = 30.0, len_window: float = 2.0):
    """Run the calling automaton for a batch.

    found: (B, L) bool; func/mean: (B, L) int32; seqlen: (B,) int32.

    Returns dict:
      calls:  start/end/count/fI (B, REC_CAP) int32, median (B, REC_CAP)
              int32, mad (B, REC_CAP) f32, call_valid (B, REC_CAP) bool
      n_recs: (B,) total records (for overflow detection: > REC_CAP means
              the device result for that row is incomplete)
    """
    B, L = found.shape
    func = func.astype(jnp.int32)
    mean = mean.astype(jnp.int32)

    # ---- compact hits per row (stable: hits keep position order) --------
    order = jnp.argsort(~found, axis=1, stable=True)
    hit_func = jnp.take_along_axis(func, order, axis=1)
    hit_mean = jnp.take_along_axis(mean, order, axis=1)
    pos_mat = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    hit_pos = jnp.take_along_axis(
        jnp.where(found, pos_mat, I32_INF), order, axis=1)
    n_hits = found.sum(axis=1).astype(jnp.int32)

    # ---- pass A: scan over positions ------------------------------------
    def step(carry, xs):
        (cur, n, first, bs, hcount, lpos, lfunc, l2func, l2pos, nrec) = carry
        h, f, p = xs

        # 1. gap flush (before append; ref tcc:295-301)
        gap = h & (n > 0) & (lpos + max_gap < p)
        gap_flush = gap & (n >= min_hits)
        gap_clear = gap & ~gap_flush
        r1_valid = gap_flush
        r1_fI, r1_first, r1_s = cur, first, bs
        r1_e = hcount - 1
        retain1 = gap_flush & (n >= 2) & (l2func != cur) & (l2func == lfunc)
        cur = jnp.where(retain1, lfunc, cur)
        first = jnp.where(retain1, l2pos, first)
        bs = jnp.where(retain1, hcount - 2, bs)
        n = jnp.where(gap_flush, jnp.where(retain1, 2, 0), n)
        n = jnp.where(gap_clear, 0, n)
        nrec = nrec + r1_valid.astype(jnp.int32)

        # 2. empty buffer adopts the hit's function (ref tcc:302-305)
        fresh = h & (n == 0)
        cur = jnp.where(fresh, f, cur)
        first = jnp.where(fresh, p, first)
        bs = jnp.where(fresh, hcount, bs)

        # 3. append
        l2func_new = jnp.where(h, lfunc, l2func)
        l2pos_new = jnp.where(h, lpos, l2pos)
        lfunc = jnp.where(h, f, lfunc)
        lpos = jnp.where(h, p, lpos)
        l2func, l2pos = l2func_new, l2pos_new
        n = jnp.where(h, n + 1, n)
        hcount = jnp.where(h, hcount + 1, hcount)

        # 4. same-function-pair switch (ref tcc:320-327)
        switch = h & (n > 1) & (cur != f) & (l2func == lfunc)
        r2_valid = switch
        r2_fI, r2_first, r2_s = cur, first, bs
        r2_e = hcount - 1
        cur = jnp.where(switch, f, cur)
        first = jnp.where(switch, l2pos, first)
        bs = jnp.where(switch, hcount - 2, bs)
        n = jnp.where(switch, 2, n)
        nrec = nrec + r2_valid.astype(jnp.int32)

        carry = (cur, n, first, bs, hcount, lpos, lfunc, l2func, l2pos, nrec)
        ys = (r1_valid, r1_fI, r1_first, r1_s, r1_e,
              r2_valid, r2_fI, r2_first, r2_s, r2_e)
        return carry, ys

    z = jnp.zeros(B, jnp.int32)
    init = (jnp.full(B, UNDEF), z, z, z, z,
            jnp.full(B, -(1 << 30), jnp.int32), jnp.full(B, UNDEF),
            jnp.full(B, UNDEF), z, z)
    xs = (found.T, func.T, jnp.arange(L, dtype=jnp.int32))
    carry, ys = jax.lax.scan(step, init, xs)
    (cur, n, first, bs, hcount, lpos, lfunc, l2func, l2pos, nrec) = carry

    # tail flush (ref tcc:336-337)
    tail_valid = n >= min_hits
    nrec_total = nrec + tail_valid.astype(jnp.int32)

    # ---- collect records into (B, REC_CAP) slots ------------------------
    (r1v, r1f, r1fp, r1s, r1e, r2v, r2f, r2fp, r2s, r2e) = ys  # (L, B) each

    r1v, r1f, r1fp, r1s, r1e = (a.T for a in (r1v, r1f, r1fp, r1s, r1e))
    r2v, r2f, r2fp, r2s, r2e = (a.T for a in (r2v, r2f, r2fp, r2s, r2e))

    # interleave the two streams: position p contributes slots (p,0), (p,1)
    v = jnp.stack([r1v, r2v], axis=2).reshape(B, 2 * L)
    fI = jnp.stack([r1f, r2f], axis=2).reshape(B, 2 * L)
    fp = jnp.stack([r1fp, r2fp], axis=2).reshape(B, 2 * L)
    s = jnp.stack([r1s, r2s], axis=2).reshape(B, 2 * L)
    e = jnp.stack([r1e, r2e], axis=2).reshape(B, 2 * L)

    rank = jnp.cumsum(v.astype(jnp.int32), axis=1) - 1
    # overflowing records are dropped (row flagged via n_recs)
    slot = jnp.where(v & (rank < REC_CAP), rank, REC_CAP)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * L), 0)

    def scatter(field, fill):
        out = jnp.full((B, REC_CAP + 1), fill, field.dtype)
        out = out.at[rows, slot].set(
            jnp.where(v, field, fill), mode="drop")
        return out[:, :REC_CAP]

    rec_valid = scatter(v, False)
    rec_fI = scatter(fI, UNDEF)
    rec_first = scatter(fp, 0)
    rec_s = scatter(s, 0)
    rec_e = scatter(e, -1)

    # append tail record at slot nrec (dropped when the row overflowed;
    # such rows are re-run on the host path)
    tslot = jnp.minimum(nrec, REC_CAP - 1)
    brow = jnp.arange(B)
    put = tail_valid & (nrec < REC_CAP)
    rec_valid = rec_valid.at[brow, tslot].set(
        rec_valid[brow, tslot] | put)
    rec_fI = rec_fI.at[brow, tslot].set(jnp.where(put, cur, rec_fI[brow, tslot]))
    rec_first = rec_first.at[brow, tslot].set(
        jnp.where(put, first, rec_first[brow, tslot]))
    rec_s = rec_s.at[brow, tslot].set(jnp.where(put, bs, rec_s[brow, tslot]))
    rec_e = rec_e.at[brow, tslot].set(
        jnp.where(put, hcount - 1, rec_e[brow, tslot]))

    # ---- pass B: per-record statistics ----------------------------------
    # gather each record's hit range [s, e] (contiguous hit indices)
    W = L  # a record can span every hit of the row
    widx = rec_s[:, :, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    in_range = (widx <= rec_e[:, :, None]) & rec_valid[:, :, None]
    widx_c = jnp.clip(widx, 0, L - 1)
    g_func = jnp.take_along_axis(
        hit_func[:, None, :].repeat(REC_CAP, axis=1), widx_c, axis=2)
    g_mean = jnp.take_along_axis(
        hit_mean[:, None, :].repeat(REC_CAP, axis=1), widx_c, axis=2)
    g_pos = jnp.take_along_axis(
        hit_pos[:, None, :].repeat(REC_CAP, axis=1), widx_c, axis=2)

    match = in_range & (g_func == rec_fI[:, :, None])
    cnt = match.sum(axis=2).astype(jnp.int32)
    msum = jnp.where(match, g_mean, 0).sum(axis=2)

    vals = jnp.where(match, g_mean, I32_INF)
    vals = jnp.sort(vals, axis=2)
    safe_cnt = jnp.maximum(cnt, 1)
    lo_i = (safe_cnt - 1) // 2
    hi_i = safe_cnt // 2
    med_lo = jnp.take_along_axis(vals, lo_i[:, :, None], axis=2)[:, :, 0]
    med_hi = jnp.take_along_axis(vals, hi_i[:, :, None], axis=2)[:, :, 0]
    median = (med_lo + med_hi).astype(jnp.float32) / 2.0

    dev = jnp.where(match,
                    jnp.abs(g_mean.astype(jnp.float32) - median[:, :, None]),
                    jnp.float32(3e38))
    dev = jnp.sort(dev, axis=2)
    mad_lo = jnp.take_along_axis(dev, lo_i[:, :, None], axis=2)[:, :, 0]
    mad_hi = jnp.take_along_axis(dev, hi_i[:, :, None], axis=2)[:, :, 0]
    mad = (mad_lo + mad_hi) / 2.0
    mad = jnp.where(mad == 0.0, jnp.float32(mad_floor), mad)

    mean_len = msum.astype(jnp.float32) / safe_cnt.astype(jnp.float32)
    sl = seqlen.astype(jnp.float32)[:, None]
    in_window = ((sl >= mean_len - len_window * mad)
                 & (sl <= mean_len + len_window * mad))
    emit = rec_valid & (cnt >= min_hits) & in_window

    last_match_pos = jnp.where(match, g_pos, -1).max(axis=2)

    return {
        "call_valid": emit,
        "start": rec_first,
        "end": last_match_pos + (k - 1),
        "count": cnt,
        "fI": rec_fI,
        "median": median.astype(jnp.int32),
        "mad": mad,
        "n_recs": nrec_total,
    }
