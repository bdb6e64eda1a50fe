"""Production signature builder: device sort + segment-op selection.

The reference accumulates every (k-mer, attributes) pair in a TBB
concurrent multimap and scans ranges (ref: signature_build.h:61,
signature_build.tcc:184-213).  The TPU-native design replaces that with:

  1. extraction: rolling window pack + validity mask over the whole corpus
     (host/numpy or ops.kmer_pack.pack_flat_windows);
  2. selection: one multi-key device sort of the packed attribute arrays
     by (kmer, function, protein_length) and a second by (kmer, offset),
     then per-(kmer,function) counts, the 80%% rule, and rank-selected
     medians via jax.ops.segment_{sum,max,min} on the sorted segments
     (ref semantics: signature_build.tcc:219-293);
  3. host finalization with exact int64 statistics (mean floor, exact
     median, exact variance floor) — see FIDELITY.md.

Determinism: the reference's output depends on TBB range splits (a k-mer's
group can be split across threads); the sorted pipeline is exactly
deterministic for any device count.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from ..core.config import BuildConfig, TableConfig
from ..core.function_map import FunctionMap, UNDEFINED_FUNCTION
from ..golden.build import BuildStats
from ..io import fasta as fasta_io
from ..table.kmer_table import KmerTable

BIG_I32 = np.int32(2**31 - 1)


def _finalize_stats_np(best_count, s_best, sq_hi, sq_lo, med_lo, med_hi):
    """Exact int64 host finalization of the per-k-mer statistics (see
    FIDELITY.md): mean floor, exact median, exact variance floor, all
    truncated to uint16 like StoredKmerData (kmer_data.h:122-127).

    The device pass delivers sum(x) and sum(x^2) (16-bit split channels)
    over the best-function occurrences; with c = floor(mean),
    sum((x-c)^2) = sum(x^2) - 2*c*sum(x) + n*c^2 exactly, and
    var = floor((n*sum((x-c)^2) - r^2) / n^2) with r = s mod n.
    """
    n_b = best_count.astype(np.int64)
    s_b = s_best.astype(np.int64)
    sq = (sq_hi.astype(np.int64) << 16) + sq_lo.astype(np.int64)
    c = s_b // n_b
    mean_u16 = (c & 0xFFFF).astype(np.uint16)
    ml = med_lo.astype(np.int64)
    mh = med_hi.astype(np.int64)
    median_u16 = (((ml + mh) // 2) & 0xFFFF).astype(np.uint16)
    d2 = sq - 2 * c * s_b + n_b * c * c
    r = s_b - c * n_b
    var_u16 = (((n_b * d2 - r * r) // (n_b * n_b)) & 0xFFFF).astype(np.uint16)
    return mean_u16, median_u16, var_u16


def _p2_boost_stats_np(p_s, sbe, cnt):
    """Opt-in boost::accumulators-compatible statistics (BuildConfig
    .p2_stats): per kept k-mer, (mean, median, var) over the best-function
    protein lengths with the REFERENCE's accumulator semantics
    (signature_build.tcc:262-279) instead of this framework's exact spec:

      - mean:   tag::mean on an accumulator_set<unsigned short, ...> —
                the running sum is kept in the SAMPLE type, so it wraps
                mod 65536 before the division (sum % 65536) / n;
      - median: tag::median = the P-square quantile estimator at p=0.5
                (Jain & Chhikara 1985, the published algorithm boost
                implements) — approximate and insertion-order dependent;
      - var:    tag::variance — boost's iterative formula
                var = var*(n-1)/n + (x - mean_n)^2/(n-1) with mean_n the
                immediate mean AFTER including x (double precision).

    Insertion order is defined as SORTED-CANONICAL: occurrences ordered
    by ascending protein length (the plen-sorted best-function run the
    selection pass produces).  The reference's own order is the TBB
    multimap iteration order — nondeterministic run to run — so exact
    byte-reproduction of a given reference run is possible only when that
    run's order happened to be equivalent; see FIDELITY.md.  For counts
    < 5 the P-square markers are not yet initialized and the estimator
    reads its middle height slot (3rd inserted sample, or 0 when fewer
    than 3 samples) — replicated as the deterministic spec.

    p_s: plen-sorted entry array; sbe/cnt: per-group start and length of
    the best-function run.  Vectorized across groups, sequential in the
    per-group sample index (the P-square recurrence is inherently
    sequential).  Returns (mean16, median16, var16).
    """
    G = int(sbe.shape[0])
    if G == 0:
        z = np.zeros(0, np.uint16)
        return z, z, z
    maxc = int(cnt.max())
    heights = np.zeros((G, 5))
    npos = np.zeros((G, 5))                  # actual marker positions
    dpos = np.array([0.0, 0.25, 0.5, 0.75, 1.0])  # desired increments, p=.5
    desired = np.zeros((G, 5))
    mean_imm = np.zeros(G)
    var_it = np.zeros(G)
    total = np.zeros(G, np.int64)            # exact sum; wrapped at the end
    for t in range(maxc):
        act = cnt > t
        x = p_s[np.minimum(sbe + t, p_s.shape[0] - 1)].astype(np.float64)
        c = t + 1
        # iterative mean/variance (boost immediate_mean / variance_impl)
        mean_new = (mean_imm * t + x) / c
        if c > 1:
            tmp = x - mean_new
            var_new = var_it * ((c - 1) / c) + tmp * tmp / (c - 1)
            var_it = np.where(act, var_new, var_it)
        mean_imm = np.where(act, mean_new, mean_imm)
        total = np.where(act, total + x.astype(np.int64), total)
        # P-square median markers
        if t < 5:
            heights[act, t] = x[act]
            if t == 4:
                rows = act
                heights[rows] = np.sort(heights[rows], axis=1)
                npos[rows] = np.arange(1, 6)
                desired[rows] = np.arange(1.0, 6.0)
        else:
            a = act
            xa = x
            # locate the sample's cell k in 0..3; extreme samples move
            # the end markers
            below = a & (xa < heights[:, 0])
            heights[below, 0] = xa[below]
            above = a & (xa >= heights[:, 4])
            heights[above, 4] = xa[above]
            k = np.clip((heights[:, :4].T <= xa).T.sum(axis=1) - 1, 0, 3)
            k = np.where(below, 0, np.where(above, 3, k))
            bump = (np.arange(5) > k[:, None]) & a[:, None]
            npos += bump
            desired += np.where(a[:, None], dpos, 0.0)
            for i in (1, 2, 3):
                d = desired[:, i] - npos[:, i]
                move = a & (((d >= 1) & (npos[:, i + 1] - npos[:, i] > 1))
                            | ((d <= -1) & (npos[:, i - 1] - npos[:, i] < -1)))
                s = np.sign(d)
                nim, ni, nip = npos[:, i - 1], npos[:, i], npos[:, i + 1]
                qim, qi, qip = heights[:, i - 1], heights[:, i], heights[:, i + 1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    qp = qi + s / (nip - nim) * (
                        (ni - nim + s) * (qip - qi) / (nip - ni)
                        + (nip - ni - s) * (qi - qim) / (ni - nim))
                    lin = qi + s * np.where(
                        s >= 0, (qip - qi) / (nip - ni),
                        (qim - qi) / (nim - ni))
                use_p = (qim < qp) & (qp < qip)
                qnew = np.where(use_p, qp, lin)
                heights[:, i] = np.where(move, qnew, heights[:, i])
                npos[:, i] = np.where(move, ni + s, ni)
    median = heights[:, 2]
    # kept groups always have cnt >= 1; guard anyway so a zero-count
    # group degrades to 0 instead of a divide warning + undefined cast
    # (matches _finalize_stats_np's safe-count convention)
    mean = (total % 65536) / np.maximum(cnt, 1)        # ushort-wrapped sum
    var_it = np.where(cnt > 1, var_it, 0.0)
    to16 = lambda v: (v.astype(np.int64) & 0xFFFF).astype(np.uint16)  # noqa: E731
    return to16(np.floor(mean)), to16(np.floor(median)), to16(np.floor(var_it))


def _finalize_stats_jax(best_count, s_best, sq_hi, sq_lo, med_lo, med_hi):
    """Device twin of _finalize_stats_np, exact in 32-bit limb arithmetic
    (TPU has no int64): mean floor, exact median, exact variance floor,
    each truncated to 16 bits.

    Domain: x = protein_length <= 65535 and <= 32767 occurrences per
    (k-mer, function) — the same bounds the scan's 16-bit split
    sum-of-squares channels already assume (FIDELITY.md).  d2 =
    sum(x^2) - 2*c*sum(x) + n*c^2 is carried in three base-2^16 limbs
    (<= 48 bits); the variance floor division runs as base-2^12 long
    division (4 steps, partial values < 2^27), using
    floor((n*d2 - r^2)/n^2) = (d2 // n) - [ (d2 % n)*n < r^2 ].
    """
    import jax.numpy as jnp

    def u(x):
        return x.astype(jnp.uint32)

    m16 = jnp.uint32(0xFFFF)
    nb = u(jnp.maximum(best_count, 1))  # compaction padding guard
    sb = u(s_best)
    c = sb // nb
    r = sb - c * nb
    mean16 = c & m16
    median16 = ((u(med_lo) + u(med_hi)) >> jnp.uint32(1)) & m16

    # P = sq + n*c^2 and M = 2*c*sb, accumulated in two uint32 lanes of
    # weight 2^0 / 2^16 (every partial product is < 2^32 on the domain
    # above), then normalized to three 16-bit limbs
    c2 = c * c
    p0 = u(sq_lo) + nb * (c2 & m16)
    p1 = u(sq_hi) + nb * (c2 >> 16)
    P0 = p0 & m16
    pt = p1 + (p0 >> 16)
    P1 = pt & m16
    P2 = pt >> 16
    s2 = sb * jnp.uint32(2)
    m0 = c * (s2 & m16)
    m1 = c * (s2 >> 16)
    M0 = m0 & m16
    mt = m1 + (m0 >> 16)
    M1 = mt & m16
    M2 = mt >> 16

    # d2 = P - M with borrows (mathematically >= 0)
    i32 = jnp.int32
    b0 = P0.astype(i32) - M0.astype(i32)
    b1 = P1.astype(i32) - M1.astype(i32) - (b0 < 0).astype(i32)
    b2 = P2.astype(i32) - M2.astype(i32) - (b1 < 0).astype(i32)
    L0 = u(b0 & 0xFFFF)
    L1 = u(b1 & 0xFFFF)
    L2 = u(b2 & 0xFFFF)

    # q = d2 // nb, rem = d2 % nb by base-2^12 long division
    d3 = L2 >> 4
    d2_ = ((L2 & jnp.uint32(0xF)) << 8) | (L1 >> 8)
    d1 = ((L1 & jnp.uint32(0xFF)) << 4) | (L0 >> 12)
    d0 = L0 & jnp.uint32(0xFFF)
    rem = jnp.zeros_like(nb)
    q = jnp.zeros_like(nb)
    for dig in (d3, d2_, d1, d0):
        v = (rem << jnp.uint32(12)) | dig
        qd = v // nb
        rem = v - qd * nb
        q = (q << jnp.uint32(12)) | qd  # uint32 wrap; only low 16 used
    var16 = (q - (rem * nb < r * r).astype(jnp.uint32)) & m16
    return mean16, median16, var16


@dataclasses.dataclass
class KeptKmerArrays:
    """Struct-of-arrays result of a build, sorted by packed k-mer."""

    hi: np.ndarray            # uint32
    lo: np.ndarray            # uint32
    avg_from_end: np.ndarray  # uint16
    function_index: np.ndarray  # uint16
    mean: np.ndarray          # uint16
    median: np.ndarray        # uint16
    var: np.ndarray           # uint16

    def __len__(self):
        return int(self.hi.shape[0])

    def to_table(self, config: TableConfig = TableConfig()):
        """Production table in the configured layout (table/__init__.py)."""
        from ..table import table_from_stats

        return table_from_stats(
            self.hi, self.lo, self.avg_from_end, self.function_index,
            self.mean, self.median, self.var, config)

    def to_linear_table(self, config: TableConfig = TableConfig()) -> KmerTable:
        return KmerTable.from_stats(
            self.hi, self.lo, self.avg_from_end, self.function_index,
            self.mean, self.median, self.var, config)


def _select_signatures_jax(hi, lo, func, off, plen, sid, threshold: float):
    """Device selection pass.  All inputs int32/uint32 1-D of equal length.

    Returns per-entry arrays in kmer-sorted order.  `keep`, `ktotal`,
    `best_count` and `best_func` are full-segment broadcasts (valid at
    every entry); `s_best`, the sum-of-squares channels, the medians and
    `avg_from_end` are valid at k-mer run STARTS, which is where both
    consumers read them (_select_compact_jax, parallel.build_step.
    finalize_sharded).

    Scatter-free: reductions are segmented associative scans (ops/
    segscan.py) instead of segment_sum/min/max + `[segment_id]` gathers —
    random-access ops are transaction-quantized on TPU and made the first
    version of this pass ~6x slower (docs/PERF.md, benchmarks/
    select_bench.py).
    """
    import jax.numpy as jnp
    from jax import lax

    from ..ops import segscan

    n = hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    # sort 1: by (kmer, function, protein_length).  The 48-bit key, the
    # 16-bit function index and the length are packed into two uint32 sort
    # keys — sort cost on TPU grows with both comparator width and payload
    # count, and (hi, lo, func, plen, off, sid) as a 4-key/2-payload sort
    # measures ~1.6x slower than this packed 2-key/2-payload form.
    # k1 = hi(24) | lo_hi(8); k2 = lo_lo(16) | func(16); k3 = plen.
    k1 = (hi << jnp.uint32(8)) | (lo >> jnp.uint32(16))
    k2 = ((lo & jnp.uint32(0xFFFF)) << jnp.uint32(16)) \
        | func.astype(jnp.uint32)
    k1s, k2s, p1, s1 = lax.sort((k1, k2, plen, sid), num_keys=3)
    hi1 = k1s >> jnp.uint32(8)
    lo1 = ((k1s & jnp.uint32(0xFF)) << jnp.uint32(16)) \
        | (k2s >> jnp.uint32(16))
    f1 = (k2s & jnp.uint32(0xFFFF)).astype(jnp.int32)

    def prev(a, fill):
        return jnp.concatenate([jnp.full((1,), fill, a.dtype), a[:-1]])

    kstart = (idx == 0) | (hi1 != prev(hi1, 0)) | (lo1 != prev(lo1, 0))
    pstart = kstart | (f1 != prev(f1, -1))

    # run extents from monotone cumulative ops: a run's start index
    # forward-fills with cummax (idx is increasing), the NEXT run's start
    # index back-fills with a reverse cummin shifted one left.
    nint = jnp.int32(n)

    def run_pos(flags):
        start_pos = lax.cummax(jnp.where(flags, idx, 0))
        nxt = lax.cummin(jnp.where(flags, idx, nint), reverse=True)
        next_start = jnp.concatenate([nxt[1:], jnp.full((1,), nint, nxt.dtype)])
        return start_pos, next_start

    kpos, knext = run_pos(kstart)
    ppos, pnext = run_pos(pstart)
    ktotal = knext - kpos
    pair_count = pnext - ppos

    # best function per kmer: max pair count, ties -> lowest function index
    # (ref iterates an ordered map replacing only on strictly greater
    # counts, signature_build.tcc:228-248)
    best_count = segscan.seg_bcast(jnp.maximum, kstart, pair_count)
    cand = jnp.where(pair_count == best_count, f1, BIG_I32)
    best_func = segscan.seg_bcast(jnp.minimum, kstart, cand)

    # 80% rule in float32, exactly as the reference compares
    # (signature_build.tcc:250-257)
    keep = ~(best_count.astype(jnp.float32)
             < ktotal.astype(jnp.float32) * jnp.float32(threshold))

    # statistics over the best-function pair (contiguous, plen-sorted):
    # one reverse (suffix) multi-lane scan, read at run starts.  The
    # variance is derived on the host from sum(x) and sum(x^2); x^2 can
    # reach 65535^2 > int32, so it is split into 16-bit channels (each
    # sum int32-safe to 32767 occurrences), recombined in int64.
    is_best = f1 == best_func
    pu = lax.bitcast_convert_type(p1, jnp.uint32)
    sq = pu * pu
    zero = jnp.int32(0)
    start_best, s_best, sum_sq_hi, sum_sq_lo = segscan.seg_scan(
        (jnp.minimum, jnp.add, jnp.add, jnp.add), kstart,
        jnp.where(is_best, ppos, nint),
        jnp.where(is_best, p1, zero),
        jnp.where(is_best, (sq >> 16).astype(jnp.int32), zero),
        jnp.where(is_best, (sq & jnp.uint32(0xFFFF)).astype(jnp.int32), zero),
        reverse=True)

    # median rank selection inside the best pair (valid at run starts)
    med_lo = p1[jnp.clip(start_best + (best_count - 1) // 2, 0, n - 1)]
    med_hi = p1[jnp.clip(start_best + best_count // 2, 0, n - 1)]

    # sort 2: by (kmer, offset) for avg_from_end = upper median of ALL
    # offsets (signature_build.tcc:281-282).  offsets are 16-bit by
    # construction (masked in extraction), so the whole sort packs into
    # two uint32 key words with no payload.
    q2 = ((lo & jnp.uint32(0xFFFF)) << jnp.uint32(16)) \
        | off.astype(jnp.uint32)
    _q1s, q2s = lax.sort((k1, q2), num_keys=2)
    o2 = (q2s & jnp.uint32(0xFFFF)).astype(jnp.int32)
    avg_from_end = o2[jnp.clip(kpos + ktotal // 2, 0, n - 1)]

    return (hi1, lo1, s1, kstart, keep, best_func, ktotal, best_count,
            s_best, sum_sq_hi, sum_sq_lo, med_lo, med_hi, avg_from_end)


def _select_compact_jax(hi, lo, func, off, plen, sid, threshold: float):
    """Selection + device finalization + device-side compaction.

    Returns (n_rep, n_uniq_sids, words (n, 4) uint32, uniq_sids): each
    kept representative is finalized on device (_finalize_stats_jax) and
    bit-packed into FOUR words —
      w0 = hi(24) | lo[23:16];  w1 = lo[15:0] | func(16)
      w2 = mean(16) | median(16);  w3 = var(16) | avg_from_end(16)
    — so the host fetches ONE contiguous 16 B/rep block instead of ten
    int32 arrays (40 B/rep); on a link-attached chip that transfer is
    the bulk of build time once the corpus upload is packed.
    """
    import jax.numpy as jnp
    from jax import lax

    (hi1, lo1, s1, kstart, keep, best_func, _ktotal, best_count,
     s_best, sq_hi, sq_lo, med_lo, med_hi, avg) = _select_signatures_jax(
        hi, lo, func, off, plen, sid, threshold)

    n = hi1.shape[0]
    # drop SENTINEL padding groups (device extraction masks invalid
    # windows to 0xFFFFFF words; valid words are <= 0xCF3CF3)
    keep = keep & (hi1 != jnp.uint32(0xFFFFFF))
    reps = kstart & keep
    pos = jnp.cumsum(reps.astype(jnp.int32)) - 1
    n_rep = reps.astype(jnp.int32).sum()
    tgt = jnp.where(reps, pos, jnp.int32(n))  # out of bounds -> dropped

    mean16, median16, var16 = _finalize_stats_jax(
        best_count, s_best, sq_hi, sq_lo, med_lo, med_hi)
    m16 = jnp.uint32(0xFFFF)
    w0 = (hi1 << jnp.uint32(8)) | (lo1 >> jnp.uint32(16))
    w1 = ((lo1 & m16) << jnp.uint32(16)) \
        | (best_func.astype(jnp.uint32) & m16)
    w2 = (mean16 << jnp.uint32(16)) | median16
    w3 = (var16 << jnp.uint32(16)) | (avg.astype(jnp.uint32) & m16)
    vals = jnp.stack([w0, w1, w2, w3], axis=1)  # (n, 4)
    words = jnp.zeros((n, 4), jnp.uint32).at[tgt].set(vals, mode="drop")

    # unique kept sequence ids (seqs_with_a_signature counter,
    # ref: signature_build.h:44-50): sort + boundary compaction
    big = jnp.int32(0x7FFFFFFF)
    ks = lax.sort(jnp.where(keep, s1, big))
    first = (ks != jnp.concatenate([jnp.full((1,), -1, ks.dtype),
                                    ks[:-1]])) & (ks != big)
    posu = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_uniq = first.astype(jnp.int32).sum()
    tgtu = jnp.where(first, posu, jnp.int32(n))
    uniq = jnp.zeros(n, ks.dtype).at[tgtu].set(ks, mode="drop")

    return n_rep, n_uniq, words, uniq


SENTINEL_WORD = 0xFFFFFF  # > max valid packed word 0xCF3CF3 (4x code 51)


def _extract_windows_jax(packed_rows, starts, fidxs, plens, sids):
    """Device window extraction from the packed corpus transfer format.

    packed_rows: flat (R*16,) uint8 codes, every sequence 16-code
    aligned (ops/kmer_pack.pack_u8_rows; see there for why the build
    ships 8-bit while the caller ships 6-bit); starts: (Bg,) int32
    aligned start position per sequence (out-of-range for padding
    entries); fidxs/plens/sids: (Bg,) int32 per-seq metadata.

    The corpus crosses the link packed (1 B/residue) instead of as
    24 B/window attribute tuples — on a link-attached chip the old
    upload dominated the whole build (docs/PERF.md).  Per-window
    attributes are reconstructed with ONE B-sized scatter + a 4-lane
    forward segmented scan (forward fill from sequence starts); there are
    no per-residue gathers anywhere.

    Returns (hi, lo, func, off, plen, sid), each (R*16,); invalid window
    slots carry SENTINEL_WORD keys and zeroed attributes.
    """
    import jax.numpy as jnp

    from ..ops import kmer_pack, segscan

    codes = packed_rows                              # (n,) = (R*16,)
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    bnd = jnp.zeros(n, jnp.bool_).at[starts].set(True, mode="drop")

    def at_starts(vals):
        return jnp.zeros(n, vals.dtype).at[starts].set(vals, mode="drop")

    # forward fill per-seq values from sequence starts: values are >= 0
    # and non-start positions hold 0, so a segmented running max is a
    # forward fill.  starts[0] == 0 always (first sequence), so every
    # position belongs to a segment.
    fidx_w, plen_w, sid_w, start_ff = segscan.seg_scan(
        (jnp.maximum, jnp.maximum, jnp.maximum, jnp.maximum), bnd,
        at_starts(fidxs), at_starts(plens), at_starts(sids),
        at_starts(starts))

    # start_ff is unique per sequence -> serves as the seq id for the
    # boundary check; 16-alignment padding has INVALID codes, so windows
    # touching it fail the all-AA test.
    hi, lo, valid = kmer_pack.pack_flat_windows(codes, start_ff)

    off = (plen_w - (idx - start_ff)) & jnp.int32(0xFFFF)
    sen = jnp.uint32(SENTINEL_WORD)
    zero = jnp.int32(0)
    return (jnp.where(valid, hi, sen), jnp.where(valid, lo, sen),
            jnp.where(valid, fidx_w, zero), jnp.where(valid, off, zero),
            jnp.where(valid, plen_w, zero), jnp.where(valid, sid_w, zero))


def _extract_select_jax(packed_rows, starts, fidxs, plens, sids,
                        threshold: float):
    """Device window extraction fused with the compact selection pass
    (single-chip build; the mesh twin is parallel.build_step.
    build_step_from_seqs)."""
    import jax

    # the barrier materializes the extraction outputs once; without it
    # XLA re-fuses the window shifts + segmented forward fill into every
    # consumer inside the selection sorts/scans, multiplying generated
    # code (docs/PERF.md "build program compile")
    hi, lo, func, off, plen, sid = jax.lax.optimization_barrier(
        _extract_windows_jax(packed_rows, starts, fidxs, plens, sids))
    return _select_compact_jax(hi, lo, func, off, plen, sid, threshold)


def _extract_windows_np(codes, fidxs, plens, sids, k: int):
    """Host (numpy) window extraction from a concatenated corpus.

    Twin of _extract_windows_jax for the --host-only path: same validity
    rule (all K residues in the 20-AA whitelist, window fully inside one
    sequence; ref: signature_build.h:102-103, signature_build.tcc:162-180)
    and the same offset definition (distance from window start to protein
    end, truncated to uint16; ref: signature_build.tcc:164).  Returns only
    the VALID windows as (hi, lo, func, off, plen, sid).
    """
    from ..core import alphabet

    if k != alphabet.K:
        raise ValueError(f"packed extraction requires k == {alphabet.K}")
    n = int(codes.shape[0])
    B = int(plens.shape[0])
    e32 = np.zeros(0, np.uint32)
    e_i32 = np.zeros(0, np.int32)
    if n < k or B == 0:
        return e32, e32, e_i32, e_i32, e_i32, e_i32
    p64 = plens.astype(np.int64)
    starts = np.zeros(B, np.int64)
    np.cumsum(p64[:-1], out=starts[1:])
    seq_ord = np.repeat(np.arange(B, dtype=np.int64), p64)

    W = n - k + 1
    c = codes.astype(np.uint32)
    hi = (c[0:W] << 18) | (c[1:W + 1] << 12) | (c[2:W + 2] << 6) | c[3:W + 3]
    lo = (c[4:W + 4] << 18) | (c[5:W + 5] << 12) \
        | (c[6:W + 6] << 6) | c[7:W + 7]

    is_aa = alphabet.CODE_IS_AA[codes]
    cc = np.zeros(n + 1, np.int64)
    np.cumsum(is_aa, out=cc[1:])
    all_aa = (cc[k:] - cc[:-k]) == k            # (W,)
    in_seq = seq_ord[:W] == seq_ord[k - 1:]     # first/last residue same seq
    widx = np.nonzero(all_aa & in_seq)[0]

    so = seq_ord[widx]
    off = (p64[so] - (widx - starts[so])) & 0xFFFF
    return (hi[widx], lo[widx], fidxs[so].astype(np.int32),
            off.astype(np.int32), plens[so].astype(np.int32),
            sids[so].astype(np.int32))


def _select_np(hi, lo, func, off, plen, sid, threshold: float,
               p2_stats: bool = False):
    """Host (numpy) twin of _select_compact_jax.

    Identical selection semantics — same (kmer, function, plen) sort,
    the same float32 80%% compare (signature_build.tcc:250-257), ties to
    the lowest function index (:228-248), and the same exact statistics
    finalization (_finalize_stats_np).  Used by the --host-only build and
    as a differential oracle for the device pass.

    p2_stats=True switches mean/median/var to the reference's
    boost-accumulator semantics (_p2_boost_stats_np) — the k-mer set,
    function_index and avg_from_end columns are unchanged (avg_from_end
    is an exact sorted median in the reference too,
    signature_build.tcc:280-281).

    Returns (KeptKmerArrays, kept_entry_sids): the kept signatures sorted
    by packed k-mer, plus the unique sequence ids contributing to any
    kept k-mer (seqs_with_a_signature, ref: signature_build.h:44-50).
    """
    hi = np.asarray(hi, dtype=np.uint32)
    lo = np.asarray(lo, dtype=np.uint32)
    func = np.asarray(func)
    off = np.asarray(off)
    plen = np.asarray(plen)
    sid = np.asarray(sid)

    def empty():
        e16 = np.zeros(0, dtype=np.uint16)
        e32 = np.zeros(0, dtype=np.uint32)
        return (KeptKmerArrays(e32, e32, e16, e16, e16, e16, e16),
                np.zeros(0, dtype=np.int64))

    n = int(hi.shape[0])
    if n == 0:
        return empty()

    key = (hi.astype(np.uint64) << np.uint64(24)) | lo.astype(np.uint64)
    order = np.lexsort((plen, func, key))
    k_s = key[order]
    f_s = func[order].astype(np.int64)
    p_s = plen[order].astype(np.int64)
    s_s = sid[order]

    kstart = np.empty(n, dtype=bool)
    kstart[0] = True
    np.not_equal(k_s[1:], k_s[:-1], out=kstart[1:])
    pstart = kstart.copy()
    pstart[1:] |= f_s[1:] != f_s[:-1]

    gid = np.cumsum(kstart) - 1                        # kmer group per entry
    gstart_idx = np.nonzero(kstart)[0]
    ktotal = np.diff(np.append(gstart_idx, n))
    pstart_idx = np.nonzero(pstart)[0]
    pair_count = np.diff(np.append(pstart_idx, n))

    pair_is_gstart = kstart[pstart_idx]
    gstart_pairs = np.nonzero(pair_is_gstart)[0]
    pair_gid = np.cumsum(pair_is_gstart) - 1
    best_count = np.maximum.reduceat(pair_count, gstart_pairs)
    # ties -> lowest function index; pairs are func-sorted within a group,
    # so the first pair achieving the max count has the lowest index
    cand = pair_count == best_count[pair_gid]
    npairs = pair_count.shape[0]
    best_pair = np.minimum.reduceat(
        np.where(cand, np.arange(npairs, dtype=np.int64), np.int64(npairs)),
        gstart_pairs)
    best_func = f_s[pstart_idx[best_pair]]

    keep = ~(best_count.astype(np.float32)
             < ktotal.astype(np.float32) * np.float32(threshold))
    if not keep.any():
        return empty()

    # statistics over the best-function run (contiguous, plen-sorted)
    sbe = pstart_idx[best_pair]
    cnt = best_count
    cs = np.zeros(n + 1, np.int64)
    np.cumsum(p_s, out=cs[1:])
    s_best = cs[sbe + cnt] - cs[sbe]
    csq = np.zeros(n + 1, np.int64)
    np.cumsum(p_s * p_s, out=csq[1:])
    sumsq = csq[sbe + cnt] - csq[sbe]
    med_lo = p_s[sbe + (cnt - 1) // 2]
    med_hi = p_s[sbe + cnt // 2]
    if p2_stats:
        mean16, median16, var16 = _p2_boost_stats_np(p_s, sbe, cnt)
    else:
        mean16, median16, var16 = _finalize_stats_np(
            cnt, s_best, sumsq >> 16, sumsq & 0xFFFF, med_lo, med_hi)

    # avg_from_end = upper median of ALL offsets in the kmer group
    # (signature_build.tcc:281-282); lexsort is stable and the primary key
    # is identical, so group boundaries land at the same indices
    o2 = np.asarray(off)[np.lexsort((off, key))].astype(np.int64)
    avg = o2[gstart_idx + ktotal // 2]

    kk = k_s[gstart_idx][keep]
    out = KeptKmerArrays(
        hi=(kk >> np.uint64(24)).astype(np.uint32),
        lo=(kk & np.uint64(0xFFFFFF)).astype(np.uint32),
        avg_from_end=(avg[keep] & 0xFFFF).astype(np.uint16),
        function_index=(best_func[keep] & 0xFFFF).astype(np.uint16),
        mean=mean16[keep],
        median=median16[keep],
        var=var16[keep],
    )
    kept_sids = np.unique(s_s[keep[gid]])
    return out, kept_sids


def _grid(x: int, lo: int = 256) -> int:
    """Pad to a pow2 / 1.5*pow2 grid so jit compiles O(log n) variants."""
    g = lo
    while g < x:
        g <<= 1
    if g > lo and (g >> 1) + (g >> 2) >= x:
        g = (g >> 1) + (g >> 2)
    return g


class SignatureBuilder:
    """End-to-end builder: metadata -> extraction -> device selection."""

    def __init__(self, config: BuildConfig = BuildConfig(),
                 kept_log_path=None, use_device: bool = True):
        self.config = config
        self.fm = FunctionMap(kept_log_path)
        self.all_fasta_files: list[Path] = []
        self.use_device = use_device
        self.stats = BuildStats()
        # raw corpus chunks: (codes u8, sids i32, fidxs i32, plens i32)
        self._seq_chunks: list[tuple] = []

    # -- metadata (host; mirrors golden) -----------------------------------

    def load_function_data(self, good_functions, good_roles, definition_files):
        self.fm.add_good_roles(good_roles)
        self.fm.add_good_functions(good_functions)
        for f in definition_files:
            self.fm.load_id_assignments(f)

    def load_fasta(self, fasta_files, keep_functions: bool, deleted_fids: set[str]):
        for f in fasta_files:
            self.fm.load_fasta_file(f, keep_functions, deleted_fids)
            self.all_fasta_files.append(Path(f))

    def process_kept_functions(self, ignored_functions: set[str]):
        self.fm.process_kept_functions(self.config.min_reps_required,
                                       ignored_functions)

    # -- extraction --------------------------------------------------------

    def extract_kmers(self, deleted_fids: set[str],
                      checkpoint_dir=None):
        """Vectorized window extraction per file (ref: signature_build.tcc:
        48-181).  Sequence ids are file_number * max_seqs_per_file + n.

        With checkpoint_dir, each input file's extracted attribute arrays
        are persisted and re-loaded on restart — a killed build resumes at
        the first unextracted file (the reference restarts from zero; cf.
        the folder CLI's output-existence restartability,
        kmers-matrix-distance-folder.cc:113-116)."""
        k = self.config.k
        ckpt = Path(checkpoint_dir) if checkpoint_dir else None
        if ckpt:
            ckpt.mkdir(parents=True, exist_ok=True)
        for file_number, path in enumerate(self.all_fasta_files):
            if ckpt:
                cfile = ckpt / f"extract_{file_number:06d}.npz"
                if cfile.is_file():
                    z = np.load(cfile)
                    if z["plens"].shape[0]:
                        self._seq_chunks.append(tuple(
                            z[k2] for k2 in ("codes", "sids", "fidxs",
                                             "plens")))
                    for fi, cnt in zip(z["stat_func"], z["stat_count"]):
                        self.stats.seqs_with_func[int(fi)] = \
                            self.stats.seqs_with_func.get(int(fi), 0) + int(cnt)
                    continue
                before = len(self._seq_chunks)
                stats_before = dict(self.stats.seqs_with_func)
                self._extract_file(file_number, path, deleted_fids, k)
                new = self._seq_chunks[before:]
                if new:
                    codes, sids, fidxs, plens = new[0]
                else:
                    codes = np.zeros(0, np.uint8)
                    sids = fidxs = plens = np.zeros(0, np.int32)
                delta = {fi: cnt - stats_before.get(fi, 0)
                         for fi, cnt in self.stats.seqs_with_func.items()
                         if cnt != stats_before.get(fi, 0)}
                np.savez(cfile, codes=codes, sids=sids, fidxs=fidxs,
                         plens=plens,
                         stat_func=np.asarray(list(delta), np.int32),
                         stat_count=np.asarray(list(delta.values()),
                                               np.int32))
                continue
            self._extract_file(file_number, path, deleted_fids, k)

    def _extract_file(self, file_number, path, deleted_fids, k):
        """Collect the file's kept sequences as one raw chunk (flat codes
        + per-seq metadata).  Window extraction happens later, on device:
        fused with selection single-chip (_select_from_seqs) or per dp
        shard on a mesh (parallel.build_step.build_step_from_seqs)."""
        seqs = []
        next_id = file_number * self.config.max_seqs_per_file
        batch = fasta_io.read_fasta_batch(path)
        for i in range(len(batch)):
            sid_str = batch.ids[i]
            if not sid_str or sid_str in deleted_fids:
                continue
            func = self.fm.lookup_function(sid_str)
            if not func:
                continue  # no id consumed (signature_build.tcc:133-136)
            sid = next_id
            next_id += 1
            fidx = self.fm.lookup_index(func)
            if fidx == UNDEFINED_FUNCTION:
                continue  # id consumed (signature_build.tcc:138-158)
            self.stats.seqs_with_func[fidx] = \
                self.stats.seqs_with_func.get(fidx, 0) + 1
            seqs.append((sid, fidx,
                         batch.codes[batch.offsets[i]:batch.offsets[i + 1]]))
        if not seqs:
            return
        codes = (np.concatenate([c for _, _, c in seqs])
                 if seqs else np.zeros(0, np.uint8)).astype(np.uint8, copy=False)
        sids = np.asarray([s for s, _, _ in seqs], dtype=np.int32)
        fidxs = np.asarray([f for _, f, _ in seqs], dtype=np.int32)
        plens = np.asarray([len(c) for _, _, c in seqs], dtype=np.int32)
        self._seq_chunks.append((codes, sids, fidxs, plens))

    # -- selection ---------------------------------------------------------

    def process_kmers(self, mesh=None) -> KeptKmerArrays:
        """Selection pass; with a mesh, windows are dp-sharded and routed
        to k-mer owner shards with all-to-all (parallel/build_step.py)."""
        chunks = self._seq_chunks
        self._seq_chunks = []

        def empty():
            e16 = np.zeros(0, dtype=np.uint16)
            e32 = np.zeros(0, dtype=np.uint32)
            return KeptKmerArrays(e32, e32, e16, e16, e16, e16, e16)

        if not chunks:
            return empty()
        if mesh is not None and self.config.p2_stats:
            # p2 fidelity mode is host-only: the P-square recurrence is
            # specified in float64 (boost uses double) and TPUs have no
            # native f64, so a device twin could not honor the bit-compat
            # contract (see _p2_boost_stats_np / FIDELITY.md).
            import logging
            logging.getLogger(__name__).warning(
                "--p2-stats forces the host selection path; the mesh is "
                "ignored for this build (P-square fidelity requires "
                "float64, unavailable on TPU)")
            mesh = None
        if mesh is not None:
            cat = self._concat_chunks(chunks)
            if cat is None:
                return empty()
            return self._select_sharded(mesh, *cat)
        return self._select_from_seqs(chunks)

    def _select_sharded(self, mesh, codes, sids, fidxs, plens) -> KeptKmerArrays:
        """Mesh selection from raw chunks: the corpus is dp-sharded in
        the same packed-row transfer format as the single-chip path,
        extracted on device per shard, then k-mer-routed with all-to-all
        (parallel/build_step.py)."""
        from ..parallel import build_step

        outs = build_step.build_step_from_seqs(
            mesh, codes, sids, fidxs, plens,
            threshold=self.config.signature_threshold)
        kept = build_step.finalize_sharded(outs)
        out = KeptKmerArrays(**kept)
        self.stats.distinct_signatures = len(out)
        bf, cnt = np.unique(out.function_index, return_counts=True)
        self.stats.distinct_functions = dict(zip(bf.tolist(), cnt.tolist()))
        # seqs_with_a_signature over kept entries (outs: hi1, lo1, s1,
        # kstart, keep, ... per _select_signatures_jax)
        from ..parallel.distributed import fetch_global

        hi1 = fetch_global(outs[0])
        s1 = fetch_global(outs[2])
        keep_entry = fetch_global(outs[4]) & (hi1 != build_step.SENTINEL)
        self.stats.seqs_with_a_signature = set(
            np.unique(s1[keep_entry]).tolist())
        return out

    def _concat_chunks(self, chunks):
        """Concatenate raw chunks, dropping sequences too short for a
        window (so every packed sequence owns >= 1 row, giving distinct
        aligned starts).  Returns (codes, sids, fidxs, plens) or None."""
        k = self.config.k
        codes_l, sids_l, fidxs_l, plens_l = [], [], [], []
        for codes, sids, fidxs, plens in chunks:
            short = plens < k
            if short.any():
                starts = np.zeros(plens.shape[0], np.int64)
                np.cumsum(plens[:-1], out=starts[1:])
                kidx = np.nonzero(~short)[0]
                codes = (np.concatenate(
                    [codes[starts[i]:starts[i] + plens[i]] for i in kidx])
                    if kidx.size else np.zeros(0, np.uint8))
                sids, fidxs, plens = sids[kidx], fidxs[kidx], plens[kidx]
            if plens.shape[0]:
                codes_l.append(codes)
                sids_l.append(sids)
                fidxs_l.append(fidxs)
                plens_l.append(plens)
        if not plens_l:
            return None
        return (np.concatenate(codes_l), np.concatenate(sids_l),
                np.concatenate(fidxs_l), np.concatenate(plens_l))

    def _select_from_seqs(self, chunks) -> KeptKmerArrays:
        """Single-device selection from raw chunks: the corpus goes up
        8-bit packed + 16 B of metadata per SEQUENCE, windows are
        extracted on device (_extract_select_jax).  The previous design
        uploaded 24 B per WINDOW — ~30x more link traffic, which
        dominated the build end-to-end on a link-attached chip."""
        cat = self._concat_chunks(chunks)
        if cat is None:
            e16 = np.zeros(0, dtype=np.uint16)
            e32 = np.zeros(0, dtype=np.uint32)
            return KeptKmerArrays(e32, e32, e16, e16, e16, e16, e16)
        codes, sids, fidxs, plens = cat

        if not self.use_device or self.config.p2_stats:
            # p2_stats: the P-square recurrence is sequential per group —
            # a host-side fidelity mode, not a device path (FIDELITY.md)
            win = _extract_windows_np(codes, fidxs, plens, sids,
                                      self.config.k)
            out, kept_sids = _select_np(
                *win, threshold=self.config.signature_threshold,
                p2_stats=self.config.p2_stats)
            return self._finalize_host(out, kept_sids)

        import jax

        from ..ops import kmer_pack

        B = plens.shape[0]
        offsets = np.zeros(B + 1, np.int64)
        np.cumsum(plens, out=offsets[1:])
        spans = -(-plens.astype(np.int64) // kmer_pack.ALIGN)
        row_start = np.zeros(B + 1, np.int64)
        np.cumsum(spans, out=row_start[1:])
        R = _grid(int(row_start[-1]))
        packed = kmer_pack.pack_u8_rows(codes, offsets, plens, row_start, R)
        n = R * kmer_pack.ALIGN
        Bg = _grid(B)
        starts16 = np.full(Bg, n, np.int32)  # out of range -> dropped
        starts16[:B] = row_start[:-1] * kmer_pack.ALIGN
        meta = np.zeros((3, Bg), np.int32)
        meta[0, :B] = fidxs
        meta[1, :B] = plens
        meta[2, :B] = sids
        sel = jax.jit(_extract_select_jax, static_argnames=("threshold",))(
            packed, starts16, meta[0], meta[1], meta[2],
            threshold=self.config.signature_threshold)
        return self._finalize_compact(sel)

    def _select(self, hi, lo, func, off, plen, sid) -> KeptKmerArrays:
        """Selection from pre-extracted window attribute arrays (mesh
        fallback and the fuzz tests' direct entry point)."""
        import jax

        thresh = self.config.signature_threshold
        if not self.use_device or self.config.p2_stats:
            out, kept_sids = _select_np(hi, lo, func, off, plen, sid,
                                        threshold=thresh,
                                        p2_stats=self.config.p2_stats)
            return self._finalize_host(out, kept_sids)

        sel = jax.jit(_select_compact_jax, static_argnames=("threshold",))(
            hi, lo, func, off, plen, sid, threshold=thresh)
        return self._finalize_compact(sel)

    def _finalize_host(self, out: KeptKmerArrays, kept_sids) -> KeptKmerArrays:
        """Record build statistics for the numpy selection result
        (host twin of the tail of _finalize_compact)."""
        self.stats.distinct_signatures = len(out)
        bf, cnt = np.unique(out.function_index, return_counts=True)
        self.stats.distinct_functions = dict(zip(bf.tolist(), cnt.tolist()))
        self.stats.seqs_with_a_signature = set(
            int(x) for x in kept_sids.tolist())
        return out

    def _finalize_compact(self, sel) -> KeptKmerArrays:
        """Fetch the device-compacted, device-finalized selection result.

        Only the kept representatives (16 B each, one contiguous block)
        and the unique kept sequence ids come back to the host — the
        full per-entry arrays are 14 x n words, which measured ~1.1 GB
        for a 20M-window build on a link-attached chip."""
        n_rep = int(sel[0])
        n_uniq = int(sel[1])

        def fetch(dev_arr, m):
            # slice on a sparse size grid so the slice program compiles
            # O(log n) times, then trim on the host
            if m == 0:
                return np.zeros((0,) + dev_arr.shape[1:], dev_arr.dtype)
            g = min(_grid(m, lo=1024), dev_arr.shape[0])
            return np.asarray(dev_arr[:g])[:m]

        w = fetch(sel[2], n_rep)
        uniq_sids = fetch(sel[3], n_uniq)
        w0, w1, w2, w3 = (w[:, i] for i in range(4))

        out = KeptKmerArrays(
            hi=w0 >> 8,
            lo=((w0 & 0xFF) << 16) | (w1 >> 16),
            avg_from_end=(w3 & 0xFFFF).astype(np.uint16),
            function_index=(w1 & 0xFFFF).astype(np.uint16),
            mean=(w2 >> 16).astype(np.uint16),
            median=(w2 & 0xFFFF).astype(np.uint16),
            var=(w3 >> 16).astype(np.uint16),
        )
        # already sorted by (hi, lo) from the device sort
        self.stats.distinct_signatures = len(out)
        bf, cnt = np.unique(out.function_index, return_counts=True)
        self.stats.distinct_functions = dict(
            zip(bf.tolist(), cnt.tolist()))
        self.stats.seqs_with_a_signature = set(uniq_sids.tolist())
        return out
