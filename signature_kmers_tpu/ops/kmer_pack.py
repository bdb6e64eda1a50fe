"""Device rolling k-mer extraction over padded sequence batches.

Vectorized replacement for the reference's per-position scalar loops
(ref: kmer_data.h:76-102 ``for_each_kmer``; signature_build.tcc:162-180
window validation).  Operates on (B, L) uint8 code matrices padded with
INVALID_CODE; every position is a window start, the last K-1 positions and
any window crossing the sequence end are masked invalid.

Outputs stay position-aligned: hi/lo/masks have shape (B, L) so a window's
index is its residue position, exactly the ``offset`` the reference
reports.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import alphabet

K = alphabet.K

# Device-side lookup tables are materialized lazily INSIDE traced
# functions: a module-level jnp.asarray would initialize the backend at
# import time (and hang outright when the TPU link is down).
def _code_is_aa():
    return jnp.asarray(alphabet.CODE_IS_AA)


def _code_is_call_ambig():
    return jnp.asarray(alphabet.CODE_IS_CALL_AMBIG)


def _window_all(flags, L):
    """flags: (..., L) bool; result[..., i] = all(flags[..., i:i+K]),
    with the last K-1 positions False."""
    # cumulative-sum trick: window sum == K
    c = jnp.cumsum(flags.astype(jnp.int32), axis=-1)
    zero = jnp.zeros(flags.shape[:-1] + (1,), dtype=jnp.int32)
    c = jnp.concatenate([zero, c], axis=-1)  # (..., L+1)
    wsum = c[..., K:] - c[..., :-K]          # (..., L-K+1)
    ok = wsum == K
    pad = jnp.zeros(flags.shape[:-1] + (K - 1,), dtype=bool)
    return jnp.concatenate([ok, pad], axis=-1)


def _shift_left(x, j, fill):
    """x shifted left by j along the last axis, padded with fill."""
    B = x.shape[0]
    return jnp.concatenate(
        [x[:, j:], jnp.full((B, j), fill, x.dtype)], axis=1)


@jax.jit
def pack_call_windows(codes, lengths):
    """Minimal call-path variant of pack_windows: (hi, lo, call_valid).

    Uses log-doubling shifts (3 steps) instead of per-offset shifts and a
    cumsum, and arithmetic ambiguity tests instead of table lookups —
    the full pack_windows was measured to dominate the fused caller.
    """
    B, L = codes.shape
    c = codes.astype(jnp.uint32)

    # 4-char words by doubling: d2[j] = c[j]c[j+1]; d4[j] = c[j..j+3]
    d2 = (c << 6) | _shift_left(c, 1, alphabet.INVALID_CODE)
    d4 = (d2 << 12) | _shift_left(d2, 2, 0)
    hi = d4 & jnp.uint32(0xFFFFFF)
    lo = _shift_left(d4, 4, 0) & jnp.uint32(0xFFFFFF)

    # call-side ambiguity: '*' (52) or uppercase 'X' (23), kmer_data.h:82
    ok = (codes != jnp.uint8(alphabet.STAR_CODE)) \
        & (codes != jnp.uint8(alphabet.X_UPPER_CODE))
    w2 = ok & _shift_left(ok, 1, False)
    w4 = w2 & _shift_left(w2, 2, False)
    w8 = w4 & _shift_left(w4, 4, False)
    # the reference's ambiguity jump tests kend >= next_ambig
    # (kmer_data.h:88-90): a window ENDING at an ambiguous char (ambig at
    # p+K) is also skipped — K+1-wide exclusion.  Fill True: beyond the
    # sequence the padding codes are INVALID (not ambiguous), so the final
    # window (p+K == length) stays valid, exactly like the reference.
    w9 = w8 & _shift_left(ok, K, True)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    in_seq = pos + K <= lengths[:, None]
    return hi, lo, w9 & in_seq


@jax.jit
def pack_windows(codes, lengths):
    """codes: (B, L) uint8; lengths: (B,) int32.

    Returns dict with position-aligned (B, L) arrays:
      hi, lo          packed window words (uint32; garbage where invalid)
      in_seq          window lies fully inside the sequence
      build_valid     in_seq and all K residues in the 20-AA set
      call_valid      in_seq and no '*' / uppercase 'X' in the window
    """
    B, L = codes.shape
    c = codes.astype(jnp.uint32)

    def shifted(j):
        # codes shifted left by j, padded with INVALID_CODE
        return jnp.concatenate(
            [c[:, j:], jnp.full((B, j), alphabet.INVALID_CODE, jnp.uint32)],
            axis=1)

    s = [shifted(j) for j in range(K)]
    hi = (s[0] << 18) | (s[1] << 12) | (s[2] << 6) | s[3]
    lo = (s[4] << 18) | (s[5] << 12) | (s[6] << 6) | s[7]

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    in_seq = pos + K <= lengths[:, None]

    is_aa = _code_is_aa()[codes]
    not_ambig = ~_code_is_call_ambig()[codes]
    build_valid = _window_all(is_aa, L) & in_seq
    # K+1-wide call exclusion (see pack_call_windows): the window ending
    # AT an ambiguous char is skipped too; padding codes are INVALID
    # (not ambiguous) so the sequence-final window stays valid
    abut_ok = jnp.concatenate(
        [not_ambig[:, K:], jnp.ones((B, K), dtype=bool)], axis=1)
    call_valid = _window_all(not_ambig, L) & abut_ok & in_seq
    return {"hi": hi, "lo": lo, "in_seq": in_seq,
            "build_valid": build_valid, "call_valid": call_valid}


def pad_batch(batch, max_len: int | None = None, multiple: int = 128):
    """Host helper: SequenceBatch -> (codes (B, L) uint8, lengths (B,) int32).

    Sequences longer than max_len are truncated (documented divergence;
    raise max_len for long proteins).  L is rounded up to ``multiple`` for
    TPU lane alignment.
    """
    lens = batch.lengths
    B = len(batch)
    if max_len is not None:
        tgt = int(max_len)  # fixed shape requested (jit shape stability)
    else:
        tgt = int(lens.max()) if B else multiple
    L = max(multiple, -(-tgt // multiple) * multiple)
    codes = np.full((B, L), alphabet.INVALID_CODE, dtype=np.uint8)
    out_lens = np.minimum(lens, L).astype(np.int32)
    for i in range(B):
        n = out_lens[i]
        codes[i, :n] = batch.codes[batch.offsets[i]:batch.offsets[i] + n]
    return codes, out_lens


def pack_u6_host(codes: np.ndarray) -> np.ndarray:
    """Host: (N,) uint8 6-bit codes (N % 4 == 0) -> (3N/4,) uint8.

    Four 6-bit codes per 3 transferred bytes — cuts the host->device
    residue transfer by 25% (the link, not compute, bounds the caller)."""
    q = codes.reshape(-1, 4).astype(np.uint32)
    w = (q[:, 0] << 18) | (q[:, 1] << 12) | (q[:, 2] << 6) | q[:, 3]
    out = np.empty((q.shape[0], 3), dtype=np.uint8)
    out[:, 0] = w >> 16
    out[:, 1] = (w >> 8) & 0xFF
    out[:, 2] = w & 0xFF
    return out.reshape(-1)


def unpack_u6(packed):
    """Device inverse of pack_u6_host: (3M,) uint8 -> (4M,) uint8 codes."""
    b = packed.reshape(-1, 3).astype(jnp.uint32)
    w = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
    c = jnp.stack([(w >> 18) & 63, (w >> 12) & 63, (w >> 6) & 63, w & 63],
                  axis=1)
    return c.reshape(-1).astype(jnp.uint8)


ALIGN = 16  # codes per transfer row: 16 codes = 96 bits = 3 uint32 words


def pack_u6_rows_host(codes: np.ndarray, offsets: np.ndarray, rows: int,
                      L: int):
    """Host: concatenated codes + offsets -> 16-code-aligned packed rows.

    Each sequence's codes start on a 16-code boundary (INVALID padding in
    between), 6-bit packed MSB-first into one 96-bit row of THREE uint32
    words, so the device can expand the batch with ROW gathers instead of
    per-element gathers: element gathers are transaction-quantized like
    row gathers on TPU (~10ns each; docs/PERF.md), which made the old
    flat expand_flat cost ~15ms per 4096x384 chunk vs ~1ms here.  Word
    rows (not byte rows): strided byte slices of a gathered u8 block made
    XLA re-issue the gather once per byte lane — 3 redundant (B, L/16)
    gathers, ~3.6ms/chunk.

    Returns (packed_rows (R, 3) uint32, start_row (rows,) int32,
    lengths (rows,) int32); R is padded to a pow2/1.5x grid so jit
    compiles once per grid step.  start_row of padding rows points at a
    dedicated all-INVALID row.
    """
    B = offsets.shape[0] - 1
    lens = np.minimum((offsets[1:] - offsets[:-1]), L).astype(np.int32)
    spans = -(-lens // ALIGN)  # 16-code rows per sequence
    row_start = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(spans, out=row_start[1:])
    total_rows = int(row_start[-1]) + 1  # +1 all-INVALID row for padding
    R = 1 << 10
    while R < total_rows:
        R <<= 1
    if R > (1 << 10) and (R >> 1) + (R >> 2) >= total_rows:
        R = (R >> 1) + (R >> 2)
    packed = _pack_u6_rows(codes, offsets, lens, row_start, R)
    start_row = np.full(rows, total_rows - 1, dtype=np.int32)
    start_row[:B] = row_start[:-1]
    lengths = np.zeros(rows, dtype=np.int32)
    lengths[:B] = lens
    return packed, start_row, lengths


def _pack_u6_rows(codes, offsets, lens, row_start, R: int):
    from ..runtime import host

    if host.available():
        # single-pass native packer: this runs per chunk on the caller's
        # critical path (~16 ms/4096-row chunk in numpy, ~1 ms native)
        return host.pack_u6_rows(codes, offsets, lens, row_start, R)
    return _pack_u6_rows_np(codes, offsets, lens, row_start, R)


def pack_u8_rows(codes, offsets, lens, row_start, R: int):
    """Build-corpus transfer format: flat (R*16,) uint8 codes, every
    sequence starting on a 16-code boundary with INVALID padding — the
    same row geometry as the caller's 6-bit rows but NO bit packing.

    The BUILD corpus deliberately ships 8-bit: the 6-bit unpack's 16-way
    stack + interleaving flat reshape made the XLA TPU backend emit
    ~20 MB of code on its own and balloon the fused extract+select build
    program to ~1.1 GB of generated code with a 60-90 s compile (and a
    word-bitcast variant tripped a >20 GB layout-padding OOM).  A flat
    u8 array needs no device unpack at all.  The corpus crosses the link
    ONCE per build, so +33% bytes is noise; the CALLER keeps 6-bit rows
    because query chunks cross the link constantly and their row-gather
    expand (expand_rows16) never flattens, avoiding the reshape.
    """
    flat = np.full(R * ALIGN, alphabet.INVALID_CODE, dtype=np.uint8)
    B = lens.shape[0]
    # per-sequence slice copies: variable-count np.repeat index
    # construction measures ~260 ns/element on the target host (75x a
    # slice loop) — at build scale (90M residues) that was ~20 s of pure
    # index building
    off64 = np.asarray(offsets[:B], np.int64)
    rs64 = row_start[:B].astype(np.int64) * ALIGN
    l64 = lens.astype(np.int64)
    for b in range(B):
        flat[rs64[b]:rs64[b] + l64[b]] = \
            codes[off64[b]:off64[b] + l64[b]]
    return flat


def _pack16_np(flat: np.ndarray) -> np.ndarray:
    """Numpy: (N,) uint8 codes with N % 16 == 0 -> (N/16, 3) uint32
    MSB-first 96-bit rows (the transfer format expand_rows16 inverts;
    do NOT add a flat device unpack of this form — the 16-way interleave
    reshape is the XLA code blowup pack_u8_rows documents)."""
    c = flat.reshape(-1, ALIGN).astype(np.uint32)
    packed = np.empty((c.shape[0], 3), dtype=np.uint32)
    packed[:, 0] = ((c[:, 0] << 26) | (c[:, 1] << 20) | (c[:, 2] << 14)
                    | (c[:, 3] << 8) | (c[:, 4] << 2) | (c[:, 5] >> 4))
    packed[:, 1] = (((c[:, 5] & 15) << 28) | (c[:, 6] << 22)
                    | (c[:, 7] << 16) | (c[:, 8] << 10) | (c[:, 9] << 4)
                    | (c[:, 10] >> 2))
    packed[:, 2] = (((c[:, 10] & 3) << 30) | (c[:, 11] << 24)
                    | (c[:, 12] << 18) | (c[:, 13] << 12) | (c[:, 14] << 6)
                    | c[:, 15])
    return packed


def _pack_u6_rows_np(codes, offsets, lens, row_start, R: int):
    """Numpy spec for the packed row format (host.pack_u6_rows must
    match byte for byte; tests/test_runtime.py asserts it)."""
    B = lens.shape[0]
    flat = np.full(R * ALIGN, alphabet.INVALID_CODE, dtype=np.uint8)
    for b in range(B):
        s = int(offsets[b])
        d = int(row_start[b]) * ALIGN
        flat[d:d + int(lens[b])] = codes[s:s + int(lens[b])]
    return _pack16_np(flat)


def _unpack16(w0, w1, w2):
    """Bit-unpack three MSB-first uint32 words -> 16 6-bit codes, stacked
    on a new trailing axis."""
    m6 = jnp.uint32(63)
    return jnp.stack([
        (w0 >> 26) & m6, (w0 >> 20) & m6, (w0 >> 14) & m6,
        (w0 >> 8) & m6, (w0 >> 2) & m6,
        ((w0 << 4) | (w1 >> 28)) & m6,              # straddles w0/w1
        (w1 >> 22) & m6, (w1 >> 16) & m6, (w1 >> 10) & m6, (w1 >> 4) & m6,
        ((w1 << 2) | (w2 >> 30)) & m6,              # straddles w1/w2
        (w2 >> 24) & m6, (w2 >> 18) & m6, (w2 >> 12) & m6,
        (w2 >> 6) & m6, w2 & m6,
    ], axis=-1)


def expand_rows16(packed_rows, start_row, lengths, L: int):
    """Device inverse of pack_u6_rows_host: ONE row gather + bit unpack.

    packed_rows: (R, 3) uint32; start_row: (B,); lengths: (B,).
    -> (B, L) uint8 codes (INVALID beyond each length, exactly like
    expand_flat) with L % 16 == 0.
    """
    nrow = L // ALIGN
    idx = start_row[:, None] + jnp.arange(nrow, dtype=jnp.int32)[None, :]
    rows = packed_rows[jnp.clip(idx, 0, packed_rows.shape[0] - 1)]
    c = _unpack16(rows[..., 0], rows[..., 1], rows[..., 2])  # (B, nrow, 16)
    codes = c.reshape(c.shape[0], nrow * ALIGN).astype(jnp.uint8)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    return jnp.where(pos < lengths[:, None], codes,
                     jnp.uint8(alphabet.INVALID_CODE))


def expand_flat(flat_codes, offsets, L: int):
    """Device-side padding: flat concatenated codes + offsets -> (B, L)
    matrix padded with INVALID_CODE, plus lengths.  Keeps the host->device
    transfer at the raw corpus size."""
    B = offsets.shape[0] - 1
    starts = offsets[:-1]
    lengths = jnp.minimum(offsets[1:] - starts, L).astype(jnp.int32)
    idx = starts[:, None] + jnp.arange(L, dtype=offsets.dtype)[None, :]
    valid = idx < offsets[1:, None]
    codes = jnp.where(valid,
                      flat_codes[jnp.clip(idx, 0, flat_codes.shape[0] - 1)],
                      jnp.uint8(alphabet.INVALID_CODE))
    return codes, lengths


@functools.partial(jax.jit, static_argnames=())
def pack_flat_windows(codes, seq_ids):
    """Flat-form extraction for the build pipeline.

    codes: (N,) uint8 concatenated corpus; seq_ids: (N,) int32 sequence id
    per residue (padding positions use -1).  A window is in-sequence iff
    its first and last residues share a sequence id.
    Returns (hi, lo, build_valid) of shape (N,) (last 7 garbage/invalid).
    """
    n = codes.shape[0]
    c = codes.astype(jnp.uint32)

    def shifted(arr, j, fill):
        return jnp.concatenate([arr[j:], jnp.full((j,), fill, arr.dtype)])

    s = [shifted(c, j, alphabet.INVALID_CODE) for j in range(K)]
    hi = (s[0] << 18) | (s[1] << 12) | (s[2] << 6) | s[3]
    lo = (s[4] << 18) | (s[5] << 12) | (s[6] << 6) | s[7]

    last_ids = shifted(seq_ids, K - 1, -1)
    in_seq = (seq_ids == last_ids) & (seq_ids >= 0)

    is_aa = _code_is_aa()[codes]
    c2 = jnp.cumsum(is_aa.astype(jnp.int32))
    c2 = jnp.concatenate([jnp.zeros((1,), jnp.int32), c2])
    tail = jnp.full((K - 1,), 0, jnp.int32)
    wsum = jnp.concatenate([c2[K:] - c2[:-K], tail])
    build_valid = (wsum == K) & in_seq
    return hi, lo, build_valid
