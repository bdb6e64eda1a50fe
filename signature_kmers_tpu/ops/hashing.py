"""32-bit mixing hash for packed k-mer keys.

TPU-native: everything stays in uint32 (int64 is emulated on TPU).  The
same arithmetic runs under numpy (host table build) and jax.numpy (device
probing); unsigned multiplication wraps mod 2^32 in both.

Replaces the reference's storage hashes (CMPH BDZ, cmph_kmer.h:36-50, and
NuDB xxhasher, nudb_kmer_db.h:55-63) with a murmur3-finalizer-based slot
hash for a static open-addressing table.
"""

from __future__ import annotations

import numpy as np

_C1 = 0x85EB_CA6B
_C2 = 0xC2B2_AE35
_GOLDEN = 0x9E37_79B9


def fmix32(x, xp=np):
    """Murmur3 32-bit finalizer (public-domain bit-mix constants)."""
    x = xp.asarray(x, dtype=xp.uint32)
    x = x ^ (x >> xp.uint32(16))
    x = x * xp.uint32(_C1)
    x = x ^ (x >> xp.uint32(13))
    x = x * xp.uint32(_C2)
    x = x ^ (x >> xp.uint32(16))
    return x


def hash_kmer(hi, lo, xp=np):
    """Mix the two 24-bit key words into a uint32 hash."""
    hi = xp.asarray(hi, dtype=xp.uint32)
    lo = xp.asarray(lo, dtype=xp.uint32)
    return fmix32(hi ^ (fmix32(lo, xp) + xp.uint32(_GOLDEN)), xp)


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


# -- invertible 48-bit key permutation (wide-table layout) -------------------
#
# A 3-round Feistel network over the two 24-bit key halves.  Each round is
# a bijection of the 48-bit key space, so the permuted (L, R) pair — and
# therefore any full-entropy (bucket, tag) split of it — identifies the key
# EXACTLY.  This is what lets the wide table store a <=31-bit tag per slot
# instead of the full 48-bit key (half the probe-row bytes) while keeping
# exact membership, unlike the reference's aliasing CMPH read path
# (cmph_kmer.h:138-147).

_ROUND = (0x9E37_79B9, 0x85EB_CA6B, 0xC2B2_AE35)
_M24 = 0xFF_FFFF


def perm48(hi, lo, salt: int, xp=np):
    """Injective permutation of a 48-bit key given as two 24-bit words."""
    L = xp.asarray(hi, dtype=xp.uint32) & xp.uint32(_M24)
    R = xp.asarray(lo, dtype=xp.uint32) & xp.uint32(_M24)
    s = xp.uint32(salt)
    for rc in _ROUND:
        F = fmix32(R ^ (s ^ xp.uint32(rc)), xp) & xp.uint32(_M24)
        L, R = R, L ^ F
    return L, R


def perm48_inv(L, R, salt: int, xp=np):
    """Inverse of perm48: recover (hi, lo) from the permuted halves."""
    L = xp.asarray(L, dtype=xp.uint32)
    R = xp.asarray(R, dtype=xp.uint32)
    s = xp.uint32(salt)
    for rc in reversed(_ROUND):
        F = fmix32(L ^ (s ^ xp.uint32(rc)), xp) & xp.uint32(_M24)
        L, R = R ^ F, L
    return L, R


def wide_bucket_tag(L, R, bits: int, xp=np):
    """Split permuted halves into (bucket, tag) covering all 48 bits.

    bits = log2(bucket count), 17 <= bits <= 30: the tag has 48-bits
    width (<= 31 bits), so the uint32 empty-slot sentinel 0xFFFFFFFF can
    never be a valid tag — for stored keys AND for arbitrary queries
    (at 16 bits a query whose tag hit the sentinel would falsely match
    empty slots; re-salting the build cannot prevent that).
    (bucket, tag) <-> (L, R) is a bijection.
    """
    if not 17 <= bits <= 30:
        raise ValueError(f"wide table bits {bits} outside [17, 30]")
    if bits <= 24:
        bucket = R & xp.uint32((1 << bits) - 1)
        tag = (L << xp.uint32(24 - bits)) | (R >> xp.uint32(bits))
    else:
        bucket = ((L & xp.uint32((1 << (bits - 24)) - 1)) << xp.uint32(24)) | R
        tag = L >> xp.uint32(bits - 24)
    return bucket, tag
