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
