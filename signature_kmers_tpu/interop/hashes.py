"""Vectorized host implementations of the reference stores' hash functions.

- cmph's Jenkins 1996 lookup2 hash (jenkins.c in libcmph), specialized to
  the 8-byte keys the reference stores (raw k-mer characters,
  ref: perfect_hash.h:50, cmph_kmer.h:91).
- XXH64, the hasher the reference's NuDB store is created with
  (``nudb::xxhasher``, ref: nudb_kmer_db.h:55-63), specialized to 8-byte
  keys.

Both are written against an `xp` array namespace so the SAME code runs in
numpy (host) and jax.numpy (device probe of a CMPH-format table).
"""

from __future__ import annotations

import numpy as np

GOLDEN = 0x9E3779B9  # jenkins initializer


def _u32(xp, v):
    return xp.uint32(v)


def jenkins_mix(a, b, c, xp=np):
    """The classic Bob Jenkins mix() on uint32 lanes (cmph jenkins.c)."""
    u = lambda v: v  # noqa: E731 - all inputs already uint32
    a = u(a - b - c) ^ (c >> _u32(xp, 13))
    b = u(b - c - a) ^ (a << _u32(xp, 8))
    c = u(c - a - b) ^ (b >> _u32(xp, 13))
    a = u(a - b - c) ^ (c >> _u32(xp, 12))
    b = u(b - c - a) ^ (a << _u32(xp, 16))
    c = u(c - a - b) ^ (b >> _u32(xp, 5))
    a = u(a - b - c) ^ (c >> _u32(xp, 3))
    b = u(b - c - a) ^ (a << _u32(xp, 10))
    c = u(c - a - b) ^ (b >> _u32(xp, 15))
    return a, b, c


def jenkins_hash3_k8(seed: int, word_lo, word_hi, xp=np):
    """cmph __jenkins_hash_vector for an 8-byte key -> (h0, h1, h2).

    word_lo = bytes k[0..3] little-endian (k[0] | k[1]<<8 | ...), word_hi
    = bytes k[4..7] little-endian; uint32 arrays of any equal shape.

    Matches jenkins.c exactly for keylen == 8: a/b start at the golden
    ratio, c at the seed; c += keylen; the length switch adds the two
    little-endian words to b then a; one final mix.
    """
    word_lo = word_lo.astype(xp.uint32)
    word_hi = word_hi.astype(xp.uint32)
    a = word_lo + _u32(xp, GOLDEN)
    b = word_hi + _u32(xp, GOLDEN)
    c = xp.full(word_lo.shape, (int(seed) + 8) & 0xFFFFFFFF, dtype=xp.uint32)
    return jenkins_mix(a, b, c, xp)


def jenkins_hash3_bytes(seed: int, keys: np.ndarray) -> tuple:
    """Host convenience: keys (N, 8) uint8 -> (h0, h1, h2) uint32."""
    k = np.ascontiguousarray(keys, dtype=np.uint8)
    if k.ndim != 2 or k.shape[1] != 8:
        raise ValueError("keys must be (N, 8) bytes")
    w = k.view("<u4")  # (N, 2) little-endian words
    return jenkins_hash3_k8(seed, w[:, 0], w[:, 1], np)


# ---------------------------------------------------------------------------
# XXH64 (NuDB's nudb::xxhasher: XXH64(key, len, seed=salt))
# ---------------------------------------------------------------------------

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x, n: int):
    n = np.uint64(n)
    return (x << n) | (x >> np.uint64(64 - int(n)))


def xxh64_u64(data_le: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of one 8-byte chunk per lane (len == 8 specialization).

    data_le: uint64 array, each the key's 8 bytes little-endian.
    """
    with np.errstate(over="ignore"):
        d = data_le.astype(np.uint64)
        h = np.uint64((int(seed) + int(_P5) + 8) & 0xFFFFFFFFFFFFFFFF)
        h = np.full(d.shape, h, dtype=np.uint64)
        k1 = _rotl64(d * _P2, 31) * _P1
        h ^= k1
        h = _rotl64(h, 27) * _P1 + _P4
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
        return h


def xxh64_bytes8(keys: np.ndarray, seed: int) -> np.ndarray:
    """keys (N, 8) uint8 -> uint64 XXH64 values."""
    k = np.ascontiguousarray(keys, dtype=np.uint8)
    if k.ndim != 2 or k.shape[1] != 8:
        raise ValueError("keys must be (N, 8) bytes")
    return xxh64_u64(k.view("<u8")[:, 0], seed)
