"""CMPH BDZ minimal-perfect-hash files: pure-numpy reader, writer, search.

The reference builds its production read path with libcmph's BDZ algorithm
over the kept k-mer strings and persists it via ``cmph_dump``
(ref: perfect_hash.h:28-33,66), then indexes a flat array of 10-byte
StoredKmerData records by ``cmph_search`` (ref: cmph_kmer.h:139-147 —
with NO membership verification, so alien keys alias onto arbitrary
slots).  This module reads and writes that exact on-disk format:

  .mph  ::=  "bdz\\0"  u32 size(=m)
             u32 buflen(=12)  "jenkins\\0"  u32 seed
             u32 n  u32 m  u32 r
             u8 g[ceil(n/4)]          (2-bit entries, little-endian in byte)
             u32 k  u8 b
             u32 ranktablesize  u32 ranktable[ranktablesize]
  .dat  ::=  StoredKmerData[m]        (5 x uint16 little-endian per record)

(integer fields little-endian, as written by fwrite on x86).

BDZ (Botelho-Djamal-Ziviani): keys map to edges of a 3-partite random
hypergraph via one Jenkins hash (3 lanes); the graph is peeled; a 2-bit
value array g is assigned so that (g[v0]+g[v1]+g[v2]) mod 3 picks each
key's representative vertex; rank over assigned vertices (value != 3)
compresses vertex ids to [0, m).  The construction here is vectorized:
peeling removes ALL degree-1-incident edges per round, and g assignment
runs round-by-round in reverse (intra-round vertices are provably
UNASSIGNED, so rounds only depend on later rounds).
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np

from .hashes import jenkins_hash3_bytes

UNASSIGNED = 3
_MAX_ITER = 100

STORED_KMER_DTYPE = np.dtype([
    # ref: kmer_data.h:114-128 (5 consecutive uint16, no padding)
    ("avg_from_end", "<u2"),
    ("function_index", "<u2"),
    ("mean", "<u2"),
    ("median", "<u2"),
    ("var", "<u2"),
])


@dataclasses.dataclass
class BdzMph:
    seed: int
    n: int            # 3r vertices
    m: int            # number of keys = hash range
    r: int            # partition size
    g: np.ndarray     # packed 2-bit values, ceil(n/4) bytes
    k: int            # rank block size (1 << b)
    b: int
    ranktable: np.ndarray  # uint32

    def g_values(self) -> np.ndarray:
        """Unpacked 2-bit entries for vertices [0, n)."""
        v = np.arange(self.n, dtype=np.int64)
        return (self.g[v >> 2] >> ((v & 3) << 1)) & 3

    def rank_array(self) -> np.ndarray:
        """rank[v] = number of assigned vertices strictly below v (the
        value bdz rank() computes from ranktable + bytes, bdz.c)."""
        assigned = (self.g_values() != UNASSIGNED).astype(np.uint32)
        out = np.zeros(self.n, dtype=np.uint32)
        np.cumsum(assigned[:-1], out=out[1:])
        return out


def _pack_g(values: np.ndarray) -> np.ndarray:
    """2-bit entries -> byte array, little-endian within byte (bitbool.h
    GETVALUE: (array[i>>2] >> ((i&3)<<1)) & 3)."""
    n = values.shape[0]
    pad = (-n) % 4
    v = np.concatenate([values.astype(np.uint8),
                        np.full(pad, UNASSIGNED, np.uint8)]).reshape(-1, 4)
    return (v[:, 0] | (v[:, 1] << 2) | (v[:, 2] << 4)
            | (v[:, 3] << 6)).astype(np.uint8)


def load_mph(path) -> BdzMph:
    """Parse a cmph_dump'd BDZ .mph file."""
    raw = Path(path).read_bytes()
    nul = raw.index(b"\x00")
    algo = raw[:nul].decode("ascii")
    if algo != "bdz":
        raise ValueError(f"unsupported cmph algorithm {algo!r} (only bdz)")
    off = nul + 1
    (size,) = struct.unpack_from("<I", raw, off)
    off += 4
    (buflen,) = struct.unpack_from("<I", raw, off)
    off += 4
    state = raw[off:off + buflen]
    off += buflen
    hnul = state.index(b"\x00")
    hname = state[:hnul].decode("ascii")
    if hname != "jenkins":
        raise ValueError(f"unsupported cmph hash {hname!r} (only jenkins)")
    (seed,) = struct.unpack_from("<I", state, hnul + 1)
    n, m, r = struct.unpack_from("<III", raw, off)
    off += 12
    sizeg = -(-n // 4)
    g = np.frombuffer(raw, dtype=np.uint8, count=sizeg, offset=off).copy()
    off += sizeg
    (k,) = struct.unpack_from("<I", raw, off)
    off += 4
    b = raw[off]
    off += 1
    (rts,) = struct.unpack_from("<I", raw, off)
    off += 4
    ranktable = np.frombuffer(raw, dtype="<u4", count=rts, offset=off).copy()
    if m != size:
        raise ValueError(f"inconsistent mph: size={size} m={m}")
    return BdzMph(seed, n, m, r, g, k, b, ranktable)


def save_mph(path, mph: BdzMph) -> None:
    """Write the cmph_dump BDZ format (loadable by cmph_load)."""
    out = bytearray()
    out += b"bdz\x00"
    out += struct.pack("<I", mph.m)
    state = b"jenkins\x00" + struct.pack("<I", mph.seed)
    out += struct.pack("<I", len(state)) + state
    out += struct.pack("<III", mph.n, mph.m, mph.r)
    sizeg = -(-mph.n // 4)
    g = np.asarray(mph.g, np.uint8)
    if g.shape[0] != sizeg:
        raise ValueError("bad g size")
    out += g.tobytes()
    out += struct.pack("<I", mph.k)
    out += struct.pack("<B", mph.b)
    out += struct.pack("<I", mph.ranktable.shape[0])
    out += np.asarray(mph.ranktable, "<u4").tobytes()
    Path(path).write_bytes(bytes(out))


def _edges_for_seed(keys: np.ndarray, seed: int, r: int) -> np.ndarray:
    h0, h1, h2 = jenkins_hash3_bytes(seed, keys)
    r32 = np.uint32(r)
    return np.stack([(h0 % r32).astype(np.int64),
                     (h1 % r32).astype(np.int64) + r,
                     (h2 % r32).astype(np.int64) + 2 * r], axis=1)


def _peel(edges: np.ndarray, n: int):
    """Vectorized hypergraph peeling.

    Returns a list of rounds, each (edge_ids, free_position) — every edge
    in a round had a degree-1 vertex at round start (its free vertex; the
    FIRST such position in vertex order, matching bdz's first-unmarked
    assignment choice) — or None if the graph is not peelable.
    """
    m = edges.shape[0]
    deg = np.bincount(edges.ravel(), minlength=n)
    xs = np.zeros(n, dtype=np.int64)
    np.bitwise_xor.at(xs, edges.ravel(),
                      np.repeat(np.arange(m, dtype=np.int64), 3))
    alive = m
    rounds = []
    free_mark = np.zeros(n, dtype=bool)
    while alive:
        d1 = np.nonzero(deg == 1)[0]
        if d1.size == 0:
            return None  # 2-core non-empty: duplicate edges or unlucky seed
        eids = np.unique(xs[d1])
        vs = edges[eids]                       # (k, 3)
        free_mark[d1] = True
        isfree = free_mark[vs]                 # (k, 3)
        j = np.argmax(isfree, axis=1)          # first degree-1 position
        free_mark[d1] = False
        rounds.append((eids, j.astype(np.int64)))
        np.subtract.at(deg, vs.ravel(), 1)
        np.bitwise_xor.at(xs, vs.ravel(), np.repeat(eids, 3))
        alive -= eids.shape[0]
    return rounds


def _assign(edges: np.ndarray, rounds, n: int) -> np.ndarray:
    """Reverse-round g assignment (bdz.c assigning(), vectorized).

    Every vertex not some edge's free vertex stays UNASSIGNED (bdz marks
    it and explicitly sets 3); a round's equations depend only on later
    rounds' values, because two edges peeled in the same round can share
    only vertices that are free for neither (degree >= 2 at round start).
    """
    gv = np.full(n, UNASSIGNED, dtype=np.int64)
    for eids, j in reversed(rounds):
        vs = edges[eids]                       # (k, 3)
        free = vs[np.arange(eids.shape[0]), j]
        others = gv[vs].sum(axis=1) - gv[free]  # gv[free] is still 3 here
        gv[free] = (j - others) % 3
    return gv


def build_bdz(keys: np.ndarray, b: int = 7, c: float = 1.23,
              seed0: int = 0x5EED, native: "bool | None" = None) -> BdzMph:
    """Construct a BDZ MPH over (N, 8) uint8 keys (bdz_new semantics:
    r = ceil(c*m/3) forced odd, n = 3r, rank block k = 1<<b).

    The peel + assign runs natively when the toolchain is available
    (runtime skt_bdz_build_try; ~20x at 20M keys) with this module's
    vectorized numpy construction as the byte-identical fallback/oracle;
    `native=False` forces the numpy path (differential tests)."""
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    m = keys.shape[0]
    if m == 0:
        raise ValueError("cannot build an MPH over zero keys")
    if native is None or native:
        from ..runtime import host

        use_native = host.available() and keys.shape[1] == 8
    else:
        use_native = False
    r = int(np.ceil(c * m / 3.0))
    if r % 2 == 0:
        r += 1
    rng = np.random.default_rng(seed0)
    for it in range(_MAX_ITER):
        if it and it % 20 == 0:
            # tiny key sets can make r so small every seed collides
            # (e.g. m=2 -> r=1: both edges are (0,1,2)); grow r — the
            # file stores r, so any reader handles the larger graph
            r = (3 * r) // 2 + 2
            if r % 2 == 0:
                r += 1
        n = 3 * r
        seed = int(rng.integers(0, 2**32, dtype=np.uint64))
        if use_native:
            from ..runtime import host

            out = host.bdz_build_try(keys, seed, r, b)
            if out is None:
                continue
            g, ranktable = out
            return BdzMph(seed, n, m, r, g, 1 << b, b, ranktable)
        edges = _edges_for_seed(keys, seed, r)
        rounds = _peel(edges, n)
        if rounds is not None:
            break
    else:
        raise RuntimeError(f"BDZ peeling failed after {_MAX_ITER} seeds")
    gv = _assign(edges, rounds, n)
    g = _pack_g(gv)
    k = 1 << b
    rts = -(-n // k)
    assigned = (gv != UNASSIGNED).astype(np.int64)
    ranktable = np.zeros(rts, dtype=np.uint32)
    blocks = np.add.reduceat(assigned, np.arange(0, n, k))
    ranktable[1:] = np.cumsum(blocks)[:rts - 1]
    return BdzMph(seed, n, m, r, g, k, b, ranktable)


def bdz_search(mph: BdzMph, keys: np.ndarray,
               native: "bool | None" = None) -> np.ndarray:
    """Vectorized bdz_search (bdz.c): keys (N, 8) uint8 -> uint32 indices.

    For member keys the result is the key's unique slot in [0, m); for
    alien keys it is an arbitrary value in [0, m] — exactly the aliasing
    the reference's fetch exhibits (cmph_kmer.h:138-147).  Runs natively
    (threaded, ranktable + byte-scan rank like bdz.c) when the toolchain
    is present; `native=False` forces this numpy path.
    """
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    if native is None or native:
        from ..runtime import host

        if host.available() and keys.ndim == 2 and keys.shape[1] == 8:
            return host.bdz_search(keys, mph.seed, mph.r, mph.g,
                                   mph.ranktable, mph.b)
    h0, h1, h2 = jenkins_hash3_bytes(mph.seed, keys)
    r = np.uint32(mph.r)
    hl = np.stack([(h0 % r).astype(np.int64),
                   (h1 % r).astype(np.int64) + mph.r,
                   (h2 % r).astype(np.int64) + 2 * mph.r], axis=1)
    g = mph.g
    gv = (g[hl >> 2] >> ((hl & 3) << 1)) & 3     # (N, 3)
    sel = gv.sum(axis=1) % 3
    vertex = hl[np.arange(hl.shape[0]), sel]
    return mph.rank_array()[vertex]


# ---------------------------------------------------------------------------
# Store-level helpers (.mph + .dat pair, ref: perfect_hash.h:28-63)
# ---------------------------------------------------------------------------


def keys_from_packed(hi, lo) -> np.ndarray:
    """Packed 6-bit (hi, lo) words -> raw 8-char keys as (N, 8) uint8
    (the byte form the reference hashes, cmph_kmer.h:91)."""
    from ..core import alphabet

    hi = np.asarray(hi, np.uint32)
    lo = np.asarray(lo, np.uint32)
    out = np.empty((hi.shape[0], 8), dtype=np.uint8)
    for i, w, s in ((0, hi, 18), (1, hi, 12), (2, hi, 6), (3, hi, 0),
                    (4, lo, 18), (5, lo, 12), (6, lo, 6), (7, lo, 0)):
        out[:, i] = alphabet.CODE_TO_BYTE[(w >> s) & 63]
    return out


def packed_from_keys(keys: np.ndarray):
    """(N, 8) uint8 raw keys -> packed (hi, lo) uint32 words."""
    from ..core import alphabet

    c = alphabet.BYTE_TO_CODE[keys].astype(np.uint32)
    hi = (c[:, 0] << 18) | (c[:, 1] << 12) | (c[:, 2] << 6) | c[:, 3]
    lo = (c[:, 4] << 18) | (c[:, 5] << 12) | (c[:, 6] << 6) | c[:, 7]
    return hi, lo


def write_cmph_files(mph_path, dat_path, hi, lo, avg_from_end,
                     function_index, mean, median, var) -> BdzMph:
    """Write a .mph + flat value array to explicit paths, exactly as the
    reference's build_perfect_hash does (perfect_hash.h:28-63): BDZ over
    the raw k-mer strings, flat StoredKmerData[m] indexed by the hash."""
    keys = keys_from_packed(hi, lo)
    mph = build_bdz(keys)
    idx = bdz_search(mph, keys)
    vals = np.zeros(mph.m, dtype=STORED_KMER_DTYPE)
    vals["avg_from_end"][idx] = np.asarray(avg_from_end, np.uint16)
    vals["function_index"][idx] = np.asarray(function_index, np.uint16)
    vals["mean"][idx] = np.asarray(mean, np.uint16)
    vals["median"][idx] = np.asarray(median, np.uint16)
    vals["var"][idx] = np.asarray(var, np.uint16)
    save_mph(mph_path, mph)
    vals.tofile(dat_path)
    return mph


def write_cmph_store(base, hi, lo, avg_from_end, function_index, mean,
                     median, var) -> BdzMph:
    """Write <base>.mph + <base>.dat (the pair CmphKmerDb opens,
    cmph_kmer.h:36-43)."""
    base = str(base)
    return write_cmph_files(base + ".mph", base + ".dat", hi, lo,
                            avg_from_end, function_index, mean, median, var)


def read_cmph_values(dat_path) -> np.ndarray:
    """Flat .dat value array -> structured (m,) StoredKmerData records."""
    return np.fromfile(dat_path, dtype=STORED_KMER_DTYPE)
