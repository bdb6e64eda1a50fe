"""ctypes bindings for the native host runtime (csrc/skt_runtime.cpp).

Compiled on demand with g++ -O3 into a per-user cache directory; every
entry point has a pure-Python fallback (io/fasta.py, golden/call.py), so
the package works without a toolchain — just slower on the host side.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_SRC = Path(__file__).parent / "csrc" / "skt_runtime.cpp"


def _build_dir() -> Path:
    d = Path(os.environ.get(
        "SKT_NATIVE_CACHE",
        str(Path.home() / ".cache" / "signature_kmers_tpu" / "native")))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = _build_dir() / f"skt_runtime_{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-pthread", "-std=c++17", str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))

        lib.skt_scan_fasta.restype = ctypes.c_long
        lib.skt_scan_fasta.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.skt_automaton.restype = ctypes.c_long
        lib.skt_automaton.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.skt_best_call.restype = ctypes.c_long
        lib.skt_best_call.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.skt_build_cuckoo.restype = ctypes.c_long
        lib.skt_build_cuckoo.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_uint32, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.skt_build_wide.restype = ctypes.c_long
        lib.skt_build_wide.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_int, ctypes.c_uint32, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.skt_cpu_baseline.restype = ctypes.c_long
        lib.skt_cpu_baseline.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_uint32,
            ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
        ]
        lib.skt_cpu_baseline_bdz.restype = ctypes.c_long
        lib.skt_cpu_baseline_bdz.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p,
            ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
        ]
        lib.skt_jenkins3_k8.restype = None
        lib.skt_jenkins3_k8.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_uint32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.skt_cpu_baseline_bdz_mt.restype = ctypes.c_long
        lib.skt_cpu_baseline_bdz_mt.argtypes = (
            lib.skt_cpu_baseline_bdz.argtypes + [ctypes.c_int])
        lib.skt_bdz_build_try.restype = ctypes.c_int
        lib.skt_bdz_build_try.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.skt_bdz_search.restype = None
        lib.skt_bdz_search.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.skt_pack_u6_rows.restype = None
        lib.skt_pack_u6_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_void_p,
        ]
        lib.skt_write_final_kmers.restype = ctypes.c_long
        lib.skt_write_final_kmers.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_fasta_batch(path):
    """Native FASTA scan -> SequenceBatch."""
    from ..io.fasta import SequenceBatch

    lib = _load()
    data = Path(path).read_bytes()
    n = len(data)
    cap_seqs = n // 2 + 2
    codes = np.empty(n + 1, dtype=np.uint8)
    code_off = np.empty(cap_seqs + 1, dtype=np.int64)
    id_heap = np.empty(n + 1, dtype=np.uint8)
    id_off = np.empty(cap_seqs + 1, dtype=np.int64)
    def_heap = np.empty(n + 1, dtype=np.uint8)
    def_off = np.empty(cap_seqs + 1, dtype=np.int64)
    nseq = lib.skt_scan_fasta(
        data, n, _ptr(codes), _ptr(code_off), _ptr(id_heap), _ptr(id_off),
        _ptr(def_heap), _ptr(def_off))
    ids = []
    defs = []
    ib = id_heap.tobytes()
    db = def_heap.tobytes()
    for i in range(nseq):
        ids.append(ib[id_off[i]:id_off[i + 1]].decode("latin-1"))
        defs.append(db[def_off[i]:def_off[i + 1]].decode("latin-1"))
    # drop empty-id records like every reference callback does
    keep = [i for i, s in enumerate(ids) if s]
    if len(keep) != nseq:
        lens = np.diff(code_off[:nseq + 1])
        new_codes = np.concatenate(
            [codes[code_off[i]:code_off[i + 1]] for i in keep]) \
            if keep else np.zeros(0, dtype=np.uint8)
        offs = np.concatenate([[0], np.cumsum(lens[keep])]).astype(np.int32)
        return SequenceBatch(new_codes, offs,
                             [ids[i] for i in keep], [defs[i] for i in keep])
    return SequenceBatch(
        codes=codes[:code_off[nseq]].copy(),
        offsets=code_off[:nseq + 1].astype(np.int32).copy(),
        ids=ids, deflines=defs)


def cpu_baseline_call(codes, seq_off, table, min_hits: int, max_gap: int,
                      k: int, mad_floor: float, len_window: float) -> int:
    """Single-thread reference-style CPU calling pass (bench baseline).

    One probe per residue + the sequential automaton; returns total calls.
    `table` is a BucketKmerTable."""
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    seq_off = np.ascontiguousarray(seq_off, dtype=np.int64)
    packed = np.ascontiguousarray(table.packed, dtype=np.uint32)
    return lib.skt_cpu_baseline(
        _ptr(codes), _ptr(seq_off), seq_off.shape[0] - 1,
        _ptr(packed), table.n_buckets, np.uint32(table.salt), table.slots,
        min_hits, max_gap, k, mad_floor, len_window)


def cpu_baseline_call_bdz(codes, seq_off, mph, values, min_hits: int,
                          max_gap: int, k: int, mad_floor: float,
                          len_window: float, n_threads: int = 1) -> int:
    """Single-thread CPU pass with the reference's AUTHENTIC read path:
    CMPH BDZ search (jenkins + 3 g-array reads + rank byte scan) + one
    unverified 10-byte record read per window (cmph_kmer.h:139-147),
    feeding the same sequential automaton.  `mph` is an interop BdzMph;
    `values` the (m,) STORED_KMER_DTYPE record array.  Returns calls.
    n_threads > 1 partitions sequences across threads like the
    reference's --n-threads TBB loop (kmers-call-functions.cc:91)."""
    from ..core import alphabet

    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    seq_off = np.ascontiguousarray(seq_off, dtype=np.int64)
    c2b = np.ascontiguousarray(alphabet.CODE_TO_BYTE, dtype=np.uint8)
    g = np.ascontiguousarray(mph.g, dtype=np.uint8)
    rt = np.ascontiguousarray(mph.ranktable, dtype=np.uint32)
    vals = np.ascontiguousarray(values)
    if vals.dtype.itemsize != 10:
        raise ValueError("values must be 10-byte StoredKmerData records")
    args = (_ptr(codes), _ptr(seq_off), seq_off.shape[0] - 1, _ptr(c2b),
            np.uint32(mph.seed), np.uint32(mph.r), _ptr(g), _ptr(rt),
            int(mph.b), _ptr(vals), int(mph.m),
            min_hits, max_gap, k, mad_floor, len_window)
    if n_threads > 1:
        return lib.skt_cpu_baseline_bdz_mt(*args, int(n_threads))
    return lib.skt_cpu_baseline_bdz(*args)


def jenkins3_k8(keys, seed: int):
    """Native jenkins lookup2 over (N, 8) byte keys -> (a, b, c) uint32.

    Independent C++ transcription used to cross-check interop/hashes.py."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    n = keys.shape[0]
    a = np.empty(n, np.uint32)
    b = np.empty(n, np.uint32)
    c = np.empty(n, np.uint32)
    lib.skt_jenkins3_k8(_ptr(keys), n, np.uint32(seed),
                        _ptr(a), _ptr(b), _ptr(c))
    return a, b, c


def bdz_build_try(keys, seed: int, r: int, b: int):
    """Native BDZ peel + assign for one (seed, r) attempt.

    Byte-identical to the numpy spec in interop/cmph.py (same round-based
    peel, same reverse-round assignment).  Returns (g_packed, ranktable)
    or None when the graph is not peelable with this seed."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    m = keys.shape[0]
    n = 3 * r
    g = np.empty(-(-n // 4), np.uint8)
    rts = -(-n // (1 << b))
    ranktable = np.empty(rts, np.uint32)
    rc = lib.skt_bdz_build_try(_ptr(keys), m, np.uint32(seed),
                               np.uint32(r), int(b), _ptr(g), _ptr(ranktable))
    if rc != 0:
        return None
    return g, ranktable


def bdz_search(keys, seed: int, r: int, g, ranktable, b: int):
    """Native bdz_search (bdz.c semantics) over (N, 8) uint8 keys.

    Byte-identical to interop/cmph.py's vectorized bdz_search."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    g = np.ascontiguousarray(g, dtype=np.uint8)
    ranktable = np.ascontiguousarray(ranktable, dtype=np.uint32)
    out = np.empty(keys.shape[0], np.uint32)
    lib.skt_bdz_search(_ptr(keys), keys.shape[0], np.uint32(seed),
                       np.uint32(r), _ptr(g), _ptr(ranktable), int(b),
                       _ptr(out))
    return out


def build_cuckoo(hi, lo, v0, v1, v2, n_buckets: int, salt: int,
                 max_kicks: int = 500, slots: int = 2):
    """Native cuckoo placement.  Returns (khi, klo, fv0, fv1, fv2) as
    (n_buckets, slots) arrays, or None when placement failed (retry with
    a new salt / bigger table)."""
    lib = _load()
    hi = np.ascontiguousarray(hi, dtype=np.uint32)
    lo = np.ascontiguousarray(lo, dtype=np.uint32)
    v0 = np.ascontiguousarray(v0, dtype=np.uint32)
    v1 = np.ascontiguousarray(v1, dtype=np.uint32)
    v2 = np.ascontiguousarray(v2, dtype=np.uint32)
    shape = (n_buckets, slots)
    khi = np.empty(shape, np.uint32)
    klo = np.empty(shape, np.uint32)
    fv0 = np.empty(shape, np.uint32)
    fv1 = np.empty(shape, np.uint32)
    fv2 = np.empty(shape, np.uint32)
    rc = lib.skt_build_cuckoo(
        _ptr(hi), _ptr(lo), _ptr(v0), _ptr(v1), _ptr(v2),
        hi.shape[0], n_buckets, np.uint32(salt), max_kicks, slots,
        _ptr(khi), _ptr(klo), _ptr(fv0), _ptr(fv1), _ptr(fv2))
    if rc != 0:
        return None
    return khi, klo, fv0, fv1, fv2


def build_wide_place(hi, lo, v0, v1, v2, bits: int, salt: int, slots: int):
    """Native wide tagged-bucket placement (single pass; byte-identical to
    the numpy fallback in table/wide_table.py).

    Returns (packed, aux, leftover_indices); raises ValueError on a
    duplicate key."""
    lib = _load()
    hi = np.ascontiguousarray(hi, dtype=np.uint32)
    lo = np.ascontiguousarray(lo, dtype=np.uint32)
    v0 = np.ascontiguousarray(v0, dtype=np.uint32)
    v1 = np.ascontiguousarray(v1, dtype=np.uint32)
    v2 = np.ascontiguousarray(v2, dtype=np.uint32)
    n = hi.shape[0]
    nb = 1 << bits
    packed = np.empty((nb, 2 * slots), np.uint32)
    aux = np.empty((nb, 3 * slots), np.uint32)
    leftover = np.empty(max(n, 1), np.int64)
    nl = lib.skt_build_wide(
        _ptr(hi), _ptr(lo), _ptr(v0), _ptr(v1), _ptr(v2),
        n, bits, np.uint32(salt), slots,
        _ptr(packed), _ptr(aux), _ptr(leftover))
    if nl < 0:
        raise ValueError("duplicate k-mer keys in table build input")
    return packed, aux, leftover[:nl].copy()


def run_best_call(call_fI, call_count, call_off, is_multipart, lex_rank,
                  interior_thresh: int, exterior_thresh: int,
                  margin: float, pair_margin: float):
    """Native margin-path find_best_call over flat per-sequence call arrays.

    Returns (kind, func, score, offset, f1, f2); kind 3 rows need the
    Python fusion path."""
    lib = _load()
    call_fI = np.ascontiguousarray(call_fI, dtype=np.int32)
    call_count = np.ascontiguousarray(call_count, dtype=np.int32)
    call_off = np.ascontiguousarray(call_off, dtype=np.int64)
    n_seqs = call_off.shape[0] - 1
    kind = np.empty(n_seqs, np.int32)
    func = np.empty(n_seqs, np.int32)
    score = np.empty(n_seqs, np.float32)
    offset = np.empty(n_seqs, np.float32)
    f1 = np.empty(n_seqs, np.int32)
    f2 = np.empty(n_seqs, np.int32)
    lib.skt_best_call(
        _ptr(call_fI), _ptr(call_count), _ptr(call_off), n_seqs,
        _ptr(np.ascontiguousarray(is_multipart, np.uint8)),
        _ptr(np.ascontiguousarray(lex_rank, np.int32)),
        interior_thresh, exterior_thresh, margin, pair_margin,
        _ptr(kind), _ptr(func), _ptr(score), _ptr(offset), _ptr(f1),
        _ptr(f2))
    return kind, func, score, offset, f1, f2


def run_automaton(hit_pos, hit_func, hit_mean, hit_offsets, seq_lens,
                  min_hits: int, max_gap: int, k: int,
                  mad_floor: float, len_window: float):
    """Batch automaton over flat hit arrays.

    Returns (call_offsets[n_seqs+1], start, end, count, func, median, mad)
    with calls for sequence s in [call_offsets[s], call_offsets[s+1]).
    """
    lib = _load()
    hit_pos = np.ascontiguousarray(hit_pos, dtype=np.int32)
    hit_func = np.ascontiguousarray(hit_func, dtype=np.int32)
    hit_mean = np.ascontiguousarray(hit_mean, dtype=np.int32)
    hit_offsets = np.ascontiguousarray(hit_offsets, dtype=np.int64)
    seq_lens = np.ascontiguousarray(seq_lens, dtype=np.int32)
    n_seqs = seq_lens.shape[0]
    cap = max(int(hit_pos.shape[0]), 1)
    start = np.empty(cap, dtype=np.int32)
    end = np.empty(cap, dtype=np.int32)
    count = np.empty(cap, dtype=np.int32)
    func = np.empty(cap, dtype=np.int32)
    med = np.empty(cap, dtype=np.int32)
    mad = np.empty(cap, dtype=np.float32)
    call_off = np.empty(n_seqs + 1, dtype=np.int64)
    total = lib.skt_automaton(
        _ptr(hit_pos), _ptr(hit_func), _ptr(hit_mean), _ptr(hit_offsets),
        _ptr(seq_lens), n_seqs, min_hits, max_gap, k,
        mad_floor, len_window,
        _ptr(start), _ptr(end), _ptr(count), _ptr(func), _ptr(med),
        _ptr(mad), _ptr(call_off))
    return (call_off, start[:total], end[:total], count[:total],
            func[:total], med[:total], mad[:total])


def pack_u6_rows(codes, offsets, lens, row_start, R: int):
    """Single-pass 16-code-aligned 6-bit row packing (H2D transfer
    format; byte-identical to the numpy spec in ops/kmer_pack)."""
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    row_start = np.ascontiguousarray(row_start, dtype=np.int64)
    packed = np.empty((R, 3), dtype=np.uint32)
    lib.skt_pack_u6_rows(_ptr(codes), _ptr(offsets), _ptr(lens),
                         _ptr(row_start), lens.shape[0], R, _ptr(packed))
    return packed


def write_final_kmers(path, hi, lo, avg, fn, decode_bytes: bytes) -> bool:
    """Buffered native final.kmers text writer (rows in input order;
    byte-identical to the Python formatter in io/formats.py).  Returns
    False when the native library is unavailable or the write fails."""
    lib = _load()
    if lib is None:
        return False
    avg = np.asarray(avg)
    fn = np.asarray(fn)
    if (avg.size and int(avg.max()) > 0xFFFF) \
            or (fn.size and int(fn.max()) > 0xFFFF):
        # wider values than the uint16 native ABI: take the Python path
        # so the artifact prints the true values
        return False
    hi = np.ascontiguousarray(hi, dtype=np.uint32)
    lo = np.ascontiguousarray(lo, dtype=np.uint32)
    avg = np.ascontiguousarray(avg, dtype=np.uint16)
    fn = np.ascontiguousarray(fn, dtype=np.uint16)
    rc = lib.skt_write_final_kmers(
        _ptr(hi), _ptr(lo), _ptr(avg), _ptr(fn), hi.shape[0],
        decode_bytes, str(path).encode())
    return rc == 0
