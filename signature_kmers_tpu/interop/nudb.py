"""NuDB store files: pure-numpy reader and writer.

The reference persists its signature set as a NuDB key/value store of
8-byte k-mer keys -> 10-byte StoredKmerData values, created with
``nudb::create<nudb::xxhasher>(..., appnum=1, key_size=8, block_size,
load_factor=0.5)`` (ref: nudb_kmer_db.h:55-63).  NuDB's on-disk format
(nudb/detail/format.hpp, version 2; all integers BIG-endian, uint48 =
6 bytes):

  <base>.dat  ::=  DatHeader  Record*
    DatHeader  ::=  "nudb.dat"  u16 version  u64 uid  u64 appnum
                    u16 key_size  u8 reserved[64]            (92 bytes)
    Record     ::=  DataRecord | SpillRecord
    DataRecord ::=  u48 size(>0)  u8 key[key_size]  u8 value[size]
    SpillRecord::=  u48 0  u16 size  BucketImage(size bytes)

  <base>.key  ::=  KeyHeader (padded to one block)  Bucket*
    KeyHeader  ::=  "nudb.key"  u16 version  u64 uid  u64 appnum
                    u16 key_size  u64 salt  u64 pepper  u16 block_size
                    u16 load_factor(x 2^16)  u8 reserved[56]  (104 bytes)
    Bucket     ::=  u16 count  u48 spill  Entry[count]  (one per block)
    Entry      ::=  u48 offset  u48 size  u48 hash      (sorted by hash)

  hash = XXH64(key, key_size, seed=salt) truncated to 48 bits;
  bucket index = h % modulus, minus modulus/2 if >= buckets, with
  modulus = ceil_pow2(buckets).

READING only needs the .dat file: it is an append-only log containing
every (key, value) pair — this loader scans it and ignores the key file
entirely (so damaged/missing .key files still load).  WRITING emits a
bit-valid pair (bucket-placed, hash-sorted, spill-chained) that
nudb::store::open/fetch accepts.
"""

from __future__ import annotations

import os
import struct
from pathlib import Path

import numpy as np

from .hashes import xxh64_bytes8, xxh64_u64

DAT_TYPE = b"nudb.dat"
KEY_TYPE = b"nudb.key"
VERSION = 2
MASK48 = (1 << 48) - 1

_DAT_HEADER = struct.Struct(">8sHQQH64s")   # 92 bytes
_KEY_HEADER = struct.Struct(">8sHQQHQQHH56s")  # 104 bytes
_BUCKET_HEADER_SIZE = 2 + 6
_ENTRY_SIZE = 6 + 6 + 6


def _u48(v: int) -> bytes:
    return int(v).to_bytes(6, "big")


def _ceil_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def bucket_capacity(block_size: int) -> int:
    return (block_size - _BUCKET_HEADER_SIZE) // _ENTRY_SIZE


def bucket_index(h: np.ndarray, buckets: int, modulus: int) -> np.ndarray:
    n = h % np.uint64(modulus)
    return np.where(n >= buckets, n - np.uint64(modulus // 2),
                    n).astype(np.int64)


def pepper(salt: int) -> int:
    """NuDB's stored hash-function fingerprint: the hash of the salt with
    itself as seed (format.hpp pepper<Hasher>); best-effort — the reader
    never validates it, only real NuDB would."""
    data = np.frombuffer(struct.pack("<Q", salt), dtype="<u8")
    return int(xxh64_u64(data, salt)[0])


# ---------------------------------------------------------------------------
# Reader: sequential .dat scan
# ---------------------------------------------------------------------------


def read_nudb_dat(dat_path):
    """Scan a NuDB .dat file -> (keys (N, key_size) uint8, values
    list-of-bytes | (N, value_size) uint8 when uniform).

    Fast path: when every record has the same value size and there are no
    spill records (true for the reference's stores: fixed 10-byte
    StoredKmerData), the whole file parses as one strided numpy view.
    """
    raw = np.fromfile(dat_path, dtype=np.uint8)
    if raw.shape[0] < _DAT_HEADER.size:
        raise ValueError(f"{dat_path}: truncated dat header")
    typ, version, uid, appnum, key_size, _ = _DAT_HEADER.unpack_from(
        raw.tobytes()[:_DAT_HEADER.size])
    if typ != DAT_TYPE:
        raise ValueError(f"{dat_path}: not a nudb dat file ({typ!r})")
    body = raw[_DAT_HEADER.size:]
    n_body = body.shape[0]
    if n_body == 0:
        return np.zeros((0, key_size), np.uint8), np.zeros((0, 0), np.uint8)

    # fast path: uniform record stride, no spills
    size0 = int.from_bytes(body[:6].tobytes(), "big")
    stride = 6 + key_size + size0
    if size0 > 0 and n_body % stride == 0:
        rec = body.reshape(-1, stride)
        sizes = rec[:, :6].astype(np.uint64)
        s = (sizes[:, 0] << 40) | (sizes[:, 1] << 32) | (sizes[:, 2] << 24) \
            | (sizes[:, 3] << 16) | (sizes[:, 4] << 8) | sizes[:, 5]
        if (s == size0).all():
            return (rec[:, 6:6 + key_size].copy(),
                    rec[:, 6 + key_size:].copy())

    # general path: walk records, skip spills
    keys, values = [], []
    off = 0
    b = body.tobytes()
    while off + 6 <= n_body:
        size = int.from_bytes(b[off:off + 6], "big")
        off += 6
        if size == 0:
            if off + 2 > n_body:
                break
            (spill_size,) = struct.unpack_from(">H", b, off)
            off += 2 + spill_size
            continue
        keys.append(b[off:off + key_size])
        off += key_size
        values.append(b[off:off + size])
        off += size
    karr = np.frombuffer(b"".join(keys), np.uint8).reshape(-1, key_size)
    vsizes = {len(v) for v in values}
    if len(vsizes) == 1:
        varr = np.frombuffer(b"".join(values), np.uint8).reshape(
            -1, vsizes.pop())
        return karr, varr
    return karr, values


def read_nudb_header(key_path):
    """Parse a .key header -> dict (salt, block_size, key_size, ...)."""
    with open(key_path, "rb") as f:
        hdr = f.read(_KEY_HEADER.size)
    (typ, version, uid, appnum, key_size, salt, pep, block_size,
     load_factor, _) = _KEY_HEADER.unpack(hdr)
    if typ != KEY_TYPE:
        raise ValueError(f"{key_path}: not a nudb key file ({typ!r})")
    return dict(version=version, uid=uid, appnum=appnum, key_size=key_size,
                salt=salt, pepper=pep, block_size=block_size,
                load_factor=load_factor / 65536.0)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def write_nudb(base, keys: np.ndarray, values: np.ndarray, appnum: int = 1,
               block_size: int = 4096, load_factor: float = 0.5,
               salt: int | None = None, uid: int | None = None) -> None:
    """Write <base>.dat + <base>.key for (N, key_size) uint8 keys and
    (N, value_size) uint8 values (duplicate keys not checked).

    Buckets are sized for the requested load factor (the reference
    creates with 0.5, nudb_kmer_db.h:61); rows past a bucket's capacity
    go to chained spill records in the dat file, exactly as NuDB's own
    inserts spill.
    """
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    values = np.ascontiguousarray(values, dtype=np.uint8)
    n, key_size = keys.shape
    value_size = values.shape[1] if values.ndim == 2 else 0
    if salt is None:
        salt = int.from_bytes(os.urandom(8), "little")
    if uid is None:
        uid = int.from_bytes(os.urandom(8), "little")

    base = str(base)
    cap = bucket_capacity(block_size)
    buckets = max(1, -(-n // max(1, int(load_factor * cap))))
    modulus = _ceil_pow2(buckets)

    if n:
        h = (xxh64_bytes8(keys, salt) if key_size == 8 else
             _xxh64_any(keys, salt)) & np.uint64(MASK48)
        bidx = bucket_index(h, buckets, modulus)
        order = np.lexsort((h, bidx))
    else:
        h = np.zeros(0, np.uint64)
        bidx = np.zeros(0, np.int64)
        order = np.zeros(0, np.int64)

    # dat file: header + one data record per key (insertion order = key
    # order given), then spill records appended at the end
    dat_off = np.zeros(n, dtype=np.int64)
    rec_size = 6 + key_size + value_size
    dat_off[:] = _DAT_HEADER.size + np.arange(n, dtype=np.int64) * rec_size

    dat = bytearray()
    dat += _DAT_HEADER.pack(DAT_TYPE, VERSION, uid, appnum, key_size,
                            b"\x00" * 64)
    if n:
        recs = np.empty((n, rec_size), dtype=np.uint8)
        sz = np.uint64(value_size)
        for i in range(6):
            recs[:, i] = (sz >> np.uint64(8 * (5 - i))) & np.uint64(0xFF)
        recs[:, 6:6 + key_size] = keys
        recs[:, 6 + key_size:] = values
        dat += recs.tobytes()

    def bucket_image(entries, spill: int) -> bytes:
        out = bytearray()
        out += struct.pack(">H", len(entries)) + _u48(spill)
        for off, size, hv in entries:
            out += _u48(off) + _u48(size) + _u48(hv)
        return bytes(out)

    # group rows by bucket (rows within a bucket already hash-sorted)
    key_blocks = {}
    boundaries = np.nonzero(np.diff(bidx[order]))[0] + 1 if n else []
    groups = np.split(order, boundaries) if n else []
    for grp in groups:
        b = int(bidx[grp[0]])
        entries = [(int(dat_off[i]), value_size, int(h[i])) for i in grp]
        # newest-first like NuDB: the key-file bucket keeps up to cap,
        # the rest chain through spill records (all hash-sorted)
        chunks = [entries[j:j + cap] for j in range(0, len(entries), cap)]
        spill = 0
        for chunk in reversed(chunks[1:]):
            img = bucket_image(chunk, spill)
            spill = len(dat)
            dat += _u48(0) + struct.pack(">H", len(img)) + img
        key_blocks[b] = bucket_image(chunks[0], spill)

    with open(base + ".dat", "wb") as f:
        f.write(bytes(dat))

    pep = pepper(salt)
    lf16 = min(65535, int(round(load_factor * 65536)))
    with open(base + ".key", "wb") as f:
        hdr = _KEY_HEADER.pack(KEY_TYPE, VERSION, uid, appnum, key_size,
                               salt, pep, block_size, lf16, b"\x00" * 56)
        f.write(hdr + b"\x00" * (block_size - len(hdr)))
        empty = bucket_image([], 0)
        for b in range(buckets):
            img = key_blocks.get(b, empty)
            f.write(img + b"\x00" * (block_size - len(img)))


def _xxh64_any(keys: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 for arbitrary key sizes (slow scalar path; the reference
    only ever uses 8-byte keys)."""
    try:
        import xxhash  # pragma: no cover

        return np.asarray([xxhash.xxh64_intdigest(k.tobytes(), seed)
                           for k in keys], dtype=np.uint64)
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "vectorized XXH64 implemented for 8-byte keys only") from e


def fetch_nudb(base, query_keys: np.ndarray):
    """Bucket-path fetch (exercises the .key file like NuDB's own fetch,
    used by tests to prove the writer's bucket placement is valid).

    Returns (found bool (N,), values (N, value_size) uint8).
    """
    base = str(base)
    hdr = read_nudb_header(base + ".key")
    key_size = hdr["key_size"]
    block_size = hdr["block_size"]
    salt = hdr["salt"]
    kf = np.fromfile(base + ".key", dtype=np.uint8)
    dat = np.fromfile(base + ".dat", dtype=np.uint8)
    buckets = kf.shape[0] // block_size - 1
    modulus = _ceil_pow2(buckets)

    q = np.ascontiguousarray(query_keys, dtype=np.uint8)
    nq = q.shape[0]
    h = xxh64_bytes8(q, salt) & np.uint64(MASK48)
    bidx = bucket_index(h, buckets, modulus)

    def parse_bucket(img: bytes):
        count, = struct.unpack_from(">H", img, 0)
        spill = int.from_bytes(img[2:8], "big")
        entries = []
        for i in range(count):
            o = _BUCKET_HEADER_SIZE + i * _ENTRY_SIZE
            entries.append((int.from_bytes(img[o:o + 6], "big"),
                            int.from_bytes(img[o + 6:o + 12], "big"),
                            int.from_bytes(img[o + 12:o + 18], "big")))
        return entries, spill

    found = np.zeros(nq, dtype=bool)
    out = None
    for i in range(nq):
        blk = (1 + int(bidx[i])) * block_size
        img = kf[blk:blk + block_size].tobytes()
        hv = int(h[i])
        while True:
            entries, spill = parse_bucket(img)
            for off, size, eh in entries:
                if eh != hv:
                    continue
                rk = dat[off + 6:off + 6 + key_size]
                if (rk == q[i]).all():
                    val = dat[off + 6 + key_size:off + 6 + key_size + size]
                    if out is None:
                        out = np.zeros((nq, size), np.uint8)
                    out[i] = val
                    found[i] = True
                    break
            if found[i] or spill == 0:
                break
            ssize, = struct.unpack_from(">H", dat[spill + 6:spill + 8]
                                        .tobytes())
            img = dat[spill + 8:spill + 8 + ssize].tobytes()
    if out is None:
        out = np.zeros((nq, 0), np.uint8)
    return found, out
