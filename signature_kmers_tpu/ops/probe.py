"""Batched device probe of the HBM signature table.

The hot inner loop of inference: one table lookup per residue position of
every query protein (the reference does one cmph_search + one random mmap
read per position, ref: call_functions.tcc:276-335, cmph_kmer.h:139-147).

TPU design: the whole query batch probes in lock-step rounds of linear
probing.  Each round is one batched gather from HBM; nearly all queries
resolve in the first round (hit or empty slot), and the loop exits as soon
as every lane is resolved, bounded by the table's longest probe chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import hashing

EMPTY = 0xFFFFFFFF  # empty-slot key word (kept a plain int: jnp scalars at module level would init the backend at import)


@functools.partial(jax.jit, static_argnames=("max_probes",))
def probe_table(key_hi, key_lo, v0, v1, v2, qhi, qlo, max_probes: int):
    """Probe the table for a batch of packed queries.

    Args:
      key_hi..v2: table word arrays (size S, power of two) in HBM.
      qhi, qlo: uint32 query words, any (equal) shape.
      max_probes: static longest probe chain of this table.

    Returns (found, r0, r1, r2): found bool, value words (0 where miss).
    """
    mask = jnp.uint32(key_hi.shape[0] - 1)
    qhi = qhi.astype(jnp.uint32)
    qlo = qlo.astype(jnp.uint32)
    cur0 = hashing.hash_kmer(qhi, qlo, jnp) & mask

    def gather_round(cur, done, found, r0, r1, r2):
        khi = key_hi[cur]
        klo = key_lo[cur]
        hit = (khi == qhi) & (klo == qlo) & ~done
        empty = (khi == jnp.uint32(EMPTY)) & ~done
        r0 = jnp.where(hit, v0[cur], r0)
        r1 = jnp.where(hit, v1[cur], r1)
        r2 = jnp.where(hit, v2[cur], r2)
        found = found | hit
        done = done | hit | empty
        return done, found, r0, r1, r2

    zeros = jnp.zeros_like(qhi)
    done0 = jnp.zeros(qhi.shape, dtype=bool)
    # first round unconditionally
    done, found, r0, r1, r2 = gather_round(
        cur0, done0, done0, zeros, zeros, zeros)

    if max_probes > 1:
        def cond(state):
            i, cur, done, found, r0, r1, r2 = state
            return (i < max_probes) & ~jnp.all(done)

        def body(state):
            i, cur, done, found, r0, r1, r2 = state
            cur = (cur + jnp.uint32(1)) & mask
            done, found, r0, r1, r2 = gather_round(cur, done, found, r0, r1, r2)
            return i + 1, cur, done, found, r0, r1, r2

        _, _, done, found, r0, r1, r2 = jax.lax.while_loop(
            cond, body, (jnp.int32(1), cur0, done, found, r0, r1, r2))
    return found, r0, r1, r2


def unpack_values_jnp(r0, r1, r2):
    """-> (avg_from_end, function_index, mean, median, var) as uint32."""
    m = jnp.uint32(0xFFFF)
    return (r0 & m, r0 >> 16, r1 & m, r1 >> 16, r2 & m)


# ---------------------------------------------------------------------------
# Bucketed-cuckoo probe: exactly two 48B row-gathers per query
# ---------------------------------------------------------------------------


def probe_bucket(packed, qhi, qlo, salt: int, aux=None):
    """Probe a BucketKmerTable (see table/bucket_table.py).

    packed: (n_buckets, 3*slots) uint32 rows [khi*s, klo*s, fm*s].
    qhi/qlo: uint32 queries, any shape.
    aux: optional (n_buckets, 3*slots) rows [v0*s, v1*s, v2*s]; when given
    the full StoredKmerData words are gathered for hits.

    Returns (found, fm) or (found, fm, r0, r1, r2); fm = func<<16 | mean.
    Call under jit; `salt` must be static (close over it).
    """
    from ..table.bucket_table import bucket_hashes

    nb = packed.shape[0]
    s = packed.shape[1] // 3
    qhi = qhi.astype(jnp.uint32)
    qlo = qlo.astype(jnp.uint32)
    b1, b2 = bucket_hashes(qhi, qlo, salt, nb, jnp)

    def match(b):
        row = packed[b]  # (..., 3*slots)
        m = ((row[..., 0:s] == qhi[..., None])
             & (row[..., s:2 * s] == qlo[..., None]))
        f = m.any(axis=-1)
        # at most one slot matches; masked sum selects it exactly
        fm = jnp.sum(row[..., 2 * s:3 * s] * m.astype(jnp.uint32), axis=-1)
        return f, fm, m

    f1, fm1, m1 = match(b1)
    f2, fm2, m2 = match(b2)
    found = f1 | f2
    fm = jnp.where(f1, fm1, fm2)
    if aux is None:
        return found, fm

    # full-value path: one more row gather at the winning bucket
    bwin = jnp.where(f1, b1, b2)
    mwin = jnp.where(f1[..., None], m1, m2).astype(jnp.uint32)
    arow = aux[bwin]  # (..., 3*slots)
    r0 = jnp.sum(arow[..., 0:s] * mwin, axis=-1)
    r1 = jnp.sum(arow[..., s:2 * s] * mwin, axis=-1)
    r2 = jnp.sum(arow[..., 2 * s:3 * s] * mwin, axis=-1)
    return found, fm, r0, r1, r2


def split_fm(fm):
    """fm -> (function_index, mean) uint32."""
    return fm >> 16, fm & jnp.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# Wide-bucket probe: ONE main row-gather + a small cached overflow lookup
# ---------------------------------------------------------------------------


def _tagged_match(packed, qhi, qlo, salt: int, bits: int):
    """One gather + tag compare on a tagged single-hash store.

    Returns (bucket, match_mask_u32, found, fm)."""
    s = packed.shape[1] // 2
    L, R = hashing.perm48(qhi, qlo, salt, jnp)
    bucket, tag = hashing.wide_bucket_tag(L, R, bits, jnp)
    bucket = bucket.astype(jnp.int32)
    row = packed[bucket]  # (..., 2*slots): the single row gather
    m = row[..., 0:s] == tag[..., None]
    f = m.any(axis=-1)
    mu = m.astype(jnp.uint32)
    # at most one slot matches (tags are injective); masked sum selects it
    fm = jnp.sum(row[..., s:2 * s] * mu, axis=-1)
    return bucket, mu, f, fm


def _gather_aux(aux, bucket, mu):
    s = mu.shape[-1]
    arow = aux[bucket]  # (..., 3*slots)
    return (jnp.sum(arow[..., 0:s] * mu, axis=-1),
            jnp.sum(arow[..., s:2 * s] * mu, axis=-1),
            jnp.sum(arow[..., 2 * s:3 * s] * mu, axis=-1))


def probe_wide(packed, ov_packed, qhi, qlo, salt: int, ov_salt: int,
               bits: int, ov_bits: int, aux=None, ov_aux=None,
               ov_empty: bool = False):
    """Probe a WideKmerTable (see table/wide_table.py): one large row
    gather + one small one (dropped statically when the build had no
    overflow keys).

    Returns (found, fm) or (found, fm, r0, r1, r2).
    Call under jit; salts/bits/ov_empty must be static (close over them).
    """
    qhi = qhi.astype(jnp.uint32)
    qlo = qlo.astype(jnp.uint32)
    b1, mu1, f1, fm1 = _tagged_match(packed, qhi, qlo, salt, bits)
    if ov_empty:
        if aux is None:
            return f1, fm1
        return (f1, fm1) + _gather_aux(aux, b1, mu1)

    b2, mu2, f2, fm2 = _tagged_match(ov_packed, qhi, qlo, ov_salt, ov_bits)
    found = f1 | f2
    fm = jnp.where(f1, fm1, fm2)
    if aux is None:
        return found, fm
    r1s = _gather_aux(aux, b1, mu1)
    r2s = _gather_aux(ov_aux, b2, mu2)
    return (found, fm) + tuple(jnp.where(f1, a, b)
                               for a, b in zip(r1s, r2s))


def table_probe(table, with_aux: bool):
    """Uniform device-probe interface over the table layouts.

    Returns (fn, arrays): fn(*arrays, qhi, qlo) -> (found, fm[, r0, r1, r2])
    for use inside jit; `arrays` are the HBM-resident jnp table arrays to
    pass as jit ARGUMENTS (closing over them would bake hundreds of MB
    into the executable as constants).
    """
    from ..table.bucket_table import BucketKmerTable
    from ..table.wide_table import WideKmerTable

    arrays = table.device_arrays(with_aux=with_aux)
    if hasattr(table, "probe"):
        # protocol path: the table supplies its own probe fn
        # (e.g. table/cmph_table.py's aliasing-emulation probe)
        return table.probe(with_aux), arrays
    if isinstance(table, WideKmerTable):
        salt, ov_salt = table.salt, table.ov_salt
        bits, ov_bits = table.bits, table.ov_bits
        ov_empty = table.ov_items == 0
        if with_aux:
            def fn(packed, ov_packed, aux, ov_aux, qhi, qlo):
                return probe_wide(packed, ov_packed, qhi, qlo, salt,
                                  ov_salt, bits, ov_bits, aux, ov_aux,
                                  ov_empty)
        else:
            def fn(packed, ov_packed, qhi, qlo):
                return probe_wide(packed, ov_packed, qhi, qlo, salt,
                                  ov_salt, bits, ov_bits,
                                  ov_empty=ov_empty)
        return fn, arrays
    if isinstance(table, BucketKmerTable):
        salt = table.salt
        if with_aux:
            def fn(packed, aux, qhi, qlo):
                return probe_bucket(packed, qhi, qlo, salt, aux)
        else:
            def fn(packed, qhi, qlo):
                return probe_bucket(packed, qhi, qlo, salt, None)
        return fn, arrays
    raise TypeError(f"no device probe for table type {type(table)!r}")
