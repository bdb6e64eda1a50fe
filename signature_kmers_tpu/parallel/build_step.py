"""Multi-chip signature build step: dp-sharded windows, all-to-all k-mer
routing, exact local selection.

Scheme (the collective replacement for the reference's single-process TBB
multimap, signature_build.h:61):

  1. each dp shard owns a slice of the extracted window/attribute arrays;
  2. windows are routed to their k-mer's owner shard (top hash bits) with
     jax.lax.all_to_all, so every k-mer's full occurrence set lands on one
     device — statistics are exact, no approximate merging;
  3. each shard runs the same sort+segment selection as the single-chip
     path (models.signature_builder._select_signatures_jax) on the windows
     it owns.

Entries are padded with SENTINEL keys (0xFFFFFF words — above any valid
24-bit window word, so they sort last and survive the packed 2-word sort
keys in _select_signatures_jax) and are filtered after gathering.
"""

from __future__ import annotations

import numpy as np

from ..models.signature_builder import (_extract_windows_jax,
                                        _finalize_stats_np, _grid,
                                        _select_signatures_jax)
from ..ops import hashing

SENTINEL = np.uint32(0xFFFFFF)  # > max valid word 0xCF3CF3 (4x code 51)


def _route_and_select(hi_l, lo_l, f_l, o_l, p_l, s_l, ndp: int, cap: int,
                      threshold: float):
    """Per-shard body: bucket windows by k-mer owner, all-to-all route,
    run the local selection pass."""
    import jax
    import jax.numpy as jnp

    n_local = hi_l.shape[0]
    # --- bucket by owner shard -------------------------------------
    valid = hi_l != SENTINEL
    if ndp == 1:
        owner_raw = jnp.zeros_like(hi_l, dtype=jnp.uint32)
    else:
        bits = ndp.bit_length() - 1
        owner_raw = hashing.hash_kmer(hi_l, lo_l, jnp) >> np.uint32(32 - bits)
    owner = jnp.where(valid, owner_raw, jnp.uint32(ndp))
    order = jnp.argsort(owner, stable=True)
    owner_s = owner[order]
    idx = jnp.arange(n_local, dtype=jnp.int32)
    # rank within bucket
    bucket_start = jnp.searchsorted(
        owner_s, jnp.arange(ndp + 1, dtype=jnp.uint32)).astype(jnp.int32)
    rank = idx - bucket_start[jnp.minimum(
        owner_s, jnp.uint32(ndp)).astype(jnp.int32)]

    fields = jnp.stack([
        jax.lax.bitcast_convert_type(hi_l[order], jnp.int32),
        jax.lax.bitcast_convert_type(lo_l[order], jnp.int32),
        f_l[order], o_l[order], p_l[order], s_l[order],
    ], axis=-1)  # (n_local, 6)

    send = jnp.full((ndp, cap, 6), -1, dtype=jnp.int32)
    keep_entry = (owner_s < ndp) & (rank < cap)
    # dropped entries are routed to the out-of-bounds bucket `ndp`
    # and discarded by mode="drop"
    send = send.at[
        jnp.where(keep_entry, owner_s.astype(jnp.int32), ndp),
        jnp.where(keep_entry, rank, 0)].set(fields, mode="drop")

    recv = jax.lax.all_to_all(send, "dp", split_axis=0, concat_axis=0,
                              tiled=True)
    recv = recv.reshape(ndp * cap, 6)

    r_hi = jax.lax.bitcast_convert_type(recv[:, 0], jnp.uint32)
    r_lo = jax.lax.bitcast_convert_type(recv[:, 1], jnp.uint32)
    r_valid = recv[:, 2] >= 0
    r_hi = jnp.where(r_valid, r_hi, SENTINEL)
    r_lo = jnp.where(r_valid, r_lo, SENTINEL)

    return _select_signatures_jax(
        r_hi, r_lo,
        jnp.where(r_valid, recv[:, 2], 0),
        jnp.where(r_valid, recv[:, 3], 0),
        jnp.where(r_valid, recv[:, 4], 0),
        jnp.where(r_valid, recv[:, 5], 0),
        threshold)


def build_step_sharded(mesh, hi, lo, func, off, plen, sid,
                       threshold: float = 0.8, bucket_cap: int | None = None):
    """Run the sharded selection from pre-extracted window attributes.
    Inputs are global flat arrays whose length is divisible by the dp
    size.  Returns per-entry arrays (global, padded with SENTINEL groups)
    matching _select_signatures_jax outputs.
    """
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ndp = mesh.shape["dp"]
    n = int(hi.shape[0])  # works for numpy arrays and jit tracers alike
    assert n % ndp == 0, (n, ndp)
    n_local = n // ndp
    cap = bucket_cap or n_local  # worst case: every local window same owner

    fn = shard_map(
        lambda *a: _route_and_select(*a, ndp, cap, threshold), mesh=mesh,
        in_specs=(P("dp"),) * 6,
        out_specs=(P("dp"),) * 14,
    )
    from . import distributed

    def put(a, dt):
        # host arrays get an explicit global placement (required on
        # process-spanning meshes); tracers pass through untouched
        if isinstance(a, np.ndarray):
            return distributed.put_global(mesh, P("dp"), a.astype(dt))
        return jnp.asarray(a, dt)

    return fn(put(hi, np.uint32), put(lo, np.uint32), put(func, np.int32),
              put(off, np.int32), put(plen, np.int32), put(sid, np.int32))


def pack_corpus_sharded(codes, sids, fidxs, plens, ndp: int):
    """Host: split sequences into ndp contiguous row-balanced groups and
    pack each in the 16-code-aligned 8-bit row transfer format
    (ops/kmer_pack.pack_u8_rows; no device unpack — see there).

    Returns (packed (ndp, Rl*16) uint8, starts (ndp, Bg) int32,
    meta (ndp, 3, Bg) int32 [fidx, plen, sid]); padding rows are
    all-INVALID codes, padding metadata entries point out of range.
    """
    from ..ops import kmer_pack

    B = plens.shape[0]
    spans = -(-plens.astype(np.int64) // kmer_pack.ALIGN)
    row_cum = np.cumsum(spans)
    total = int(row_cum[-1]) if B else 0
    targets = (np.arange(1, ndp) * total) // max(ndp, 1)
    # side="right": a sequence whose cumulative row count lands exactly
    # on a target stays in the LEFT group (side="left" produced an empty
    # first shard and a doubled last shard on evenly divisible corpora)
    bounds = np.concatenate(
        [[0], np.searchsorted(row_cum, targets, side="right"), [B]])
    seq_off = np.zeros(B + 1, np.int64)
    np.cumsum(plens, out=seq_off[1:])

    group_rows = [int(row_cum[b - 1] - (row_cum[a - 1] if a else 0))
                  if b > a else 0
                  for a, b in zip(bounds[:-1], bounds[1:])]
    Rl = _grid(max(group_rows))
    Bg = _grid(int((bounds[1:] - bounds[:-1]).max()))
    n_loc = Rl * kmer_pack.ALIGN

    packed = np.empty((ndp, Rl * kmer_pack.ALIGN), np.uint8)
    starts = np.full((ndp, Bg), n_loc, np.int32)
    meta = np.zeros((ndp, 3, Bg), np.int32)
    for g in range(ndp):
        a, b = int(bounds[g]), int(bounds[g + 1])
        pl = plens[a:b]
        rs = np.zeros(b - a + 1, np.int64)
        np.cumsum(spans[a:b], out=rs[1:])
        packed[g] = kmer_pack.pack_u8_rows(
            codes, seq_off[a:b], pl, rs, Rl)
        starts[g, :b - a] = rs[:-1] * kmer_pack.ALIGN
        meta[g, 0, :b - a] = fidxs[a:b]
        meta[g, 1, :b - a] = pl
        meta[g, 2, :b - a] = sids[a:b]
    return packed, starts, meta


def build_step_from_seqs_arrays(mesh, packed, starts, fidxs, plens, sids,
                                threshold: float = 0.8,
                                bucket_cap: int | None = None):
    """Device half of build_step_from_seqs: takes pack_corpus_sharded's
    stacked arrays (jit-friendly — __graft_entry__ traces it inside the
    multi-chip train step)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ndp = mesh.shape["dp"]
    n_local = packed.shape[1]  # flat u8 codes per shard
    cap = bucket_cap or n_local

    def extract_route_select(pk, st, f_l, p_l, s_l):
        win = _extract_windows_jax(pk[0], st[0], f_l[0], p_l[0], s_l[0])
        return _route_and_select(*win, ndp, cap, threshold)

    fn = shard_map(
        extract_route_select, mesh=mesh,
        in_specs=(P("dp"),) * 5,
        out_specs=(P("dp"),) * 14,
    )
    return fn(packed, starts, fidxs, plens, sids)


def build_step_from_seqs(mesh, codes, sids, fidxs, plens,
                         threshold: float = 0.8,
                         bucket_cap: int | None = None):
    """Sharded selection from the raw corpus: sequences are dp-sharded
    in the 8-bit packed transfer format (1 B/residue up the link per
    shard instead of 24 B/window), windows extracted ON DEVICE per shard
    (_extract_windows_jax), then k-mer-routed with all-to-all exactly
    like build_step_sharded."""
    import jax.numpy as jnp

    ndp = mesh.shape["dp"]
    packed, starts, meta = pack_corpus_sharded(codes, sids, fidxs, plens,
                                               ndp)
    from jax.sharding import PartitionSpec as P

    from . import distributed

    put = lambda a: distributed.put_global(  # noqa: E731
        mesh, P("dp", *((None,) * (a.ndim - 1))), a)
    return build_step_from_seqs_arrays(
        mesh, put(packed), put(starts),
        put(np.ascontiguousarray(meta[:, 0])),
        put(np.ascontiguousarray(meta[:, 1])),
        put(np.ascontiguousarray(meta[:, 2])), threshold, bucket_cap)


def finalize_sharded(outputs):
    """Host finalization of build_step_sharded outputs -> kept arrays.

    Mirrors SignatureBuilder._select's host step, additionally dropping
    SENTINEL padding groups."""
    from .distributed import fetch_global

    (hi1, lo1, s1, kstart, keep, best_func, ktotal, best_count,
     s_best, sum_sq_hi, sum_sq_lo, med_lo, med_hi,
     avg_from_end) = map(fetch_global, outputs)
    reps = kstart & keep & (hi1 != SENTINEL)
    ridx = np.nonzero(reps)[0]
    mean_u16, median_u16, var_u16 = _finalize_stats_np(
        best_count[ridx], s_best[ridx], sum_sq_hi[ridx], sum_sq_lo[ridx],
        med_lo[ridx], med_hi[ridx])
    out = dict(
        hi=hi1[ridx].astype(np.uint32),
        lo=lo1[ridx].astype(np.uint32),
        avg_from_end=(avg_from_end[ridx] & 0xFFFF).astype(np.uint16),
        function_index=best_func[ridx].astype(np.uint16),
        mean=mean_u16, median=median_u16, var=var_u16,
    )
    # global sort by key (shards own disjoint key ranges but hash order
    # differs from key order)
    order = np.lexsort((out["lo"], out["hi"]))
    return {k: v[order] for k, v in out.items()}
