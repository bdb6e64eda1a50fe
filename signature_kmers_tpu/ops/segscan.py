"""Segmented scans over boundary-flagged sorted runs — the scatter-free
building block of the build-selection pass.

The reference groups k-mer occurrences in a TBB concurrent multimap and
reduces each group serially (signature_build.tcc:184-293).  The first TPU
port used `jax.ops.segment_{sum,max,min}` + a `[segment_id]` gather per
reduction; both the scatter and the gather are transaction-quantized
random access (~12-22 ns/element, docs/PERF.md) and dominated the pass.
`lax.associative_scan` with a (reset-flag, values) carry is O(n) work of
purely contiguous traffic, so a segmented reduction costs about as much
as a cumsum.

Conventions: segments are contiguous runs; `start` flags mark each run's
first element.  Forward scans produce prefix-within-segment reductions
(the full reduction lands on the run's LAST element); `reverse=True`
produces suffix reductions (full value on the run's FIRST element).  For
a full-segment broadcast, combine both directions (`seg_bcast`).

Implementation is log-doubling (Hillis-Steele) over statically shifted
arrays, NOT `lax.associative_scan`: the recursive odd/even interleave
associative_scan lowers to is pathologically slow to compile/run at
2e7 elements on this backend, while ceil(log2 n) shifted elementwise
steps compile small and run at memory speed.

Sums use int32 with wraparound; a segment's true sum must fit in int32
(the selection pass bounds every summed channel to 16 bits x <= 32767
occurrences, FIDELITY.md).
"""

from __future__ import annotations


def _scan(combine, flags, vals, reverse):
    import jax.numpy as jnp

    flags = flags.astype(jnp.bool_)
    if reverse:
        # suffix reduction: segments scanned back-to-front reset at the
        # element BEFORE a start flag, i.e. at run ends.  Flip, scan with
        # end flags (= start flags shifted left), flip back.
        ends = jnp.concatenate([flags[1:], jnp.ones((1,), jnp.bool_)])
        out = _scan(combine, ends[::-1],
                    tuple(v[::-1] for v in vals), reverse=False)
        return tuple(v[::-1] for v in out)

    n = flags.shape[0]
    # invariant after processing offset d: vs[i] = reduction over
    # (max(seg_start_i, i-2d+1) .. i], f[i] = "a segment start lies in
    # (i-2d+1 .. i]"
    f = flags
    vs = list(vals)
    d = 1
    while d < n:
        fsh = jnp.concatenate([jnp.ones((d,), jnp.bool_), f[:-d]])
        absorb = ~f
        vs = [jnp.where(absorb,
                        op(v, jnp.concatenate([v[:d], v[:-d]])), v)
              for op, v in zip(combine, vs)]
        f = f | fsh
        d <<= 1
    return tuple(vs)


def seg_scan(combine, start_flags, *vals, reverse: bool = False):
    """Segmented scan of one or more value lanes sharing the flags.

    combine: per-lane binary ops, e.g. (jnp.add, jnp.minimum).  Returns a
    tuple of scanned lanes (prefix reductions; suffix when reverse)."""
    assert len(combine) == len(vals)
    return _scan(tuple(combine), start_flags, tuple(vals), reverse)


def seg_bcast(op, start_flags, x):
    """Full-segment reduction of `x` broadcast to every element: the
    elementwise combine of the forward prefix and reverse suffix scans."""
    (fwd,) = _scan((op,), start_flags, (x,), reverse=False)
    (bwd,) = _scan((op,), start_flags, (x,), reverse=True)
    return op(fwd, bwd)


def run_starts(key_words):
    """Boundary flags: element i starts a run of the (multi-word) key."""
    import jax.numpy as jnp

    first = jnp.zeros(key_words[0].shape[0], jnp.bool_).at[0].set(True)
    neq = first
    for w in key_words:
        neq = neq | (w != jnp.concatenate([w[:1], w[:-1]]))
    return neq
