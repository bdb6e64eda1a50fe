"""Rank-0 HTTP front-end over a process-spanning (dp x tp) mesh.

The BASELINE service config is a streaming annotation service on a pod
slice: the signature table tp-sharded across all chips, queries
dp-sharded, one HTTP front-end.  The reference's server is a
single-process asio loop (kmer_request_server.cc:132-199); this module
is its pod-scale replacement.

Under ``jax.distributed`` every process must execute the same collective
program, so rank 0 (the HTTP server) broadcasts a small (op, payload)
frame to all ranks before every mesh dispatch, and follower ranks run
:func:`follower_loop`, executing the identical ParallelFunctionCaller
program on their devices.  ``multihost_utils.broadcast_one_to_all``
carries the host data over the distributed runtime (two phases: a fixed
header with op + shapes, then the shaped payload).

Scope: POST /query (the coalesced batch path), /fq_lookup and /add run
on the spanning mesh; endpoints whose compute is host-side (version,
dump_*, genus_lookup, mapping/*, checkpoint) answer on rank 0 alone.
/lookup (keep_hits) and /matrix fall back to rank 0's local device —
exact, but not table-sharded (they inherit ParallelFunctionCaller's own
keep_hits fallback).  GET /quit shuts the whole fleet down (rank 0
broadcasts OP_QUIT after its HTTP server stops).
"""

from __future__ import annotations

import threading

import numpy as np

OP_QUIT = 0
OP_CALL = 1
OP_ADD = 2

_HEADER_LEN = 3

# One MODULE-GLOBAL reentrant dispatch lock serializes every broadcast
# sequence a rank-0 thread can start (call dispatches, /add rebuilds,
# /quit).  Followers execute broadcasts in one strict order; rank 0 runs
# HTTP handlers on executor threads plus the event loop, and /add swaps
# in a fresh MultihostCaller instance — a per-instance lock would let an
# in-flight dispatch on the OLD caller interleave with the first
# dispatch on the NEW one (or with broadcast_add/broadcast_quit, which
# are plain functions).  Everything that broadcasts takes this lock.
#
# CRITICALLY, the lock must also make {engines-snapshot read -> OP_CALL
# broadcast} atomic against {OP_ADD broadcast -> engines swap}: the
# follower's program order is its broadcast-receive order, so an OP_CALL
# broadcast AFTER OP_ADD must run on the NEW engines on BOTH sides.  A
# lock-free snapshot read let rank 0 dispatch an old (already-placed)
# caller against a follower running its new (unplaced) caller — the two
# ranks' lazy table placements then issue different Gloo transfer
# sequences and the runtime aborts with a collective size mismatch
# (observed: 2 MB table placement vs 12 KB input rows).  Reentrant
# because service._call_batch holds it around MultihostCaller.call_batch
# (which takes it again), and add_text holds it across broadcast_add +
# its own rebuild.
_dispatch_lock = threading.RLock()

# set (under the lock) once OP_QUIT has been broadcast: the followers
# have exited their loops, so any later broadcast would block forever
# waiting for peers.  Guarded dispatchers raise instead — a queued /add
# or /query racing shutdown gets a clean 500, not a fleet hang.
_quit_sent = False


def reset_quit() -> None:
    """Re-arm the fleet after a serve()/quit cycle.

    The quit latch is module state (it guards module-level broadcast
    functions); without a reset, any LATER multihost AnnotationService
    constructed in the same process would get a permanent RuntimeError
    on every dispatch.  Called when a new multihost service is built
    (every rank constructs one before serving / following)."""
    global _quit_sent
    with _dispatch_lock:
        _quit_sent = False


def _check_live() -> None:
    if _quit_sent:
        raise RuntimeError("multihost service is shutting down "
                           "(OP_QUIT already broadcast)")


def _bcast(arr):
    """Broadcast a host array from rank 0 to every process."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(arr))


def _bcast_header(op: int = 0, a: int = 0, b: int = 0) -> np.ndarray:
    return _bcast(np.asarray([op, a, b], dtype=np.int64))


class MultihostCaller:
    """Wraps a ParallelFunctionCaller on a process-spanning mesh.

    Rank 0 owns the only instance in broadcasting mode: every collective
    ``call_batch`` first broadcasts the batch bytes so the follower
    ranks enter the same program.  The module-global ``_dispatch_lock``
    serializes dispatches — the asyncio service runs batches in executor
    threads, and interleaved broadcasts from two threads (or from an old
    caller instance surviving an /add swap) would deadlock the
    collective order.

    ``keep_hits`` batches take ParallelFunctionCaller's own local
    fallback and are NOT broadcast (no collectives on that path).
    """

    def __init__(self, inner):
        self.inner = inner

    # attribute surface the service/batcher touches
    @property
    def function_at_index(self):
        return self.inner.function_at_index

    @property
    def config(self):
        return self.inner.config

    @property
    def host_fallback_frac(self):
        return self.inner.host_fallback_frac

    def call_batch(self, batch, keep_hits: bool = False):
        if keep_hits:
            # local fallback path in ParallelFunctionCaller: no
            # collectives, so no broadcast required
            return self.inner.call_batch(batch, keep_hits=True)
        with _dispatch_lock:
            _check_live()
            codes = np.ascontiguousarray(batch.codes, dtype=np.uint8)
            offsets = np.ascontiguousarray(batch.offsets, dtype=np.int32)
            _bcast_header(OP_CALL, codes.shape[0], len(batch))
            _bcast(codes)
            _bcast(offsets)
            return self.inner.call_batch(batch)


def broadcast_add(body: bytes) -> None:
    """Rank 0: announce an /add body so every rank rebuilds its table.

    The caller (AnnotationService.add_text) holds the reentrant
    dispatch lock across this broadcast AND its own rebuild+swap, so no
    call dispatch can slip between OP_ADD and the engine swap."""
    payload = np.frombuffer(body, dtype=np.uint8).copy()
    with _dispatch_lock:
        _check_live()
        _bcast_header(OP_ADD, payload.shape[0], 0)
        _bcast(payload)


def broadcast_quit() -> None:
    global _quit_sent
    with _dispatch_lock:
        if _quit_sent:
            return
        _bcast_header(OP_QUIT, 0, 0)
        _quit_sent = True


def follower_loop(service) -> None:
    """Ranks > 0: execute rank 0's broadcast ops until OP_QUIT.

    ``service`` is this rank's AnnotationService built on the same data
    dir and the same process-spanning mesh (its engines hold this rank's
    table shards).
    """
    from ..io.fasta import SequenceBatch

    while True:
        op, a, b = (int(x) for x in _bcast_header())
        if op == OP_QUIT:
            return
        if op == OP_CALL:
            codes = _bcast(np.zeros(a, dtype=np.uint8))
            offsets = _bcast(np.zeros(b + 1, dtype=np.int32))
            batch = SequenceBatch(codes, offsets,
                                  [f"s{i}" for i in range(b)], [""] * b)
            # re-read per op: /add swaps service.engines (followers never
            # wrap in MultihostCaller — _make_engines only wraps rank 0)
            service.engines.caller.call_batch(batch)
        elif op == OP_ADD:
            payload = _bcast(np.zeros(a, dtype=np.uint8))
            service.add_text(payload.tobytes(), _broadcast=False)
