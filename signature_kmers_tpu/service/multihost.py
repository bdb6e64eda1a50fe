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

Scope: POST /query (the coalesced batch path), /fq_lookup, /lookup
(OP_LOOKUP: keep_hits gather on the tp-sharded table), /matrix
(OP_MATRIX: every rank runs the identical mesh distance compute) and
/add run on the spanning mesh; endpoints whose compute is host-side
(version, dump_*, genus_lookup, mapping/*, checkpoint) answer on rank 0
alone.  GET /quit shuts the whole fleet down (rank 0 broadcasts OP_QUIT
after its HTTP server stops).

Call dispatches OVERLAP up to SKT_SERVE_DEPTH: each dispatch's
collectives (broadcast + placement + program launch) are issued in
ticket order under the module dispatch lock; the call program
all-gathers its dp shards ON DEVICE, so result collection is a local
replica read that runs off-lock (parallel_caller.collect_batch) while
later dispatches are already in flight on every rank.
"""

from __future__ import annotations

import threading

import numpy as np

OP_QUIT = 0
OP_CALL = 1
OP_ADD = 2
OP_LOOKUP = 3   # keep_hits gather on the tp-sharded table (/lookup)
OP_MATRIX = 4   # distance compute on the spanning mesh (/matrix)

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


# broadcast payloads ride fixed shape GRIDS: broadcast_one_to_all
# compiles one program per array shape, and coalesced batches all have
# different byte lengths — unpadded, every dispatch would recompile
# (measured: multi-second per-request compile storms on the CPU mesh).
# The header carries true lengths; receivers slice the padding off.
_CODES_GRID = 1 << 16


def _pad_grid(arr: np.ndarray, grid: int) -> np.ndarray:
    n = arr.shape[0]
    m = -(-max(n, 1) // grid) * grid
    if m == n:
        return arr
    return np.concatenate([arr, np.zeros(m - n, arr.dtype)])


def _bcast_padded(arr: np.ndarray, grid: int) -> np.ndarray:
    return _bcast(_pad_grid(np.ascontiguousarray(arr), grid))


def _recv_padded(n: int, dtype, grid: int) -> np.ndarray:
    m = -(-max(n, 1) // grid) * grid
    return _bcast(np.zeros(m, dtype=dtype))[:n]


def _bcast_header(op: int = 0, a: int = 0, b: int = 0) -> np.ndarray:
    return _bcast(np.asarray([op, a, b], dtype=np.int64))


def _bcast_batch(op: int, batch) -> None:
    """Rank 0: broadcast a SequenceBatch as header + ONE padded payload
    (offsets bytes ++ codes bytes).  One rendezvous fewer per dispatch
    than separate codes/offsets broadcasts — the broadcast phase is
    serialized under the dispatch lock, so its per-dispatch cost is the
    pod service's critical path."""
    codes = batch.codes.astype(np.uint8, copy=False)
    offsets = batch.offsets.astype(np.int32, copy=False)
    _bcast_header(op, codes.shape[0], len(batch))
    buf = np.concatenate([offsets.view(np.uint8), codes])
    _bcast_padded(buf, _CODES_GRID)


def _recv_batch(a: int, b: int):
    """Follower: inverse of _bcast_batch."""
    from ..io.fasta import SequenceBatch

    off_bytes = 4 * (b + 1)
    buf = _recv_padded(off_bytes + a, np.uint8, _CODES_GRID)
    offsets = buf[:off_bytes].view(np.int32)
    codes = buf[off_bytes:]
    return SequenceBatch(codes, offsets,
                         [f"s{i}" for i in range(b)], [""] * b)


class MultihostCaller:
    """Wraps a ParallelFunctionCaller on a process-spanning mesh.

    Rank 0 owns the only instance in broadcasting mode: every collective
    ``call_batch`` first broadcasts the batch bytes so the follower
    ranks enter the same program.  The module-global ``_dispatch_lock``
    serializes dispatches — the asyncio service runs batches in executor
    threads, and interleaved broadcasts from two threads (or from an old
    caller instance surviving an /add swap) would deadlock the
    collective order.

    ``keep_hits`` batches (OP_LOOKUP) gather against the tp-sharded
    table — collective, broadcast, and executed synchronously under the
    lock (lookups are rare admin/debug operations).
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

    def dispatch_batch(self, batch, keep_hits: bool = False):
        """Broadcast the batch and launch the collective dispatch, all
        under the module dispatch lock — so every rank enqueues this
        call's collective program(s) in the same ticket order.  The
        returned handle is collected OUTSIDE the lock (collect is a
        local replica read, no collectives), which is what lets up to
        SKT_SERVE_DEPTH batches overlap at pod scale (the reference
        server's threadpool concurrency, kmer_request_server.cc:56-126,
        recast for a collective device fleet)."""
        if keep_hits:
            # /lookup gathers against the TP-SHARDED table (the mesh
            # gather_hits_batch override) — a collective program, so it
            # is broadcast and executed under the lock like any dispatch
            with _dispatch_lock:
                _check_live()
                _bcast_batch(OP_LOOKUP, batch)
                return ("local",
                        self.inner.call_batch(batch, keep_hits=True))
        with _dispatch_lock:
            _check_live()
            _bcast_batch(OP_CALL, batch)
            return self.inner.dispatch_batch(batch)

    def collect_batch(self, handle):
        if isinstance(handle, tuple) and handle and handle[0] == "local":
            return handle[1]
        return self.inner.collect_batch(handle)

    def call_batch(self, batch, keep_hits: bool = False):
        return self.collect_batch(self.dispatch_batch(batch, keep_hits))


def broadcast_add(body: bytes) -> None:
    """Rank 0: announce an /add body so every rank rebuilds its table.

    The caller (AnnotationService.add_text) holds the reentrant
    dispatch lock across this broadcast AND its own rebuild+swap, so no
    call dispatch can slip between OP_ADD and the engine swap."""
    payload = np.frombuffer(body, dtype=np.uint8).copy()
    with _dispatch_lock:
        _check_live()
        _bcast_header(OP_ADD, payload.shape[0], 0)
        _bcast_padded(payload, _CODES_GRID)


def broadcast_matrix(body: bytes) -> None:
    """Rank 0: announce a /matrix body; every rank runs the identical
    distance compute on the spanning mesh (caller holds the dispatch
    lock across this broadcast AND the compute — the matrix program's
    collectives must not interleave with call dispatches)."""
    payload = np.frombuffer(body, dtype=np.uint8).copy()
    with _dispatch_lock:
        _check_live()
        _bcast_header(OP_MATRIX, payload.shape[0], 0)
        _bcast_padded(payload, _CODES_GRID)


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

    Call dispatches are NOT collected synchronously: the follower
    launches the collective program and immediately returns to the
    broadcast receive, so rank 0 can keep several batches in flight
    (the broadcast order IS the program order on every rank; collection
    is a local replica read with no collectives and can lag).  A
    bounded deque caps in-flight outputs and surfaces execution errors;
    the (caller, handle) pair keeps a swapped-out engine alive until
    its batches have drained past an /add.
    """
    import os
    from collections import deque

    depth = max(1, int(os.environ.get("SKT_SERVE_DEPTH", "4")))
    pending: deque = deque()

    def _collect_oldest():
        caller, handle = pending.popleft()
        caller.collect_batch(handle)

    import sys

    while True:
        op, a, b = (int(x) for x in _bcast_header())
        if op == OP_QUIT:
            while pending:
                _collect_oldest()
            return
        # Handler bodies catch-and-continue: a DETERMINISTIC compute
        # error (a bad /matrix body, a lookup edge case) raises
        # identically on every rank — rank 0's HTTP handler turns it
        # into a 500 and keeps serving, so the follower must stay in
        # the loop too (exiting would leave rank 0's next broadcast
        # hanging on a peerless collective until the heartbeat abort).
        # Asymmetric failures (single-rank OOM) still diverge and end
        # in the coordination-service abort, exactly as before.
        try:
            if op == OP_CALL:
                batch = _recv_batch(a, b)
                # re-read per op: /add swaps service.engines (followers
                # never wrap in MultihostCaller — only rank 0 does)
                caller = service.engines.caller
                pending.append((caller, caller.dispatch_batch(batch)))
                while len(pending) > depth:
                    _collect_oldest()
            elif op == OP_LOOKUP:
                batch = _recv_batch(a, b)
                # synchronous, like rank 0 (the lookup gather is
                # collective, held under rank 0's lock for its duration)
                service.engines.caller.call_batch(batch, keep_hits=True)
            elif op == OP_MATRIX:
                payload = _recv_padded(a, np.uint8, _CODES_GRID)
                from ..io import fasta as fasta_io

                batch = fasta_io.SequenceBatch.from_records(
                    fasta_io.iter_fasta(payload.tobytes()))
                service.engines.distance.compute([batch],
                                                 mesh=service.mesh)
            elif op == OP_ADD:
                payload = _recv_padded(a, np.uint8, _CODES_GRID)
                service.add_text(payload.tobytes(), _broadcast=False)
        except Exception as e:  # noqa: BLE001 — mirror rank 0's catch
            print(f"follower: op {op} failed (continuing, rank 0 "
                  f"reports the error to its client): {e!r}",
                  file=sys.stderr, flush=True)
