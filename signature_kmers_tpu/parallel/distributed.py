"""Multi-host runtime initialization.

The reference has no in-process multi-node support at all — multi-machine
operation is "run many binaries on disjoint files and merge text outputs"
(SURVEY §5).  Here multi-host runs use the standard JAX distributed
runtime: every host calls :func:`initialize` (env-driven or explicit),
after which ``jax.devices()`` spans the pod slice and the meshes built by
parallel.mesh cover all chips — collectives ride ICI within a slice and
DCN across slices, with no further code changes in the pipelines.

Typical launch (per host):

    SKT_COORDINATOR=host0:9731 SKT_NUM_PROCESSES=4 SKT_PROCESS_ID=$RANK \
        python -m signature_kmers_tpu.cli.main call-functions ...
"""

from __future__ import annotations

import os

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed when multi-host env/args are present.

    Returns True when running distributed, False for single-host runs.
    Safe to call multiple times."""
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("SKT_COORDINATOR")
    if num_processes is None:
        env = os.environ.get("SKT_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("SKT_PROCESS_ID")
        process_id = int(env) if env else None

    if not coordinator:
        # On TPU pods, jax.distributed can self-discover; only initialize
        # when explicitly requested to avoid surprising single-host runs.
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def process_info():
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main() -> bool:
    import jax

    return jax.process_index() == 0


def shard_inputs(items):
    """This process's slice of a work list (round-robin by process id).

    The multi-host replacement for the reference's "each job takes
    disjoint files" sharding (ref: kmers-matrix-distance-folder.cc:108-116
    + the skip-existing restart check): every process parses and computes
    only its own inputs, so I/O scales with the number of processes.
    Identity for single-process runs."""
    import jax

    n = jax.process_count()
    if n <= 1:
        return list(items)
    return list(items)[jax.process_index()::n]


def barrier(name: str = "skt_barrier") -> None:
    """Block until every process reaches this point (no-op single-process)."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def merge_shards(target) -> None:
    """Rank 0 concatenates per-process output shards into `target`.

    Protocol shared by the multi-host CLIs: every process wrote
    `<target>.shard<pid:05d>`; after the callers' barrier, rank 0
    streams the shards together in process order (binary mode — byte
    exact for any text encoding, constant memory) and unlinks them.
    Call distributed.barrier() before AND after (writers must be done;
    readers must wait for the merge).

    Requires a SHARED FILESYSTEM: rank 0 must be able to read every
    rank's shard path (the reference's folder/merge model has the same
    requirement — jobs write into one output directory,
    kmers-matrix-distance-folder.cc:108-116).  Without shared storage,
    point the output at a network mount or merge the per-rank shards
    out of band."""
    import shutil

    import jax

    if not is_main():
        return
    with open(target, "wb") as merged:
        for p in range(jax.process_count()):
            sp = f"{target}.shard{p:05d}"
            try:
                f = open(sp, "rb")
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"merge_shards: shard {sp!r} of process {p} is not "
                    f"visible on process 0 — multi-host output merging "
                    f"requires a shared filesystem (every rank writes "
                    f"<output>.shardNNNNN next to the final output)."
                ) from None
            with f:
                shutil.copyfileobj(f, merged)
            os.unlink(sp)


def is_multiprocess_mesh(mesh) -> bool:
    """Does this mesh span devices of more than one process?"""
    import jax

    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def put_global(mesh, spec, arr):
    """Place a host array onto the mesh with an explicit NamedSharding.

    Works for single-process meshes AND process-spanning meshes (each
    process must pass the same logical array; jax.device_put fills the
    locally addressable shards)."""
    import jax
    from jax.sharding import NamedSharding

    return jax.device_put(arr, NamedSharding(mesh, spec))


def fetch_replicated(x) -> "np.ndarray":
    """Read a REPLICATED device array to host without any collective.

    For fully-addressable arrays this is a plain conversion.  On a
    process-spanning mesh a replicated array (out_specs P(None, ...)) is
    not "fully addressable", but every process holds complete replicas —
    one local shard read returns the whole value.  This is what lets
    multihost serve collect results outside the dispatch-order lock:
    collection issues no Gloo/ICI traffic at all."""
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    shard = x.addressable_shards[0]
    arr = np.asarray(shard.data)
    if arr.shape != x.shape:
        raise ValueError(
            f"fetch_replicated: array is not replicated (local shard "
            f"{arr.shape} != global {x.shape}); use fetch_global")
    return arr


def fetch_global(x) -> "np.ndarray":
    """Read a device array back to host on every process.

    Fully-addressable arrays convert directly; process-spanning arrays go
    through a tiled process_allgather so every process sees the full
    logical value."""
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
