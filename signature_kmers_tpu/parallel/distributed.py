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
