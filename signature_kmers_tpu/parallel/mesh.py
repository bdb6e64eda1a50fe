"""Device mesh construction and sharding policy.

Axes:
  dp — data parallel: query/window batches sharded by row.  The reference's
       only scaling axis was file sharding across jobs
       (ref: kmers-matrix-distance-folder.cc:108-116); dp is its in-process,
       collective-merged replacement.
  tp — table parallel: the signature table sharded by key-owner across
       devices when it exceeds a single HBM; replicated when small.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int | None = None, tp: int | None = None,
              devices=None, local: bool = False):
    """Build the (dp, tp) mesh.

    devices: explicit device list (overrides everything else).
    local: use only THIS process's devices — the per-process mesh for
    multi-host runs where each process works a disjoint input slice
    (slicing jax.devices() would hand every rank process 0's devices).
    Default: the global device list (spans processes under
    jax.distributed).
    """
    import jax
    from jax.sharding import Mesh

    if devices is not None:
        devs = list(devices)
    elif local:
        devs = jax.local_devices()
    else:
        devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 4 else 1
    assert n % tp == 0, (n, tp)
    dp = n // tp
    return Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))


def dp_size(mesh) -> int:
    return mesh.shape["dp"]


def tp_size(mesh) -> int:
    return mesh.shape["tp"]
