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


def make_mesh(n_devices: int | None = None, tp: int | None = None):
    import jax
    from jax.sharding import Mesh

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
