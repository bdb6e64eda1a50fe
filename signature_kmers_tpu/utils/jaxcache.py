"""Persistent XLA compilation cache setup.

First compiles are the dominant cost of small runs (20-40s on TPU);
enabling the on-disk cache makes repeat CLI invocations and test runs
start warm.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    _enabled = True
    # default inside the repo so the cache travels with the checkout
    repo_default = Path(__file__).resolve().parents[2] / ".jax_cache"
    cache_dir = cache_dir or os.environ.get(
        "SKT_JAX_CACHE_DIR", str(repo_default))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          "all")
    except Exception:
        pass
