"""Tracing and timing harness.

The reference's only profiling is compile-time gperftools hooks
(kmers-server.cc:279-290) and ad-hoc chrono prints.  Here:

- :func:`trace` wraps a block in a JAX profiler trace (Perfetto/XPlane,
  viewable in TensorBoard or ui.perfetto.dev);
- :class:`PhaseTimer` collects per-phase wall times with device sync;
- :func:`roofline` reports bytes/FLOP estimates for the probe kernel.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the wrapped block when log_dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class PhaseTimer:
    """Accumulates per-phase wall time; `sync=True` blocks on the device
    queue so times reflect completed device work."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                import jax

                jax.block_until_ready(sync_value)
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.phases.values()) or 1.0
        lines = [f"{name}: {dt * 1e3:.1f} ms ({dt / total:.0%})"
                 for name, dt in sorted(self.phases.items(),
                                        key=lambda kv: -kv[1])]
        return "\n".join(lines)


def probe_roofline(n_windows: int, table_bytes: int,
                   main_row_bytes: int = 16, leaf_row_bytes: int = 16) -> dict:
    """Bytes-accessed accounting for the table probe.

    Wide layout (default): one main row + one overflow-leaf row per
    window.  Note gather cost on this chip is TRANSACTION-quantized, not
    byte-proportional (docs/PERF.md) — bytes are a lower bound, the
    per-gather latency model is the binding one."""
    stream_bytes = n_windows * (4 + 4 + 1)  # hi, lo, valid
    gather_bytes = n_windows * (main_row_bytes + leaf_row_bytes)
    return {
        "windows": n_windows,
        "gather_bytes": gather_bytes,
        "stream_bytes": stream_bytes,
        "table_bytes": table_bytes,
        "bytes_per_window": (gather_bytes + stream_bytes) / max(n_windows, 1),
    }
