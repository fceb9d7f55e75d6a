"""Tracing / profiling / observability (SURVEY.md section 5).

The reference's tooling is a compiled-out DEBUG_PRINT macro plus ALGLIB's
iteration report surfaced as a node message (src/SOP_FaceDeform.hpp:22-26,
src/SOP_FaceDeform.cpp:369-373).  The rebuild provides:

  * stage(name)        — context manager: wall-clock per pipeline stage with
                         a real device sync (scalar pull — block_until_ready
                         does not fence on tunneled TPU runtimes), nested
                         under jax.profiler traces when active;
  * StageTimes         — collected per-stage milliseconds, the solve/eval
                         split being the headline observability metric;
  * trace(path)        — jax.profiler wrapper for TensorBoard-compatible
                         device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


class StageTimes:
    """Accumulates per-stage wall-clock times across a cook/run."""

    def __init__(self) -> None:
        self.ms: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def add(self, name: str, ms: float) -> None:
        self.ms[name] = self.ms.get(name, 0.0) + ms
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        parts = [
            f"{k}: {v:.2f}ms" + (f" x{self.counts[k]}" if self.counts[k] > 1 else "")
            for k, v in sorted(self.ms.items(), key=lambda kv: -kv[1])
        ]
        return ", ".join(parts)

    def __repr__(self) -> str:
        return f"StageTimes({self.summary()})"


def sync(*arrays) -> None:
    """Fence device execution.  On tunneled TPU runtimes block_until_ready
    returns before execution completes; pulling a scalar does not."""
    for a in arrays:
        if isinstance(a, jnp.ndarray):
            float(jnp.sum(jnp.ravel(a)[:1]))
            return


@contextlib.contextmanager
def stage(name: str, times: Optional[StageTimes] = None, *sync_arrays):
    """Time a pipeline stage; annotates the device trace via named_scope.

    Pass the stage's device outputs as sync_arrays to include their
    execution in the measurement; host-only stages need none (and must not
    trigger a device round-trip — backend init would be misattributed)."""
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    sync(*sync_arrays)
    ms = (time.perf_counter() - t0) * 1e3
    if times is not None:
        times.add(name, ms)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
