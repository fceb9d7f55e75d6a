"""Cold-compile bootstrap: precompile the common program set.

The remote-compile TPU runtime pays 10-240 s per jit program on first
sight (CLAUDE.md), amortized only through JAX's persistent client-side
compilation cache (~/.cache/facedeform_tpu/jax, enabled by the package).
A first interactive session therefore eats the full cold cost exactly
when the user is watching.  `facedeform-tpu warm` (or warm_programs())
runs a synthetic fit + eval at the session's REAL shapes once — jit
programs are shape-specialized, so warming only helps at matching
(verts, controls, frames) — filling the persistent cache so every later
process at those shapes starts at warm speed.

What gets compiled mirrors a first cook end to end through the public
entry points (identical jit keys): the dense fit (LU + df refinement),
the dense AND culled Pallas eval kernels (node.cook's autotune measures
both), and optionally the animated-sequence programs (batched solve +
frames kernel).  Measured on v5e (1M verts x 997 controls x 4 frames):
a cold `warm` took 468 s (fit compile alone 435 s under service load);
the second process at the same shapes totalled 6.7 s (fit 2.9 s, evals
0.3-1.3 s, frames 2.2 s) — a ~70x first-session improvement.  This
needs jax_persistent_cache_min_compile_time_secs=0 (the package sets
it): with the default 1 s floor, the fit's small-but-remote-compiled
helper programs skipped the cache and re-paid 27-129 s per launch.

No reference counterpart (ALGLIB JIT-compiles nothing); this is the
operational cost of the remote-compile runtime made a one-time step.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.utils.platform import on_tpu


def _synth_points(verts: int) -> jnp.ndarray:
    """(V, 3) device-resident synthetic vertices — content is irrelevant
    to compilation, so build on device instead of uploading ~12 MB/1M
    through the tunnel."""
    i = jnp.arange(verts, dtype=jnp.float32)
    return jnp.stack([
        jnp.sin(0.01 * i), jnp.cos(0.017 * i), jnp.sin(0.003 * i + 1.0),
    ], axis=-1)


def _sync(x) -> float:
    # jax.block_until_ready does not fence the axon tunnel (CLAUDE.md);
    # a scalar pull does.
    return float(jnp.sum(x))


def warm_programs(
    verts: int = 1_000_000,
    controls: int = 1000,
    frames: int = 0,
    cfg: Optional[DeformConfig] = None,
    params: Optional[DeformParams] = None,
    progress: Optional[Callable[[str], None]] = None,
) -> dict:
    """Compile-and-run the common program set at the given shapes.

    Returns {stage: seconds}.  Run once per (verts, controls, frames,
    model-config) combination; later processes at the same shapes hit
    the persistent compile cache.
    """
    say = progress or (lambda s: None)
    cfg = cfg or DeformConfig()
    params = params or DeformParams()
    rng = np.random.default_rng(0)
    rest = fibonacci_points(controls)
    deformed = (
        rest + 0.05 * rng.standard_normal(rest.shape)
    ).astype(np.float32)
    pts = _synth_points(verts)
    dist2 = jnp.zeros(verts, jnp.float32)
    timings: dict = {}

    t0 = time.time()
    d = Deformer.fit(rest, deformed, cfg, params)
    _sync(d.model.w_rbf)
    timings["fit"] = time.time() - t0
    say(f"fit @ {controls} controls: {timings['fit']:.1f}s")

    # The Mosaic kernels exist on TPU only (compiled mode); elsewhere the
    # dense XLA path is what a session would actually run.
    backends = ("pallas", "pallas_culled") if on_tpu() else ("dense",)
    for backend in backends:
        t0 = time.time()
        out, w = d.apply(pts, dist2=dist2, backend=backend)
        _sync(out)
        timings[f"eval_{backend}"] = time.time() - t0
        say(
            f"eval {backend} @ {verts} verts: "
            f"{timings[f'eval_{backend}']:.1f}s"
        )

    if frames > 0:
        from facedeform_tpu.parallel import batched

        rigs = jnp.asarray(np.stack([
            rest + 0.04 * rng.standard_normal(rest.shape).astype(np.float32)
            for _ in range(frames)
        ]))
        gate = jnp.ones(verts, jnp.float32)
        t0 = time.time()
        seq, _ = batched.deform_frames(
            jnp.asarray(rest), rigs, pts, dist2, gate, cfg, params,
            None, None,
        )
        _sync(seq)
        timings["frames"] = time.time() - t0
        say(f"sequence @ {frames} frames: {timings['frames']:.1f}s")

    timings["total"] = sum(timings.values())
    return timings
