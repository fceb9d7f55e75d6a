"""Capture falloff weighting (device-side half of component E).

The reference computes, per vertex inside the eval loop
(src/SOP_FaceDeform.cpp:404-425):

    skip vertex entirely if d2 > radius^2            (:408)
    falloff = (1 - min(d2 / radius^2, 1)) ^ rate     (:423-424)

and the capture pass pre-seeds d2 (capture.cpp:66-99) with these quirks
(SURVEY.md section 2, "behavioral quirks"):
  * quirk 1 — uncaptured vertices keep the attribute default d2 = 0 and so
    deform at full strength;
  * quirk 2 — captured vertices whose closest-prim query failed keep the
    d2 = -1 sentinel, which passes the skip test and yields falloff > 1
    (amplification) when rate is odd-ish.  Almost certainly a bug.

Default mode clamps d2 >= 0 (fixing quirk 2); strict_parity=True keeps the
reference bit pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("strict_parity",))
def falloff_weight(
    dist2: jnp.ndarray,
    radius: jnp.ndarray,
    rate: jnp.ndarray,
    strict_parity: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-vertex falloff weight and skip mask.

    Args:
      dist2: (V,) squared distance to the nearest rig primitive (the capture
        attribute, capture.cpp:88); 0 for uncaptured vertices.
      radius: deformation cutoff radius (the same `radius` parameter that
        scales the RBF — reference overloads it, src/SOP_FaceDeform.cpp:402).
      rate: falloff exponent (:423-424).
      strict_parity: keep the reference's d2 = -1 amplification quirk.

    Returns:
      (weight, active): weight (V,) f32 — 0 where skipped; active (V,) bool —
      False where the reference would `continue` without touching P.
    """
    dist2 = dist2.astype(jnp.float32)
    r2 = (radius * radius).astype(jnp.float32)
    if not strict_parity:
        dist2 = jnp.maximum(dist2, 0.0)
    active = dist2 <= r2
    ratio = jnp.minimum(dist2 / r2, 1.0)
    w = jnp.power(jnp.maximum(1.0 - ratio, 0.0) if not strict_parity else (1.0 - ratio), rate)
    return jnp.where(active, w, 0.0), active
