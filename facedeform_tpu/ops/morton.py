"""Morton (Z-order) spatial sorting for cull-friendly vertex layouts.

The culled eval kernel (ops/pallas_eval.evaluate_pallas_culled) skips
control-point slabs that lie beyond the kernel's reach of a vertex tile.
That only wins when tiles are spatially coherent, which arbitrary mesh
vertex order is not — so callers sort vertices by 30-bit Morton code once
per rest pose (the order is a function of topology+rest positions, cached
like capture) and scatter results back.

All device-side jnp; argsort of 1M keys is a few ms on v5e.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits10(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so consecutive bits are 3 apart."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


@jax.jit
def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes for (V, 3) points, normalized to their bbox."""
    pts = points.astype(jnp.float32)
    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((pts - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    return (
        _expand_bits10(q[:, 0])
        | (_expand_bits10(q[:, 1]) << 1)
        | (_expand_bits10(q[:, 2]) << 2)
    )


@jax.jit
def spatial_order(points: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(perm, inv_perm): points[perm] is Z-order sorted; x[inv_perm] undoes it."""
    perm = jnp.argsort(morton_codes(points))
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0]))
    return perm, inv
