"""Tangent-space projection of displacements (component G).

Vectorized re-derivation of the reference's project_to_tangents
(src/SOP_FaceDeform.hpp:28-41), invoked per vertex at
src/SOP_FaceDeform.cpp:416-422 after normalizing u, v, n (:420).

The reference's exact recipe, preserved here:
    B   = M^T M with rows M = [u; v; n]
    a1  = normalize(u B), a2 = normalize(v B)
    disp' = a1 (disp . a1) + a2 (disp . a2)
Note a1/a2 are not orthonormalized against each other, so this is the
reference's oblique projection, not a Gram-Schmidt orthogonal one — kept
verbatim for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


@jax.jit
def project_to_tangents(
    u: jnp.ndarray, v: jnp.ndarray, n: jnp.ndarray, disp: jnp.ndarray
) -> jnp.ndarray:
    """Project (V, 3) displacements onto the per-vertex tangent plane.

    Args:
      u, v, n: (V, 3) tangent-u, tangent-v and normal attributes (the
        reference requires all three, src/SOP_FaceDeform.cpp:289-297).
      disp: (V, 3) displacements.
    """
    u = _normalize(u.astype(jnp.float32))
    v = _normalize(v.astype(jnp.float32))
    n = _normalize(n.astype(jnp.float32))
    # b = M^T M = u u^T + v v^T + n n^T; row_i . b computed without
    # materializing the (V, 3, 3) tensor:
    #   x b = (x.u) u + (x.v) v + (x.n) n
    def _dot_b(x):
        return (
            jnp.sum(x * u, -1, keepdims=True) * u
            + jnp.sum(x * v, -1, keepdims=True) * v
            + jnp.sum(x * n, -1, keepdims=True) * n
        )

    a1 = _normalize(_dot_b(u))
    a2 = _normalize(_dot_b(v))
    da1 = jnp.sum(disp * a1, -1, keepdims=True)
    da2 = jnp.sum(disp * a2, -1, keepdims=True)
    return a1 * da1 + a2 * da2
