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


def _projection_axes(u: jnp.ndarray, v: jnp.ndarray, n: jnp.ndarray):
    """The reference's (a1, a2) oblique projection axes, (V, 3) each."""
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

    return _normalize(_dot_b(u)), _normalize(_dot_b(v))


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
    a1, a2 = _projection_axes(u, v, n)
    da1 = jnp.sum(disp * a1, -1, keepdims=True)
    da2 = jnp.sum(disp * a2, -1, keepdims=True)
    return a1 * da1 + a2 * da2


@jax.jit
def tangent_projection_matrix(
    u: jnp.ndarray, v: jnp.ndarray, n: jnp.ndarray
) -> jnp.ndarray:
    """Per-vertex matrix T with T @ d == project_to_tangents(u, v, n, d).

    T = a1 a1^T + a2 a2^T, shape (V, 3, 3).  Used to compose the tangent
    projection into the displacement Jacobian (ops/jacobian.py): the
    projected field's spatial gradient is T_v J_v when the frame attrs are
    treated as locally constant (they are per-vertex data, not fields).
    """
    a1, a2 = _projection_axes(u, v, n)
    return a1[:, :, None] * a1[:, None, :] + a2[:, :, None] * a2[:, None, :]
