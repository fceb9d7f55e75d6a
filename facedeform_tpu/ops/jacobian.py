"""Displacement-field Jacobians and deformed-normal transport.

The reference consumes the mesh's `N`/`tangentu`/`tangentv` attributes to
*project* displacement (src/SOP_FaceDeform.cpp:289-297, :416-422) but never
updates them after moving P — downstream shading sees rest-pose normals on
a deformed surface.  Owning the RBF math (the reference delegates it to
ALGLIB's rbfcalc, :414) makes the fix closed-form:

    d(x)   = sum_l sum_j w_lj phi(|x - c_j| / eps_lj) + P(x) c
    J(x)   = grad d = sum_lj w_lj phi'(s) * 2 (x - c_j) / eps_lj^2 + C
    y      = x + f * T d(x)          (f: per-vertex falloff weight,
                                      T: optional tangent projection —
                                      both per-vertex DATA, treated
                                      locally constant, not fields)
    F      = dy/dx = I + f T J
    n'     ~ F^{-T} n = cof(F) n / det(F)   (cofactor transport)

phi'(s) comes from kernels.phi_prime_s (finite at r = 0 for every kernel
in the zoo).  The Jacobian assembles as two MXU matmuls per layer — no
(V, N, 3) intermediate:

    J[v,a,b] = sum_lj g[lvj] w[lja] (x[vb] - c[jb])
             = (sum_lj g w)[va] x[vb]  -  (sum_lj g (w outer c))[vab]

with g = 2 phi'(s) / eps^2.  Precision note: this is the plain-f32 path;
for growing kernels (TPS/MQ) the Jacobian inherits the f32 contraction
noise the df eval path exists to kill — fine for normals (direction-only,
then re-normalized), not for quantitative strain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.fit import RBFModel
from facedeform_tpu.ops.kernels import pairwise_sqdist, phi_prime_s

_HP = dict(
    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
)


def jacobian_block(
    model: RBFModel,
    points: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
) -> jnp.ndarray:
    """Jacobian J[v, a, b] = d disp_a / d x_b at `points`; (V, 3, 3).

    Materializes (L, V, N) scratch — use displacement_jacobian for the
    chunked sweep.
    """
    pts = points.astype(jnp.float32)
    d2 = pairwise_sqdist(pts, model.ctrl)                    # (V, N)
    inv_e2 = 1.0 / (model.eps * model.eps)                   # (L, N)
    s = d2[None, :, :] * inv_e2[:, None, :]                  # (L, V, N)
    g = 2.0 * phi_prime_s(kernel, s) * inv_e2[:, None, :]    # (L, V, N)
    l, n = model.w_rbf.shape[0], model.w_rbf.shape[1]
    sum_gw = jnp.einsum("lvn,lna->va", g, model.w_rbf, **_HP)          # (V, 3)
    w_outer_c = (
        model.w_rbf[:, :, :, None] * model.ctrl[None, :, None, :]
    ).reshape(l, n, 9)                                        # (L, N, 3a*3b)
    t = jnp.einsum("lvn,lnz->vz", g, w_outer_c, **_HP).reshape(-1, 3, 3)
    jac = sum_gw[:, :, None] * pts[:, None, :] - t
    if PolyTerm(term) == PolyTerm.LINEAR and model.w_poly.shape[0] >= 4:
        # poly_basis = [1, x, y, z]: d(P c)_a / d x_b = w_poly[1 + b, a]
        jac = jac + model.w_poly[1:4].T[None, :, :]
    return jac


@functools.partial(jax.jit, static_argnames=("kernel", "term", "chunk"))
def displacement_jacobian(
    model: RBFModel,
    points: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    chunk: int = 16384,
) -> jnp.ndarray:
    """Chunked dense Jacobian of the displacement field; (V, 3, 3).

    Mirrors evaluate()'s lax.map sweep so scratch is bounded at
    L * chunk * N regardless of V.
    """
    v = points.shape[0]
    if v <= chunk:
        return jacobian_block(model, points, kernel, term)
    pad = (-v) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    out = jax.lax.map(
        lambda p: jacobian_block(model, p, kernel, term), pts
    )
    return out.reshape(-1, 3, 3)[:v]


def deformation_gradient(
    jac: jnp.ndarray, weight: jnp.ndarray, proj: jnp.ndarray | None = None
) -> jnp.ndarray:
    """F = I + f (T) J for the applied map y = x + f (T) d(x); (V, 3, 3).

    Args:
      jac: (V, 3, 3) displacement Jacobian.
      weight: (V,) falloff weights actually applied (deformer.apply's w:
        falloff * group gate — per-vertex data, treated locally constant).
      proj: optional (V, 3, 3) tangent projection matrices
        (ops.tangent.tangent_projection_matrix) when cfg.tangent is on.
    """
    if proj is not None:
        jac = jnp.einsum("vab,vbc->vac", proj, jac, **_HP)
    eye = jnp.eye(3, dtype=jac.dtype)
    return eye[None, :, :] + weight[:, None, None] * jac


def transport_normals(jac, normals, weight, cfg=None, frame=None) -> jnp.ndarray:
    """Shared composition jac -> (tangent proj) -> F -> cofactor transport.

    The one definition both Deformer.deformed_normals and
    PUNodeDeformer.deformed_normals delegate to, so the global and PU
    routes can never transport differently.  `cfg` only contributes its
    `tangent` flag; the projection applies when that is set AND a frame
    is given (matching apply()'s displacement treatment).
    """
    proj = None
    if cfg is not None and getattr(cfg, "tangent", False) and frame is not None:
        from facedeform_tpu.ops.tangent import tangent_projection_matrix

        proj = tangent_projection_matrix(
            *(jnp.asarray(f, jnp.float32) for f in frame)
        )
    f = deformation_gradient(jac, jnp.asarray(weight, jnp.float32), proj)
    return transform_normals(jnp.asarray(normals, jnp.float32), f)


@jax.jit
def transform_normals(normals: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Transport unit normals through deformation gradients F; (V, 3).

    n' ~ F^{-T} n, computed via the cofactor matrix (columns f2 x f3,
    f3 x f1, f1 x f2) so no inverse/det division — robust to flat or
    inverted elements; re-normalized.  Degenerate (zero cofactor) rows
    fall back to the input normal.
    """
    normals = normals.astype(jnp.float32)
    f1, f2, f3 = f[..., :, 0], f[..., :, 1], f[..., :, 2]
    cof = jnp.stack(
        [jnp.cross(f2, f3), jnp.cross(f3, f1), jnp.cross(f1, f2)], axis=-1
    )                                                         # (V, 3, 3)
    out = jnp.einsum("vab,vb->va", cof, normals, **_HP)
    nrm2 = jnp.sum(out * out, axis=-1, keepdims=True)
    ok = nrm2 > 1e-24
    out = jnp.where(ok, out * jax.lax.rsqrt(jnp.maximum(nrm2, 1e-24)), normals)
    return out
