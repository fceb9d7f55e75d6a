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


#: degree cap for the transport neighbor table (padded_neighbors
#: max_degree=): the 1-ring LSQ gradient only needs a tangent-plane-
#: spanning subset, and the (V, Dmax, 3) gather temps scale with the
#: WORST degree — a 1M uv-sphere's ~1000-degree poles cost ~12 GB
#: uncapped (HBM OOM, measured) vs ~200 MB at 16.  Stride-subsampling
#: in padded_neighbors keeps capped rings angularly spread.
TRANSPORT_MAX_DEGREE = 16


@jax.jit
def field_gradient_plan(points: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
    """Precompute the 1-ring least-squares gradient COEFFICIENTS
    c[v, d] = M_v^-1 (s_v e_{vd}); (V, D, 3).

    The LSQ gradient is linear in the field: G_v = sum_d u_{vd} (x)
    c_{vd} with u the neighbor field differences — so everything that
    depends only on GEOMETRY (edge gather, Gram, Cholesky solve) hoists
    into this per-topology plan, and apply_field_gradient's per-cook
    cost is ONE (V, D) gather + one einsum.  At 1M x 16 on v5e the
    fused two-gather pass measured 432 ms; the split leaves ~half on
    the cook path (TPU gathers dominate, ~8 ms per 1M 3-vector rows).

    Ridge sizing: pole-adjacent uv-grid cells reach ~160:1 anisotropy
    (azimuthal edges 2e-5 vs polar 3e-3 on a 1M uv-sphere), putting the
    smallest TANGENTIAL Gram eigenvalue at ~4e-5 of the trace — an
    earlier 1e-4 relative ridge sat ABOVE it and wiped out the azimuthal
    gradient at those vertices (transported-normal error ~|A|, measured
    0.026 on the 1M bench sphere).  3e-7 keeps the full tangent plane
    (bias ~1e-2 of the weak direction at worst) while staying ~3x above
    the f32 Gram noise floor.  The along-normal derivative is whatever
    the ring's off-plane curvature supports; the cofactor normal rule
    downstream never consumes it — cof(F)(t1 x t2) = F t1 x F t2 depends
    only on F's TANGENTIAL action, where the 1-ring fit is exact for
    affine fields.  For the OTHER f_map consumers (vector transport,
    principal stretches) the small ridge trades the old hard-zeroed
    normal column for a curvature-supported estimate: on rings whose
    normal Gram eigenvalue sits in [3e-7, 1e-4]·tr the estimate can
    amplify per-vertex field noise by the inverse of that eigenvalue,
    but the amplified term is bounded by ~eps·|field|·|ring|/lambda_n
    — about 1e-4 absolute in F for f32-rounded smooth fields (blend
    reconstructions and PSD corrections are RBF-smooth), i.e. a 1e-4
    perturbation of stretch singular values against a unit diagonal.

    Solved by closed-form 3x3 Cholesky on the trace-normalized Gram
    (backward-stable for PD matrices with no pivoting; clamped pivots
    absorb the rank-2 + ridge edge): pure VPU ops that fuse behind the
    einsums — the batched jnp.linalg.solve they replace dispatched a
    generic LU that dominated the pass (measured 1.2 s at 1M x 16).
    Padded self-slots give e = 0 -> c = 0, so they stay inert.
    """
    e = points[nbr] - points[:, None, :]                  # (V, D, 3)
    a = jnp.einsum("vdi,vdj->vij", e, e, **_HP)           # E E^T (V, 3, 3)
    tr = a[:, 0, 0] + a[:, 1, 1] + a[:, 2, 2]
    s = 1.0 / (tr + 1e-30)                                # scale-invariant
    m = a * s[:, None, None] + 3e-7 * jnp.eye(3, dtype=a.dtype)
    rhs = e * s[:, None, None]                            # (V, D, 3)
    # closed-form Cholesky m = L L^T (m normalized: diag in [3e-7, 1])
    eps = jnp.float32(1e-12)
    l11 = jnp.sqrt(jnp.maximum(m[:, 0, 0], eps))
    l21 = m[:, 1, 0] / l11
    l31 = m[:, 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(m[:, 1, 1] - l21 * l21, eps))
    l32 = (m[:, 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(m[:, 2, 2] - l31 * l31 - l32 * l32, eps))
    # solve m c = rhs_d per slot: L y = r, L^T c = y (components along
    # the last axis, batched over the D slots)
    r1, r2, r3 = rhs[..., 0], rhs[..., 1], rhs[..., 2]    # (V, D) each
    y1 = r1 / l11[:, None]
    y2 = (r2 - l21[:, None] * y1) / l22[:, None]
    y3 = (r3 - l31[:, None] * y1 - l32[:, None] * y2) / l33[:, None]
    c3 = y3 / l33[:, None]
    c2 = (y2 - l32[:, None] * c3) / l22[:, None]
    c1 = (y1 - l21[:, None] * c2 - l31[:, None] * c3) / l11[:, None]
    return jnp.stack([c1, c2, c3], axis=-1)               # (V, D, 3)


@jax.jit
def apply_field_gradient(
    values: jnp.ndarray, nbr: jnp.ndarray, coeff: jnp.ndarray
) -> jnp.ndarray:
    """(V, 3, 3) LSQ gradient of a field given a field_gradient_plan:
    G_v = sum_d (u_j - u_v) c_{vd}^T — one gather + one einsum, the
    whole per-cook cost of the morphspace transport gradient."""
    u = values[nbr] - values[:, None, :]                  # (V, D, 3)
    return jnp.einsum("vdi,vdj->vij", u, coeff, **_HP)


def mesh_field_gradient(
    points: jnp.ndarray, values: jnp.ndarray, nbr: jnp.ndarray
) -> jnp.ndarray:
    """(V, 3, 3) least-squares spatial gradient of a discrete vector
    field over mesh 1-rings: G_v minimizes sum_j |G (x_j - x_v) -
    (u_j - u_v)|^2 over the neighbors in `nbr` (self-padded table from
    geometry.topology.padded_neighbors — padded slots contribute exact
    zeros).  One-shot convenience over field_gradient_plan +
    apply_field_gradient; callers with a stable topology (node.cook)
    cache the plan and call apply_ per cook.

    Used by the morphspace transport composition (node.cook): the
    reconstructed blend displacement is discrete data, so unlike the RBF
    pass it has no closed-form Jacobian.
    """
    return apply_field_gradient(values, nbr, field_gradient_plan(points, nbr))


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


def _applied_gradient(jac, weight, cfg=None, frame=None) -> jnp.ndarray:
    """jac -> (tangent proj) -> F for the map the deformer actually applied.

    `cfg` only contributes its `tangent` flag; the projection applies when
    that is set AND a frame is given (matching apply()'s displacement
    treatment)."""
    proj = None
    if cfg is not None and getattr(cfg, "tangent", False) and frame is not None:
        from facedeform_tpu.ops.tangent import tangent_projection_matrix

        proj = tangent_projection_matrix(
            *(jnp.asarray(f, jnp.float32) for f in frame)
        )
    return deformation_gradient(jac, jnp.asarray(weight, jnp.float32), proj)


def transport_normals(jac, normals, weight, cfg=None, frame=None) -> jnp.ndarray:
    """Shared composition jac -> (tangent proj) -> F -> cofactor transport.

    The one definition both Deformer.deformed_normals and
    PUNodeDeformer.deformed_normals delegate to, so the global and PU
    routes can never transport differently.
    """
    f = _applied_gradient(jac, weight, cfg, frame)
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


# ---------------------------------------------------------------------------
# General attribute transport.  The reference copies every non-P point
# attribute through untouched (cookMySop writes P only,
# src/SOP_FaceDeform.cpp:438) — velocities, ups and orients keep their
# rest-pose frames on the deformed surface.  Owning F = I + w (T) J makes
# the standard transport rules closed-form per Houdini attribute typeinfo:
#   vector      v' = F v          (tangent/covariant vectors: v, up, dPdu)
#   normal      n' ~ cof(F) n     (transform_normals above)
#   quaternion  q' = quat(R) * q  with R the rotation factor of F = R S
# ---------------------------------------------------------------------------


@jax.jit
def transform_vectors(vectors: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Push tangent vectors through F: v' = F v; (V, 3).

    Length is NOT preserved on purpose — a stretching map stretches
    velocities/tangents (Houdini's 'vector' typeinfo semantics)."""
    return jnp.einsum("vab,vb->va", f, vectors.astype(jnp.float32), **_HP)


@functools.partial(jax.jit, static_argnames=("iters",))
def polar_rotation(f: jnp.ndarray, iters: int = 14) -> jnp.ndarray:
    """Rotation factor R of F = R S (polar decomposition); (V, 3, 3).

    Higham determinant-scaled Newton: R <- (g R + (g R)^-T)/2 with
    g = |det R|^(-1/3), the inverse-transpose formed from the cofactor
    matrix — no linalg calls, so it fuses on the VPU.  Det scaling makes
    the iteration count ~independent of anisotropy (plain Newton needs
    ~log2(sigma_max/sigma_min) extra steps and stalls around a 1e-4
    singular-value ratio in f32 — measured 0.16 orthogonality error).
    Rows with det(F) <= 1e-12 (collapsed or inverted elements, where no
    rotation is defined), or whose iterate still isn't orthogonal after
    the budget (f32 rounding through the cofactor inverse at extreme
    pinch), return identity rather than garbage."""
    f = f.astype(jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), f.shape)

    def _cof_det(m):
        c1, c2, c3 = m[..., :, 0], m[..., :, 1], m[..., :, 2]
        cof = jnp.stack(
            [jnp.cross(c2, c3), jnp.cross(c3, c1), jnp.cross(c1, c2)], axis=-1
        )
        det = jnp.sum(c1 * cof[..., :, 0], axis=-1)
        return cof, det

    _, det0 = _cof_det(f)
    valid = det0 > 1e-12
    f = jnp.where(valid[..., None, None], f, eye)

    def body(_, r):
        cof, det = _cof_det(r)
        g = jnp.abs(det) ** (-1.0 / 3.0)
        # (gR)^-T = cof(gR) / det(gR) = g^2 cof(R) / (g^3 det R)
        inv_t = cof / (g * det)[..., None, None]
        return 0.5 * (g[..., None, None] * r + inv_t)

    r = jax.lax.fori_loop(0, iters, body, f)
    rtr = jnp.einsum("vba,vbc->vac", r, r, **_HP)
    ortho = jnp.max(jnp.abs(rtr - jnp.eye(3, dtype=jnp.float32)),
                    axis=(-2, -1)) < 1e-2
    ok = (valid & ortho)[..., None, None]
    return jnp.where(ok, r, eye)


@jax.jit
def quaternion_from_rotation(r: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x, y, z, w) — Houdini `orient` layout — from
    rotation matrices (V, 3, 3).  Branch-free Shepperd: build all four
    pivot candidates and select the best-conditioned per row."""
    m = lambda a, b: r[..., a, b]
    t0 = 1.0 + m(0, 0) + m(1, 1) + m(2, 2)
    t1 = 1.0 + m(0, 0) - m(1, 1) - m(2, 2)
    t2 = 1.0 - m(0, 0) + m(1, 1) - m(2, 2)
    t3 = 1.0 - m(0, 0) - m(1, 1) + m(2, 2)
    c0 = jnp.stack([m(2, 1) - m(1, 2), m(0, 2) - m(2, 0),
                    m(1, 0) - m(0, 1), t0], axis=-1)
    c1 = jnp.stack([t1, m(0, 1) + m(1, 0), m(0, 2) + m(2, 0),
                    m(2, 1) - m(1, 2)], axis=-1)
    c2 = jnp.stack([m(0, 1) + m(1, 0), t2, m(1, 2) + m(2, 1),
                    m(0, 2) - m(2, 0)], axis=-1)
    c3 = jnp.stack([m(0, 2) + m(2, 0), m(1, 2) + m(2, 1), t3,
                    m(1, 0) - m(0, 1)], axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)            # (V, 4, 4)
    pick = jnp.argmax(jnp.stack([t0, t1, t2, t3], axis=-1), axis=-1)
    q = jnp.take_along_axis(cands, pick[..., None, None], axis=-2)[..., 0, :]
    q = q * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-24)
    )
    # canonical sign: w >= 0 (both signs encode the same rotation)
    return q * jnp.where(q[..., 3:4] < 0.0, -1.0, 1.0)


@jax.jit
def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b of (x, y, z, w) quaternions, broadcasting."""
    ax, ay, az, aw = (a[..., i] for i in range(4))
    bx, by, bz, bw = (b[..., i] for i in range(4))
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


@jax.jit
def transform_quaternions(quats: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Rotate orientation quaternions by F's rotation factor:
    q' = quat(polar(F)) * q, renormalized; (V, 4), (x, y, z, w) layout.

    Stretch is deliberately discarded — an orient frame stays orthonormal
    (copy/instance semantics); vectors that should stretch belong in a
    'vector' attribute instead."""
    qr = quaternion_from_rotation(polar_rotation(f))
    out = quaternion_multiply(qr, quats.astype(jnp.float32))
    return out * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(out * out, axis=-1, keepdims=True), 1e-24)
    )


@jax.jit
def principal_stretches(f: jnp.ndarray) -> jnp.ndarray:
    """Singular values of F, descending; (V, 3).

    sigma_i = sqrt(eig_i(F^T F)) via the closed-form trigonometric
    symmetric-3x3 eigenvalue formula (no linalg calls — fuses on the
    VPU next to the Jacobian that produced F).  sigma_max > 1 means
    local stretch, sigma_min < 1 compression; a rigid map gives
    (1, 1, 1).  Rigging QC: node cook(output_stretch=True) writes these
    as fd_stretch / fd_compress."""
    f = f.astype(jnp.float32)
    a = jnp.einsum("vba,vbc->vac", f, f, **_HP)              # F^T F, SPD
    a11, a22, a33 = a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]
    a12, a13, a23 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]
    q = (a11 + a22 + a33) / 3.0
    p1 = a12 * a12 + a13 * a13 + a23 * a23
    p2 = ((a11 - q) ** 2 + (a22 - q) ** 2 + (a33 - q) ** 2 + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-12)
    b11, b22, b33 = (a11 - q) / safe_p, (a22 - q) / safe_p, (a33 - q) / safe_p
    b12, b13, b23 = a12 / safe_p, a13 / safe_p, a23 / safe_p
    det_b = (b11 * (b22 * b33 - b23 * b23)
             - b12 * (b12 * b33 - b23 * b13)
             + b13 * (b12 * b23 - b22 * b13))
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # p ~ 0: A = qI (isotropic); the formula's 0/0 is guarded by safe_p,
    # and e_i -> q automatically since the cos terms carry the p factor
    eigs = jnp.stack([e1, e2, e3], axis=-1)                   # descending
    return jnp.sqrt(jnp.maximum(eigs, 0.0))


#: transport rules by Houdini typeinfo-style kind
ATTR_KINDS = ("vector", "normal", "quaternion")


def infer_attr_kind(name: str, values, typeinfo: str | None = None) -> str | None:
    """Best-effort kind from Houdini typeinfo, naming conventions + width.

    An explicit typeinfo qualifier (mesh.attr_typeinfo, read from .geo
    files) is AUTHORITATIVE: vector/normal/quaternion transport when the
    width matches; any other declared qualifier (color, point, a
    width-mismatched transform kind, ...) returns None — the attr passes
    through untouched rather than being silently rotated (an RGBA Cd is
    4-wide but is not a quaternion).  Without typeinfo: N/normal-ish
    (3-wide) -> normal, 4-wide -> quaternion (orient/rot), other 3-wide
    -> vector, anything else -> None."""
    width = values.shape[-1] if values.ndim == 2 else 1
    if typeinfo is not None:
        if typeinfo in ("vector", "normal") and width == 3:
            return typeinfo
        if typeinfo == "quaternion" and width == 4:
            return "quaternion"
        return None
    if width == 4:
        return "quaternion"
    if width != 3:
        return None
    if name in ("N", "normal") or name.startswith("N_"):
        return "normal"
    return "vector"


def transport_attrs(
    jac,
    attrs: dict,
    weight,
    cfg=None,
    frame=None,
    kinds: dict | None = None,
    want_stretch: bool = False,
    f_map=None,
):
    """Transport a batch of point attributes through ONE shared F.

    Args:
      jac: (V, 3, 3) displacement Jacobian at the rest positions.
      attrs: {name: (V, 3) or (V, 4) array}.
      weight: (V,) per-vertex multiplier apply() actually used.
      cfg/frame: tangent-projection context, as transport_normals.
      kinds: optional {name: kind} overrides; unspecified names infer via
        infer_attr_kind.  A None kind (uninferable) raises ValueError —
        callers (node.cook) filter/warn before reaching here.
      want_stretch: also return principal_stretches(F) — the Jacobian and
        F are the dominant cost, so a cook wanting both attrs and the
        stretch QC pays for them once.
      f_map: optional (V, 3, 3) -> (V, 3, 3) post-composition of the
        deformation gradient — node.cook's morphspace pass rewrites
        F to I + grad(blend disp) + gamma (F - I) through this hook.

    Returns {name: transported array} in input order; with want_stretch,
    the tuple ({name: ...}, (V, 3) singular values).
    """
    f = _applied_gradient(jac, weight, cfg, frame)
    if f_map is not None:
        f = f_map(f)
    rules = {
        "vector": transform_vectors,
        "normal": transform_normals,
        "quaternion": transform_quaternions,
    }
    out = {}
    for name, values in attrs.items():
        kind = (kinds or {}).get(name) or infer_attr_kind(name, values)
        if kind not in rules:
            raise ValueError(
                f"attribute {name!r}: no transport rule for kind {kind!r} "
                f"(shape {tuple(values.shape)}); expected one of {ATTR_KINDS}"
            )
        out[name] = rules[kind](jnp.asarray(values, jnp.float32), f)
    if want_stretch:
        return out, principal_stretches(f)
    return out
