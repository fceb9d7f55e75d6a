"""Radial basis kernel zoo.

The reference delegates basis evaluation to ALGLIB's rbfcalc
(src/SOP_FaceDeform.cpp:414); the rebuild owns the math as explicit,
XLA-fusable elementwise functions of the *squared* distance.  Working in
squared distance lets the hot pallas/XLA path produce d^2 from exact
per-coordinate differences and never take an unnecessary sqrt for
kernels that don't need one (gaussian, thin-plate).

All kernels are normalized so phi is a function of (r / eps) with eps the
per-control-point (or global) radius; eps broadcasts against the trailing
control axis of d2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedeform_tpu.config import RBFKernel

# Floor on squared distances inside logs/square-roots; keeps grads finite.
_TINY = 1e-30


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def apply_kernel(kernel: RBFKernel, d2: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """Evaluate phi(r/eps) given squared distances.

    Args:
      kernel: static kernel id.
      d2: squared distances, any shape (..., N); clamped to >= 0 here.
      eps: radius scale, broadcastable to d2's trailing axis (scalar, (N,),
        or (L, 1, N) for multilayer stacks).

    Returns:
      phi with d2's shape and dtype.
    """
    kernel = RBFKernel(kernel)
    d2 = jnp.maximum(d2, 0.0)
    s = d2 / (eps * eps)  # (r/eps)^2
    if kernel == RBFKernel.GAUSSIAN:
        return jnp.exp(-s)
    if kernel == RBFKernel.THIN_PLATE:
        # (r/eps)^2 log(r/eps) = 0.5 * s * log(s); phi(0) = 0 by limit.
        # precise_log, not jnp.log: the TPU hardware log is only ~3.6e-4
        # accurate, which the solve amplifies past the parity budget.
        from facedeform_tpu.ops.precise_math import precise_log

        return jnp.where(s > _TINY, 0.5 * s * precise_log(jnp.maximum(s, _TINY)), 0.0)
    if kernel == RBFKernel.MULTIQUADRIC:
        return jnp.sqrt(1.0 + s)
    if kernel == RBFKernel.INVERSE_MULTIQUADRIC:
        return jax.lax.rsqrt(1.0 + s)
    if kernel == RBFKernel.LINEAR:
        return jnp.sqrt(s)
    if kernel == RBFKernel.CUBIC:
        return s * jnp.sqrt(s)
    if kernel == RBFKernel.WENDLAND_C2:
        t = jnp.sqrt(s)
        base = jnp.maximum(1.0 - t, 0.0)
        b2 = base * base
        return b2 * b2 * (4.0 * t + 1.0)
    raise ValueError(f"unknown kernel {kernel!r}")


def phi_prime_s(kernel: RBFKernel, s: jnp.ndarray) -> jnp.ndarray:
    """d phi / d s with s = (r/eps)^2, finite everywhere (incl. s = 0).

    Autodiff of apply_kernel's raw expressions NaNs at r = 0 for every
    kernel built through sqrt(s) (LINEAR, CUBIC, WENDLAND_C2: the inf
    from sqrt'(0) meets the 0 tangent of s and makes 0*inf), and a mesh
    vertex sitting exactly on a rig marker is a *normal* production input.
    These closed forms take the correct limit instead:

      LINEAR     |r| has subgradient 0 at r = 0        -> 0
      CUBIC      d(s^1.5)/ds = 1.5 sqrt(s)             -> 0
      WENDLAND   d((1-t)^4(4t+1))/ds = -10 (1-t)^3     -> -10 (finite!)
      TPS        d(0.5 s log s)/ds = 0.5 (log s + 1)   -> 0 by the r->0
                 limit of the chain rule (the log blows up slower than
                 the (x - c) factor vanishes)

    Wired into apply_kernel's custom_jvp below, so every autodiff consumer
    (inverse rig fitting, displacement Jacobians / normal updates) is
    r=0-safe without touching the forward precision path.
    """
    kernel = RBFKernel(kernel)
    s = jnp.maximum(s, 0.0)
    if kernel == RBFKernel.GAUSSIAN:
        return -jnp.exp(-s)
    if kernel == RBFKernel.THIN_PLATE:
        from facedeform_tpu.ops.precise_math import precise_log

        return jnp.where(
            s > _TINY, 0.5 * (precise_log(jnp.maximum(s, _TINY)) + 1.0), 0.0
        )
    if kernel == RBFKernel.MULTIQUADRIC:
        return 0.5 * jax.lax.rsqrt(1.0 + s)
    if kernel == RBFKernel.INVERSE_MULTIQUADRIC:
        q = jax.lax.rsqrt(1.0 + s)
        return -0.5 * q / (1.0 + s)
    if kernel == RBFKernel.LINEAR:
        return jnp.where(
            s > _TINY, 0.5 * jax.lax.rsqrt(jnp.maximum(s, _TINY)), 0.0
        )
    if kernel == RBFKernel.CUBIC:
        return 1.5 * jnp.sqrt(s)
    if kernel == RBFKernel.WENDLAND_C2:
        base = jnp.maximum(1.0 - jnp.sqrt(s), 0.0)
        return -10.0 * base * base * base
    raise ValueError(f"unknown kernel {kernel!r}")


@apply_kernel.defjvp
def _apply_kernel_jvp(kernel, primals, tangents):
    d2, eps = primals
    d2_dot, eps_dot = tangents
    phi = apply_kernel(kernel, d2, eps)
    inv_e2 = 1.0 / (eps * eps)
    s = jnp.maximum(d2, 0.0) * inv_e2
    fp = phi_prime_s(kernel, s)
    # s = max(d2, 0)/eps^2: no gradient from the clamped (d2 < 0) region.
    ds = jnp.where(d2 >= 0.0, inv_e2, 0.0) * d2_dot
    ds = ds + (-2.0 * s / eps) * eps_dot
    return phi, fp * ds


def kernel_is_compact(kernel: RBFKernel) -> bool:
    """True if phi has compact support (vanishes for r > eps)."""
    return RBFKernel(kernel) == RBFKernel.WENDLAND_C2


def kernel_is_pd(kernel: RBFKernel) -> bool:
    """True if the kernel matrix is positive definite for distinct points
    (gaussian/IMQ/wendland); the rest are only conditionally PD, so their
    diagonal blocks may be indefinite (TPS even has phi(0) = 0) and
    block-Jacobi is not a valid SPD preconditioner for them."""
    return RBFKernel(kernel) in (
        RBFKernel.GAUSSIAN,
        RBFKernel.INVERSE_MULTIQUADRIC,
        RBFKernel.WENDLAND_C2,
    )


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """All-pairs squared distances via exact per-coordinate differences.

    d2[i, j] = sum_k (x[i,k] - y[j,k])^2.  Shapes: (V, 3), (N, 3) -> (V, N).

    Deliberately NOT the ||x||^2 + ||y||^2 - 2 x.y MXU form: for geometry
    away from the origin that identity cancels catastrophically in f32
    (~1e-2 absolute d2 error at |x| ~ 100, i.e. ~600x the 5e-5 parity
    budget end to end), because the norms grow as |x|^2 while the result
    stays O(r^2).  Exact differences are translation-invariant, match the
    fused Pallas kernel's arithmetic bit-for-bit in structure, and at K=3
    the VPU cost (9 ops/pair) is negligible next to the kernel phi —
    the rank-3 matmul was a pad-dominated MXU sliver anyway (see the
    measurement notes in ops/pallas_eval.py)."""
    if x.shape[-1] != 3 or y.shape[-1] != 3:
        # 3-D points ONLY: the unrolled form below silently drops extra
        # coordinates (bit the pose-space fit, whose features are (K, 3N)
        # — use ops/psd.pairwise_sqdist_nd for general-D descriptors).
        raise ValueError(
            f"pairwise_sqdist is specialized to 3-D points; got trailing "
            f"dims {x.shape[-1]} and {y.shape[-1]}"
        )
    dx = x[:, 0:1] - y[None, :, 0]  # (V, N) broadcasts, fused by XLA
    dy = x[:, 1:2] - y[None, :, 1]
    dz = x[:, 2:3] - y[None, :, 2]
    return dx * dx + dy * dy + dz * dz


def nearest_neighbor_dist(pts: jnp.ndarray) -> jnp.ndarray:
    """Per-point distance to its nearest *other* point; shape (N,).

    Used by the QNN radius rule (see fit.py).  Degenerate duplicate points
    produce 0 and are floored by the caller.  A single-point rig has no
    neighbor — fall back to unit distance so downstream radii stay finite.
    """
    d2 = pairwise_sqdist(pts, pts)
    n = pts.shape[0]
    if n == 1:
        return jnp.ones((1,), dtype=pts.dtype)
    diag = jnp.eye(n, dtype=bool)
    d2 = jnp.where(diag, jnp.inf, d2)
    return jnp.sqrt(jnp.min(d2, axis=-1))
