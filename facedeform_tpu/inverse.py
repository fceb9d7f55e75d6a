"""Inverse rig fitting: recover control-point motion from a target mesh.

The reference deforms mesh from rig; production workflows often need the
opposite — given a scanned/sculpted target pose, find the rig delta that
reproduces it (cf. the direct-blendshape-edit idea the reference applies to
blend weights, dbse.cpp, generalized here to the RBF rig itself).

Key structural fact: for single-layer models the whole pipeline is LINEAR
in the rig displacement `delta`:

    w      = A^-1 [delta; 0]                  (the RBF solve)
    disp_i = falloff_i * PhiEval_i . w        (the eval loop)

so the vertex displacements are  D = W K delta  with
K = PhiEval A^-1[:, :N]  (V, N) and W the per-vertex falloff scaling.  The
inverse problem is then one ridge-regularized least-squares solve in the N
rig deltas (shared across xyz):

    delta* = argmin ||W (K delta - T)||_F^2 + ridge ||delta||^2

computed entirely on device: one batched LU solve for K (against A^T —
QNN's per-point radii make A non-symmetric), one (N, N) Gram matmul, one
compensated Cholesky solve.

For cases that break linearity-in-closed-form bookkeeping (multilayer
stacks, tangent projection coupling xyz), fit_rig falls back to gradient
descent through the differentiable fit+apply pipeline (optax Adam) — the
dense path is fully differentiable, including the LU solve.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from facedeform_tpu.config import DeformConfig, DeformParams, RBFModelType
from facedeform_tpu.ops import fit as fit_mod
from facedeform_tpu.ops.assemble import assemble_system, poly_basis
from facedeform_tpu.ops.evaluate import evaluate
from facedeform_tpu.ops.falloff import falloff_weight
from facedeform_tpu.ops.kernels import apply_kernel, pairwise_sqdist
from facedeform_tpu.ops.solve import cholesky_solve_refined


class InverseRigResult(NamedTuple):
    deformed_ctrl: jnp.ndarray   # (N, 3) recovered rig pose
    residual_rms: jnp.ndarray    # rms vertex error of the refit
    iterations: int              # 0 for the closed-form path


def _linear_map_matrix(
    rest_ctrl: jnp.ndarray,
    points: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
) -> jnp.ndarray:
    """K (V, N): vertex displacement per unit rig delta (single layer)."""
    params = params.clamped()
    n = rest_ctrl.shape[0]
    kernel = fit_mod.effective_kernel(cfg)
    if cfg.model == RBFModelType.QNN:
        eps = fit_mod._qnn_radii(rest_ctrl, params.qcoef, params.zcoef)
        lam = jnp.asarray(0.0, jnp.float32)
    else:
        eps = jnp.broadcast_to(params.radius, (n,)).astype(jnp.float32)
        lam = jnp.asarray(params.lam, jnp.float32)
    a = assemble_system(rest_ctrl, kernel, cfg.term, eps, lam)
    phi_e = apply_kernel(kernel, pairwise_sqdist(points, rest_ctrl), eps)
    pb = poly_basis(points, cfg.term)
    phi_full = jnp.concatenate([phi_e, pb], axis=1)  # (V, N+m)
    # K = phi_full A^-1[:, :N]  ==  ((A^T)^-1 phi_full^T)[:N]^T.  A is NOT
    # symmetric in QNN mode (per-point radii scale Phi's columns), so the
    # transpose is load-bearing.  Plain f32 LU here — the compensated
    # refinement in ops.solve materializes an (N+m, N+m, K) product tensor
    # and this solve carries K = V (thousands of) RHS columns; f32 accuracy
    # of K feeds a ridge-regularized least squares and is ample.
    with jax.default_matmul_precision("highest"):
        lu, piv = jax.scipy.linalg.lu_factor(a.T)
        z = jax.scipy.linalg.lu_solve((lu, piv), phi_full.T)
    return z[:n].T


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fit_rig_closed_form(
    rest_ctrl, rest_points, target_points, dist2, cfg, params, ridge
):
    params = params.clamped()
    target_disp = (target_points - rest_points).astype(jnp.float32)
    k = _linear_map_matrix(rest_ctrl, rest_points, cfg, params)  # (V, N)
    w, _ = falloff_weight(
        dist2, params.radius, params.falloffrate, strict_parity=cfg.strict_parity
    )
    # Forward model: observed_disp_i = w_i * (K delta)_i — the falloff is
    # part of the prediction, NOT a row weight on an unscaled residual.
    kw = k * w[:, None]
    g = jnp.dot(
        kw.T, kw, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rhs = jnp.dot(
        kw.T, target_disp, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n = g.shape[0]
    reg = ridge * jnp.trace(g) / n + 1e-30
    delta, _ = cholesky_solve_refined(g + reg * jnp.eye(n, dtype=g.dtype), rhs)
    # refit residual
    err = jnp.dot(
        kw, delta, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) - target_disp
    rms = jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))
    return rest_ctrl + delta, rms


def fit_rig(
    rest_ctrl,
    rest_points,
    target_points,
    cfg: DeformConfig = DeformConfig(),
    params: DeformParams = DeformParams(),
    dist2=None,
    frame=None,
    ridge: float = 1e-4,
    max_iters: int = 200,
    learning_rate: float = 5e-2,
    subsample: Optional[int] = 20000,
    seed: int = 0,
) -> InverseRigResult:
    """Recover the deformed rig whose deformation best matches the target.

    Args:
      rest_ctrl: (N, 3) rest rig markers.
      rest_points / target_points: (V, 3) rest and target mesh positions.
      dist2: optional capture distances gating the fit like the forward pass.
      frame: optional (u, v, n) tangent attributes — only meaningful with
        cfg.tangent, matching the forward pipeline (no frame = no
        projection, so the closed form still applies).
      ridge: Tikhonov weight on the rig delta (keeps markers from flying off
        when V constraints underdetermine N markers).
      max_iters / learning_rate: gradient-path budget (multilayer/tangent).
      subsample: cap on constraint vertices (random subset); None = all.

    Returns InverseRigResult; feed .deformed_ctrl back into Deformer.fit to
    reproduce the target.
    """
    rest_ctrl = jnp.asarray(rest_ctrl, jnp.float32)
    rest_points = jnp.asarray(rest_points, jnp.float32)
    target_points = jnp.asarray(target_points, jnp.float32)
    # Dense-route guard (round-5 review finding): the closed form LU-
    # factorizes the (N+m)^2 system — XLA's LU hits its VMEM panel limit
    # near 16k and the (V, N+m) map matrix scales with both axes — and
    # the gradient path cannot reverse-differentiate the Krylov solver's
    # lax.while_loops.  Fail with the remedy instead of an OOM or an AD
    # crash mid-trace.
    n_rig = int(rest_ctrl.shape[0])
    _grad_path = cfg.n_layers > 1 or (cfg.tangent and frame is not None)
    if n_rig > fit_mod._KRYLOV_THRESHOLD or (
        _grad_path and fit_mod.uses_krylov(cfg, n_rig)
    ):
        raise ValueError(
            f"inverse rig fit needs the dense solve route (N <= "
            f"{fit_mod._KRYLOV_THRESHOLD}; the gradient path additionally "
            f"needs solver auto/direct — Krylov while_loops don't "
            f"reverse-differentiate); got N={n_rig}, "
            f"solver={cfg.solver!r} — decimate the rig first "
            "(ops.decimate.reduce_rig / CLI deform --reduce-k)"
        )
    v = rest_points.shape[0]
    if dist2 is None:
        dist2 = jnp.zeros(v, jnp.float32)
    else:
        dist2 = jnp.asarray(dist2, jnp.float32)
    if frame is not None:
        frame = tuple(jnp.asarray(f, jnp.float32) for f in frame)
    if subsample is not None and v > subsample:
        idx = jax.random.permutation(jax.random.key(seed), v)[:subsample]
        rest_points = rest_points[idx]
        target_points = target_points[idx]
        dist2 = dist2[idx]
        if frame is not None:
            frame = tuple(f[idx] for f in frame)

    use_tangent = cfg.tangent and frame is not None
    if cfg.n_layers == 1 and not use_tangent:
        # eval_view: the closed form reads model/kernel/term/strict_parity
        # only, but jit keys on the WHOLE static cfg — without the
        # normalized view every eval-only toggle (morphspace, dofalloff,
        # doclampweight, ...) paid a fresh 10-240 s remote compile
        ctrl, rms = _fit_rig_closed_form(
            rest_ctrl, rest_points, target_points, dist2, cfg.eval_view(),
            params, jnp.asarray(ridge, jnp.float32),
        )
        return InverseRigResult(deformed_ctrl=ctrl, residual_rms=rms, iterations=0)

    # ---- general path: gradient descent through the differentiable pipeline
    import optax

    from facedeform_tpu.ops.tangent import project_to_tangents

    params_c = params.clamped()
    kernel = fit_mod.effective_kernel(cfg)
    w_fall, _ = falloff_weight(
        dist2, params_c.radius, params_c.falloffrate, strict_parity=cfg.strict_parity
    )
    target_disp = target_points - rest_points

    def forward_err(delta):
        model, _ = fit_mod.fit(rest_ctrl, rest_ctrl + delta, cfg, params)
        disp = evaluate(model, rest_points, kernel, cfg.term)
        if use_tangent:
            disp = project_to_tangents(*frame, disp)
        # forward model applies the falloff to the prediction (:437-438)
        return disp * w_fall[:, None] - target_disp

    def loss_fn(delta):
        err = forward_err(delta)
        return jnp.mean(jnp.sum(err * err, axis=-1)) + ridge * jnp.mean(delta * delta)

    opt = optax.adam(learning_rate)
    delta0 = jnp.zeros_like(rest_ctrl)

    @jax.jit
    def step(carry, _):
        delta, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(delta)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(delta, updates), opt_state), loss

    (delta, _), _ = jax.lax.scan(
        step, (delta0, opt.init(delta0)), None, length=max_iters
    )
    # Report the pure vertex-error RMS of the final iterate (the ridge
    # penalty is an optimizer detail, and losses[-1] predates the last
    # update) — consistent with the closed-form path's metric.
    final_err = forward_err(delta)
    rms = jnp.sqrt(jnp.mean(jnp.sum(final_err * final_err, axis=-1)))
    return InverseRigResult(
        deformed_ctrl=rest_ctrl + delta, residual_rms=rms, iterations=max_iters
    )
