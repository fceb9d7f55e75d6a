"""Leave-one-out cross-validation (Rippa) radius / ridge selection.

The reference exposes raw smoothing knobs and leaves choosing them to the
user: QNN's q/z coefficients and the Multilayer radius/lambda go straight
into ALGLIB (src/SOP_FaceDeform.cpp:344-347) with no guidance beyond the
parameter ranges (:99-137).  A mis-set radius is the classic RBF failure
mode — too small underfits between markers, too large blows up the
conditioning — and the only feedback the reference gives is visual.

This module picks those knobs by leave-one-out cross-validation using
Rippa's closed form: for the interpolation system B x = b (with the
polynomial tail and ridge exactly as ops/assemble.py builds it), the
leave-one-out prediction error at control point i is

    e_i = -w_i / (B^{-1})_{ii}

per displacement column — NO refits.  Derivation (works unsymmetric, with
tail rows and ridge): perturb the RHS entry i to the value v that makes
the solved w_i = 0; that solution restricted to j != i satisfies exactly
the leave-i-out system, and row i reads off its prediction v at x_i.
Solving for v gives v - d_i = -w_i / (B^{-1})_{ii}.

So one factorization per candidate scores the whole LOO error — a grid of
radii/ridges is a handful of batched (N+m)-size LU solves, all on the MXU,
with one scalar pulled to host at the end.  Cost is O(C (N+m)^3) for C
candidates; this is a dense-regime tool (same <= 8k-control limit as the
dense fit route).

Family mapping (mirrors ops/fit.py):
  * QNN: radii are q * nndist capped at z * mean(nndist); a candidate
    factor f scales the whole radius field, which is exactly scaling q and
    z together (min(fq*nn, fz*mean) = f*min(q*nn, z*mean)).  lam stays 0
    (exact interpolation, like ALGLIB QNN).
  * MULTILAYER: the score is computed on the FIRST layer's interpolant at
    the candidate radius/ridge (residual layers halve the radius from
    whatever is chosen) — a documented approximation; in practice the
    first layer dominates the fit.
  * KERNEL: single layer, global radius + ridge — the exact model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from facedeform_tpu.config import (
    DeformConfig,
    DeformParams,
    PolyTerm,
    RBFKernel,
    RBFModelType,
)
from facedeform_tpu.ops.assemble import assemble_rhs, assemble_system
from facedeform_tpu.ops.solve import SolveReport, lu_solve_refined_factored

# Default radius candidate grid: half-octave steps over +-3 octaves around
# the user's value — wide enough to recover from an off-by-8x radius, fine
# enough that the LOO curve's minimum is bracketed within ~19%.
DEFAULT_RADIUS_FACTORS = tuple(float(2.0 ** e) for e in
                               np.arange(-3.0, 3.5, 0.5))
# Default ridge grid (MULTILAYER/KERNEL only): the reference clamps
# lambda >= 0.01 (src/SOP_FaceDeform.cpp:253), so that is the floor.
DEFAULT_RIDGE_VALUES = (0.01, 0.0316, 0.1, 0.316, 1.0)


@functools.partial(jax.jit, static_argnames=("kernel", "term", "n_refine"))
def loocv_errors(
    ctrl: jnp.ndarray,
    delta: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    n_refine: int = 2,
) -> tuple[jnp.ndarray, SolveReport]:
    """Closed-form (N, 3) leave-one-out prediction errors, no refits.

    e[i, c] is (LOO interpolant without point i, evaluated at x_i) minus
    delta[i, c], for the exact system ops/assemble.py builds (tail rows,
    quasi-definite tail regularization, ridge included).
    """
    ctrl = ctrl.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    n = ctrl.shape[0]
    a = assemble_system(ctrl, kernel, term, eps, lam)
    b = assemble_rhs(delta, term)
    x, report, lu_piv = lu_solve_refined_factored(a, b, n_refine=n_refine)
    # Inverse diagonal from the SAME factorization (two triangular solves
    # against the identity) — a second jnp.linalg.inv would re-factor and
    # double the O((N+m)^3) cost of every candidate in the sweep.
    with jax.default_matmul_precision("highest"):
        binv = jax.scipy.linalg.lu_solve(lu_piv, jnp.eye(a.shape[0], dtype=a.dtype))
        binv_diag = jnp.diagonal(binv)[:n]
    w = x[:n]
    # A vanishing diagonal means the leave-i-out subsystem is singular
    # (duplicate points); the sign-preserving floor turns that into a huge
    # e_i, which correctly poisons this candidate's score.
    safe = jnp.where(
        jnp.abs(binv_diag) > 1e-30,
        binv_diag,
        jnp.where(binv_diag < 0, -1e-30, 1e-30),
    )
    e = -w / safe[:, None]
    return e, report


@functools.partial(jax.jit, static_argnames=("kernel", "term"))
def loocv_score(
    ctrl: jnp.ndarray,
    delta: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
) -> jnp.ndarray:
    """Scalar RMS of the LOO errors; NaN/inf candidates map to +inf so a
    blown-up factorization can never win the argmin."""
    e, _ = loocv_errors(ctrl, delta, kernel, term, eps, lam)
    s = jnp.sqrt(jnp.mean(e * e))
    return jnp.where(jnp.isfinite(s), s, jnp.inf)


@functools.partial(jax.jit, static_argnames=("kernel", "term"))
def _sweep(
    ctrl: jnp.ndarray,
    delta: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps_base: jnp.ndarray,   # (N,) radius field at factor 1
    scales: jnp.ndarray,     # (C,) radius factors
    lams: jnp.ndarray,       # (C,) ridge values
) -> jnp.ndarray:
    """(C,) LOO scores, one candidate at a time (lax.map keeps the peak
    memory at a single (N+m)^2 system + inverse regardless of C)."""

    def one(c):
        s, l = c
        return loocv_score(ctrl, delta, kernel, term, eps_base * s, l)

    return jax.lax.map(one, (scales, lams))


def autotune(
    rest_ctrl,
    deformed_ctrl,
    cfg: DeformConfig = DeformConfig(),
    params: DeformParams = DeformParams(),
    radius_factors=None,
    ridge_values=None,
) -> tuple[DeformParams, dict]:
    """Pick the radius (QNN: the q/z scale) and optionally the ridge by
    LOOCV; returns (updated DeformParams, diagnostics).

    Args:
      radius_factors: multiplicative candidates on the current radius field
        (default: half-octave grid over +-3 octaves).
      ridge_values: absolute lambda candidates (MULTILAYER/KERNEL only;
        passing them for QNN raises — QNN is exact interpolation by
        construction, ops/fit.py).  None tunes the radius only.

    Returns:
      (params', diag) where params' reproduces the winning candidate when
      passed to fit()/Deformer.fit, and diag carries the full score grid:
      {"factors", "ridges", "scores" (F, R), "best_factor", "best_ridge",
       "best_score", "radius_candidates"}.  diag's factors/ridges are the
      APPLIED grids — clamped to the fit-time floors and deduped — so they
      can differ from the raw candidates passed in.
    """
    from facedeform_tpu.ops import fit as fit_mod

    rest_ctrl = jnp.asarray(rest_ctrl, jnp.float32)
    deformed_ctrl = jnp.asarray(deformed_ctrl, jnp.float32)
    n = int(rest_ctrl.shape[0])
    if cfg.solver == "pu":
        raise ValueError(
            "LOOCV autotune applies to the global dense families; the PU "
            "route picks per-patch radii from the local point spacing "
            "(ops/pu.py eps='auto') and takes no global radius"
        )
    if fit_mod.uses_krylov(cfg, n):
        raise ValueError(
            "LOOCV autotune needs the dense factorization (closed-form "
            f"inverse diagonal); {n} controls routes to Krylov.  Tune on a "
            "subsampled rig or use solver='pu' locality instead."
        )
    cp = params.clamped()
    kernel = fit_mod.effective_kernel(cfg)
    if cfg.model == RBFModelType.QNN:
        if ridge_values is not None:
            raise ValueError(
                "QNN is exact interpolation (lam=0 structurally, "
                "ops/fit.py); ridge_values only applies to "
                "MULTILAYER/KERNEL"
            )
        eps_base = fit_mod._qnn_radii(rest_ctrl, cp.qcoef, cp.zcoef)
        lam_base = 0.0
    else:
        eps_base = jnp.broadcast_to(
            jnp.asarray(cp.radius, jnp.float32), (n,)
        )
        lam_base = float(cp.lam)

    factors = np.asarray(
        DEFAULT_RADIUS_FACTORS if radius_factors is None else radius_factors,
        np.float32,
    )
    ridges = (
        np.asarray([lam_base], np.float32)
        if ridge_values is None
        else np.asarray(ridge_values, np.float32)
    )
    # Keep candidates reproducible through the fit-time clamps (the
    # reference's read clamps: radius >= 0.01, lam >= 0.01, qcoef/zcoef
    # >= 0.1 — src/SOP_FaceDeform.cpp:249-253): score what fit() would
    # actually run after params.clamped().
    if cfg.model != RBFModelType.QNN:
        base_r = float(cp.radius)
        factors = np.maximum(factors, 0.01 / base_r).astype(np.float32)
        ridges = np.maximum(ridges, 0.01).astype(np.float32)
    else:
        floor = max(0.1 / float(cp.qcoef), 0.1 / float(cp.zcoef))
        factors = np.maximum(factors, floor).astype(np.float32)
    # Clamping can collapse several grid cells onto the floor; dedupe so
    # each distinct candidate pays its (N+m)^3 factorization exactly once.
    # diag reports THESE applied grids, which may differ from the caller's
    # raw radius_factors/ridge_values.
    factors = np.unique(factors)
    ridges = np.unique(ridges)

    grid_f, grid_l = np.meshgrid(factors, ridges, indexing="ij")
    scales = jnp.asarray(grid_f.ravel())
    lams = jnp.asarray(grid_l.ravel())

    delta = deformed_ctrl - rest_ctrl
    scores = np.asarray(
        _sweep(rest_ctrl, delta, kernel, cfg.term, eps_base, scales, lams)
    ).reshape(len(factors), len(ridges))

    if not np.isfinite(scores).any():
        raise ValueError(
            "every LOOCV candidate produced a non-finite score — the rig "
            "is degenerate (duplicate/collinear controls at every radius)"
        )
    fi, ri = np.unravel_index(np.nanargmin(
        np.where(np.isfinite(scores), scores, np.inf)
    ), scores.shape)
    best_f = float(factors[fi])
    best_l = float(ridges[ri])

    if cfg.model == RBFModelType.QNN:
        new_params = params._replace(
            qcoef=float(cp.qcoef) * best_f, zcoef=float(cp.zcoef) * best_f
        )
    else:
        new_params = params._replace(radius=float(cp.radius) * best_f)
        if ridge_values is not None:
            new_params = new_params._replace(lam=best_l)

    diag = {
        "factors": factors,
        "ridges": ridges,
        "scores": scores,
        "best_factor": best_f,
        "best_ridge": best_l,
        "best_score": float(scores[fi, ri]),
        "radius_candidates": factors * (
            1.0 if cfg.model == RBFModelType.QNN else float(cp.radius)
        ),
    }
    return new_params, diag


def fit_auto(
    rest_ctrl,
    deformed_ctrl,
    cfg: DeformConfig = DeformConfig(),
    params: DeformParams = DeformParams(),
    radius_factors=None,
    ridge_values=None,
    check: bool = True,
):
    """autotune + Deformer.fit in one call; returns (Deformer, diag).

    The Deformer carries the tuned params, so checkpoints and later
    apply/jacobian calls all reproduce the selected model.
    """
    from facedeform_tpu.deformer import Deformer

    new_params, diag = autotune(
        rest_ctrl, deformed_ctrl, cfg, params,
        radius_factors=radius_factors, ridge_values=ridge_values,
    )
    return (
        Deformer.fit(rest_ctrl, deformed_ctrl, cfg, new_params, check=check),
        diag,
    )
