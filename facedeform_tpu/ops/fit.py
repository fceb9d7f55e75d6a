"""RBF model fitting: build + solve the interpolation system on device.

Replaces the reference's ALGLIB driver (component D, SURVEY.md section 2):
data packing src/SOP_FaceDeform.cpp:268-287, model setup :330-368.  The two
ALGLIB algorithm families are reinterpreted with explicit math:

  * QNN (rbfsetalgoqnn(q, z), src/SOP_FaceDeform.cpp:344): gaussian kernels
    with per-point adaptive radii  eps_i = q * nndist_i  capped at
    z * mean(nndist) — q scales each basis to its local point spacing
    (smoothness), z bounds how far an isolated point may reach (deviation).
    Exact interpolation (no ridge), like ALGLIB-QNN.

  * Multilayer (rbfsetalgomultilayer(radius, layers, lambda),
    src/SOP_FaceDeform.cpp:347): coarse-to-fine residual fitting — `layers`
    gaussian layers with radius halving each layer and ridge `lambda`, each
    fitted to what the previous layers left unexplained (SURVEY.md section 7).

  * KERNEL (rebuild extension, BASELINE config 2): a single layer of the
    user-chosen zoo kernel with a global radius and ridge.

All solves go through ops.solve.lu_solve_refined (f32 + compensated
refinement).  The polynomial tail (reference `term`) is attached to the
first layer only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from facedeform_tpu.config import DeformConfig, DeformParams, RBFKernel, RBFModelType
from facedeform_tpu.ops.assemble import assemble_rhs, assemble_system
from facedeform_tpu.ops.kernels import nearest_neighbor_dist
from facedeform_tpu.ops.solve import SolveReport, lu_solve_refined


class RBFModel(NamedTuple):
    """Solved deformation model — the pytree equivalent of ALGLIB's rbfmodel.

    The reference serializes its model to hand copies to worker threads
    (src/SOP_FaceDeform.hpp:132-133); here the model is a plain pytree that
    jit/vmap/shard_map replicate for free.

    Shapes: ctrl (N, 3); w_rbf (L, N, 3); eps (L, N); w_poly (m, 3) with m
    determined by the static term config (4/1/0).

    w_rbf_lo / w_poly_lo are the optional sub-f32 bits of the solved
    weights (double-float pairs, produced by the dense solve path): the
    precise eval path (ops/precise_eval.py) contracts against hi + lo so
    growing kernels keep the 5e-5 displacement budget at large N.  None on
    Krylov-path fits; every f32-only consumer ignores them.
    """

    ctrl: jnp.ndarray
    w_rbf: jnp.ndarray
    w_poly: jnp.ndarray
    eps: jnp.ndarray
    w_rbf_lo: jnp.ndarray | None = None
    w_poly_lo: jnp.ndarray | None = None


# Above this control count the dense factorization gives way to MINRES.
_KRYLOV_THRESHOLD = 8192


def uses_krylov(cfg, n: int) -> bool:
    """Whether fit() will route (cfg, n-control rig) through the
    matrix-free Krylov solvers — exposed so callers (the solve health
    check) can pick the matching backward-error threshold."""
    return cfg.solver == "krylov" or (
        cfg.solver == "auto" and n > _KRYLOV_THRESHOLD
    )


def _worst_report(reports: list) -> SolveReport:
    """Reduce per-layer SolveReports to the layer with the worst backward
    error (the health check's criterion), picked with traced arithmetic so
    this works inside jit."""
    if len(reports) == 1:
        return reports[0]
    errs = jnp.stack([r.backward_error() for r in reports])
    idx = jnp.argmax(errs)

    def pick(*leaves):
        return jnp.stack(leaves)[idx]

    return jax.tree_util.tree_map(pick, *reports)


def effective_kernel(cfg: DeformConfig) -> RBFKernel:
    """QNN and Multilayer are gaussian-based; KERNEL mode picks from the zoo."""
    if cfg.model == RBFModelType.KERNEL:
        return cfg.kernel
    return RBFKernel.GAUSSIAN


def _qnn_radii(ctrl: jnp.ndarray, q: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Per-point adaptive radii for QNN mode; shape (N,)."""
    nn = nearest_neighbor_dist(ctrl)
    # Floor at a fraction of the cloud scale so duplicate points can't
    # produce zero-radius (singular) bases.
    scale = jnp.maximum(jnp.max(nn), 1e-6)
    nn = jnp.maximum(nn, 1e-4 * scale)
    eps = q * nn
    cap = z * jnp.mean(nn)
    return jnp.minimum(eps, cap)


def _family_radii(
    cfg: DeformConfig,
    params: DeformParams,
    rest_ctrl: jnp.ndarray,
    confidence: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-family first-layer radius field (N,) and ridge (scalar or (N,)).

    QNN: adaptive per-point radii, lam structurally 0 (exact interpolation,
    like ALGLIB QNN).  MULTILAYER / KERNEL: global radius + user ridge.
    Shared by fit() and fit_frames_dense() so the family rules can never
    drift between the single-pose and packed-frames routes.

    `confidence` ((N,) in (0, 1], e.g. a tracker's per-marker quality)
    turns the scalar ridge into lam_i = lam / c_i: a c=1 marker keeps the
    user ridge, a low-c marker is smoothed over instead of interpolated
    (the weighted-ridge formulation of scattered-data fitting).  Requires
    a ridge family — QNN's lam is structurally 0, so confidence would be
    a silent no-op there; raise instead.
    """
    n = rest_ctrl.shape[0]
    if cfg.model == RBFModelType.QNN:
        if confidence is not None:
            raise ValueError(
                "confidence weighting needs a ridge family "
                "(MULTILAYER or KERNEL): QNN interpolates exactly "
                "(lam = 0 structurally), so per-marker confidence would "
                "have no effect"
            )
        eps0 = _qnn_radii(rest_ctrl, params.qcoef, params.zcoef)
        lam0 = jnp.asarray(0.0, jnp.float32)
    else:  # MULTILAYER / KERNEL: global radius + ridge
        eps0 = jnp.broadcast_to(params.radius, (n,)).astype(jnp.float32)
        lam0 = jnp.asarray(params.lam, jnp.float32)
        if confidence is not None:
            c = confidence_clipped(confidence, n)
            lam0 = jnp.broadcast_to(lam0 / c, (n,))
    return eps0, lam0


# Confidence below this floor is treated as "barely trusted", not zero:
# lam / c must stay finite.  THE single definition of the confidence
# contract — the dense, Krylov and PU routes all clip through here.
CONFIDENCE_FLOOR = 1e-3


def confidence_clipped(confidence, n: int) -> jnp.ndarray:
    """(N,) confidence clipped to [CONFIDENCE_FLOOR, 1], shape-checked.

    Shared by every route that weights the ridge (lam_i = lam / c_i):
    _family_radii (dense + Krylov) and ops/pu._fit_pu_rhs (per-patch).
    Raises ShapeMismatchError on a wrong-length vector (works at trace
    time too — shapes are static under jit).
    """
    from facedeform_tpu.utils import errors

    c = jnp.asarray(confidence, jnp.float32).reshape(-1)
    if c.shape[0] != n:
        raise errors.ShapeMismatchError(
            f"confidence has {c.shape[0]} entries for {n} markers"
        )
    return jnp.clip(c, CONFIDENCE_FLOOR, 1.0)


def _lam_col(lam: jnp.ndarray) -> jnp.ndarray:
    """Ridge shaped to broadcast against (N, k) weight columns: scalars
    pass through, per-marker (N,) vectors gain the column axis."""
    lam = jnp.asarray(lam)
    return lam[:, None] if lam.ndim == 1 else lam


class LayerFactors(NamedTuple):
    """Pose-independent artifacts of one dense layer's solve: the
    assembled system (df pair for growing kernels, a_lo=None otherwise)
    plus its f32 LU factors.  Everything here depends only on the rest
    rig and the solve params — never on the deformed pose — which is what
    makes the interactive marker-drag re-solve (refit) an O(n^2) step."""

    a_hi: jnp.ndarray
    a_lo: jnp.ndarray | None
    lu: jnp.ndarray
    piv: jnp.ndarray


class FitFactors(NamedTuple):
    """prepare()'s output: per-layer LayerFactors plus the radius/ridge
    fields fit() derived from the rest rig, so refit() never recomputes
    them (QNN's adaptive radii are a rest-rig function)."""

    ctrl: jnp.ndarray                       # (N, 3) f32 rest controls
    eps0: jnp.ndarray                       # (N,) first-layer radii
    lam0: jnp.ndarray                       # scalar or (N,) ridge
    layers: tuple                           # L x LayerFactors


def _assemble_layer(rest_ctrl, kernel, term, eps_l, lam0):
    """Assemble one layer's system: df pair for growing kernels (the f32
    assembly rounding of phi is itself budget-breaking once amplified by
    conditioning), plain f32 (a, None) for decaying kernels."""
    from facedeform_tpu.ops.precise_eval import GROWING_KERNELS

    if kernel in GROWING_KERNELS:
        from facedeform_tpu.ops.assemble import assemble_system_df

        return assemble_system_df(rest_ctrl, kernel, term, eps_l, lam0)
    return assemble_system(rest_ctrl, kernel, term, eps_l, lam0), None


def _factor_layer(a_hi, a_lo) -> LayerFactors:
    from facedeform_tpu.ops.solve import lu_factor_hp

    lu, piv = lu_factor_hp(a_hi)
    return LayerFactors(a_hi=a_hi, a_lo=a_lo, lu=lu, piv=piv)


def _resolve_layer(lay: LayerFactors, b: jnp.ndarray, n_refine: int):
    """Refined solve against a layer's PRECOMPUTED factors — the exact
    refinement arithmetic of the factoring path (ops/solve.py), minus the
    O(n^3) factorization.  Returns ((x, x_lo), report)."""
    from facedeform_tpu.ops.solve import _lu_against_df_impl, _lu_refined_impl

    if lay.a_lo is not None:
        return _lu_against_df_impl(
            lay.a_hi, lay.a_lo, b, max(n_refine, 3), gmres_ir=True,
            lu_piv=(lay.lu, lay.piv),
        )
    (x, x_lo), report, _ = _lu_refined_impl(
        lay.a_hi, b, n_refine, want_lo=True, lu_piv=(lay.lu, lay.piv)
    )
    return (x, x_lo), report


def _dense_layer_solve(
    rest_ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term,
    eps_l: jnp.ndarray,
    lam0: jnp.ndarray,
    b: jnp.ndarray,
    n_refine: int,
    want_factors: bool = False,
):
    """One dense-layer solve: assemble + refined LU, df-aware per kernel.

    Returns (a, (x, x_lo), report[, LayerFactors]); a is the f32(-hi)
    system for residual chaining.  Single source of truth for fit()'s
    dense branch AND fit_frames_dense (which only packs more RHS columns
    into b) AND — decomposed as _assemble_layer/_factor_layer/
    _resolve_layer — the prepare()/refit() pose-independent split.
    """
    a, a_lo = _assemble_layer(rest_ctrl, kernel, term, eps_l, lam0)
    lay = _factor_layer(a, a_lo)
    (x, x_lo), report = _resolve_layer(lay, b, n_refine)
    if want_factors:
        return a, (x, x_lo), report, lay
    return a, (x, x_lo), report


@functools.partial(jax.jit, static_argnames=("cfg",))
def fit(
    rest_ctrl: jnp.ndarray,
    deformed_ctrl: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    confidence: jnp.ndarray | None = None,
) -> tuple[RBFModel, SolveReport]:
    """Fit an RBFModel mapping rest control points to their displacements.
    (docstring continues on _fit_impl)"""
    model, report, _ = _fit_impl(
        rest_ctrl, deformed_ctrl, cfg, params, confidence, want_factors=False
    )
    return model, report


@functools.partial(jax.jit, static_argnames=("cfg",))
def fit_with_factors(
    rest_ctrl: jnp.ndarray,
    deformed_ctrl: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    confidence: jnp.ndarray | None = None,
) -> tuple[RBFModel, SolveReport, FitFactors]:
    """fit() that also returns the pose-independent FitFactors, so an
    interactive caller (node.py's factor cache) pays the O(n^3)
    factorizations ONCE per rest rig and re-solves marker drags through
    refit() at O(n^2).  Dense route only — Krylov fits are matrix-free
    (raise at trace time; callers gate on uses_krylov)."""
    if uses_krylov(cfg, int(rest_ctrl.shape[0])):
        raise ValueError(
            "fit_with_factors is a dense-route API: the Krylov path is "
            "matrix-free (no factorization to reuse) — gate on "
            "fit.uses_krylov before calling"
        )
    model, report, factors = _fit_impl(
        rest_ctrl, deformed_ctrl, cfg, params, confidence, want_factors=True
    )
    return model, report, factors


def _fit_impl(
    rest_ctrl: jnp.ndarray,
    deformed_ctrl: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
    confidence: jnp.ndarray | None,
    want_factors: bool,
):
    """Fit an RBFModel mapping rest control points to their displacements.

    Equivalent of the reference's pack + build sequence
    (src/SOP_FaceDeform.cpp:268-287 packs [restP, deformP - restP]; :330-368
    selects algorithm/term and calls rbfbuildmodel).

    Args:
      rest_ctrl: (N, 3) rest-pose control/rig points.
      deformed_ctrl: (N, 3) deformed rig; delta = deformed - rest.
      cfg: static config (model family, term, layers, refinement sweeps).
      params: dynamic knobs (q, z, radius, lambda).
      confidence: optional (N,) per-marker quality in (0, 1] — turns the
        ridge into lam / c_i so low-confidence markers are smoothed over
        (ridge families only; see _family_radii).

    Returns:
      (model, report); report aggregates residuals across layers.
    """
    params = params.clamped()
    rest_ctrl = rest_ctrl.astype(jnp.float32)
    delta = (deformed_ctrl.astype(jnp.float32) - rest_ctrl)
    n = rest_ctrl.shape[0]
    kernel = effective_kernel(cfg)
    n_layers = cfg.n_layers

    eps0, lam0 = _family_radii(cfg, params, rest_ctrl, confidence)

    w_layers = []
    w_lo_layers = []
    eps_layers = []
    layer_reports = []
    layer_factors = []
    w_poly = jnp.zeros((cfg.n_poly, 3), dtype=jnp.float32)
    w_poly_lo = jnp.zeros((cfg.n_poly, 3), dtype=jnp.float32)
    target = delta

    # Solver routing: dense factorization hits XLA's LU VMEM panel limit
    # near 16k controls; matrix-free Krylov (ops/krylov.py) scales past it
    # for every family — (P)MINRES on the symmetric MULTILAYER/KERNEL
    # saddle systems, restarted GMRES on QNN (per-point radii make that
    # system non-symmetric).
    use_krylov = uses_krylov(cfg, n)

    for layer in range(n_layers):
        eps_l = eps0 * (0.5 ** layer)
        # Polynomial tail rides the first layer only.
        term = cfg.term if layer == 0 else type(cfg.term)(2)  # PolyTerm.ZERO
        b = assemble_rhs(target, term)
        if use_krylov:
            from facedeform_tpu.ops.kernels import kernel_is_pd
            from facedeform_tpu.ops.krylov import (
                gmres, make_abs_block_jacobi, make_block_jacobi,
                make_saddle_matvec, pminres,
            )

            apply_sys = make_saddle_matvec(rest_ctrl, kernel, term, eps_l, lam0)
            if cfg.model == RBFModelType.QNN:
                # Non-symmetric (per-point radii): right-preconditioned
                # restarted GMRES.  QNN radii scale with the local point
                # spacing, so Phi is diagonally dominated and block-Jacobi
                # captures most of the coupling.
                msolve = make_block_jacobi(
                    rest_ctrl, kernel, term, eps_l, lam0
                )
                x, report = gmres(apply_sys, b, msolve=msolve)
                for _ in range(max(cfg.n_refine - 1, 0)):
                    x, report = gmres(apply_sys, b, msolve=msolve, x0=x)
            elif kernel_is_pd(kernel):
                msolve = make_block_jacobi(
                    rest_ctrl, kernel, term, eps_l, lam0
                )
                x, report = pminres(apply_sys, b, msolve)
                for _ in range(max(cfg.n_refine - 1, 0)):
                    x, report = pminres(apply_sys, b, msolve, x0=x)
            else:
                # CPD kernels (TPS/MQ/linear/cubic): diagonal blocks may be
                # indefinite, so the plain block inverse is not SPD —
                # precondition with the spectral absolute value instead
                # (|.|-block-Jacobi over Z-ordered neighborhoods; ~19x
                # lower converged residual than plain MINRES, measured).
                msolve = make_abs_block_jacobi(
                    rest_ctrl, kernel, term, eps_l, lam0
                )
                x, report = pminres(apply_sys, b, msolve)
                for _ in range(max(cfg.n_refine - 1, 0)):
                    # Warm-restarted sweeps recover f32 Lanczos drift.
                    x, report = pminres(apply_sys, b, msolve, x0=x)
        else:
            # The solver reports carry the double-float-compensated
            # residual plus the backward-error scale and LU cond estimate;
            # x_lo holds the sub-f32 solution bits for the precise eval.
            if want_factors:
                a, (x, x_lo), report, lay = _dense_layer_solve(
                    rest_ctrl, kernel, term, eps_l, lam0, b, cfg.n_refine,
                    want_factors=True,
                )
                layer_factors.append(lay)
            else:
                a, (x, x_lo), report = _dense_layer_solve(
                    rest_ctrl, kernel, term, eps_l, lam0, b, cfg.n_refine
                )

            def apply_sys(v, a=a):
                return jnp.dot(
                    a, v,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

        w_l = x[:n]
        w_layers.append(w_l)
        eps_layers.append(eps_l)
        layer_reports.append(report)
        if use_krylov:
            w_lo_layers.append(jnp.zeros_like(w_l))
        else:
            w_lo_layers.append(x_lo[:n])
            if layer == 0 and cfg.n_poly > 0:
                w_poly_lo = x_lo[n:]
        if layer == 0 and cfg.n_poly > 0:
            w_poly = x[n:]
        if layer + 1 < n_layers:
            # Subtract this layer's prediction at the control points so the
            # next (finer) layer fits the remaining residual.  The system's
            # top block is Phi w + lam w + P c, so the prediction
            # Phi w + P c is ax[:n] - lam w on both solver paths.
            ax = apply_sys(x)
            target = target - (ax[:n] - _lam_col(lam0) * w_l)

    model = RBFModel(
        ctrl=rest_ctrl,
        w_rbf=jnp.stack(w_layers),
        w_poly=w_poly,
        eps=jnp.stack(eps_layers),
        w_rbf_lo=None if use_krylov else jnp.stack(w_lo_layers),
        w_poly_lo=None if use_krylov else w_poly_lo,
    )
    factors = (
        FitFactors(ctrl=rest_ctrl, eps0=eps0, lam0=lam0,
                   layers=tuple(layer_factors))
        if want_factors else None
    )
    return model, _worst_report(layer_reports), factors


@functools.partial(jax.jit, static_argnames=("cfg",))
def prepare(
    rest_ctrl: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    confidence: jnp.ndarray | None = None,
) -> FitFactors:
    """Assemble + LU-factor the dense per-layer systems WITHOUT a pose.

    The saddle system depends only on the rest rig and solve params
    (ops/assemble.py) — the deformed rig enters through the RHS alone.
    prepare() + refit() split the fit at exactly that boundary, so an
    interactive session (an artist dragging markers: same rest rig, new
    pose every cook — the reference re-solves its whole ALGLIB model per
    cook, src/SOP_FaceDeform.cpp:330-368) pays the O(n^3) factorization
    once and O(n^2) triangular solves + refinement per drag.

    Dense route only; gate on fit.uses_krylov (matrix-free — nothing to
    factor) and solver != "pu" (ops/pu.py has its own patch plan).
    """
    if uses_krylov(cfg, int(rest_ctrl.shape[0])):
        raise ValueError(
            "prepare() is a dense-route API: the Krylov path is "
            "matrix-free — gate on fit.uses_krylov"
        )
    params = params.clamped()
    rest_ctrl = rest_ctrl.astype(jnp.float32)
    kernel = effective_kernel(cfg)
    eps0, lam0 = _family_radii(cfg, params, rest_ctrl, confidence)
    layers = []
    for layer in range(cfg.n_layers):
        eps_l = eps0 * (0.5 ** layer)
        term = cfg.term if layer == 0 else type(cfg.term)(2)  # PolyTerm.ZERO
        a, a_lo = _assemble_layer(rest_ctrl, kernel, term, eps_l, lam0)
        layers.append(_factor_layer(a, a_lo))
    return FitFactors(ctrl=rest_ctrl, eps0=eps0, lam0=lam0,
                      layers=tuple(layers))


@functools.partial(jax.jit, static_argnames=("cfg",))
def refit(
    factors: FitFactors,
    deformed_ctrl: jnp.ndarray,
    cfg: DeformConfig,
) -> tuple[RBFModel, SolveReport]:
    """Re-solve a prepared dense fit for a NEW pose: the marker-drag path.

    Identical refinement arithmetic to fit()'s dense branch (both route
    through _resolve_layer against the same factors), so a refit model
    matches a from-scratch fit of the same pose.  Takes no params: every
    dynamic knob that shapes the system (radius/lam/qcoef/zcoef,
    confidence) was baked into `factors` by prepare()/fit_with_factors —
    changing those requires a new prepare.
    """
    rest_ctrl = factors.ctrl
    n = rest_ctrl.shape[0]
    lam0 = factors.lam0
    delta = deformed_ctrl.astype(jnp.float32) - rest_ctrl
    target = delta
    w_layers, w_lo_layers, eps_layers, layer_reports = [], [], [], []
    w_poly = jnp.zeros((cfg.n_poly, 3), dtype=jnp.float32)
    w_poly_lo = jnp.zeros((cfg.n_poly, 3), dtype=jnp.float32)
    hp = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)

    for layer in range(cfg.n_layers):
        eps_l = factors.eps0 * (0.5 ** layer)
        term = cfg.term if layer == 0 else type(cfg.term)(2)  # PolyTerm.ZERO
        b = assemble_rhs(target, term)
        lay = factors.layers[layer]
        (x, x_lo), report = _resolve_layer(lay, b, cfg.n_refine)
        w_l = x[:n]
        w_layers.append(w_l)
        w_lo_layers.append(x_lo[:n])
        eps_layers.append(eps_l)
        layer_reports.append(report)
        if layer == 0 and cfg.n_poly > 0:
            w_poly = x[n:]
            w_poly_lo = x_lo[n:]
        if layer + 1 < cfg.n_layers:
            ax = jnp.dot(lay.a_hi, x, **hp)
            target = target - (ax[:n] - _lam_col(lam0) * w_l)

    model = RBFModel(
        ctrl=rest_ctrl,
        w_rbf=jnp.stack(w_layers),
        w_poly=w_poly,
        eps=jnp.stack(eps_layers),
        w_rbf_lo=jnp.stack(w_lo_layers),
        w_poly_lo=w_poly_lo,
    )
    return model, _worst_report(layer_reports)


@functools.partial(jax.jit, static_argnames=("cfg",))
def fit_frames_dense(
    rest_ctrl: jnp.ndarray,
    deformed_frames: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    confidence: jnp.ndarray | None = None,
) -> tuple[RBFModel, jnp.ndarray, SolveReport]:
    """F-frame fit sharing ONE factorization per layer (dense path).

    The saddle system (ops/assemble.py) depends only on the rest rig and
    the layer radius, never on the pose — every frame of an animated shot
    is just 3 more RHS columns (delta_f = deformed_f - rest).  The
    reference rebuilds its ALGLIB model per cook
    (src/SOP_FaceDeform.cpp:330-368); the vmapped fit re-factors the SAME
    matrix F times; this packs the shot into a (N+m, 3F) RHS and pays one
    assembly + one LU per layer (the df refinement's per-column work still
    scales with F) — the fit_pu_frames trick (ops/pu.py) applied to the
    global families.

    Dense route only; parallel/batched.fit_frames routes here when the
    vmapped per-frame fit's refinement temps would exceed HBM (big rig x
    long shot — see batched.vmap_fit_hbm_budget), and keeps the vmapped
    fit otherwise (faster when it fits) and for Krylov-size rigs
    (multi-RHS Krylov convergence is per-column business the packed
    solve does not model).

    Returns (model with a leading F axis on w_rbf/w_poly — the
    fit_frames contract, lo bits dropped like the vmapped path —
    per-frame residual norms (F,), aggregate SolveReport).
    """
    params = params.clamped()
    rest_ctrl = rest_ctrl.astype(jnp.float32)
    frames = deformed_frames.astype(jnp.float32)
    f = frames.shape[0]
    n = rest_ctrl.shape[0]
    kernel = effective_kernel(cfg)
    n_layers = cfg.n_layers

    eps0, lam0 = _family_radii(cfg, params, rest_ctrl, confidence)

    def pack(t):      # (F, rows, 3) -> (rows, 3F)
        return t.transpose(1, 0, 2).reshape(t.shape[1], -1)

    def unpack(x):    # (rows, 3F) -> (F, rows, 3)
        return x.reshape(x.shape[0], f, 3).transpose(1, 0, 2)

    target = frames - rest_ctrl[None]  # (F, N, 3)
    w_layers, eps_layers, layer_reports, frame_resids = [], [], [], []
    w_poly = jnp.zeros((f, cfg.n_poly, 3), dtype=jnp.float32)

    for layer in range(n_layers):
        eps_l = eps0 * (0.5 ** layer)
        term = cfg.term if layer == 0 else type(cfg.term)(2)  # PolyTerm.ZERO
        b = pack(jax.vmap(lambda t: assemble_rhs(t, term))(target))
        a, (x, _), report = _dense_layer_solve(
            rest_ctrl, kernel, term, eps_l, lam0, b, cfg.n_refine
        )

        # Per-frame residual norms, reconstructed from the per-column
        # backward errors (||r_c|| = col_backward_c * col_scale_c) — no
        # extra compensated matmul.
        a_norm = jnp.linalg.norm(a)
        col_r = report.col_backward * (
            a_norm * jnp.linalg.norm(x, axis=0) + jnp.linalg.norm(b, axis=0)
        )
        frame_resids.append(
            jnp.sqrt(jnp.sum(col_r.reshape(f, 3) ** 2, axis=1))
        )

        x_f = unpack(x)                       # (F, N+m, 3)
        w_l = x_f[:, :n]
        w_layers.append(w_l)
        eps_layers.append(eps_l)
        layer_reports.append(report)
        if layer == 0 and cfg.n_poly > 0:
            w_poly = x_f[:, n:]
        if layer + 1 < n_layers:
            ax = jnp.dot(
                a, x,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            target = target - (unpack(ax)[:, :n] - _lam_col(lam0)[None] * w_l)

    model = RBFModel(
        ctrl=rest_ctrl,
        w_rbf=jnp.stack(w_layers, axis=1),   # (F, L, N, 3)
        w_poly=w_poly,                       # (F, m, 3)
        eps=jnp.stack(eps_layers),           # (L, N)
    )
    resid = jnp.max(jnp.stack(frame_resids), axis=0)  # worst layer per frame
    return model, resid, _worst_report(layer_reports)
