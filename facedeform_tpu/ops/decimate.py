"""Rig decimation: greedy pivoted-Cholesky marker selection + error report.

Dense tracked/scan rigs are over-sampled: thousands of markers carry the
same deformation a few hundred would.  Dropping markers cuts BOTH costs —
the fit (O(N^3) dense / Krylov iterations) and every per-frame eval
(O(V*N)) — so a 10x rig reduction is ~10x on the whole hot path.

Selection = greedy pivoted Cholesky on the (ridge-regularized) kernel Gram
matrix: at each step pick the marker whose basis function is worst
approximated by the span of the already-selected ones (the residual
diagonal of the Schur complement) — farthest-point sampling in the RKHS
metric rather than euclidean space, so selection density follows the
kernel's notion of information, and the residual trace is a certified
bound on how much kernel mass the dropped markers still carry (lazy/
pivoted-Cholesky <-> FPS equivalence: arXiv 2601.03706).  The reference
has no counterpart — ALGLIB consumes whatever rig it is given
(src/SOP_FaceDeform.cpp:268-287).

TPU design: the selection is a `lax.fori_loop` of k steps, each one
argmax + one fused kernel-column evaluation + one (N, k)x(k,) matvec on
VPU/MXU — O(N k^2) total, no (N, N) matrix ever materialized, so a 50k
rig selects 2k markers device-resident.  Selection always uses a GAUSSIAN
surrogate (strictly PD, so the Cholesky diagonal stays nonnegative);
growing kernels (TPS/MQ) are only conditionally PD and selection is a
geometry-coverage problem, not a solve — the surrogate's picks serve
every family (the error REPORT below is measured with the real fit).

`reduce_rig` closes the loop with production truth: refit on the selected
subset, evaluate at the DROPPED markers, and report the actual
displacement error the reduction costs — not just the RKHS bound.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class SelectReport(NamedTuple):
    """Diagnostics of a marker selection."""

    residual_trace: float     # sum of the remaining Schur diagonal (>= 0)
    residual_max: float       # worst single dropped-marker residual
    eps: float                # gaussian surrogate radius used


class ReduceReport(NamedTuple):
    """Measured cost of fitting on the reduced rig (production truth)."""

    max_err: float            # max |field(dropped) - target| over dropped
    rms_err: float            # rms of the same
    motion_scale: float       # max |deformed - rest| for context
    select: SelectReport

    @property
    def relative_max_err(self) -> float:
        return self.max_err / max(self.motion_scale, 1e-30)


def select_markers(
    rest_ctrl,
    k: int,
    eps: Optional[float] = None,
    lam: float = 1e-6,
) -> tuple[np.ndarray, SelectReport]:
    """Pick the k most informative markers of a rest rig.

    Returns (idx (k,) int32 in selection order, SelectReport).  `eps`
    defaults to 2x the rig's median nearest-neighbor spacing (the PU auto
    rule, ops/pu.py): small enough that selection resolves local clusters,
    large enough that coverage stays global.  `lam` is a jitter ridge
    keeping the f32 recursion stable; it only biases scores by +lam.
    """
    x = np.ascontiguousarray(np.asarray(rest_ctrl, np.float32))
    if x.ndim != 2 or x.shape[1] != 3:
        raise ValueError(f"rest_ctrl must be (N, 3), got {x.shape}")
    n = x.shape[0]
    k = int(k)
    if not 1 <= k <= n:
        raise ValueError(f"k={k} must be in [1, {n}]")
    if eps is None:
        from facedeform_tpu.ops.pu import _median_nn

        eps = 2.0 * _median_nn(x)
    eps = float(max(eps, 1e-9))

    xj = jnp.asarray(x)
    inv_e2 = jnp.float32(1.0 / (eps * eps))
    diag0 = jnp.full((n,), 1.0 + lam, jnp.float32)

    def body(i, state):
        d, low, idx = state
        p = jnp.argmax(d).astype(jnp.int32)
        piv = jnp.maximum(d[p], 1e-30)
        # fused gaussian column phi(|x - x_p|) — never an (N, N) matrix
        diff = xj - xj[p]
        col = jnp.exp(-jnp.sum(diff * diff, axis=1) * inv_e2)
        col = col + lam * (jnp.arange(n) == p)
        # subtract the span of the previous columns: low[:, i:] is still
        # zero, so the full (N, k)x(k,) matvec is exact at every step.
        # HIGHEST: a bf16 MXU pass (~8e-3 rel) would compound over the k
        # sequential steps and corrupt pivot order + the residual bound
        c = (
            col - jnp.dot(low, low[p], precision=jax.lax.Precision.HIGHEST)
        ) * jax.lax.rsqrt(piv)
        low = low.at[:, i].set(c)
        d = jnp.maximum(d - c * c, 0.0)
        d = d.at[p].set(-1.0)  # never re-pick (roundoff guard)
        idx = idx.at[i].set(p)
        return d, low, idx

    d, _, idx = jax.lax.fori_loop(
        0, k,
        body,
        (diag0, jnp.zeros((n, k), jnp.float32), jnp.zeros((k,), jnp.int32)),
    )
    resid = jnp.maximum(d, 0.0)
    rep = SelectReport(
        residual_trace=float(jnp.sum(resid)),
        residual_max=float(jnp.max(resid)),
        eps=eps,
    )
    return np.asarray(idx), rep


def reduce_rig(
    rest_ctrl,
    deformed_ctrl,
    k: int,
    cfg=None,
    params=None,
    eps: Optional[float] = None,
) -> tuple[np.ndarray, ReduceReport]:
    """Select k markers AND measure what dropping the rest costs.

    Fits the requested model family (cfg/params, defaults DeformConfig()/
    DeformParams()) on the selected subset and evaluates the field at the
    dropped markers against their true deformed positions — the actual
    displacement error a reduced-rig cook pays, in the rig's units.

    Returns (idx, ReduceReport).  Frame-independence: selection reads only
    the REST rig, so one index set serves a whole tracked shot (slice
    every frame's posed rig with the same idx).
    """
    from facedeform_tpu.config import DeformConfig, DeformParams
    from facedeform_tpu.deformer import Deformer

    cfg = cfg if cfg is not None else DeformConfig()
    params = params if params is not None else DeformParams()
    rest = np.ascontiguousarray(np.asarray(rest_ctrl, np.float32))
    deformed = np.ascontiguousarray(np.asarray(deformed_ctrl, np.float32))
    if rest.shape != deformed.shape:
        raise ValueError(
            f"rig shapes differ: {rest.shape} vs {deformed.shape}"
        )
    idx, sel = select_markers(rest, k, eps=eps)
    motion = float(np.abs(deformed - rest).max())

    if len(idx) == rest.shape[0]:
        rep = ReduceReport(0.0, 0.0, motion, sel)
        return idx, rep

    keep = np.zeros(rest.shape[0], bool)
    keep[idx] = True
    if getattr(cfg, "solver", None) == "pu":
        # the error REPORT fit goes through Deformer, which refuses the
        # PU route (a different artifact class); the interpolation error
        # at the dropped markers is a kernel-family property, so measure
        # it with the auto-routed dense/Krylov solver of the same family
        import dataclasses as _dc

        cfg = _dc.replace(cfg, solver="auto")
    d = Deformer.fit(rest[keep], deformed[keep], cfg, params)
    pred, _ = d.apply(rest[~keep])
    err = np.asarray(pred) - deformed[~keep]
    enorm = np.linalg.norm(err, axis=1)
    rep = ReduceReport(
        max_err=float(enorm.max()),
        rms_err=float(np.sqrt(np.mean(enorm**2))),
        motion_scale=motion,
        select=sel,
    )
    return idx, rep


class ReducedFitInfo(NamedTuple):
    """Regression-quality diagnostics of a reduced-basis fit (distinct
    from the SolveReport, which measures solver health on the normal
    equations — a noisy rig legitimately has a large REGRESSION residual
    while the solve itself is healthy)."""

    idx: np.ndarray           # (k,) selected centers
    fit_rms: float            # rms |field(marker) - target| over ALL N
    fit_max: float            # max of the same
    motion_scale: float


def _resolve_centers(rest, k, idx, eps_select):
    """Shared idx resolution: select (or validate caller-supplied) centers."""
    if idx is None:
        idx, _sel = select_markers(rest, k, eps=eps_select)
    else:
        idx = np.asarray(idx, np.int32)
        n = rest.shape[0]
        if idx.size and (idx.min() < 0 or idx.max() >= n):
            # -1 and n-1 pass a uniqueness check as distinct values but
            # index the same marker — duplicate centers in disguise
            raise ValueError(
                f"idx out of range: values must be in [0, {n}), got "
                f"[{idx.min()}, {idx.max()}]"
            )
        if len(np.unique(idx)) != len(idx):
            raise ValueError("idx has duplicate centers")
    return idx


def _check_single_layer(cfg):
    """fit_reduced's family contract; raised before any selection work."""
    from facedeform_tpu.config import RBFModelType

    if cfg.model == RBFModelType.MULTILAYER:
        raise ValueError(
            "fit_reduced is single-layer (KERNEL/QNN): MULTILAYER's "
            "residual layers are interpolation machinery — use "
            "reduce_rig (subset mode) for that family"
        )


def _reduced_design(cfg, params, rest, idx):
    """Assemble the (N, K+m) reduced design matrix over K selected centers.

    Returns (centers (K,3), a (N,K+m), eps_c, lam, m).  Radii follow the
    model family on the CENTERS (QNN adaptive / global radius); QNN's
    structural lam=0 is an interpolation contract — the regression is
    overdetermined (N >= K) so a tiny ridge only conditions it."""
    from facedeform_tpu.ops import fit as fit_mod
    from facedeform_tpu.ops.assemble import poly_basis
    from facedeform_tpu.ops.kernels import apply_kernel, pairwise_sqdist

    _check_single_layer(cfg)
    centers = jnp.asarray(rest[idx])
    kernel = fit_mod.effective_kernel(cfg)
    # confidence is an observation weight here, not a ridge, so it does
    # not flow into _family_radii (whose QNN branch would reject it)
    eps_c, lam0 = fit_mod._family_radii(cfg, params, centers, None)
    lam = jnp.maximum(jnp.max(jnp.asarray(lam0)), 1e-6)
    x = jnp.asarray(rest)
    a_rbf = apply_kernel(kernel, pairwise_sqdist(x, centers), eps_c)
    p_n = poly_basis(x, cfg.term)
    a = jnp.concatenate([a_rbf, p_n], axis=1)          # (N, K+m)
    return centers, a, eps_c, lam, int(p_n.shape[1])


def _confidence_weights(confidence, n):
    """(N, 1) sqrt-confidence observation weights, or None."""
    if confidence is None:
        return None
    from facedeform_tpu.ops.fit import confidence_clipped

    # THE per-marker-confidence contract (clip + shape check, raising the
    # same ShapeMismatchError as every other route)
    return jnp.sqrt(confidence_clipped(confidence, n))[:, None]


def _ridge_normal_solve(a_w, b_w, ridge, constraint=None):
    """Solve the ridge normal equations (A'A + diag(ridge)) Z = A'B,
    optionally under the equality constraint C Z = 0 (KKT block system).
    Returns (z, sys, rhs_sys, resid) with z the primal (K+m) block and
    sys/rhs_sys/resid describing the system actually solved.

    Zero-ridge columns (the polynomial tail) get a tiny RELATIVE ridge
    (1e-6 of their own gram diagonal): a coplanar rig makes the tail
    columns linearly dependent and the normal matrix exactly singular —
    the SPD analogue of the dense solver's quasi-definite tail
    regularization (ops/assemble.py; CLAUDE.md 'coplanar rigs solve').
    The constraint's (2,2) block carries the same -1e-8 quasi-definite
    shift.  The solve is ops.solve.lu_solve_refined — ONE factorization
    under the HIGHEST-precision scope + compensated refinement (three
    bare jnp.linalg.solve calls here used to re-factorize thrice at
    default bf16 MXU precision; round-5 review finding)."""
    from facedeform_tpu.ops.solve import lu_solve_refined

    _hp = jax.lax.Precision.HIGHEST
    gram = jnp.dot(a_w.T, a_w, precision=_hp)
    ridge = jnp.where(ridge > 0, ridge, 1e-6 * jnp.diag(gram))
    gram = gram + jnp.diag(ridge)
    rhs = jnp.dot(a_w.T, b_w, precision=_hp)
    if constraint is not None:
        mc = constraint.shape[0]
        sys = jnp.block([
            [gram, constraint.T],
            [constraint, -1e-8 * jnp.eye(mc, dtype=gram.dtype)],
        ])
        rhs_sys = jnp.concatenate(
            [rhs, jnp.zeros((mc, rhs.shape[1]), rhs.dtype)]
        )
    else:
        sys, rhs_sys = gram, rhs
    z_full, _rep = lu_solve_refined(sys, rhs_sys)
    resid = rhs_sys - jnp.dot(sys, z_full, precision=_hp)
    return z_full[: gram.shape[0]], sys, rhs_sys, resid


def _tail_constraint(cfg, centers, kk: int, m: int):
    """(m, K+m) KKT constraint [P_K^T | 0] enforcing P^T w = 0 — or None.

    Every eval path centers phi for growing kernels by assuming the
    interpolation invariant sum_j w_j = 0 (ops/evaluate.py:_center_phi);
    an unconstrained ridge regression violates it and the evaluated
    field picks up a mean_j(phi_vj) * sum_j(w_j) bias the fit
    diagnostics never see (round-5 review finding).  Imposing the full
    CPD side condition P_K^T w = 0 (the standard smoothing-spline /
    Nystrom form) restores the invariant exactly; strictly-PD kernels
    (gaussian etc.) skip centering and stay unconstrained."""
    from facedeform_tpu.ops import fit as fit_mod
    from facedeform_tpu.ops.assemble import poly_basis
    from facedeform_tpu.ops.evaluate import _center_phi

    if m == 0 or not _center_phi(fit_mod.effective_kernel(cfg), cfg.term):
        return None
    p_k = poly_basis(centers, cfg.term)                     # (K, m)
    return jnp.concatenate(
        [p_k.T, jnp.zeros((m, m), p_k.dtype)], axis=1
    )


def fit_reduced(
    rest_ctrl,
    deformed_ctrl,
    k: int,
    cfg=None,
    params=None,
    confidence=None,
    eps_select: Optional[float] = None,
    idx=None,
):
    """Reduced-basis REGRESSION fit: all N markers constrain K centers.

    Where `reduce_rig` DROPS markers (subset interpolation), this keeps
    every marker as an observation and solves the ridge least-squares

        min_w,c  sum_i c_i |Phi_ik w + P_i c - delta_i|^2 + lam |w|^2

    over the K selected basis centers — the Nystrom / inducing-point
    formulation.  On noisy tracker rigs this AVERAGES the ~N/K
    observations per degree of freedom instead of interpolating noise,
    and the result is a bog-standard `RBFModel` (ctrl = the K centers),
    so every downstream path — Pallas eval kernels, falloff, tangent,
    sharding, checkpoints, `node.cook(deformer=...)` — consumes it
    unchanged.  `confidence` ((N,) in (0, 1]) row-weights the
    observations (sqrt(c_i) scaling) — the regression-native form of the
    per-marker confidence ridge.

    Single-layer families only (KERNEL, QNN-style adaptive radii);
    MULTILAYER's coarse-to-fine residual layers are interpolation
    machinery — use subset mode (`reduce_rig`) there.

    TPU shape: the (N, K+m) design matrix assembles fused, the normal
    equations are ONE (K+m, N)x(N, K+m) HIGHEST-precision MXU matmul,
    and the (K+m)^2 solve + two iterative-refinement sweeps reuse the
    dense-solve machinery's contract.  Returns (model, report, info).
    """
    from facedeform_tpu.config import DeformConfig, DeformParams
    from facedeform_tpu.ops.solve import SolveReport

    cfg = cfg if cfg is not None else DeformConfig()
    params = (params if params is not None else DeformParams()).clamped()
    _check_single_layer(cfg)
    rest = np.ascontiguousarray(np.asarray(rest_ctrl, np.float32))
    deformed = np.ascontiguousarray(np.asarray(deformed_ctrl, np.float32))
    if rest.shape != deformed.shape:
        raise ValueError(
            f"rig shapes differ: {rest.shape} vs {deformed.shape}"
        )
    n = rest.shape[0]
    idx = _resolve_centers(rest, k, idx, eps_select)
    kk = len(idx)
    centers, a, eps_c, lam, m = _reduced_design(cfg, params, rest, idx)

    delta = jnp.asarray(deformed - rest)
    sw = _confidence_weights(confidence, n)
    a_w, delta_w = (a, delta) if sw is None else (a * sw, delta * sw)

    ridge = jnp.concatenate(
        [jnp.full((kk,), lam, jnp.float32), jnp.zeros((m,), jnp.float32)]
    )
    _hp = jax.lax.Precision.HIGHEST
    z, gram, rhs, resid = _ridge_normal_solve(
        a_w, delta_w, ridge, constraint=_tail_constraint(cfg, centers, kk, m)
    )

    # solver-health report: backward error of the NORMAL system (the
    # regression misfit below is data, not a solve failure)
    report = SolveReport(
        residual_norm=jnp.linalg.norm(resid),
        rhs_norm=jnp.linalg.norm(rhs),
        scale_norm=(
            jnp.linalg.norm(gram) * jnp.linalg.norm(z)
            + jnp.linalg.norm(rhs)
        ),
    )

    w = z[:kk]
    w_poly = z[kk:]
    from facedeform_tpu.ops.fit import RBFModel

    model = RBFModel(
        ctrl=centers,
        w_rbf=w[None],                    # (1, K, 3)
        w_poly=w_poly.astype(jnp.float32),
        eps=jnp.broadcast_to(
            jnp.asarray(eps_c, jnp.float32), (kk,)
        )[None],                          # (1, K)
    )

    pred = jnp.dot(a, z, precision=_hp)   # unweighted: true field at markers
    err = jnp.linalg.norm(pred - delta, axis=1)
    info = ReducedFitInfo(
        idx=np.asarray(idx),
        fit_rms=float(jnp.sqrt(jnp.mean(err**2))),
        fit_max=float(jnp.max(err)),
        motion_scale=float(jnp.max(jnp.abs(delta))),
    )
    return model, report, info


class ReducedSeqFitInfo(NamedTuple):
    """Per-frame regression diagnostics of a reduced-basis SHOT fit."""

    idx: np.ndarray           # (k,) selected centers
    fit_rms: np.ndarray       # (F,) rms |field(marker) - target| over ALL N
    fit_max: np.ndarray       # (F,) max of the same
    motion_scale: float
    resid_norms: np.ndarray   # (F,) normal-system residual per frame


def fit_reduced_frames(
    rest_ctrl,
    deformed_frames,
    k: int,
    cfg=None,
    params=None,
    confidence=None,
    eps_select: Optional[float] = None,
    idx=None,
):
    """Reduced-basis regression over a whole shot: ONE shared factorization.

    The design matrix depends only on the REST rig and the selected
    centers, so an F-frame tracked shot is just 3F right-hand-side columns
    of the same ridge normal system: one (K+m, N)x(N, K+m) Gram assembly,
    one factorization, all frames solved together (the reduced-regression
    analogue of `fit_frames_dense` — the reference re-solves per cook,
    src/SOP_FaceDeform.cpp:330-368).  Inputs (N, 3) rest and (F, N, 3)
    deformed frames; `confidence` (N,) row-weights every frame alike.

    Returns (model, report, info): `model` is a stock frames-stacked
    RBFModel — ctrl (K, 3), w_rbf (F, 1, K, 3), w_poly (F, m, 3),
    eps (1, K) — consumed unchanged by parallel/batched.apply_frames,
    transport_frames, save_seq checkpoints and the sharded eval;
    `report` is a single SolveReport over all 3F columns whose
    col_backward exposes any single bad frame to errors.check_solve;
    `info` carries per-frame regression misfits (data, not solve health).
    """
    from facedeform_tpu.config import DeformConfig, DeformParams
    from facedeform_tpu.ops.fit import RBFModel
    from facedeform_tpu.ops.solve import SolveReport

    cfg = cfg if cfg is not None else DeformConfig()
    params = (params if params is not None else DeformParams()).clamped()
    _check_single_layer(cfg)
    rest = np.ascontiguousarray(np.asarray(rest_ctrl, np.float32))
    frames = np.ascontiguousarray(np.asarray(deformed_frames, np.float32))
    if frames.ndim != 3 or frames.shape[1:] != rest.shape:
        raise ValueError(
            f"deformed_frames must be (F, N, 3) matching rest "
            f"{rest.shape}, got {frames.shape}"
        )
    n, f = rest.shape[0], frames.shape[0]
    idx = _resolve_centers(rest, k, idx, eps_select)
    kk = len(idx)
    centers, a, eps_c, lam, m = _reduced_design(cfg, params, rest, idx)

    delta = jnp.asarray(frames) - jnp.asarray(rest)[None]      # (F, N, 3)
    # pack frames as RHS columns: (N, 3F), frame-major [f0 xyz, f1 xyz, …]
    delta_cols = jnp.transpose(delta, (1, 0, 2)).reshape(n, 3 * f)
    sw = _confidence_weights(confidence, n)
    a_w, d_w = (a, delta_cols) if sw is None else (a * sw, delta_cols * sw)

    ridge = jnp.concatenate(
        [jnp.full((kk,), lam, jnp.float32), jnp.zeros((m,), jnp.float32)]
    )
    _hp = jax.lax.Precision.HIGHEST
    z, gram, rhs, resid = _ridge_normal_solve(
        a_w, d_w, ridge, constraint=_tail_constraint(cfg, centers, kk, m)
    )

    # one report over all 3F columns; per-column backward errors let
    # errors.check_solve catch a single degenerate frame/axis
    gnorm = jnp.linalg.norm(gram)
    col_back = jnp.linalg.norm(resid, axis=0) / jnp.maximum(
        gnorm * jnp.linalg.norm(z, axis=0)
        + jnp.linalg.norm(rhs, axis=0), 1e-30
    )
    report = SolveReport(
        residual_norm=jnp.linalg.norm(resid),
        rhs_norm=jnp.linalg.norm(rhs),
        scale_norm=gnorm * jnp.linalg.norm(z) + jnp.linalg.norm(rhs),
        col_backward=col_back,
    )

    zf = jnp.transpose(z.reshape(kk + m, f, 3), (1, 0, 2))     # (F, K+m, 3)
    model = RBFModel(
        ctrl=centers,
        w_rbf=zf[:, None, :kk, :],                             # (F, 1, K, 3)
        w_poly=zf[:, kk:, :].astype(jnp.float32),              # (F, m, 3)
        eps=jnp.broadcast_to(
            jnp.asarray(eps_c, jnp.float32), (kk,)
        )[None],                                               # (1, K)
    )

    pred = jnp.dot(a, z, precision=_hp).reshape(n, f, 3)
    err = jnp.linalg.norm(jnp.transpose(pred, (1, 0, 2)) - delta, axis=2)
    info = ReducedSeqFitInfo(
        idx=np.asarray(idx),
        fit_rms=np.asarray(jnp.sqrt(jnp.mean(err**2, axis=1))),
        fit_max=np.asarray(jnp.max(err, axis=1)),
        motion_scale=float(jnp.max(jnp.abs(delta))),
        resid_norms=np.asarray(
            jnp.linalg.norm(resid.reshape(kk + m, f, 3), axis=(0, 2))
        ),
    )
    return model, report, info
