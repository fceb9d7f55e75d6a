"""Deformer: the solve-once / eval-many user API (component B's core loop).

Wraps fit (ops/fit.py) and the deformation application semantics of the
reference's eval loop (src/SOP_FaceDeform.cpp:404-439):

    for each mesh point:
        skip if captured d2 > radius^2                      (:408)
        disp = rbfcalc(P)                                   (:414)
        optional tangent projection                         (:416-422)
        falloff = (1 - min(d2/r^2, 1))^rate                 (:423-424)
        write fd_falloff; P += falloff * disp               (:425, :437-438)

restricted to the optional point group (:485).  The Deformer object is a
thin host-side wrapper; `apply_fn` below is the pure jittable core.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.ops import fit as fit_mod
from facedeform_tpu.ops.evaluate import evaluate
from facedeform_tpu.ops.falloff import falloff_weight
from facedeform_tpu.ops.fit import RBFModel
from facedeform_tpu.ops.solve import SolveReport
from facedeform_tpu.ops.tangent import project_to_tangents
from facedeform_tpu.utils import errors
from facedeform_tpu.utils.platform import on_tpu


@functools.partial(jax.jit, static_argnames=("cfg",))
def apply_fn(
    model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    frame: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    group_mask: Optional[jnp.ndarray],
    cfg: DeformConfig,
    params: DeformParams,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pure deformation step: (new_points, fd_falloff), both (V, ...) f32.

    None-valued frame/group_mask change the pytree structure, so jit
    re-specializes automatically — no static flags needed.
    """
    params = params.clamped()
    points = points.astype(jnp.float32)
    kernel = fit_mod.effective_kernel(cfg)
    disp = evaluate(model, points, kernel, cfg.term)
    if cfg.tangent and frame is not None:
        u, v, n = frame
        disp = project_to_tangents(u, v, n, disp)
    w, active = falloff_weight(
        dist2, params.radius, params.falloffrate, strict_parity=cfg.strict_parity
    )
    if group_mask is not None:
        active = jnp.logical_and(active, group_mask)
    w = jnp.where(active, w, 0.0)
    new_points = points + disp * w[:, None]
    return new_points, w


@dataclasses.dataclass(frozen=True)
class Deformer:
    """A solved RBF deformation: model pytree + config; eval-many across frames.

    The reference re-solves every cook; this object is the explicit
    "solve-once" artifact (the rbfmodel the disabled threaded path would
    have serialized, src/SOP_FaceDeform.hpp:132-133) and pickles/orbax-saves
    as a plain pytree (utils/checkpoint.py).
    """

    model: RBFModel
    cfg: DeformConfig
    params: DeformParams
    report: SolveReport
    # True for reduced-basis regression fits (ops/decimate.fit_reduced):
    # the model's ctrl are K selected centers of a larger rig, so the
    # node's "deformer/rig control-count mismatch" safety warning is
    # intentional there, not a stale-checkpoint symptom (node.py checks)
    reduced: bool = False

    @classmethod
    def fit(
        cls,
        rest_ctrl: np.ndarray,
        deformed_ctrl: np.ndarray,
        cfg: DeformConfig = DeformConfig(),
        params: DeformParams = DeformParams(),
        check: bool = True,
        confidence=None,
        want_plan: bool = False,
    ) -> "Deformer":
        """Solve the RBF system mapping rest_ctrl -> deformed_ctrl.

        `confidence` ((N,) per-marker quality in (0, 1]) weights the ridge
        per marker — lam_i = lam / c_i — so low-confidence markers are
        smoothed over instead of interpolated (ridge families only;
        ops/fit._family_radii).

        Raises ShapeMismatchError on rig count mismatch (the reference's
        input contract, src/SOP_FaceDeform.cpp:231-234) and SolveFailedError
        on solver blow-up (:363-368).
        """
        if cfg.solver == "pu":
            # The PU model is a different artifact (patch pytree, not an
            # RBFModel); silently running the dense route here would OOM
            # at the rig sizes PU exists for.  Route explicitly.
            raise ValueError(
                "solver='pu' is not a Deformer route — use "
                "FaceDeformNode.cook (full node semantics) or "
                "ops.pu.PUDeformer.fit directly"
            )
        rest_ctrl = jnp.asarray(rest_ctrl, jnp.float32)
        deformed_ctrl = jnp.asarray(deformed_ctrl, jnp.float32)
        if rest_ctrl.shape != deformed_ctrl.shape:
            raise errors.ShapeMismatchError(
                f"rest and deform rigs must match: {rest_ctrl.shape} vs "
                f"{deformed_ctrl.shape}"
            )
        if confidence is not None:
            # shared contract (shape check + clip): ops/fit.confidence_clipped
            confidence = fit_mod.confidence_clipped(
                confidence, int(rest_ctrl.shape[0])
            )
        # solve_view: don't let eval-only config toggles force recompiles
        if want_plan:
            model, report, factors = fit_mod.fit_with_factors(
                rest_ctrl, deformed_ctrl, cfg.solve_view(), params,
                confidence=confidence,
            )
        else:
            model, report = fit_mod.fit(
                rest_ctrl, deformed_ctrl, cfg.solve_view(), params,
                confidence=confidence,
            )
        if check:
            # The CPD-kernel Krylov path converges to the f32 Krylov noise
            # floor, not the refined-LU floor — match the threshold to the
            # route fit() actually took, using the SAME predicate fit's
            # routing uses (`not kernel_is_pd`, ops/fit.py) so the pair
            # cannot drift if the kernel zoo grows.
            from facedeform_tpu.ops.kernels import kernel_is_pd

            # (QNN/MULTILAYER resolve to the PD gaussian, so this is
            # exactly fit's else-branch condition.)
            cpd_krylov = (
                fit_mod.uses_krylov(cfg, int(rest_ctrl.shape[0]))
                and not kernel_is_pd(fit_mod.effective_kernel(cfg))
            )
            errors.check_solve(
                report,
                rtol=errors.KRYLOV_CPD_BACKWARD_RTOL if cpd_krylov
                else errors.SOLVE_BACKWARD_RTOL,
            )
        deformer = cls(model=model, cfg=cfg, params=params, report=report)
        if want_plan:
            return deformer, FitPlan(factors=factors, cfg=cfg, params=params)
        return deformer

    @classmethod
    def fit_with_plan(
        cls,
        rest_ctrl: np.ndarray,
        deformed_ctrl: np.ndarray,
        cfg: DeformConfig = DeformConfig(),
        params: DeformParams = DeformParams(),
        check: bool = True,
        confidence=None,
    ) -> tuple["Deformer", "FitPlan"]:
        """Deformer.fit that also returns the pose-independent FitPlan.

        The plan's factors ride along with the fit (the LU was computed
        anyway), so there is no second factorization — subsequent poses of
        the same rest rig go through plan.refit() at O(n^2) (the
        interactive marker-drag path; see FitPlan).  Requires the dense
        route: gate with FitPlan.supports(cfg, n).
        """
        if not FitPlan.supports(cfg, int(jnp.shape(rest_ctrl)[0])):
            raise ValueError(
                "fit_with_plan needs the dense route (plans cache the "
                "dense factorization): this cfg/rig routes through "
                f"{'PU' if cfg.solver == 'pu' else 'Krylov'} — gate with "
                "FitPlan.supports(cfg, n)"
            )
        return cls.fit(
            rest_ctrl, deformed_ctrl, cfg, params, check=check,
            confidence=confidence, want_plan=True,
        )

    def displacement(self, points) -> jnp.ndarray:
        """Raw RBF displacement field at arbitrary points (V, 3) -> (V, 3).

        Routes growing kernels through the double-float eval like apply()
        does — the plain f32 field for TPS/MQ measured 2.8e-3 error at 4k
        controls vs the 5e-5 budget, and a field sampled here must match
        what apply() composes (round-5 review: this path silently stayed
        f32)."""
        from facedeform_tpu.ops.precise_eval import GROWING_KERNELS

        kernel = fit_mod.effective_kernel(self.cfg)
        pts = jnp.asarray(points, jnp.float32)
        if kernel in GROWING_KERNELS:
            from facedeform_tpu.ops.precise_eval import evaluate_precise

            return evaluate_precise(self.model, pts, kernel, self.cfg.term)
        return evaluate(self.model, pts, kernel, self.cfg.term)

    def jacobian(self, points) -> jnp.ndarray:
        """Spatial Jacobian of the displacement field, (V, 3, 3)."""
        kernel = fit_mod.effective_kernel(self.cfg)
        pts = jnp.asarray(points, jnp.float32)
        if on_tpu():
            # fused VPU kernel: g = 2 phi'/eps^2 never touches HBM and the
            # 3/9-column einsum slivers disappear (measured ~3x at 1M x 1k)
            from facedeform_tpu.ops.pallas_jacobian import jacobian_pallas

            return jacobian_pallas(self.model, pts, kernel, self.cfg.term)
        from facedeform_tpu.ops.jacobian import displacement_jacobian

        return displacement_jacobian(self.model, pts, kernel, self.cfg.term)

    def deformed_normals(
        self, points, normals, weight, frame=None
    ) -> jnp.ndarray:
        """Transport normals through the applied map y = x + w (T) d(x).

        The reference never updates `N` after moving P
        (src/SOP_FaceDeform.cpp:438 writes positions only), so deformed
        surfaces shade with rest-pose normals; the rebuild owns d(x) and
        transports n by the cofactor (inverse-transpose) rule.

        Args:
          points: (V, 3) REST positions (where the map was applied).
          normals: (V, 3) rest normals.
          weight: (V,) the falloff weights apply() returned (the actual
            per-vertex multiplier, including group gating).
          frame: optional (u, v, n) tuple; required when cfg.tangent so the
            Jacobian composes with the same projection apply() used.
        """
        from facedeform_tpu.ops.jacobian import transport_normals

        return transport_normals(
            self.jacobian(points), normals, weight, self.cfg, frame
        )

    def transform_attrs(self, points, attrs, weight, frame=None, kinds=None,
                        want_stretch=False, f_map=None):
        """Transport point attributes through the applied map's deformation
        gradient — one shared Jacobian for the whole batch.

        Extension over the reference, which copies every non-P attribute
        through untouched (src/SOP_FaceDeform.cpp:438 writes P only):
        (V, 3) attrs push forward as vectors (v' = F v; `N` by the
        cofactor rule), (V, 4) as orientation quaternions (rotation
        factor of F).  See ops.jacobian.transport_attrs.

        Args:
          points: (V, 3) REST positions.
          attrs: {name: (V, 3) or (V, 4) array}.
          weight: (V,) falloff weights apply() returned.
          frame: optional (u, v, n) tangent attrs when cfg.tangent.
          kinds: optional {name: "vector"|"normal"|"quaternion"} overrides.
          want_stretch: also return principal stretches off the SAME
            Jacobian/F pass — returns (dict, (V, 3) singular values).
        """
        from facedeform_tpu.ops.jacobian import transport_attrs

        return transport_attrs(
            self.jacobian(points), attrs, weight, self.cfg, frame, kinds,
            want_stretch=want_stretch, f_map=f_map,
        )

    def principal_stretches(self, points, weight, frame=None, f_map=None):
        """Per-vertex singular values of the applied map's deformation
        gradient, descending; (V, 3).  sigma_max > 1 = local stretch,
        sigma_min < 1 = compression, rigid regions give (1, 1, 1) —
        the rigging QC metric behind node cook(output_stretch=True)."""
        from facedeform_tpu.ops.jacobian import (
            _applied_gradient, principal_stretches,
        )

        f = _applied_gradient(self.jacobian(points), weight, self.cfg, frame)
        if f_map is not None:
            f = f_map(f)
        return principal_stretches(f)

    def apply(
        self,
        points,
        dist2=None,
        frame=None,
        group_mask=None,
        backend: str = "auto",
        spatial_perm=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Deform points; returns (new_points (V,3), fd_falloff (V,)).

        Args:
          points: (V, 3) positions to deform.
          dist2: optional (V,) captured squared distances (capture attr,
            capture.cpp:88).  Default zeros == everything deforms fully
            (reference quirk 1).
          frame: optional (u, v, n) tangent attributes for cfg.tangent.
          group_mask: optional (V,) bool point-group restriction.
          backend: "auto" picks the fastest correct path — on TPU the
            culled Pallas kernel for decaying kernels at production sizes
            (control slabs beyond the kernel's reach are skipped per
            vertex tile; results match dense to phi <= 1e-12 truncation),
            the dense fused Pallas kernel otherwise; dense XLA off-TPU.
            "pallas", "pallas_culled" and "dense" force a path.  Tangent
            projection is fused into both Pallas kernels.  Culling runs on
            the points in their NATURAL order — real meshes are spatially
            coherent enough for most of the win (measured 3.1x of 4.2x on
            a localized 4k rig over a 1M sphere); FaceDeformNode autotunes
            culled-vs-dense per rig/mesh, and Mesh.reorder_spatial() is
            the one-time preprocessing that buys the rest.
          spatial_perm: optional (perm, inv_perm) pair from
            ops.morton.spatial_order(points): evaluate in Z-order and
            scatter back.  Only worth it when amortized OFF the hot path —
            each 1M-row device gather costs ~8 ms on v5e, more than the
            entire eval; prefer reorder_spatial() for persistent meshes.
        """
        points = jnp.asarray(points, jnp.float32)
        if dist2 is None:
            dist2 = jnp.zeros(points.shape[0], jnp.float32)
        else:
            dist2 = jnp.asarray(dist2, jnp.float32)
        if frame is not None:
            frame = tuple(jnp.asarray(f, jnp.float32) for f in frame)
        if group_mask is not None:
            group_mask = jnp.asarray(group_mask, bool)

        use_tangent = self.cfg.tangent and frame is not None
        kernel = fit_mod.effective_kernel(self.cfg)
        if backend == "auto":
            from facedeform_tpu.ops.precise_eval import GROWING_KERNELS

            if kernel in GROWING_KERNELS:
                # Growing kernels break the 5e-5 parity budget in f32 well
                # below production sizes (measured: 1.8e-4 at 512 controls,
                # 2.8e-3 at 4k for TPS) — phi rounding + weight storage +
                # contraction cancellation.  Route to the double-float path
                # unconditionally: ~10x the VPU ops of the plain path, but
                # correctness is the contract (the reference runs in C++
                # doubles).  Force backend="pallas"/"dense" to trade it away.
                backend = "dense_precise"
            elif on_tpu():
                from facedeform_tpu.ops.pallas_eval import kernel_is_cullable

                # Culling needs enough vertex tiles for coherent bboxes to
                # pay for the slab tests (measured crossover ~ a few tiles).
                backend = (
                    "pallas_culled"
                    if kernel_is_cullable(kernel) and points.shape[0] >= 4096
                    else "pallas"
                )
            else:
                backend = "dense"
        if backend not in ("dense", "dense_precise", "pallas",
                           "pallas_culled"):
            # a typo used to fall through every branch to the plain f32
            # dense path — silently trading the 5e-5 budget for 2.8e-3 on
            # growing kernels (round-5 review finding)
            raise ValueError(
                f"unknown backend {backend!r}; expected 'auto', 'dense', "
                "'dense_precise', 'pallas' or 'pallas_culled'"
            )
        if backend == "dense_precise":
            params = self.params.clamped()
            if on_tpu():
                # Fused Mosaic df kernel: same math, VMEM-resident
                # intermediates (~4-6x the XLA elementwise composition).
                from facedeform_tpu.ops.pallas_precise import (
                    evaluate_pallas_precise,
                )

                gate = (
                    group_mask.astype(jnp.float32)
                    if group_mask is not None
                    else jnp.ones(points.shape[0], jnp.float32)
                )
                new_pts, w = evaluate_pallas_precise(
                    self.model, points, dist2, gate,
                    jnp.asarray(params.radius, jnp.float32),
                    jnp.asarray(params.falloffrate, jnp.float32),
                    kernel, self.cfg.term,
                    strict_parity=self.cfg.strict_parity,
                    frame=frame if use_tangent else None,
                )
                if group_mask is not None:
                    new_pts = jnp.where(group_mask[:, None], new_pts, points)
                return new_pts, w

            from facedeform_tpu.ops.falloff import falloff_weight
            from facedeform_tpu.ops.precise_eval import evaluate_precise

            disp = evaluate_precise(self.model, points, kernel, self.cfg.term)
            if use_tangent:
                disp = project_to_tangents(*frame, disp)
            w, active = falloff_weight(
                dist2, params.radius, params.falloffrate,
                strict_parity=self.cfg.strict_parity,
            )
            if group_mask is not None:
                active = jnp.logical_and(active, group_mask)
            w = jnp.where(active, w, 0.0)
            return points + disp * w[:, None], w
        if backend in ("pallas", "pallas_culled"):
            from facedeform_tpu.ops import pallas_eval

            params = self.params.clamped()
            gate = (
                group_mask.astype(jnp.float32)
                if group_mask is not None
                else jnp.ones(points.shape[0], jnp.float32)
            )
            if backend == "pallas_culled":
                if spatial_perm is not None:
                    # Optional explicit Z-order round trip (see docstring
                    # for when the gathers are worth paying).
                    perm, inv = (jnp.asarray(p) for p in spatial_perm)
                    new_s, w_s = pallas_eval.evaluate_pallas_culled(
                        self.model,
                        points[perm],
                        dist2[perm],
                        gate[perm],
                        jnp.asarray(params.radius, jnp.float32),
                        jnp.asarray(params.falloffrate, jnp.float32),
                        kernel,
                        self.cfg.term,
                        strict_parity=self.cfg.strict_parity,
                        frame=tuple(f[perm] for f in frame)
                        if use_tangent else None,
                    )
                    new_pts, w = new_s[inv], w_s[inv]
                else:
                    new_pts, w = pallas_eval.evaluate_pallas_culled(
                        self.model,
                        points,
                        dist2,
                        gate,
                        jnp.asarray(params.radius, jnp.float32),
                        jnp.asarray(params.falloffrate, jnp.float32),
                        kernel,
                        self.cfg.term,
                        strict_parity=self.cfg.strict_parity,
                        frame=frame if use_tangent else None,
                    )
            else:
                new_pts, w = pallas_eval.evaluate_pallas(
                    self.model,
                    points,
                    dist2,
                    gate,
                    jnp.asarray(params.radius, jnp.float32),
                    jnp.asarray(params.falloffrate, jnp.float32),
                    kernel,
                    self.cfg.term,
                    strict_parity=self.cfg.strict_parity,
                    frame=frame if use_tangent else None,
                )
            if group_mask is not None:
                # gate zeroes the displacement; also pin positions exactly
                new_pts = jnp.where(group_mask[:, None], new_pts, points)
            return new_pts, w
        return apply_fn(
            self.model, points, dist2, frame, group_mask,
            self.cfg.eval_view(), self.params,
        )


@dataclasses.dataclass(frozen=True)
class FitPlan:
    """Pose-independent half of a dense fit: the interactive-drag artifact.

    The RBF system matrix depends only on the rest rig and the solve
    params; the deformed rig enters through the RHS alone.  A FitPlan
    holds the assembled + LU-factored per-layer systems
    (ops/fit.FitFactors), so re-posing the SAME rest rig — an artist
    dragging markers, a tracked shot streaming new frames — costs
    O(n^2) triangular solves + refinement instead of the O(n^3)
    factorization the reference pays every cook
    (src/SOP_FaceDeform.cpp:330-368 rebuilds the whole ALGLIB model).

    Obtain one from Deformer.fit_with_plan (rides along with the first
    full fit — the factors are computed by the fit anyway) or
    FitPlan.prepare (no pose needed).  refit() returns a full Deformer
    whose weights match a from-scratch fit bitwise (same resolve
    arithmetic against the same factors).

    Dense route only: PU rigs plan per patch (ops/pu.py), Krylov fits
    are matrix-free.  Gate with FitPlan.supports(cfg, n).
    """

    factors: fit_mod.FitFactors
    cfg: DeformConfig
    params: DeformParams

    @staticmethod
    def supports(cfg: DeformConfig, n: int) -> bool:
        """Whether (cfg, n-control rig) routes through the dense
        factorization a plan can cache."""
        return cfg.solver != "pu" and not fit_mod.uses_krylov(cfg, n)

    @classmethod
    def prepare(
        cls,
        rest_ctrl,
        cfg: DeformConfig = DeformConfig(),
        params: DeformParams = DeformParams(),
        confidence=None,
    ) -> "FitPlan":
        """Assemble + factor without a pose (ops/fit.prepare)."""
        rest_ctrl = jnp.asarray(rest_ctrl, jnp.float32)
        if confidence is not None:
            confidence = fit_mod.confidence_clipped(
                confidence, int(rest_ctrl.shape[0])
            )
        factors = fit_mod.prepare(
            rest_ctrl, cfg.solve_view(), params, confidence=confidence
        )
        return cls(factors=factors, cfg=cfg, params=params)

    @property
    def num_controls(self) -> int:
        return int(self.factors.ctrl.shape[0])

    def refit(self, deformed_ctrl, check: bool = True) -> Deformer:
        """Re-solve for a new pose of the planned rest rig.

        Same validation surface as Deformer.fit: ShapeMismatchError on a
        rig-count mismatch, SolveFailedError through errors.check_solve
        (dense-route threshold — plans never cover Krylov fits).
        """
        deformed_ctrl = jnp.asarray(deformed_ctrl, jnp.float32)
        if deformed_ctrl.shape != self.factors.ctrl.shape:
            raise errors.ShapeMismatchError(
                f"planned rest rig has {self.factors.ctrl.shape} points "
                f"but the pose has {deformed_ctrl.shape}"
            )
        model, report = fit_mod.refit(
            self.factors, deformed_ctrl, self.cfg.solve_view()
        )
        if check:
            errors.check_solve(report, rtol=errors.SOLVE_BACKWARD_RTOL)
        return Deformer(
            model=model, cfg=self.cfg, params=self.params, report=report
        )
