"""FitPlan: the pose-independent dense factorization (interactive drags).

The system matrix depends only on the rest rig + solve params
(ops/assemble.py); the deformed rig enters through the RHS alone.  These
tests pin the contract: refit() against a cached plan reproduces a
from-scratch fit EXACTLY (same resolve arithmetic against the same
factors), the node reuses the plan across pose-only cooks, and the
non-dense routes are gated out loudly.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode, Mesh
from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType
from facedeform_tpu.deformer import Deformer, FitPlan
from facedeform_tpu.ops import fit as fit_mod
from facedeform_tpu.utils import errors


def _rigs(rng, n=48):
    rest = rng.normal(size=(n, 3)).astype(np.float32)
    pose_a = rest + 0.1 * rng.normal(size=(n, 3)).astype(np.float32)
    pose_b = rest + 0.1 * rng.normal(size=(n, 3)).astype(np.float32)
    return rest, pose_a, pose_b


CFGS = [
    DeformConfig(),  # QNN gaussian (adaptive radii, lam=0)
    DeformConfig(model=RBFModelType.MULTILAYER, layers=3),
    DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE),
    DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.MULTIQUADRIC,
                 term=PolyTerm.CONSTANT),
]


@pytest.mark.parametrize("cfg", CFGS, ids=lambda c: f"{c.model.name}-{c.kernel.name}")
def test_refit_matches_fit(rng, cfg):
    """plan.refit(pose) == Deformer.fit(rest, pose) — same weights, same
    report — via both plan acquisition routes (fit_with_plan / prepare)."""
    rest, pose_a, pose_b = _rigs(rng)
    d_a, plan = Deformer.fit_with_plan(rest, pose_a, cfg)
    d_a_ref = Deformer.fit(rest, pose_a, cfg)
    np.testing.assert_array_equal(
        np.asarray(d_a.model.w_rbf), np.asarray(d_a_ref.model.w_rbf)
    )

    d_b = plan.refit(pose_b)
    d_b_ref = Deformer.fit(rest, pose_b, cfg)
    np.testing.assert_array_equal(
        np.asarray(d_b.model.w_rbf), np.asarray(d_b_ref.model.w_rbf)
    )
    np.testing.assert_array_equal(
        np.asarray(d_b.model.w_poly), np.asarray(d_b_ref.model.w_poly)
    )
    assert float(d_b.report.backward_error()) <= float(
        errors.SOLVE_BACKWARD_RTOL
    )

    d_b2 = FitPlan.prepare(rest, cfg).refit(pose_b)
    np.testing.assert_array_equal(
        np.asarray(d_b2.model.w_rbf), np.asarray(d_b_ref.model.w_rbf)
    )


def test_refit_matches_fit_with_confidence(rng):
    """Confidence weighting (per-marker ridge) is baked into the plan."""
    rest, pose_a, pose_b = _rigs(rng)
    conf = rng.uniform(0.05, 1.0, size=rest.shape[0]).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)
    _, plan = Deformer.fit_with_plan(rest, pose_a, cfg, confidence=conf)
    d = plan.refit(pose_b)
    d_ref = Deformer.fit(rest, pose_b, cfg, confidence=conf)
    np.testing.assert_array_equal(
        np.asarray(d.model.w_rbf), np.asarray(d_ref.model.w_rbf)
    )


def test_gates_and_validation(rng):
    rest, pose_a, _ = _rigs(rng)
    # Krylov route: matrix-free, nothing to plan.
    with pytest.raises(ValueError, match="Krylov"):
        Deformer.fit_with_plan(rest, pose_a, DeformConfig(solver="krylov"))
    # PU route: plans per patch, different artifact.
    with pytest.raises(ValueError, match="PU"):
        Deformer.fit_with_plan(rest, pose_a, DeformConfig(solver="pu"))
    assert not FitPlan.supports(DeformConfig(solver="pu"), 10)
    assert not FitPlan.supports(DeformConfig(), 10_000)  # auto -> krylov
    assert FitPlan.supports(DeformConfig(), 1000)
    # Pose of the wrong rig size.
    _, plan = Deformer.fit_with_plan(rest, pose_a, DeformConfig())
    with pytest.raises(errors.ShapeMismatchError):
        plan.refit(pose_a[:-1])
    # prepare() refuses the Krylov route too (trace-time guard).
    with pytest.raises(ValueError, match="dense-route"):
        fit_mod.prepare(jnp.asarray(rest), DeformConfig(solver="krylov"))


def test_node_reuses_plan_across_pose_cooks(rng, monkeypatch):
    """Cook, drag the deformed rig, cook again: the second cook must route
    through refit (no new factorization) and match a fresh node's cook."""
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(20, 20)
    rest, pose_a, pose_b = _rigs(rng, n=30)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)

    rest_m = Mesh(points=rest)  # ONE rest-rig object: unchanged input
    # keeps its data id across cooks (Houdini semantics) — only the
    # deformed rig gets a new Mesh per pose, like a marker drag does.

    calls = {"fit": 0, "refit": 0}
    real_fwf, real_refit = fit_mod.fit_with_factors, fit_mod.refit

    def count_fwf(*a, **k):
        calls["fit"] += 1
        return real_fwf(*a, **k)

    def count_refit(*a, **k):
        calls["refit"] += 1
        return real_refit(*a, **k)

    monkeypatch.setattr(fit_mod, "fit_with_factors", count_fwf)
    monkeypatch.setattr(fit_mod, "refit", count_refit)

    node = FaceDeformNode()
    r1 = node.cook([mesh, rest_m, Mesh(points=pose_a)], cfg=cfg)
    assert calls == {"fit": 1, "refit": 0}

    # Pose-only change: factor key unchanged -> refit, no second fit.
    r2 = node.cook([mesh, rest_m, Mesh(points=pose_b)], cfg=cfg)
    assert calls == {"fit": 1, "refit": 1}

    fresh = FaceDeformNode().cook(
        [mesh, rest_m, Mesh(points=pose_b)], cfg=cfg
    )  # the fresh node's own full fit counts too: fit -> 2
    np.testing.assert_array_equal(r2.mesh.points, fresh.mesh.points)
    # Same cook result object invariants as the first cook.
    assert r2.mesh.points.shape == r1.mesh.points.shape
    assert calls == {"fit": 2, "refit": 1}

    # Eval-only toggle on the SAME pose object rides the fit cache
    # entirely (no fit, no refit); a solve-param change invalidates the
    # plan (new full fit).
    pose_b_m = Mesh(points=pose_b)
    node.cook([mesh, rest_m, pose_b_m], cfg=cfg)          # refit -> 2
    node.cook([mesh, rest_m, pose_b_m],
              cfg=dataclasses.replace(cfg, dofalloff=True))
    assert calls == {"fit": 2, "refit": 2}
    node.cook([mesh, rest_m, pose_b_m], cfg=cfg,
              params=DeformParams(radius=2.0))
    assert calls == {"fit": 3, "refit": 2}


def test_node_refit_carries_current_eval_knobs(rng):
    """A drag cook with changed eval-only knobs must apply THIS cook's
    knobs, not the fit-time ones frozen into the plan."""
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(20, 20)
    rest, pose_a, pose_b = _rigs(rng, n=30)
    rest_m = Mesh(points=rest)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)

    node = FaceDeformNode()
    node.cook([mesh, rest_m, Mesh(points=pose_a)], cfg=cfg)
    # Drag + flip an eval-only toggle in the same cook.
    cfg2 = dataclasses.replace(cfg, tangent=False, dofalloff=False)
    r = node.cook([mesh, rest_m, Mesh(points=pose_b)], cfg=cfg2,
                  params=DeformParams(falloffrate=1.7))
    assert node._deformer.cfg == cfg2
    assert node._deformer.params.falloffrate == pytest.approx(1.7)
    fresh = FaceDeformNode().cook(
        [mesh, rest_m, Mesh(points=pose_b)], cfg=cfg2,
        params=DeformParams(falloffrate=1.7),
    )
    np.testing.assert_array_equal(r.mesh.points, fresh.mesh.points)
