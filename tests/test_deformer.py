"""End-to-end Deformer tests: exact interpolation + f64-oracle parity.

Covers BASELINE configs 1 (gaussian 50-pt / 10k sphere) and 2 (kernel zoo
with linear polynomial tail) to the <=5e-5 max-displacement budget.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from facedeform_tpu import (
    DeformConfig,
    DeformParams,
    Deformer,
    RBFKernel,
    RBFModelType,
    ShapeMismatchError,
)
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

PARITY_BUDGET = 5e-5  # BASELINE.md: max vertex-displacement error vs f64


def _rig(rng, n=50, bump=0.3):
    rest = fibonacci_points(n)
    delta = bump * np.exp(-2.0 * np.sum((rest - [0, 1, 0]) ** 2, -1, keepdims=True))
    deformed = rest + delta * np.float32([0, 1, 0]) + 0.02 * rng.standard_normal((n, 3)).astype(np.float32)
    return rest, deformed.astype(np.float32)


@pytest.mark.parametrize("model_type", [RBFModelType.QNN, RBFModelType.MULTILAYER, RBFModelType.KERNEL])
def test_exact_interpolation_at_controls(rng, model_type):
    """RBF interpolant must reproduce control displacements at control points.

    QNN interpolates exactly; MULTILAYER/KERNEL are regularized (lambda>=0.01
    clamp mirroring the reference, src/SOP_FaceDeform.cpp:253) so they only
    approximate — check a looser bound there.
    """
    rest, deformed = _rig(rng)
    cfg = DeformConfig(model=model_type, layers=4)
    params = DeformParams(radius=1.0, lam=0.01)
    d = Deformer.fit(rest, deformed, cfg, params)
    disp = np.asarray(d.displacement(rest))
    want = deformed - rest
    err = np.abs(disp - want).max()
    if model_type == RBFModelType.QNN:
        assert err < 5e-5, err
    else:
        # lambda >= 0.01 smoothing admits a few percent residual at controls
        assert err < 0.05, err


def test_parity_baseline_config1_sphere(rng):
    """Gaussian RBF, 50 control points, 10k-vertex sphere (BASELINE config 1)."""
    mesh = uv_sphere(100, 100)  # 10002 points
    rest, deformed = _rig(rng, n=50)
    cfg = DeformConfig(model=RBFModelType.QNN)
    params = DeformParams()
    d = Deformer.fit(rest, deformed, cfg, params)
    got, falloff = d.apply(mesh.points)
    want, want_falloff = oracle.deform(rest, deformed, mesh.points, cfg, params)
    err = np.abs(np.asarray(got) - want).max()
    assert err < PARITY_BUDGET, f"max displacement error {err:.2e}"
    np.testing.assert_allclose(np.asarray(falloff), want_falloff, atol=1e-5)


@pytest.mark.parametrize(
    "kernel",
    [RBFKernel.THIN_PLATE, RBFKernel.MULTIQUADRIC, RBFKernel.INVERSE_MULTIQUADRIC, RBFKernel.GAUSSIAN],
)
def test_parity_kernel_zoo(rng, kernel):
    """Kernel zoo + linear polynomial tail (BASELINE config 2)."""
    mesh = uv_sphere(40, 40)
    rest, deformed = _rig(rng, n=40)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=kernel)
    params = DeformParams(radius=1.5, lam=0.01)
    d = Deformer.fit(rest, deformed, cfg, params)
    got = np.asarray(d.apply(mesh.points)[0])
    want, _ = oracle.deform(rest, deformed, mesh.points, cfg, params)
    err = np.abs(got - want).max()
    assert err < PARITY_BUDGET, f"{kernel.name}: max displacement error {err:.2e}"


def test_parity_multilayer(rng):
    mesh = uv_sphere(40, 40)
    rest, deformed = _rig(rng, n=60)
    cfg = DeformConfig(model=RBFModelType.MULTILAYER, layers=3)
    params = DeformParams(radius=2.0, lam=0.05)
    d = Deformer.fit(rest, deformed, cfg, params)
    got = np.asarray(d.apply(mesh.points)[0])
    want, _ = oracle.deform(rest, deformed, mesh.points, cfg, params)
    err = np.abs(got - want).max()
    assert err < PARITY_BUDGET, f"max displacement error {err:.2e}"


def test_rig_mismatch_raises(rng):
    rest = fibonacci_points(10)
    with pytest.raises(ShapeMismatchError):
        Deformer.fit(rest, fibonacci_points(11))


def test_falloff_and_radius_gate(rng):
    """Vertices with dist2 > radius^2 must be untouched (SOP_FaceDeform.cpp:408);
    captured distances attenuate smoothly (:423-424)."""
    mesh = uv_sphere(30, 30)
    rest, deformed = _rig(rng, n=30)
    v = mesh.num_points
    dist2 = np.linspace(0, 2.0, v).astype(np.float32)
    params = DeformParams(radius=1.0, falloffrate=1.5)
    d = Deformer.fit(rest, deformed, DeformConfig(), params)
    got, w = d.apply(mesh.points, dist2=dist2)
    got, w = np.asarray(got), np.asarray(w)
    frozen = dist2 > 1.0
    np.testing.assert_array_equal(got[frozen], mesh.points[frozen])
    assert (w[frozen] == 0).all()
    # falloff monotone non-increasing in dist2 (property test, SURVEY.md §4)
    active_w = w[~frozen]
    assert (np.diff(active_w) <= 1e-6).all()


def test_group_mask(rng):
    mesh = uv_sphere(20, 20)
    rest, deformed = _rig(rng, n=20)
    mask = np.zeros(mesh.num_points, bool)
    mask[: mesh.num_points // 2] = True
    d = Deformer.fit(rest, deformed, DeformConfig(), DeformParams())
    got, w = d.apply(mesh.points, group_mask=mask)
    got = np.asarray(got)
    np.testing.assert_array_equal(got[~mask], mesh.points[~mask])
    assert np.abs(got[mask] - mesh.points[mask]).max() > 1e-4
