"""Node extras: per-stage timing, strict-parity flow, NaN robustness."""

import numpy as np
import pytest

from facedeform_tpu import (
    DeformConfig, DeformParams, Mesh, FaceDeformNode, SolveFailedError,
)
from facedeform_tpu.geometry.primitives import fibonacci_points, grid, uv_sphere
from facedeform_tpu.utils.profiling import StageTimes


def _inputs(rng, n_rig=20):
    mesh = uv_sphere(30, 30)
    rest_rig = Mesh(points=fibonacci_points(n_rig))
    deform_rig = Mesh(points=rest_rig.points * 1.05)
    return mesh, rest_rig, deform_rig


def test_cook_stage_times(rng):
    mesh, r0, r1 = _inputs(rng)
    node = FaceDeformNode()
    times = StageTimes()
    node.cook([mesh, r0, r1], times=times)
    assert {"capture", "solve", "eval"} <= set(times.ms)
    # cached cook: capture and solve skipped, eval still runs
    times2 = StageTimes()
    node.cook([mesh, r0, r1], times=times2)
    assert "capture" not in times2.ms and "solve" not in times2.ms
    assert "eval" in times2.ms


def test_cook_morph_stage_timed(rng):
    mesh, r0, r1 = _inputs(rng)
    blend = Mesh(points=mesh.points + 0.05 * rng.standard_normal(
        (mesh.num_points, 3)).astype(np.float32))
    times = StageTimes()
    FaceDeformNode().cook(
        [mesh, r0, r1, blend], cfg=DeformConfig(morphspace=True), times=times
    )
    assert "morph" in times.ms


def test_strict_parity_amplification_through_cook(rng):
    """Quirk 2 end-to-end: with strict_parity + dofalloff, captured vertices
    beyond the bounded search keep d2 = -1 and get falloff > 1
    (capture.cpp:76-88 + SOP_FaceDeform.cpp:404-424)."""
    mesh = grid(40, 40, size=4.0)
    rig = Mesh(points=np.float32([[0, 0, 0]]))
    drig = Mesh(points=np.float32([[0, 0.2, 0]]))
    cfg = DeformConfig(strict_parity=True, dofalloff=True)
    params = DeformParams(radius=0.5, falloffrate=2.0, maxedges=30)
    res = FaceDeformNode().cook([mesh, rig, drig], cfg, params)
    w = res.mesh.point_attrs["fd_falloff"]
    cap = res.capture
    sentinel = cap.captured & (cap.dist2 == -1.0)
    assert sentinel.any()
    # (1 - (-1/r^2))^2 = (1 + 4)^2 = 25 for r = 0.5
    np.testing.assert_allclose(w[sentinel], 25.0, rtol=1e-5)
    # default mode clamps those to plain full deformation
    res2 = FaceDeformNode().cook(
        [mesh, rig, drig],
        DeformConfig(strict_parity=False, dofalloff=True), params,
    )
    w2 = res2.mesh.point_attrs["fd_falloff"]
    assert (w2 <= 1.0 + 1e-6).all()


def test_nan_control_points_raise(rng):
    mesh, r0, r1 = _inputs(rng)
    bad = Mesh(points=np.where(np.arange(60).reshape(20, 3) == 0,
                               np.nan, r1.points).astype(np.float32))
    with pytest.raises(SolveFailedError):
        FaceDeformNode().cook([mesh, r0, bad])


def test_picked_eval_color_viz(rng):
    """Eval-pass Cd falloff hue (the reference's selected-node viz,
    src/SOP_FaceDeform.cpp:426-436 — FIXME'd there, working here)."""
    from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode, Mesh
    from facedeform_tpu.capture.capture import _hsv_to_rgb
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(20, 20)
    rig = Mesh(points=fibonacci_points(20))
    drig = Mesh(points=rig.points * 1.1)
    cfg = DeformConfig(dofalloff=True)
    node = FaceDeformNode()
    res = node.cook([mesh, rig, drig], cfg, DeformParams(), picked=True)
    f = np.clip(res.mesh.point_attrs["fd_falloff"], 0.0, 1.0)
    want = _hsv_to_rgb(200.0 + f * 50.0)
    np.testing.assert_allclose(res.mesh.point_attrs["Cd"], want, atol=1e-6)
    # unpicked keeps the capture-pass colors (round-1 behavior)
    res2 = node.cook([mesh, rig, drig], cfg, DeformParams(), picked=False)
    assert res2.capture is not None
    np.testing.assert_array_equal(res2.mesh.point_attrs["Cd"], res2.capture.color)


def test_cook_with_precomputed_deformer(rng):
    """cook(deformer=...) skips the solve and must reproduce the fitting
    cook bit-for-bit; solve-relevant cfg comes from the checkpointed fit
    (a wrong --kernel flag cannot change the eval), eval toggles from the
    cook's cfg."""
    import dataclasses

    from facedeform_tpu import (
        DeformConfig, DeformParams, FaceDeformNode, Mesh,
    )
    from facedeform_tpu.config import RBFKernel, RBFModelType
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
    from facedeform_tpu.utils import checkpoint

    mesh = uv_sphere(20, 20)
    rest = fibonacci_points(40)
    rig0 = Mesh(points=rest)
    rig1 = Mesh(points=(rest * 1.05).astype(np.float32))
    cfg = DeformConfig(model=RBFModelType.KERNEL,
                       kernel=RBFKernel.MULTIQUADRIC, dofalloff=True)
    params = DeformParams(radius=1.5)
    fit_node = FaceDeformNode()
    base = fit_node.cook([mesh, rig0, rig1], cfg, params)

    node = FaceDeformNode()
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "d.npz")
        checkpoint.save(p, fit_node._deformer)
        loaded = checkpoint.load(p)

    # cook with a DIFFERENT solve-cfg: the merge must keep the
    # checkpoint's kernel (multiquadric), not the cook's gaussian
    wrong_cfg = DeformConfig(dofalloff=True)  # default QNN/gaussian
    res = node.cook([mesh, rig0, rig1], wrong_cfg, params, deformer=loaded)
    np.testing.assert_array_equal(res.mesh.points, base.mesh.points)
    np.testing.assert_array_equal(
        res.mesh.point_attrs["fd_falloff"],
        base.mesh.point_attrs["fd_falloff"],
    )

    # eval toggles from the cook's cfg still apply: tangent on changes
    # the result (frame attrs present)
    from facedeform_tpu.geometry.topology import compute_tangent_frame

    compute_tangent_frame(mesh)
    res_t = node.cook([mesh, rig0, rig1],
                      dataclasses.replace(wrong_cfg, tangent=True),
                      params, deformer=loaded)
    assert np.abs(res_t.mesh.points - res.mesh.points).max() > 1e-6

    # mismatched rig size warns but cooks
    rig_small = Mesh(points=rest[:30])
    res_w = node.cook(
        [mesh, rig_small, Mesh(points=(rest[:30] * 1.05).astype(np.float32))],
        wrong_cfg, params, deformer=loaded,
    )
    assert any("precomputed deformer" in w for w in res_w.warnings)
