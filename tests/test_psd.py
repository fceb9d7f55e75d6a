"""Pose-space deformation (ops/psd.py) — sculpt corrections driven by
rig pose, an extension over the reference's single-pose marker deform
(src/SOP_FaceDeform.cpp:330-439).

The load-bearing claims:
  * cardinal interpolation — at example pose j the weights are e_j, so
    the cook reproduces the artist's sculpt EXACTLY (the corrections are
    sculpt-minus-this-pipeline, absorbing capture/tangent/morph);
  * locality — gaussian pose-kernel weights decay to zero away from
    every example, so corrections never leak into unrelated poses;
  * the node/CLI/checkpoint integration composes with groups, caching,
    the deform-seq batch path, and symmetrize.
"""

from __future__ import annotations

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Mesh
from facedeform_tpu.config import RBFKernel
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.node import FaceDeformNode
from facedeform_tpu.ops import psd


# ------------------------------------------------------------------ ops


@pytest.fixture
def example_set(rng):
    k, d, v = 4, 9, 50
    feats = rng.normal(size=(k, d)).astype(np.float32)
    corr = rng.normal(size=(k, v, 3)).astype(np.float32)
    return feats, corr


def test_exact_reproduction_at_examples(example_set):
    feats, corr = example_set
    model, report = psd.fit_psd(feats, corr)
    assert float(report.backward_error()) < 1e-5
    w = np.asarray(psd.psd_weights(model, feats))
    np.testing.assert_allclose(w, np.eye(len(feats)), atol=2e-5)
    for j in range(len(feats)):
        d = np.asarray(psd.psd_delta(model, feats[j]))
        np.testing.assert_allclose(d, corr[j], atol=1e-4)


def test_far_pose_decays_to_zero(example_set):
    feats, corr = example_set
    model, _ = psd.fit_psd(feats, corr)
    far = feats[0] + 100.0 * psd.auto_eps(feats)
    w = np.asarray(psd.psd_weights(model, far))
    assert np.abs(w).max() < 1e-6
    d = np.asarray(psd.psd_delta(model, far))
    assert np.abs(d).max() < 1e-4


def test_normalize_preserves_exactness(example_set):
    feats, corr = example_set
    model, _ = psd.fit_psd(feats, corr)
    w = np.asarray(psd.psd_weights(model, feats, normalize=True))
    # EXACT at example poses (round 5: the old soft 1/(1+1e-4) rescale
    # cost 1e-4 — double the 5e-5 parity budget)
    np.testing.assert_allclose(w, np.eye(len(feats)), atol=5e-6)
    # between two examples the normalized weights sum to ~1
    mid = 0.5 * (feats[0] + feats[1])
    wm = np.asarray(psd.psd_weights(model, mid, normalize=True))
    assert abs(float(wm.sum()) - 1.0) < 5e-2
    # and far away they still fade out (no divide-by-vanishing-sum)
    far = feats[0] + 100.0 * psd.auto_eps(feats)
    wf = np.asarray(psd.psd_weights(model, far, normalize=True))
    assert np.isfinite(wf).all() and np.abs(wf).max() < 1e-3


def test_delta_frames_matches_single(example_set, rng):
    feats, corr = example_set
    model, _ = psd.fit_psd(feats, corr)
    queries = rng.normal(size=(3, feats.shape[1])).astype(np.float32)
    batch = np.asarray(psd.psd_delta(model, queries))
    for i in range(3):
        one = np.asarray(psd.psd_delta(model, queries[i]))
        np.testing.assert_allclose(batch[i], one, atol=1e-6)


def test_duplicate_pose_raises(example_set):
    feats, corr = example_set
    feats = feats.copy()
    feats[2] = feats[0]
    with pytest.raises(ValueError, match="duplicate example poses 0 and 2"):
        psd.fit_psd(feats, corr)


def test_non_pd_kernel_needs_ridge(example_set):
    feats, corr = example_set
    with pytest.raises(ValueError, match="not positive definite"):
        psd.fit_psd(feats, corr, kernel=RBFKernel.THIN_PLATE, lam=0.0)
    model, _ = psd.fit_psd(feats, corr, kernel=RBFKernel.THIN_PLATE, lam=0.1)
    w = np.asarray(psd.psd_weights(model, feats, kernel=RBFKernel.THIN_PLATE))
    assert np.isfinite(w).all()


def test_single_example(rng):
    feats = rng.normal(size=(1, 6)).astype(np.float32)
    corr = rng.normal(size=(1, 10, 3)).astype(np.float32)
    model, _ = psd.fit_psd(feats, corr)
    w = np.asarray(psd.psd_weights(model, feats[0]))
    np.testing.assert_allclose(w, [1.0], atol=1e-6)


def test_bad_shapes_raise(example_set):
    feats, corr = example_set
    with pytest.raises(ValueError, match=r"features must be \(K, D\)"):
        psd.fit_psd(feats[0], corr)
    with pytest.raises(ValueError, match="corrections must be"):
        psd.fit_psd(feats, corr[:2])
    with pytest.raises(ValueError, match="eps must be positive"):
        psd.fit_psd(feats, corr, eps=-1.0)
    with pytest.raises(ValueError, match="shape"):
        psd.features_from_rig(np.zeros((4, 3)), np.zeros((5, 3)))


def test_deformer_facade(rng):
    rest = fibonacci_points(8)
    posed = np.stack([rest * (1.0 + 0.1 * (i + 1)) for i in range(3)])
    corr = rng.normal(size=(3, 20, 3)).astype(np.float32)
    d = psd.PSDDeformer.fit(rest, posed, corr)
    w = np.asarray(d.weights(rest, posed[1]))
    np.testing.assert_allclose(w, [0, 1, 0], atol=2e-5)
    stack = np.asarray(d.delta_frames(rest, posed))
    np.testing.assert_allclose(stack, corr, atol=1e-4)


# ------------------------------------------------------------ checkpoint


def test_checkpoint_roundtrip(example_set, tmp_path):
    from facedeform_tpu.utils import checkpoint

    feats, corr = example_set
    model, report = psd.fit_psd(feats, corr)
    d = psd.PSDDeformer(model, normalize=True, report=report)
    path = str(tmp_path / "psd.npz")
    checkpoint.save_psd(path, d)
    assert checkpoint.kind(path) == "psd"
    d2 = checkpoint.load_psd(path)
    assert d2.normalize is True and d2.kernel == d.kernel
    np.testing.assert_array_equal(np.asarray(d2.model.alpha),
                                  np.asarray(model.alpha))
    np.testing.assert_array_equal(np.asarray(d2.model.corrections), corr)
    assert d2.report is not None
    assert float(d2.report.backward_error()) == pytest.approx(
        float(report.backward_error()), rel=1e-6)
    # the generic loader refuses a PSD file with a pointer to load_psd
    with pytest.raises(ValueError, match="PSD checkpoint"):
        checkpoint.load(path)
    with pytest.raises(ValueError, match="save_psd expects"):
        checkpoint.save_psd(str(tmp_path / "x.npz"), object())
    # and load_psd refuses a non-PSD file
    other = str(tmp_path / "notpsd.npz")
    np.savez(other, format_version=1)
    with pytest.raises(ValueError, match="not a PSD checkpoint"):
        checkpoint.load_psd(other)


# ------------------------------------------------------------------ node


def _node_inputs(n_rig=24):
    mesh = uv_sphere(20, 20)
    rest_rig = Mesh(points=fibonacci_points(n_rig))
    return mesh, rest_rig


def _posed(rest_rig, scale, axis=1):
    pts = rest_rig.points.copy()
    pts[:, axis] *= np.float32(scale)
    return Mesh(points=pts)


def _make_example(node_inputs, posed, bump=0.15):
    """Sculpt = base pipeline output at `posed` + a localized bump."""
    mesh, rest = node_inputs
    base = FaceDeformNode().cook([mesh, rest, posed]).mesh
    g = np.exp(-4.0 * np.sum((base.points - [0, 0, 1]) ** 2, -1))
    sculpt = Mesh(points=(base.points
                          + bump * g[:, None] * np.float32([0, 0, 1])))
    return posed, sculpt


def test_node_examples_reproduce_sculpt():
    mesh, rest = _node_inputs()
    pose_a = _posed(rest, 1.10)
    pose_b = _posed(rest, 0.92)
    ex_a = _make_example((mesh, rest), pose_a)
    ex_b = _make_example((mesh, rest), pose_b, bump=-0.1)
    node = FaceDeformNode()
    res = node.cook([mesh, rest, pose_a], examples=[ex_a, ex_b])
    # at example pose a the cook reproduces sculpt a exactly
    np.testing.assert_allclose(res.mesh.points, ex_a[1].points, atol=2e-4)
    w = res.mesh.detail_attrs["psd_weights"]
    np.testing.assert_allclose(w, [1.0, 0.0], atol=1e-4)
    assert any("psd: 2 example pose(s)" in m for m in res.messages)
    # a pose far from both examples gets (almost) no correction
    far = _posed(rest, 1.6)
    base_far = FaceDeformNode().cook([mesh, rest, far]).mesh
    res_far = node.cook([mesh, rest, far], examples=[ex_a, ex_b])
    np.testing.assert_allclose(res_far.mesh.points, base_far.points,
                               atol=5e-4)


def test_node_psd_cache_reuse():
    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    ex = _make_example((mesh, rest), pose)
    node = FaceDeformNode()
    node.cook([mesh, rest, pose], examples=[ex])
    fitted = node._psd_deformer
    assert fitted is not None
    # same example set at a NEW pose: the fit is reused, not re-derived
    node.cook([mesh, rest, _posed(rest, 1.05)], examples=[ex])
    assert node._psd_deformer is fitted
    # psd knob change invalidates
    node.cook([mesh, rest, pose], examples=[ex], psd_lam=0.05)
    assert node._psd_deformer is not fitted


def test_node_bad_examples_warn_and_skip():
    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    ex = _make_example((mesh, rest), pose)
    node = FaceDeformNode()
    # wrong rig point count: dropped with a warning, the good one stays
    bad = (Mesh(points=fibonacci_points(rest.num_points + 3)), ex[1])
    res = node.cook([mesh, rest, pose], examples=[bad, ex])
    assert any("don't match the rig/mesh point counts" in w
               for w in res.warnings)
    np.testing.assert_allclose(res.mesh.points, ex[1].points, atol=2e-4)
    # all examples unusable: cook degrades to the base pipeline
    base = FaceDeformNode().cook([mesh, rest, pose]).mesh
    res2 = FaceDeformNode().cook([mesh, rest, pose], examples=[bad])
    assert any("no usable examples" in w for w in res2.warnings)
    np.testing.assert_allclose(res2.mesh.points, base.points, atol=1e-6)
    # duplicate poses: fit fails, warns, cook still completes
    res3 = FaceDeformNode().cook([mesh, rest, pose], examples=[ex, ex])
    assert any("duplicate example poses" in w for w in res3.warnings)
    np.testing.assert_allclose(res3.mesh.points, base.points, atol=1e-6)


def test_node_group_caps_psd_writes():
    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    gmask = mesh.points[:, 2] > 0.0  # sculpt bump lives at z ~ 1
    base = FaceDeformNode().cook([mesh, rest, pose], group_mask=gmask).mesh
    # sculpt edits BOTH sides: off-group edits must be dropped + reported
    g = np.exp(-4.0 * np.sum((base.points - [0, 0, 1]) ** 2, -1))
    delta = 0.15 * g[:, None] * np.float32([0, 0, 1])
    delta += np.where(gmask[:, None], 0.0, np.float32([0.05, 0, 0]))
    sculpt = Mesh(points=base.points + delta)
    node = FaceDeformNode()
    res = node.cook([mesh, rest, pose], group_mask=gmask,
                    examples=[(pose, sculpt)])
    assert any("off-group vertices" in w for w in res.warnings)
    np.testing.assert_allclose(res.mesh.points[~gmask],
                               mesh.points[~gmask], atol=1e-6)
    np.testing.assert_allclose(res.mesh.points[gmask],
                               sculpt.points[gmask], atol=2e-4)


def test_node_loaded_psd_matches_fit(tmp_path):
    from facedeform_tpu.utils import checkpoint

    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    ex = _make_example((mesh, rest), pose)
    node = FaceDeformNode()
    res_fit = node.cook([mesh, rest, pose], examples=[ex])
    fitted, _ = node.psd_state()
    path = str(tmp_path / "psd.npz")
    checkpoint.save_psd(path, fitted)
    loaded = checkpoint.load_psd(path)
    node2 = FaceDeformNode()
    res_load = node2.cook([mesh, rest, pose], psd=loaded)
    np.testing.assert_allclose(res_load.mesh.points, res_fit.mesh.points,
                               atol=1e-6)
    # the host corrections copy is cached by identity across cooks
    corr0 = node2._psd_ext_corr
    node2.cook([mesh, rest, _posed(rest, 1.05)], psd=loaded)
    assert node2._psd_ext_corr is corr0
    # a checkpoint for a different mesh is refused with a warning
    other = uv_sphere(8, 8)
    res_bad = FaceDeformNode().cook([other, rest, pose], psd=loaded)
    assert any("checkpoint was fitted for" in w for w in res_bad.warnings)


def test_node_device_route_matches_host(monkeypatch):
    """Large-K·V routing (ops/psd.psd_apply_on_host False): corrections
    stay device-resident, the contraction runs on device, and the cook
    output matches the host-BLAS route exactly — with and without a
    device mesh (sharded placement, cached per (psd, mesh) pair)."""
    from facedeform_tpu.ops import psd as psd_ops
    from facedeform_tpu.parallel.sharding import make_mesh

    mesh, rest = _node_inputs()
    pose_a = _posed(rest, 1.10)
    ex_a = _make_example((mesh, rest), pose_a)
    ex_b = _make_example((mesh, rest), _posed(rest, 0.92), bump=-0.1)

    res_host = FaceDeformNode().cook(
        [mesh, rest, pose_a], examples=[ex_a, ex_b], psd_align=True
    )

    monkeypatch.setattr(psd_ops, "PSD_HOST_BYTES_MAX", 0)
    node_dev = FaceDeformNode()
    res_dev = node_dev.cook(
        [mesh, rest, pose_a], examples=[ex_a, ex_b], psd_align=True
    )
    assert node_dev._psd_corr_host is None          # no host cache
    np.testing.assert_allclose(
        res_dev.mesh.points, res_host.mesh.points, atol=1e-5
    )

    dmesh = make_mesh()
    node_sh = FaceDeformNode()
    res_sh = node_sh.cook(
        [mesh, rest, pose_a], examples=[ex_a, ex_b], psd_align=True,
        mesh_devices=dmesh,
    )
    np.testing.assert_allclose(
        res_sh.mesh.points, res_host.mesh.points, atol=1e-5
    )
    # sharded placement cached across cooks of the same (psd, mesh) pair
    placed = node_sh._psd_dev_corr
    assert placed is not None
    node_sh.cook(
        [mesh, rest, _posed(rest, 1.05)], examples=[ex_a, ex_b],
        psd_align=True, mesh_devices=dmesh,
    )
    assert node_sh._psd_dev_corr is placed


def test_node_loaded_psd_device_route(tmp_path, monkeypatch):
    """Checkpoint-loaded PSD over the size threshold: no host corrections
    copy is materialized, output parity holds."""
    from facedeform_tpu.ops import psd as psd_ops
    from facedeform_tpu.utils import checkpoint

    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    ex = _make_example((mesh, rest), pose)
    node = FaceDeformNode()
    res_fit = node.cook([mesh, rest, pose], examples=[ex])
    fitted, _ = node.psd_state()
    path = str(tmp_path / "psd.npz")
    checkpoint.save_psd(path, fitted)
    loaded = checkpoint.load_psd(path)

    monkeypatch.setattr(psd_ops, "PSD_HOST_BYTES_MAX", 0)
    node2 = FaceDeformNode()
    res_load = node2.cook([mesh, rest, pose], psd=loaded)
    assert node2._psd_ext_corr is None
    np.testing.assert_allclose(
        res_load.mesh.points, res_fit.mesh.points, atol=1e-6
    )


# ------------------------------------------------------------------- cli


def _write_cli_inputs(tmp_path):
    from facedeform_tpu.geometry.obj_io import save_obj

    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    ex_pose, ex_sculpt = _make_example((mesh, rest), pose)
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), rest)
    save_obj(str(tmp_path / "drig.obj"), pose)
    save_obj(str(tmp_path / "expose.obj"), ex_pose)
    save_obj(str(tmp_path / "exsculpt.obj"), ex_sculpt)
    return mesh, rest, pose, ex_sculpt


def test_cli_deform_example_and_checkpoint(tmp_path):
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.obj_io import load_obj

    _, _, _, sculpt = _write_cli_inputs(tmp_path)
    args = ["deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
            str(tmp_path / "drig.obj"),
            "--example", str(tmp_path / "expose.obj"),
            str(tmp_path / "exsculpt.obj")]
    rc = main(args + ["-o", str(tmp_path / "out.obj"),
                      "--save-psd", str(tmp_path / "psd.npz")])
    assert rc == 0
    out = load_obj(str(tmp_path / "out.obj"))
    np.testing.assert_allclose(out.points, sculpt.points, atol=2e-4)
    # reload the checkpoint: same output without the example inputs
    rc = main(["deform", str(tmp_path / "mesh.obj"),
               str(tmp_path / "rig.obj"), str(tmp_path / "drig.obj"),
               "-o", str(tmp_path / "out2.obj"),
               "--load-psd", str(tmp_path / "psd.npz")])
    assert rc == 0
    out2 = load_obj(str(tmp_path / "out2.obj"))
    np.testing.assert_allclose(out2.points, out.points, atol=1e-6)


def test_cli_save_psd_without_examples_errors(tmp_path):
    from facedeform_tpu.cli import main

    _write_cli_inputs(tmp_path)
    rc = main(["deform", str(tmp_path / "mesh.obj"),
               str(tmp_path / "rig.obj"), str(tmp_path / "drig.obj"),
               "-o", str(tmp_path / "out.obj"),
               "--save-psd", str(tmp_path / "psd.npz")])
    assert rc == 1


def test_cli_seq_batch_psd_matches_per_frame(tmp_path):
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.obj_io import load_obj, save_obj

    mesh, rest, pose, _ = _write_cli_inputs(tmp_path)
    for f, s in enumerate([1.02, 1.06, 1.10]):
        save_obj(str(tmp_path / f"posed{f}.obj"), _posed(rest, s))
    base = ["deform-seq", str(tmp_path / "mesh.obj"),
            str(tmp_path / "rig.obj"),
            *[str(tmp_path / f"posed{f}.obj") for f in range(3)],
            "--out-pattern", "f_%02d.obj",
            "--example", str(tmp_path / "expose.obj"),
            str(tmp_path / "exsculpt.obj")]
    assert main(base + ["-o", str(tmp_path / "ref")]) == 0
    assert main(base + ["-o", str(tmp_path / "bat"), "--batch"]) == 0
    for f in range(3):
        ref = load_obj(str(tmp_path / "ref" / f"f_{f:02d}.obj"))
        got = load_obj(str(tmp_path / "bat" / f"f_{f:02d}.obj"))
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5,
                                   err_msg=f"frame {f}")
    # frame 2 IS the example pose: the written frame equals the sculpt
    sculpt = load_obj(str(tmp_path / "exsculpt.obj"))
    got2 = load_obj(str(tmp_path / "bat" / "f_02.obj"))
    np.testing.assert_allclose(got2.points, sculpt.points, atol=2e-4)


# ---------------------------------------------------------- rigid alignment


def _rotation(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(angle) * k
            + (1 - np.cos(angle)) * (k @ k)).astype(np.float32)


def test_rigid_align_recovers_pure_rigid_motion(rng):
    rest = fibonacci_points(20)
    r_true = _rotation([1, 2, 3], 0.7)
    t = np.float32([0.5, -1.0, 2.0])
    posed = rest @ r_true.T + t
    aligned, r = psd.rigid_align(rest, posed)
    np.testing.assert_allclose(aligned, rest, atol=1e-5)
    np.testing.assert_allclose(r, r_true, atol=1e-5)
    # proper rotation, never a reflection
    assert np.linalg.det(np.asarray(r, np.float64)) > 0.99


def test_rigid_align_needs_three_markers():
    with pytest.raises(ValueError, match="underdetermined"):
        psd.rigid_align(np.zeros((2, 3), np.float32),
                        np.ones((2, 3), np.float32))


def test_pose_feature_rigid_invariance(rng):
    rest = fibonacci_points(16)
    expr = rest.copy()
    expr[:, 1] *= np.float32(1.15)            # a non-rigid expression
    r_mat = _rotation([0, 1, 0], 1.1)
    moved = expr @ r_mat.T + np.float32([3.0, 0.2, -1.0])
    f_a, _ = psd.pose_feature(rest, expr, align=True)
    f_b, _ = psd.pose_feature(rest, moved, align=True)
    scale = max(1.0, float(np.abs(f_a).max()))
    assert np.abs(f_a - f_b).max() / scale < 1e-4
    # and WITHOUT align the head motion swamps the descriptor
    g_a, _ = psd.pose_feature(rest, expr, align=False)
    g_b, _ = psd.pose_feature(rest, moved, align=False)
    assert np.abs(g_a - g_b).max() > 1.0


def test_aligned_delta_is_rigid_equivariant(rng):
    rest = fibonacci_points(12)
    posed = np.stack([rest * np.float32([1, 1.1, 1]),
                      rest * np.float32([1, 0.9, 1]),
                      rest * np.float32([1.05, 1, 1])])
    corr = rng.normal(size=(3, 30, 3)).astype(np.float32)
    d = psd.PSDDeformer.fit(rest, posed, corr, align=True)
    r_mat = _rotation([1, 0, 1], 0.6)
    q = posed[0] @ r_mat.T + np.float32([2.0, -0.5, 1.0])
    # the moved pose still reads as example 0 ...
    np.testing.assert_allclose(
        np.asarray(d.weights(rest, q)), [1, 0, 0], atol=2e-4
    )
    # ... and its correction arrives rotated with the head
    np.testing.assert_allclose(
        np.asarray(d.delta(rest, q)), corr[0] @ r_mat.T, atol=2e-4
    )
    # delta_frames agrees with per-pose deltas (per-frame rotations)
    stack = np.stack([posed[1], q])
    frames = np.asarray(d.delta_frames(rest, stack))
    np.testing.assert_allclose(
        frames[0], np.asarray(d.delta(rest, posed[1])), atol=1e-5
    )
    np.testing.assert_allclose(
        frames[1], np.asarray(d.delta(rest, q)), atol=1e-5
    )


def test_node_psd_align_equivariance():
    mesh, rest = _node_inputs()
    pose_a = _posed(rest, 1.12)
    ex_a = _make_example((mesh, rest), pose_a)
    r_mat = _rotation([0, 0, 1], 0.8)
    moved = Mesh(points=(pose_a.points @ r_mat.T
                         + np.float32([1.5, 0.0, -0.7])))
    node = FaceDeformNode()
    base = FaceDeformNode().cook([mesh, rest, moved]).mesh
    res = node.cook([mesh, rest, moved], examples=[ex_a], psd_align=True)
    corr = ex_a[1].points - FaceDeformNode().cook(
        [mesh, rest, pose_a]
    ).mesh.points
    np.testing.assert_allclose(
        res.mesh.points - base.points, corr @ r_mat.T, atol=5e-4
    )
    # at the untransformed example pose, exact reproduction still holds
    res_a = node.cook([mesh, rest, pose_a], examples=[ex_a], psd_align=True)
    np.testing.assert_allclose(res_a.mesh.points, ex_a[1].points, atol=2e-4)


def test_checkpoint_align_roundtrip(rng, tmp_path):
    rest = fibonacci_points(10)
    posed = np.stack([rest * np.float32([1, 1.2, 1]),
                      rest * np.float32([1, 0.8, 1])])
    corr = rng.normal(size=(2, 15, 3)).astype(np.float32)
    d = psd.PSDDeformer.fit(rest, posed, corr, align=True)
    from facedeform_tpu.utils import checkpoint

    checkpoint.save_psd(str(tmp_path / "al"), d)
    d2 = checkpoint.load_psd(str(tmp_path / "al"))
    assert d2.align is True
    r_mat = _rotation([1, 1, 0], 0.5)
    q = posed[1] @ r_mat.T + np.float32(0.3)
    np.testing.assert_allclose(
        np.asarray(d2.delta(rest, q)), np.asarray(d.delta(rest, q)),
        atol=1e-6,
    )


# ------------------------------------------------- round-5 contract fixes
def test_node_morph_respects_group_mask():
    """Morphspace cooks must not move off-group vertices: the blend
    reconstruction writes all V rows and used to skip the group gate
    (reproduced moving off-group by 0.014; round-5 review)."""
    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    # blend carries the SAME y-scaling the rig pose drives, so the morph
    # projection finds a substantial weight (an orthogonal pair would
    # project to w ~ 0 and the gate would be vacuously satisfied)
    blend = Mesh(points=(mesh.points * np.float32([1.0, 1.1, 1.0])))
    mask = mesh.points[:, 1] > 0.0
    res = FaceDeformNode().cook(
        [mesh, rest, pose, blend], DeformConfig(morphspace=True),
        DeformParams(radius=2.0), group_mask=mask,
    )
    out = np.asarray(res.mesh.points)
    np.testing.assert_array_equal(out[~mask], mesh.points[~mask])
    assert np.abs(out[mask] - mesh.points[mask]).max() > 1e-3  # it did move


def test_node_psd_checkpoint_valid_under_symmetrize():
    """A PSD checkpoint fitted for the ORIGINAL rig must keep applying
    when the cook symmetrizes (mirrors appended to the local rig used to
    spuriously reject it; round-5 review)."""
    mesh, rest_sym = _node_inputs()
    # an asymmetric rig: symmetrize appends mirrors (N grows)
    pts = rest_sym.points.copy()
    pts[:, 0] = np.abs(pts[:, 0]) + 0.05
    rest = Mesh(points=pts)
    pose = _posed(rest, 1.08)
    node = FaceDeformNode()
    node.cook([mesh, rest, pose], examples=[_make_example((mesh, rest), pose)])
    fitted = node._psd_deformer
    assert fitted is not None
    res = FaceDeformNode().cook(
        [mesh, rest, pose], psd=fitted, symmetrize="x",
    )
    assert not any("Ignoring pose-space" in w for w in res.warnings), (
        res.warnings
    )
    assert "psd_weights" in res.mesh.detail_attrs


def test_node_psd_checkpoint_respects_group_mask():
    """Checkpoint-loaded PSD corrections must gate by the cook's group
    mask (the examples route gates at fit time; the checkpoint route used
    to move off-group vertices; round-5 review)."""
    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    node = FaceDeformNode()
    node.cook([mesh, rest, pose], examples=[_make_example((mesh, rest), pose)])
    fitted = node._psd_deformer
    mask = mesh.points[:, 2] < 0.0   # the sculpt bump sits at +z
    res_m = FaceDeformNode().cook(
        [mesh, rest, pose], psd=fitted, group_mask=mask,
    )
    res_0 = FaceDeformNode().cook([mesh, rest, pose], group_mask=mask)
    out_m = np.asarray(res_m.mesh.points)
    out_0 = np.asarray(res_0.mesh.points)
    # off-group: PSD adds nothing on top of the plain cook
    np.testing.assert_array_equal(out_m[~mask], out_0[~mask])


def test_node_external_deformer_examples_reproduce_sculpt(tmp_path):
    """cook(deformer=checkpoint, examples=...): the corrections must be
    measured against the CHECKPOINT field, not a fresh re-fit, or the
    example sculpt is not reproduced (round-5 review)."""
    from facedeform_tpu.utils import checkpoint
    from facedeform_tpu.deformer import Deformer

    mesh, rest = _node_inputs()
    pose = _posed(rest, 1.1)
    # checkpoint field deliberately DIFFERENT from what a fresh fit of
    # [rest, pose] would give: fitted against a stronger pose
    d = Deformer.fit(rest.points, _posed(rest, 1.3).points,
                     DeformConfig(), DeformParams())
    path = str(tmp_path / "d.npz")
    checkpoint.save(path, d)
    loaded = checkpoint.load(path)

    node = FaceDeformNode()
    base = node.cook([mesh, rest, pose], deformer=loaded).mesh
    g = np.exp(-4.0 * np.sum((base.points - [0, 0, 1]) ** 2, -1))
    sculpt = Mesh(points=(base.points
                          + 0.1 * g[:, None] * np.float32([0, 0, 1])))
    res = node.cook([mesh, rest, pose], deformer=loaded,
                    examples=[(pose, sculpt)])
    np.testing.assert_allclose(
        np.asarray(res.mesh.points), sculpt.points, atol=5e-5
    )
