"""Node-level cook tests: orchestration, caching, warnings (components A/B/C)."""

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Mesh, ShapeMismatchError
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.geometry.topology import compute_tangent_frame
from facedeform_tpu.node import FaceDeformNode


def _inputs(rng, n_rig=30):
    mesh = uv_sphere(40, 40)
    rest_rig = Mesh(points=fibonacci_points(n_rig))
    bump = 0.2 * np.exp(-2 * np.sum((rest_rig.points - [0, 1, 0]) ** 2, -1, keepdims=True))
    deform_rig = Mesh(points=(rest_rig.points + bump * np.float32([0, 1, 0])))
    return mesh, rest_rig, deform_rig


def test_cook_basic(rng):
    mesh, r0, r1 = _inputs(rng)
    node = FaceDeformNode()
    res = node.cook([mesh, r0, r1])
    assert res.mesh.num_points == mesh.num_points
    assert "fd_falloff" in res.mesh.point_attrs
    moved = np.linalg.norm(res.mesh.points - mesh.points, axis=1)
    assert moved.max() > 0.1
    # input mesh untouched (cook works on a duplicate, :226)
    assert (mesh.points == uv_sphere(40, 40).points).all()


def test_cook_too_few_inputs():
    mesh = uv_sphere(10, 10)
    with pytest.raises(ShapeMismatchError):
        FaceDeformNode().cook([mesh, mesh])


def test_cook_rig_mismatch(rng):
    mesh, r0, _ = _inputs(rng)
    bad = Mesh(points=fibonacci_points(31))
    with pytest.raises(ShapeMismatchError):
        FaceDeformNode().cook([mesh, r0, bad])


def test_cook_caches_solve_and_capture(rng):
    """Unchanged inputs -> capture and solve objects are reused
    (InputGeoID semantics, SOP_FaceDeform.hpp:47-64)."""
    mesh, r0, r1 = _inputs(rng)
    node = FaceDeformNode()
    node.cook([mesh, r0, r1])
    deformer1, capkey1 = node._deformer, node._capture_key
    node.cook([mesh, r0, r1])
    assert node._deformer is deformer1
    assert node._capture_key == capkey1
    # moving the deformed rig re-solves but does NOT recapture
    r1b = Mesh(points=r1.points * 1.01)
    node.cook([mesh, r0, r1b])
    assert node._deformer is not deformer1
    assert node._capture_key == capkey1
    # changing maxedges DOES recapture (fixes reference FIXME :310-312)
    node.cook([mesh, r0, r1b], params=DeformParams(maxedges=8))
    assert node._capture_key != capkey1


def test_cook_tangent_warning_without_frame(rng):
    mesh, r0, r1 = _inputs(rng)
    res = FaceDeformNode().cook([mesh, r0, r1], cfg=DeformConfig(tangent=True))
    assert any("PolyFrame" in w for w in res.warnings)


def test_cook_tangent_with_frame(rng):
    mesh, r0, r1 = _inputs(rng)
    compute_tangent_frame(mesh)
    res = FaceDeformNode().cook([mesh, r0, r1], cfg=DeformConfig(tangent=True))
    assert not any("PolyFrame" in w for w in res.warnings)
    # tangent projection kills the radial component on a sphere: the bump
    # (radial push) should be strongly attenuated
    moved = np.linalg.norm(res.mesh.points - mesh.points, axis=1)
    res_free = FaceDeformNode().cook([mesh, r0, r1])
    moved_free = np.linalg.norm(res_free.mesh.points - mesh.points, axis=1)
    assert moved.max() < 0.6 * moved_free.max()


def test_cook_morphspace_no_blends_warns(rng):
    mesh, r0, r1 = _inputs(rng)
    res = FaceDeformNode().cook([mesh, r0, r1], cfg=DeformConfig(morphspace=True))
    assert any("No blendshapes" in w for w in res.warnings)


def test_cook_morphspace_mismatched_blend_skipped(rng):
    mesh, r0, r1 = _inputs(rng)
    bad_blend = Mesh(points=fibonacci_points(99))
    res = FaceDeformNode().cook(
        [mesh, r0, r1, bad_blend], cfg=DeformConfig(morphspace=True)
    )
    assert any("don't match rest pose" in w for w in res.warnings)
    assert res.weights is None


def test_cook_morphspace_projects_into_subspace(rng):
    """With morphspace on, output must lie in rest + span(blend deltas)."""
    mesh, r0, r1 = _inputs(rng)
    v = mesh.num_points
    blends = []
    basis = []
    for i in range(3):
        delta = 0.1 * rng.standard_normal((v, 3)).astype(np.float32)
        blends.append(Mesh(points=mesh.points + delta))
        basis.append(delta.reshape(-1))
    res = FaceDeformNode().cook(
        [mesh, r0, r1] + blends, cfg=DeformConfig(morphspace=True)
    )
    assert res.weights is not None and res.weights.shape == (3,)
    assert "weights" in res.mesh.detail_attrs
    d = (res.mesh.points - mesh.points).reshape(-1).astype(np.float64)
    b = np.stack(basis, axis=1).astype(np.float64)
    # d should be (almost) exactly B @ weights
    recon = b @ np.linalg.lstsq(b, d, rcond=None)[0]
    assert np.abs(d - recon).max() < 1e-3


def test_cook_group_mask(rng):
    mesh, r0, r1 = _inputs(rng)
    mask = np.zeros(mesh.num_points, bool)
    mask[: mesh.num_points // 3] = True
    res = FaceDeformNode().cook([mesh, r0, r1], group_mask=mask)
    assert (res.mesh.points[~mask] == mesh.points[~mask]).all()
