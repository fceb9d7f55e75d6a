"""Capture tests: flood-fill islands, distance attrs, quirk semantics (component E)."""

import numpy as np
import pytest

from facedeform_tpu import CaptureError, DeformConfig, DeformParams, Deformer, Mesh
from facedeform_tpu.capture.capture import ProximityCapture
from facedeform_tpu.capture.flood import multi_source_edge_rings
from facedeform_tpu.geometry.primitives import grid, uv_sphere
from facedeform_tpu.geometry.topology import mesh_adjacency


def _line_mesh(n=10):
    """A simple path graph 0-1-2-...-n-1 embedded on the x axis."""
    pts = np.stack([np.arange(n), np.zeros(n), np.zeros(n)], -1).astype(np.float32)
    faces = np.array([[i, i + 1, i + 1] for i in range(n - 1)], np.int32)
    return Mesh(points=pts, faces=faces)


def test_edge_rings_exact_depth():
    mesh = _line_mesh(10)
    indptr, indices = mesh_adjacency(mesh)
    mask = multi_source_edge_rings(indptr, indices, np.array([0]), max_edges=3)
    assert mask[:4].all() and not mask[4:].any()


def test_multi_source_union():
    mesh = _line_mesh(20)
    indptr, indices = mesh_adjacency(mesh)
    m = multi_source_edge_rings(indptr, indices, np.array([0, 19]), max_edges=2)
    want = np.zeros(20, bool)
    want[:3] = True
    want[-3:] = True
    np.testing.assert_array_equal(m, want)


def test_capture_islands_by_class():
    """Markers with distinct `class` attrs produce distinct islands
    (capture.cpp:113-137)."""
    mesh = _line_mesh(30)
    rig = Mesh(points=np.float32([[0, 0, 0], [29, 0, 0]]))
    rig.set_attr("class", np.int32([1, 2]))
    pc = ProximityCapture()
    pc.init(mesh, rig)
    res = pc.capture(max_edges=2, radius=5.0, dofalloff=False, falloffrate=1.0)
    assert set(res.islands) == {1, 2}
    assert res.islands[1][:3].all() and not res.islands[1][3:].any()
    assert res.islands[2][-3:].all() and not res.islands[2][:-3].any()


def test_capture_nofalloff_zero_distances():
    """dofalloff off -> captured vertices get dist2 = 0 (capture.cpp:71-75)."""
    mesh = uv_sphere(20, 20)
    rig = Mesh(points=mesh.points[::50].copy())
    pc = ProximityCapture()
    pc.init(mesh, rig)
    res = pc.capture(max_edges=2, radius=1.0, dofalloff=False, falloffrate=1.0)
    assert res.captured.any()
    assert (res.dist2 == 0).all()


def test_capture_falloff_distances():
    mesh = grid(30, 30, size=2.0)
    rig = Mesh(points=np.float32([[0, 0, 0]]))
    pc = ProximityCapture()
    pc.init(mesh, rig)
    res = pc.capture(max_edges=8, radius=1.0, dofalloff=True, falloffrate=1.0)
    idx = np.nonzero(res.captured)[0]
    want = np.sum(mesh.points[idx] ** 2, -1)
    np.testing.assert_allclose(res.dist2[idx], want, atol=1e-5)
    # uncaptured stay 0 (quirk 1 contract)
    assert (res.dist2[~res.captured] == 0).all()


def test_capture_strict_parity_sentinel():
    """strict_parity keeps d2 = -1 where the bounded search fails (quirk 2)."""
    mesh = grid(40, 40, size=4.0)
    rig = Mesh(points=np.float32([[0, 0, 0]]))
    pc = ProximityCapture()
    pc.init(mesh, rig)
    res = pc.capture(max_edges=30, radius=0.5, dofalloff=True, falloffrate=1.0,
                     strict_parity=True)
    idx = np.nonzero(res.captured)[0]
    far = np.sum(mesh.points[idx] ** 2, -1) > 0.25
    assert (res.dist2[idx][far] == -1.0).all()
    assert (res.dist2[idx][~far] >= 0).all()


def test_capture_triangle_rig_distance():
    """Rig with faces -> distance to nearest point on rig primitives
    (GU_RayIntersect::minimumPoint analogue, capture.cpp:81-86)."""
    mesh = grid(21, 21, size=2.0)
    # one triangle hovering 0.5 above the plane center
    rig = Mesh(
        points=np.float32([[-0.2, 0.5, -0.2], [0.2, 0.5, -0.2], [0.0, 0.5, 0.2]]),
        faces=np.int32([[0, 1, 2]]),
    )
    pc = ProximityCapture()
    pc.init(mesh, rig)
    res = pc.capture(max_edges=40, radius=3.0, dofalloff=True, falloffrate=1.0)
    # the mesh vertex directly under the triangle centroid: distance ~0.5
    center = np.argmin(np.sum((mesh.points - [0, 0, -0.066]) ** 2, -1))
    assert res.captured[center]
    np.testing.assert_allclose(np.sqrt(res.dist2[center]), 0.5, atol=0.02)


def test_capture_before_init_raises():
    with pytest.raises(CaptureError):
        ProximityCapture().capture(1, 1.0, False, 1.0)


def test_end_to_end_with_capture(rng):
    """Full pipeline: capture gates deformation to the flood-filled region."""
    mesh = grid(40, 40, size=4.0)
    rig_rest = Mesh(points=np.float32([[0, 0, 0]]))
    rig_def = np.float32([[0, 0.5, 0]])
    pc = ProximityCapture()
    pc.init(mesh, rig_rest)
    res = pc.capture(max_edges=3, radius=1.0, dofalloff=True, falloffrate=1.0)
    d = Deformer.fit(rig_rest.points, rig_def, DeformConfig(), DeformParams())
    # strict masking: freeze uncaptured vertices via the group mask
    new_pts, w = d.apply(mesh.points, dist2=res.dist2, group_mask=res.captured)
    new_pts = np.asarray(new_pts)
    assert (new_pts[~res.captured] == mesh.points[~res.captured]).all()
    moved = np.linalg.norm(new_pts - mesh.points, axis=1)
    assert moved[res.captured].max() > 0.3


def test_min_sqdist_to_triangles_auto_parity(rng):
    """The host numpy twin and the V-bucketed jit path must agree with
    the exact-shape jit kernel — both branches of the auto dispatch the
    capture triangle falloff now uses (the direct jit call recompiled on
    every captured-vertex-count change; round-5 review finding)."""
    import jax.numpy as jnp

    from facedeform_tpu.ops import distances as D

    pts = rng.standard_normal((257, 3)).astype(np.float32) * 2.0
    tri_pts = rng.standard_normal((23, 3, 3)).astype(np.float32)
    want = np.asarray(
        D.min_sqdist_to_triangles(jnp.asarray(pts), jnp.asarray(tri_pts))
    )
    # host branch (pair count far below the limit)
    got_host = D.min_sqdist_to_triangles_auto(pts, tri_pts)
    np.testing.assert_allclose(got_host, want, rtol=1e-5, atol=1e-6)
    # bucketed-device branch, forced by shrinking the limit
    old = D._HOST_PAIR_LIMIT
    D._HOST_PAIR_LIMIT = 8
    try:
        got_dev = D.min_sqdist_to_triangles_auto(pts, tri_pts)
    finally:
        D._HOST_PAIR_LIMIT = old
    np.testing.assert_allclose(got_dev, want, rtol=1e-5, atol=1e-6)
    # degenerate (collapsed) triangle stays finite and correct: distance
    # to a point-triangle equals point distance
    tri0 = np.broadcast_to(np.float32([1.0, 2.0, 3.0]), (1, 3, 3)).copy()
    got = D.min_sqdist_to_triangles_auto(pts, tri0)
    want0 = np.sum((pts - [1.0, 2.0, 3.0]) ** 2, -1)
    np.testing.assert_allclose(got, want0, rtol=1e-4, atol=1e-5)
