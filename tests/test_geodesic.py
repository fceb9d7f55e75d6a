"""Geodesic falloff metric (cfg.falloff_metric="geodesic").

The reference measures falloff distance straight through space
(capture.cpp:81-86), so a marker on one surface drags geometry that is
near in space but far along the surface — the upper-lip/lower-lip bleed.
The geodesic metric (multi-source Dijkstra over the edge graph,
capture/geodesic.py) must keep the bleed out while matching euclidean
where the surface path IS the straight line.

Test fixture: a hairpin strip — out 4 units along +x, u-turn, back 4
units at y = 0.2.  The return end sits 0.2 above the marker in space but
~8.2 away along the surface.
"""

import numpy as np
import pytest

from facedeform_tpu.capture.capture import ProximityCapture
from facedeform_tpu.capture.geodesic import (
    UNREACHABLE,
    _dijkstra_scipy,
    geodesic_distance,
)
from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.topology import mesh_adjacency
from facedeform_tpu.node import FaceDeformNode
from facedeform_tpu.utils.errors import CaptureError

LX = 4.0      # hairpin arm length
GAP = 0.2     # spatial gap between the two arms
WIDTH = 0.3   # strip width (z)
N_SEG = 40    # segments per arm


def _hairpin():
    """Two-row quad strip folding back on itself; returns (mesh, the
    vertex index at the far (return) end nearest the marker)."""
    t_out = np.linspace(0.0, LX, N_SEG)
    t_back = np.linspace(LX, 0.0, N_SEG)
    path = np.concatenate(
        [
            np.stack([t_out, np.zeros(N_SEG)], 1),
            np.stack([t_back, np.full(N_SEG, GAP)], 1),
        ]
    )
    pts = []
    for x, y in path:
        pts.append([x, y, 0.0])
        pts.append([x, y, WIDTH])
    pts = np.asarray(pts, np.float32)
    faces = []
    for i in range(len(path) - 1):
        a = 2 * i
        faces.append([a, a + 1, a + 3, a + 2])
    mesh = Mesh(points=pts, faces=np.asarray(faces, np.int32))
    # return-end vertex: last path point (x=0, y=GAP, z=0)
    return mesh, len(pts) - 2


def _rig():
    """Three markers clustered at the strip start (on the z=0 row)."""
    return Mesh(points=np.float32([
        [0.0, 0.0, 0.0], [0.15, 0.0, 0.0], [0.0, 0.0, 0.25],
    ]))


def test_geodesic_distance_hairpin_vs_euclidean():
    mesh, far_idx = _hairpin()
    indptr, indices = mesh_adjacency(mesh)
    d = geodesic_distance(indptr, indices, mesh.points, np.array([0]))
    # far end: ~2*LX + GAP along the surface (zigzag slack ~ strip width)
    assert d[far_idx] > 2 * LX, d[far_idx]
    assert d[far_idx] < 2 * LX + GAP + 2 * WIDTH + 1.0
    # along the outgoing arm the edge path is the straight line
    near_idx = 2 * (N_SEG // 2)  # x = ~LX/2, y = 0, z = 0
    eu = np.linalg.norm(mesh.points[near_idx] - mesh.points[0])
    assert d[near_idx] == pytest.approx(eu, rel=0.12)


def test_geodesic_source_offsets_and_unreachable():
    mesh, _ = _hairpin()
    indptr, indices = mesh_adjacency(mesh)
    d0 = geodesic_distance(
        indptr, indices, mesh.points, np.array([0]),
        np.array([0.5], np.float32),
    )
    assert d0[0] == pytest.approx(0.5, abs=1e-6)  # seed carries the offset
    # an isolated extra vertex (no faces touch it) must come back finite
    # (UNREACHABLE) so squaring downstream cannot overflow f32
    pts2 = np.concatenate([mesh.points, [[50.0, 50.0, 50.0]]]).astype(np.float32)
    mesh2 = Mesh(points=pts2, faces=mesh.faces)
    ip2, ix2 = mesh_adjacency(mesh2)
    d2 = geodesic_distance(ip2, ix2, pts2, np.array([0]))
    assert d2[-1] == UNREACHABLE
    assert np.isfinite(np.float32(d2[-1]) ** 2)


def test_native_and_scipy_dijkstra_agree():
    from facedeform_tpu import native

    mesh, _ = _hairpin()
    indptr, indices = mesh_adjacency(mesh)
    sources = np.array([0, 7, 91], np.int64)
    offs = np.float32([0.0, 0.3, 0.05])
    d_sp = _dijkstra_scipy(indptr, indices, mesh.points, sources, offs)
    d_nat = native.dijkstra(indptr, indices, mesh.points, sources, offs)
    if d_nat is None:
        pytest.skip("native fastgeo unavailable (no g++)")
    finite = d_sp < 1e16
    # atol floor: the scipy path nudges zero source offsets to 1e-30 so
    # the virtual edges survive sparse zero-dropping
    np.testing.assert_allclose(d_nat[finite], d_sp[finite],
                               rtol=1e-5, atol=1e-6)


def test_capture_geodesic_blocks_the_bleed():
    """Through ProximityCapture: euclidean gives the return end a tiny
    d2 (the spatial gap); geodesic must give it one far beyond radius."""
    mesh, far_idx = _hairpin()
    rig = _rig()
    radius = 1.5

    def run(metric):
        pc = ProximityCapture()
        pc.init(mesh, rig)
        return pc.capture(
            max_edges=10_000, radius=radius, dofalloff=True,
            falloffrate=1.0, metric=metric,
        )

    eu = run("euclidean")
    ge = run("geodesic")
    assert eu.captured.all() and ge.captured.all()
    assert eu.dist2[far_idx] < (GAP + WIDTH) ** 2  # spatially close
    assert ge.dist2[far_idx] > (2 * LX - 1.0) ** 2  # surface-far
    # start of the strip: both metrics agree the marker is right there
    assert ge.dist2[0] == pytest.approx(eu.dist2[0], abs=1e-3)
    with pytest.raises(CaptureError, match="unknown falloff metric"):
        run("manhattan")


def test_node_cook_geodesic_freezes_far_arm():
    """End to end: deform the strip with markers moving +y at the start.
    Euclidean falloff drags the return arm (it is only GAP away in
    space); geodesic freezes it (d2 >> radius^2 skips the vertex)."""
    mesh, far_idx = _hairpin()
    rig0 = _rig()
    rig1 = Mesh(points=rig0.points + np.float32([0, 0.3, 0]))
    base = dict(dofalloff=True)
    params = DeformParams(radius=1.5, maxedges=10_000)

    res_eu = FaceDeformNode().cook(
        [mesh, rig0, rig1], DeformConfig(**base), params)
    res_ge = FaceDeformNode().cook(
        [mesh, rig0, rig1],
        DeformConfig(falloff_metric="geodesic", **base), params)
    move_eu = np.linalg.norm(res_eu.mesh.points - mesh.points, axis=1)
    move_ge = np.linalg.norm(res_ge.mesh.points - mesh.points, axis=1)
    # the start moves in both
    assert move_eu[0] > 0.1 and move_ge[0] > 0.1
    # the return end: dragged under euclidean, frozen under geodesic
    assert move_eu[far_idx] > 0.05, move_eu[far_idx]
    assert move_ge[far_idx] < 1e-6, move_ge[far_idx]
    # falloff attr mirrors it
    assert res_ge.mesh.point_attrs["fd_falloff"][far_idx] == 0.0


def test_geodesic_needs_edges():
    cloud = Mesh(points=np.random.default_rng(0)
                 .standard_normal((30, 3)).astype(np.float32))
    pc = ProximityCapture()
    pc.init(cloud, _rig())
    with pytest.raises(CaptureError, match="geodesic falloff needs"):
        pc.capture(4, 1.0, True, 1.0, metric="geodesic")


def test_falloff_metric_config_hygiene():
    with pytest.raises(ValueError, match="falloff_metric"):
        DeformConfig(falloff_metric="chebyshev")
    a = DeformConfig(falloff_metric="geodesic")
    b = DeformConfig()
    # never a jit key: both views collapse the metric
    assert a.solve_view() == b.solve_view()
    assert a.eval_view() == b.eval_view()


def test_falloff_metric_checkpoint_roundtrip():
    import json

    from facedeform_tpu.utils.checkpoint import _cfg_from_json, _cfg_to_json

    cfg = DeformConfig(dofalloff=True, falloff_metric="geodesic")
    back = _cfg_from_json(_cfg_to_json(cfg))
    assert back.falloff_metric == "geodesic"
    d = json.loads(_cfg_to_json(cfg))
    d.pop("falloff_metric")
    assert DeformConfig(**d).falloff_metric == "euclidean"
