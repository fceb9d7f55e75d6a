"""Node cook with a device mesh: sharded eval + sharded DBSE morph."""

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode, Mesh
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.parallel import sharding


@pytest.fixture(scope="module")
def dev_mesh():
    return sharding.make_mesh()


def _inputs(rng):
    mesh = uv_sphere(30, 30)
    r0 = Mesh(points=fibonacci_points(20))
    r1 = Mesh(points=r0.points * 1.05)
    return mesh, r0, r1


def test_cook_sharded_matches_single(rng, dev_mesh):
    mesh, r0, r1 = _inputs(rng)
    res_single = FaceDeformNode().cook([mesh, r0, r1])
    res_sharded = FaceDeformNode().cook([mesh, r0, r1], mesh_devices=dev_mesh)
    np.testing.assert_allclose(
        res_sharded.mesh.points, res_single.mesh.points, atol=1e-5
    )
    np.testing.assert_allclose(
        res_sharded.mesh.point_attrs["fd_falloff"],
        res_single.mesh.point_attrs["fd_falloff"], atol=1e-6,
    )


def test_cook_sharded_morphspace(rng, dev_mesh):
    mesh, r0, r1 = _inputs(rng)
    blends = [
        Mesh(points=mesh.points + 0.05 * rng.standard_normal(
            (mesh.num_points, 3)).astype(np.float32))
        for _ in range(3)
    ]
    cfg = DeformConfig(morphspace=True)
    res_single = FaceDeformNode().cook([mesh, r0, r1] + blends, cfg)
    res_sharded = FaceDeformNode().cook(
        [mesh, r0, r1] + blends, cfg, mesh_devices=dev_mesh
    )
    np.testing.assert_allclose(
        res_sharded.weights, res_single.weights, rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        res_sharded.mesh.points, res_single.mesh.points, atol=1e-4
    )


def test_cook_sharded_group_mask(rng, dev_mesh):
    mesh, r0, r1 = _inputs(rng)
    mask = np.zeros(mesh.num_points, bool)
    mask[::2] = True
    res = FaceDeformNode().cook([mesh, r0, r1], group_mask=mask,
                                mesh_devices=dev_mesh)
    assert (res.mesh.points[~mask] == mesh.points[~mask]).all()
