"""Culled eval: truncation-bounded equality with the dense kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer, RBFKernel, RBFModelType
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops import pallas_eval
from facedeform_tpu.ops.fit import effective_kernel
from facedeform_tpu.ops.morton import morton_codes, spatial_order


def test_morton_sort_locality(rng):
    pts = rng.standard_normal((1000, 3)).astype(np.float32)
    perm, inv = spatial_order(jnp.asarray(pts))
    sorted_pts = pts[np.asarray(perm)]
    # round trip
    np.testing.assert_array_equal(sorted_pts[np.asarray(inv)], pts)
    # consecutive sorted points are closer on average than random order
    d_sorted = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    d_orig = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig


def _run(d, pts, culled, tile=128):
    v = pts.shape[0]
    fn = pallas_eval.evaluate_pallas_culled if culled else pallas_eval.evaluate_pallas
    return fn(
        d.model, jnp.asarray(pts), jnp.zeros(v), jnp.ones(v),
        jnp.float32(10.0), jnp.float32(1.0),
        effective_kernel(d.cfg), d.cfg.term,
        tile_v=tile, interpret=True,
    )


@pytest.mark.parametrize("model_type,kernel", [
    (RBFModelType.QNN, RBFKernel.GAUSSIAN),
    (RBFModelType.KERNEL, RBFKernel.WENDLAND_C2),
])
def test_culled_matches_dense(rng, model_type, kernel):
    rest = fibonacci_points(200)
    deformed = rest + 0.05 * rng.standard_normal((200, 3)).astype(np.float32)
    cfg = DeformConfig(model=model_type, kernel=kernel)
    d = Deformer.fit(rest, deformed, cfg, DeformParams(radius=0.3, lam=0.01))
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    perm, _ = spatial_order(jnp.asarray(pts))
    pts = pts[np.asarray(perm)]
    ref, ref_w = _run(d, pts, culled=False)
    got, got_w = _run(d, pts, culled=True)
    # 1e-12 phi truncation + f32 ordering wobble
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), atol=1e-6)


def test_culled_rejects_growing_kernels(rng):
    rest = fibonacci_points(64)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.MULTIQUADRIC)
    d = Deformer.fit(rest, rest * 1.01, cfg, DeformParams(radius=1.0, lam=0.01))
    with pytest.raises(ValueError, match="decaying"):
        _run(d, fibonacci_points(128), culled=True)


def test_deformer_backend_pallas_culled(rng):
    rest = fibonacci_points(100)
    d = Deformer.fit(rest, rest * 1.02, DeformConfig(), DeformParams())
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    # on the CPU test platform the culled pallas path needs interpret mode,
    # so call through the op directly (backend routing is covered on TPU)
    got, _ = _run(d, pts, culled=True)
    ref, _ = d.apply(pts, backend="dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


# ----------------------------------------------- auto path (round 2, VERDICT 1)
@pytest.fixture
def force_culled(monkeypatch):
    """Route Deformer.apply's culled path through interpret mode (no TPU in
    tests) without touching its permute/scatter logic."""
    real = pallas_eval.evaluate_pallas_culled

    def interp(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(pallas_eval, "evaluate_pallas_culled", interp)
    return interp


def test_apply_culled_scatters_back(rng, force_culled):
    """apply(backend='pallas_culled') Z-orders internally and un-permutes
    the result — output order must match the dense path exactly."""
    rest = fibonacci_points(64)
    d = Deformer.fit(rest, rest * 1.08)
    pts = rng.standard_normal((777, 3)).astype(np.float32)
    dist2 = np.abs(rng.standard_normal(777)).astype(np.float32) * 0.2
    ref_pts, ref_w = d.apply(pts, dist2=dist2, backend="dense")
    got_pts, got_w = d.apply(pts, dist2=dist2, backend="pallas_culled")
    np.testing.assert_allclose(np.asarray(got_pts), np.asarray(ref_pts), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), atol=1e-6)


def test_apply_culled_with_cached_perm_and_group(rng, force_culled):
    rest = fibonacci_points(64)
    d = Deformer.fit(rest, rest * 1.08)
    pts = rng.standard_normal((600, 3)).astype(np.float32)
    mask = rng.standard_normal(600) > 0
    perm = spatial_order(jnp.asarray(pts))
    ref_pts, _ = d.apply(pts, group_mask=mask, backend="dense")
    got_pts, _ = d.apply(
        pts, group_mask=mask, backend="pallas_culled", spatial_perm=perm
    )
    got_pts = np.asarray(got_pts)
    np.testing.assert_allclose(got_pts, np.asarray(ref_pts), atol=2e-5)
    np.testing.assert_array_equal(got_pts[~mask], pts[~mask])  # pinned exactly


def test_apply_culled_fused_tangent(rng, force_culled):
    """Tangent frames ride the culled kernel too (round-2 extension)."""
    rest = fibonacci_points(64)
    cfg = DeformConfig(tangent=True)
    d = Deformer.fit(rest, rest * 1.08, cfg)
    pts = rng.standard_normal((512, 3)).astype(np.float32)
    frame = tuple(
        rng.standard_normal((512, 3)).astype(np.float32) for _ in range(3)
    )
    ref_pts, _ = d.apply(pts, frame=frame, backend="dense")
    got_pts, _ = d.apply(pts, frame=frame, backend="pallas_culled")
    np.testing.assert_allclose(np.asarray(got_pts), np.asarray(ref_pts), atol=2e-5)


def test_node_autotunes_backend_and_caches(rng, force_culled, monkeypatch):
    """node.cook on 'TPU' (backend monkeypatched) measures dense vs culled
    once per (mesh, rig) and caches the winner; results match the dense
    cook either way."""
    import jax

    from facedeform_tpu import FaceDeformNode, Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(80, 80)  # ~6.5k vertices: past the 4096 auto threshold
    rig = Mesh(points=fibonacci_points(30))
    drig = Mesh(points=rig.points * 1.1)

    node_dense = FaceDeformNode()
    ref = node_dense.cook([mesh, rig, drig])

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    real_dense = pallas_eval.evaluate_pallas

    def interp_dense(*args, **kw):
        kw["interpret"] = True
        return real_dense(*args, **kw)

    monkeypatch.setattr(pallas_eval, "evaluate_pallas", interp_dense)
    node = FaceDeformNode()
    got = node.cook([mesh, rig, drig])
    assert node._backend_key == (mesh.pos_id, node._fit_key)  # tuned + cached
    choice = node._backend_choice
    assert choice in ("pallas", "pallas_culled")
    got2 = node.cook([mesh, rig, drig])
    assert node._backend_choice == choice  # reused, not re-measured
    np.testing.assert_allclose(got.mesh.points, ref.mesh.points, atol=2e-5)
    np.testing.assert_allclose(
        got.mesh.point_attrs["fd_falloff"],
        ref.mesh.point_attrs["fd_falloff"], atol=1e-6,
    )
    np.testing.assert_array_equal(got2.mesh.points, got.mesh.points)


def test_mesh_reorder_spatial_roundtrip(rng):
    """reorder_spatial permutes points/attrs/groups consistently and remaps
    faces; deforming the reordered mesh equals deforming the original."""
    from facedeform_tpu import FaceDeformNode, Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(20, 20)
    mesh.set_attr("tag", np.arange(mesh.num_points, dtype=np.int64))
    mesh.set_group("half", mesh.points[:, 0] > 0)
    zmesh = mesh.reorder_spatial()
    tag = zmesh.point_attrs["tag"]
    # permutation: attrs follow their points
    np.testing.assert_array_equal(zmesh.points, mesh.points[tag])
    np.testing.assert_array_equal(zmesh.group_mask("half"), mesh.group_mask("half")[tag])
    # faces index the same coordinates
    np.testing.assert_allclose(
        zmesh.points[zmesh.triangles()], mesh.points[mesh.triangles()]
    )
    rig = Mesh(points=fibonacci_points(25))
    drig = Mesh(points=rig.points * 1.1)
    ref = FaceDeformNode().cook([mesh, rig, drig])
    got = FaceDeformNode().cook([zmesh, rig, drig])
    np.testing.assert_allclose(got.mesh.points, ref.mesh.points[tag], atol=1e-6)
