"""Driven secondary meshes: accessory geometry riding the same solved field.

Extension over the reference (one SOP deforms one mesh; accessories need
their own node chains): node.cook(secondary=[...]) evaluates the one solve
on every accessory point set — full displacement, no capture gate (the
reference's no-capture semantics, src/SOP_FaceDeform.cpp:404-410).
"""

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode, Mesh
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere


def _rig(n=40, seed=0):
    rng = np.random.default_rng(seed)
    rest = fibonacci_points(n) * 1.05
    posed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    return Mesh(points=rest), Mesh(points=posed)


def test_secondary_rides_the_same_field():
    mesh = uv_sphere(16, 16)
    rest_rig, posed_rig = _rig()
    teeth = uv_sphere(6, 6)
    teeth.set_points(teeth.points * 0.4)   # interior accessory

    node = FaceDeformNode()
    res = node.cook(
        [mesh, rest_rig, posed_rig], DeformConfig(), DeformParams(),
        secondary=[teeth],
    )
    assert len(res.secondary) == 1
    sec = res.secondary[0]
    assert sec.num_points == teeth.num_points
    # input is untouched; the result is a deformed copy
    np.testing.assert_array_equal(teeth.points, uv_sphere(6, 6).points * 0.4)

    # parity: exactly the solved deformer applied with full displacement
    want, want_w = node._deformer.apply(teeth.points)
    np.testing.assert_allclose(sec.points, np.asarray(want), atol=1e-6)
    np.testing.assert_allclose(
        sec.attr("fd_falloff"), np.asarray(want_w), atol=1e-6
    )


def test_secondary_ignores_capture_and_group():
    """The main mesh is capture-gated and group-restricted; the secondary
    still deforms fully (capture binds the main mesh's topology)."""
    mesh = uv_sphere(16, 16)
    mesh.set_group("left", mesh.points[:, 0] < 0.0)
    rest_rig, posed_rig = _rig(12)
    sec_in = uv_sphere(5, 5)

    cfg = DeformConfig(dofalloff=True)
    params = DeformParams(radius=0.5, maxedges=2)
    node = FaceDeformNode()
    res = node.cook(
        [mesh, rest_rig, posed_rig], cfg, params,
        group="left", secondary=[sec_in],
    )
    sec = res.secondary[0]
    # full displacement on the secondary == raw field (falloff may be <1
    # only through the radius falloff on dist2=0 -> it is exactly 1)
    np.testing.assert_allclose(sec.attr("fd_falloff"), 1.0, atol=1e-6)
    want, _ = node._deformer.apply(sec_in.points)
    np.testing.assert_allclose(sec.points, np.asarray(want), atol=1e-6)
    # while the main mesh really was gated somewhere
    assert (res.mesh.attr("fd_falloff") < 0.5).any()


def test_secondary_tangent_uses_own_frame():
    from facedeform_tpu.geometry.topology import compute_tangent_frame

    mesh = uv_sphere(14, 14)
    compute_tangent_frame(mesh)
    rest_rig, posed_rig = _rig(20, seed=3)
    sec_in = uv_sphere(7, 7)
    compute_tangent_frame(sec_in)

    cfg = DeformConfig(tangent=True)
    node = FaceDeformNode()
    res = node.cook(
        [mesh, rest_rig, posed_rig], cfg, DeformParams(),
        secondary=[sec_in],
    )
    sec = res.secondary[0]
    frame = (sec_in.attr("tangentu"), sec_in.attr("tangentv"),
             sec_in.attr("N"))
    want, _ = node._deformer.apply(sec_in.points, frame=frame)
    np.testing.assert_allclose(sec.points, np.asarray(want), atol=1e-6)
    # and it differs from the unprojected field (tangent projection bites)
    raw, _ = node._deformer.apply(sec_in.points)
    assert np.abs(np.asarray(raw) - np.asarray(want)).max() > 1e-5


def test_secondary_pu_route():
    from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType

    mesh = uv_sphere(12, 12)
    rest_rig, posed_rig = _rig(60, seed=5)
    sec_in = uv_sphere(6, 6)
    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
        term=PolyTerm.LINEAR, solver="pu",
    )
    node = FaceDeformNode()
    res = node.cook(
        [mesh, rest_rig, posed_rig], cfg, DeformParams(lam=0.01),
        secondary=[sec_in],
    )
    sec = res.secondary[0]
    want, _ = node._deformer.apply(
        sec_in.points, plan_key=(sec_in.pos_id, sec_in.num_points)
    )
    np.testing.assert_allclose(sec.points, np.asarray(want), atol=1e-6)


def test_secondary_recompute_normals():
    mesh = uv_sphere(12, 12)
    rest_rig, posed_rig = _rig(16, seed=7)
    sec_in = uv_sphere(8, 8)
    node = FaceDeformNode()
    res = node.cook(
        [mesh, rest_rig, posed_rig], DeformConfig(), DeformParams(),
        secondary=[sec_in], recompute_normals=True,
    )
    sec = res.secondary[0]
    n = sec.attr("N")
    assert n is not None and n.shape == (sec.num_points, 3)
    np.testing.assert_allclose(
        np.linalg.norm(n, axis=1), 1.0, atol=1e-4
    )


def test_cli_deform_secondary(tmp_path):
    from facedeform_tpu import cli
    from facedeform_tpu.geometry import load_mesh
    from facedeform_tpu.geometry.obj_io import save_obj

    mesh = uv_sphere(10, 10)
    rest_rig, posed_rig = _rig(14, seed=9)
    sec_in = uv_sphere(5, 5)
    paths = {}
    for name, m in [("mesh", mesh), ("rest", rest_rig),
                    ("posed", posed_rig), ("teeth", sec_in)]:
        p = str(tmp_path / f"{name}.obj")
        save_obj(p, m)
        paths[name] = p
    out = str(tmp_path / "out.obj")
    sec_out = str(tmp_path / "teeth_out.obj")
    rc = cli.main([
        "deform", paths["mesh"], paths["rest"], paths["posed"],
        "-o", out, "--secondary", paths["teeth"], sec_out,
    ])
    assert rc == 0
    got = load_mesh(sec_out)
    assert got.num_points == sec_in.num_points
    # the accessory moved with the field
    assert np.abs(got.points - sec_in.points).max() > 1e-4


@pytest.mark.parametrize("batch", [False, True])
def test_cli_deform_seq_secondary(tmp_path, batch):
    """Per-frame and --batch secondary outputs must agree (the batched
    eval is the same field, promoted to one dispatch)."""
    from facedeform_tpu import cli
    from facedeform_tpu.geometry import load_mesh
    from facedeform_tpu.geometry.obj_io import save_obj

    rng = np.random.default_rng(21)
    mesh = uv_sphere(10, 10)
    rest = fibonacci_points(12) * 1.05
    sec_in = uv_sphere(5, 5)
    mesh_p = str(tmp_path / "mesh.obj")
    rig_p = str(tmp_path / "rig.obj")
    sec_p = str(tmp_path / "teeth.obj")
    save_obj(mesh_p, mesh)
    save_obj(rig_p, Mesh(points=rest))
    save_obj(sec_p, sec_in)
    rig_frames = []
    for f in range(3):
        p = str(tmp_path / f"rig_{f}.obj")
        save_obj(p, Mesh(
            points=rest + 0.03 * rng.standard_normal(rest.shape)
            .astype(np.float32)
        ))
        rig_frames.append(p)

    outdir = str(tmp_path / ("out_batch" if batch else "out_seq"))
    argv = [
        "deform-seq", mesh_p, rig_p, *rig_frames, "-o", outdir,
        "--secondary", sec_p, "teeth_%04d.obj",
    ]
    if batch:
        argv.append("--batch")
    rc = cli.main(argv)
    assert rc == 0
    import os

    frames = []
    for f in range(3):
        sp = os.path.join(outdir, "teeth_%04d.obj" % f)
        assert os.path.exists(sp)
        frames.append(load_mesh(sp).points)
    # deterministic across paths: stash for cross-mode comparison
    key = "secondary_frames_batch" if batch else "secondary_frames_seq"
    _CROSS[key] = np.stack(frames)
    if len(_CROSS) == 2:
        np.testing.assert_allclose(
            _CROSS["secondary_frames_batch"],
            _CROSS["secondary_frames_seq"], atol=5e-5,
        )

    # bad pattern is rejected up front
    rc = cli.main([
        "deform-seq", mesh_p, rig_p, rig_frames[0], "-o", outdir,
        "--secondary", sec_p, "teeth.obj",
    ])
    assert rc == 1


_CROSS: dict = {}


def test_secondary_pu_plan_cache_retained():
    """Secondary accessories must not thrash the PU plan cache: after a
    cook with one secondary, BOTH plans live (a second cook rebuilds
    neither host KD plan)."""
    from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType

    mesh = uv_sphere(12, 12)
    rest_rig, posed_rig = _rig(60, seed=5)
    sec_in = uv_sphere(6, 6)
    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
        term=PolyTerm.LINEAR, solver="pu",
    )
    node = FaceDeformNode()
    node.cook(
        [mesh, rest_rig, posed_rig], cfg, DeformParams(lam=0.01),
        secondary=[sec_in],
    )
    assert len(node._deformer._plans) == 2
    keys_after_first = list(node._deformer._plans)
    # cache-hit cook: same inputs -> same plans, no eviction
    node.cook(
        [mesh, rest_rig, posed_rig], cfg, DeformParams(lam=0.01),
        secondary=[sec_in],
    )
    assert list(node._deformer._plans) == keys_after_first


def test_batched_frames_growing_kernel_meets_budget(rng):
    """Batched TPS frames eval must match the single-frame PRECISE apply
    within the 5e-5 budget: the f32 frames kernel broke it silently and
    fit_frames dropped the df weight parts (round-5 review)."""
    import jax.numpy as jnp

    from facedeform_tpu.config import (
        DeformConfig, DeformParams, RBFKernel, RBFModelType,
    )
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.parallel import batched

    rest = fibonacci_points(60)
    frames = np.stack([
        rest + 0.04 * rng.standard_normal((60, 3)).astype(np.float32)
        for _ in range(3)
    ])
    cfg = DeformConfig(model=RBFModelType.KERNEL,
                       kernel=RBFKernel.THIN_PLATE)
    params = DeformParams(lam=0.01)
    m, _ = batched.fit_frames(jnp.asarray(rest), jnp.asarray(frames),
                              cfg, params)
    assert m.w_rbf_lo is not None          # df weight bits ride along
    pts = fibonacci_points(400) * 0.9
    out, _ = batched.apply_frames(
        m, jnp.asarray(pts), jnp.zeros(400), jnp.ones(400), cfg, params,
    )
    for f in range(3):
        d = Deformer.fit(rest, frames[f], cfg, params)
        want, _ = d.apply(pts)
        assert np.abs(np.asarray(out[f]) - np.asarray(want)).max() < 5e-5
