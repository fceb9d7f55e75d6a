"""Symmetry utilities (ops/symmetry.py) — a capability beyond the
reference (which packs the rig verbatim, src/SOP_FaceDeform.cpp:268-287).

The load-bearing claim is mathematical: a rig closed under the reflection
(x, d) -> (Rx, Rd) induces an RBF field with f(Rx) = R f(x) for every
kernel family (distances commute with reflections) and polynomial tail.
The tests pin that end to end, plus the pairing/enforcement mechanics and
the node/CLI integration.
"""

from __future__ import annotations

import numpy as np
import pytest

from facedeform_tpu.config import DeformConfig, DeformParams, RBFKernel, RBFModelType
from facedeform_tpu.ops import symmetry as sym


@pytest.fixture
def jittered_rig(rng):
    """x-symmetric 2x12 rig with f32 jitter + 1 on-plane + 1 unpaired."""
    half = rng.normal(size=(12, 3)).astype(np.float32)
    half[:, 0] = np.abs(half[:, 0]) + 0.2
    mirror = half * np.float32([-1, 1, 1])
    mirror += 1e-4 * rng.normal(size=mirror.shape).astype(np.float32)
    on_plane = np.array([[0.0, 0.5, 0.3]], np.float32)
    lone = np.array([[0.8, -0.9, 0.1]], np.float32)
    rest = np.concatenate([half, mirror, on_plane, lone])
    disp = 0.1 * rng.normal(size=rest.shape).astype(np.float32)
    return rest, rest + disp


def test_reflection_matrix_involution():
    for plane in ("x", "y", "z", (0.3, 0.4, 0.5)):
        r = sym.reflection_matrix(plane)
        np.testing.assert_allclose(r @ r, np.eye(3), atol=1e-12)
        assert np.linalg.det(r) == pytest.approx(-1.0)


def test_reflect_points_offset_plane():
    pts = np.array([[2.0, 1.0, 0.0]], np.float32)
    out = sym.reflect_points(pts, ((1.0, 0.0, 0.0), (1.0, 0.0, 0.0)))
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-6)


def test_pair_markers_classifies(jittered_rig):
    rest, _ = jittered_rig
    partner, on_plane, tol = sym.pair_markers(rest, "x")
    n = len(rest)
    assert partner.shape == (n,)
    # the 24 mirrored markers pair up, the on-plane marker self-pairs,
    # the lone marker stays unpaired
    assert int(((partner >= 0) & ~on_plane).sum()) == 24
    assert int(on_plane.sum()) == 1
    assert int((partner < 0).sum()) == 1
    # mutuality: pairing is an involution where defined
    ok = partner >= 0
    np.testing.assert_array_equal(partner[partner[ok]], np.arange(n)[ok])


def test_symmetrize_rig_closure(jittered_rig):
    """Reflecting (rest', disp') permutes the marker set exactly."""
    rest, dfm = jittered_rig
    r2, d2, _, rep = sym.symmetrize_rig(rest, dfm, "x")
    assert rep.n_paired == 24 and rep.n_on_plane == 1 and rep.n_appended == 1
    assert rep.max_asymmetry > 0  # the jittered pose was asymmetric
    r_mat = sym.reflection_matrix("x")
    refl_rest = r2 @ r_mat.T
    disp = d2 - r2
    # each reflected marker must coincide with some marker carrying the
    # reflected displacement
    d2_pair = ((refl_rest[:, None] - r2[None]) ** 2).sum(-1)
    idx = np.argmin(d2_pair, axis=1)
    assert np.sqrt(d2_pair[np.arange(len(r2)), idx]).max() < 1e-5
    np.testing.assert_allclose(disp @ r_mat.T, disp[idx], atol=1e-5)


def test_symmetrize_rig_idempotent(jittered_rig):
    rest, dfm = jittered_rig
    r2, d2, _, _ = sym.symmetrize_rig(rest, dfm, "x")
    r3, d3, _, rep = sym.symmetrize_rig(r2, d2, "x")
    assert rep.n_appended == 0
    assert rep.max_asymmetry < 1e-6
    np.testing.assert_allclose(r3, r2, atol=1e-6)
    np.testing.assert_allclose(d3, d2, atol=1e-6)


def test_symmetrize_rig_carries_classes(jittered_rig):
    rest, dfm = jittered_rig
    classes = (np.arange(len(rest)) % 3).astype(np.int32)
    _, _, cls2, rep = sym.symmetrize_rig(rest, dfm, "x", classes=classes)
    assert len(cls2) == len(rest) + rep.n_appended
    # appended copies carry their source's class
    assert cls2[-1] == classes[-1]


@pytest.mark.parametrize("model,kernel", [
    (RBFModelType.QNN, None),
    (RBFModelType.MULTILAYER, None),
    (RBFModelType.KERNEL, RBFKernel.THIN_PLATE),
    (RBFModelType.KERNEL, RBFKernel.WENDLAND_C2),
])
def test_field_commutes_with_reflection(rng, jittered_rig, model, kernel):
    """The headline property: f(Rx) = R f(x) after symmetrize_rig, for
    every family (distances + tails commute with reflections)."""
    from facedeform_tpu import Deformer

    rest, dfm = jittered_rig
    r2, d2, _, _ = sym.symmetrize_rig(rest, dfm, "x")
    cfg = DeformConfig(model=model, **({"kernel": kernel} if kernel else {}))
    d = Deformer.fit(r2, d2, cfg, DeformParams(radius=1.0))
    q = rng.normal(size=(400, 3)).astype(np.float32)
    r_mat = np.float32(sym.reflection_matrix("x"))
    disp_q = np.asarray(d.apply(q)[0]) - q
    q_m = q @ r_mat.T
    disp_m = np.asarray(d.apply(q_m)[0]) - q_m
    scale = max(np.abs(disp_q).max(), 1e-6)
    assert np.abs(disp_m - disp_q @ r_mat.T).max() / scale < 5e-5


def test_mirror_map_and_projection(rng, jittered_rig):
    rest, _ = jittered_rig
    pts = np.concatenate([rest[:24], rest[24:25]])  # symmetric subset
    idx, ok = sym.mirror_map(pts, "x")
    assert ok.all()
    d = rng.normal(size=pts.shape).astype(np.float32)
    s = sym.symmetrize_displacement(d, idx, ok, "x")
    a = sym.symmetrize_displacement(d, idx, ok, "x", part="antisymmetric")
    # orthogonal projection: idempotent, complementary, contractive
    np.testing.assert_allclose(
        sym.symmetrize_displacement(s, idx, ok, "x"), s, atol=1e-6
    )
    np.testing.assert_allclose(s + a, d, atol=1e-6)
    assert np.linalg.norm(s) <= np.linalg.norm(d) + 1e-6
    assert sym.symmetry_error(s, idx, ok, "x") < 1e-6
    assert sym.symmetry_error(d, idx, ok, "x") > 0.1


def test_unmatched_vertices_pass_through(rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32) + np.float32([5, 0, 0])
    idx, ok = sym.mirror_map(pts, "x")  # reflections land far away
    assert not ok.any()
    d = rng.normal(size=pts.shape).astype(np.float32)
    np.testing.assert_allclose(
        sym.symmetrize_displacement(d, idx, ok, "x"), d, atol=0
    )


def test_plane_spec_validation():
    with pytest.raises(ValueError):
        sym.reflection_matrix("w")
    with pytest.raises(ValueError):
        sym.reflection_matrix((0.0, 0.0, 0.0))
    with pytest.raises(ValueError):
        sym.symmetrize_displacement(
            np.zeros((2, 3)), np.arange(2), np.ones(2, bool), "x",
            part="bogus",
        )


def test_node_cook_symmetrize(rng):
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    face = uv_sphere(40, 40)
    half = rng.normal(size=(10, 3)).astype(np.float32)
    half[:, 0] = np.abs(half[:, 0]) * 0.5 + 0.2
    half /= np.linalg.norm(half, axis=1, keepdims=True)
    rig_pts = np.concatenate([half, half * np.float32([-1, 1, 1])])
    disp = 0.1 * rng.normal(size=rig_pts.shape).astype(np.float32)
    rest_rig = Mesh(points=rig_pts)
    dfm_rig = Mesh(points=rig_pts + disp)

    node = FaceDeformNode()
    res = node.cook(
        [face, rest_rig, dfm_rig], DeformConfig(),
        DeformParams(radius=2.0, maxedges=50), symmetrize="x",
    )
    assert any("symmetrize" in m for m in res.messages)
    idx, ok = sym.mirror_map(face.points, "x")
    d = np.asarray(res.mesh.points) - face.points
    assert ok.all()
    assert sym.symmetry_error(d, idx, ok, "x") < 5e-6
    # cache: a re-cook with unchanged inputs keeps the fit key (the
    # symmetrized rigs are cached Mesh objects with stable data ids)
    k1 = node._fit_key
    node.cook(
        [face, rest_rig, dfm_rig], DeformConfig(),
        DeformParams(radius=2.0, maxedges=50), symmetrize="x",
    )
    assert node._fit_key == k1


def test_cli_symmetrize(tmp_path, rng):
    from facedeform_tpu import cli
    from facedeform_tpu.geometry import save_mesh
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere

    face = uv_sphere(24, 24)
    half = rng.normal(size=(8, 3)).astype(np.float32)
    half[:, 0] = np.abs(half[:, 0]) * 0.5 + 0.2
    half /= np.linalg.norm(half, axis=1, keepdims=True)
    rig = np.concatenate([half, half * np.float32([-1, 1, 1])])
    dfm = rig + 0.1 * rng.normal(size=rig.shape).astype(np.float32)

    p_mesh = str(tmp_path / "mesh.obj")
    p_rest = str(tmp_path / "rest.obj")
    p_dfm = str(tmp_path / "dfm.obj")
    p_out = str(tmp_path / "out.obj")
    save_mesh(p_mesh, face)
    save_mesh(p_rest, Mesh(points=rig))
    save_mesh(p_dfm, Mesh(points=dfm))

    rc = cli.main([
        "deform", p_mesh, p_rest, p_dfm, "-o", p_out,
        "--radius", "2.0", "--maxedges", "50", "--symmetrize", "x",
    ])
    assert rc == 0
    from facedeform_tpu.geometry import load_mesh

    out = load_mesh(p_out)
    d = out.points - face.points
    idx, ok = sym.mirror_map(face.points, "x")
    assert sym.symmetry_error(d, idx, ok, "x") < 5e-6


def test_cli_seq_symmetrize_batch(tmp_path, rng):
    from facedeform_tpu import cli
    from facedeform_tpu.geometry import load_mesh, save_mesh
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere

    face = uv_sphere(20, 20)
    half = rng.normal(size=(6, 3)).astype(np.float32)
    half[:, 0] = np.abs(half[:, 0]) * 0.5 + 0.2
    half /= np.linalg.norm(half, axis=1, keepdims=True)
    rig = np.concatenate([half, half * np.float32([-1, 1, 1])])
    disp = 0.1 * rng.normal(size=rig.shape).astype(np.float32)

    p_mesh = str(tmp_path / "mesh.obj")
    p_rest = str(tmp_path / "rest.obj")
    save_mesh(p_mesh, face)
    save_mesh(p_rest, Mesh(points=rig))
    frame_paths = []
    for f, t in enumerate((0.5, 1.0)):
        p = str(tmp_path / f"pose{f}.obj")
        save_mesh(p, Mesh(points=rig + t * disp))
        frame_paths.append(p)
    outdir = str(tmp_path / "out")

    rc = cli.main([
        "deform-seq", p_mesh, p_rest, *frame_paths, "-o", outdir,
        "--batch", "--radius", "2.0", "--maxedges", "50",
        "--symmetrize", "x",
    ])
    assert rc == 0
    idx, ok = sym.mirror_map(face.points, "x")
    for f in range(2):
        out = load_mesh(f"{outdir}/frame_{f:04d}.obj")
        d = out.points - face.points
        assert sym.symmetry_error(d, idx, ok, "x") < 5e-6
