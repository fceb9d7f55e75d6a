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


def test_symmetrize_near_plane_marker_snaps_not_duplicates(rng):
    """A marker at plane distance d in (tol/2, tol] must snap onto the
    plane, NOT gain a mirror twin 2d away (a near-duplicate control point
    that makes exact-interpolation systems near-singular)."""
    half = rng.normal(size=(8, 3)).astype(np.float32)
    half[:, 0] = np.abs(half[:, 0]) + 0.5
    rest = np.concatenate(
        [half, half * np.float32([-1, 1, 1]),
         np.float32([[0.02, 0.3, 0.1]])]  # just off the plane
    )
    dfm = rest + 0.05 * rng.normal(size=rest.shape).astype(np.float32)
    tol = 0.03  # > plane distance 0.02, < pair distance 0.04
    r2, d2, _, rep = sym.symmetrize_rig(rest, dfm, "x", tol=tol)
    assert rep.n_on_plane == 1 and rep.n_appended == 0
    assert abs(r2[-1, 0]) < 1e-6  # snapped exactly onto the plane
    # no two markers closer than tol (the near-duplicate hazard)
    d2m = ((r2[:, None] - r2[None]) ** 2).sum(-1)
    np.fill_diagonal(d2m, np.inf)
    assert np.sqrt(d2m.min()) > tol


def test_symmetrize_skips_clashing_mirrors(rng):
    """An unpaired marker whose mirror would land within tol of an
    existing marker is skipped (and reported), not appended as a
    near-duplicate."""
    # A and B both reflect near C; C mutually pairs with A, so B stays
    # unpaired — and B's mirror would land within tol of the snapped C
    rest = np.float32([[1.0, 0.0, 0.0], [1.0, 0.005, 0.0],
                       [-1.0, 0.002, 0.0],
                       [0.5, 1.0, 0.0], [-0.5, 1.0, 0.0]])
    dfm = rest + np.float32([[0, 0.1, 0], [0, 0.12, 0], [0, 0.1, 0],
                             [0, 0.05, 0], [0, 0.05, 0]])
    tol = 0.01
    r2, _, _, rep = sym.symmetrize_rig(rest, dfm, "x", tol=tol)
    assert rep.n_paired == 4 and rep.n_skipped == 1
    # B's clashing mirror was NOT appended (input keeps its 5 markers)
    assert len(r2) == 5


def test_symmetrize_frames_matches_per_frame(rng, jittered_rig):
    rest, dfm = jittered_rig
    frames = np.stack([dfm, rest + 0.5 * (dfm - rest)])
    r2, f2, _, _, rep = sym.symmetrize_frames(rest, frames, "x")
    for i in range(2):
        r1, d1, _, rep1 = sym.symmetrize_rig(rest, frames[i], "x")
        np.testing.assert_allclose(r2, r1, atol=1e-6)
        np.testing.assert_allclose(f2[i], d1, atol=1e-6)
    assert rep.n_paired == rep1.n_paired


def test_symmetrize_carries_confidence(rng, jittered_rig):
    """Confidence rides the closure: pairs take the pair MINIMUM,
    appended copies inherit their source — so symmetrize + confidence
    compose instead of silently dropping the attr."""
    rest, dfm = jittered_rig
    conf = np.ones(len(rest), np.float32)
    conf[0] = 0.01            # low-trust marker in a mirror pair
    conf[-1] = 0.2            # low-trust unpaired marker
    r2, d2, _, conf2, rep = sym.symmetrize_rig_full(
        rest, dfm, "x", confidence=conf
    )
    assert conf2.shape == (len(r2),)
    partner, _, _ = sym.pair_markers(rest, "x")
    j = int(partner[0])
    assert conf2[0] == conf2[j] == np.float32(0.01)  # pair minimum
    assert conf2[-1] == np.float32(0.2)              # appended copy


def test_node_symmetrize_preserves_confidence(rng):
    """cook(symmetrize=...) must keep consuming the rest rig's
    confidence attr (regression: the symmetrized Mesh dropped it)."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.config import RBFModelType

    face = uv_sphere(20, 20)
    half = rng.normal(size=(8, 3)).astype(np.float32)
    half[:, 0] = np.abs(half[:, 0]) * 0.5 + 0.2
    half /= np.linalg.norm(half, axis=1, keepdims=True)
    rig_pts = np.concatenate([half, half * np.float32([-1, 1, 1])])
    dfm = rig_pts + 0.05 * rng.normal(size=rig_pts.shape).astype(np.float32)
    # glitch one marker, zero its confidence
    dfm_bad = dfm.copy()
    dfm_bad[3] += np.float32([0.3, -0.2, 0.2])
    conf = np.ones(len(rig_pts), np.float32)
    conf[3] = 0.001
    rest_rig = Mesh(points=rig_pts)
    rest_rig.set_attr("confidence", conf)
    cfg = DeformConfig(model=RBFModelType.KERNEL)
    p = DeformParams(radius=2.0, lam=0.01, maxedges=50)
    node = FaceDeformNode()
    res = node.cook([face, rest_rig, Mesh(points=dfm_bad)], cfg, p,
                    symmetrize="x")
    # apples to apples: each route compared to ITS clean-pose twin (the
    # confidence route also smooths the low-c pair's true displacement,
    # so the clean reference must carry the same attr)
    rest_rig_clean = Mesh(points=rig_pts)
    rest_rig_clean.set_attr("confidence", conf)
    res_clean = FaceDeformNode().cook(
        [face, rest_rig_clean, Mesh(points=dfm)], cfg, p, symmetrize="x",
    )
    err = np.abs(np.asarray(res.mesh.points)
                 - np.asarray(res_clean.mesh.points)).max()
    res_noconf = FaceDeformNode().cook(
        [face, Mesh(points=rig_pts), Mesh(points=dfm_bad)], cfg, p,
        symmetrize="x",
    )
    res_clean_noconf = FaceDeformNode().cook(
        [face, Mesh(points=rig_pts), Mesh(points=dfm)], cfg, p,
        symmetrize="x",
    )
    err_noconf = np.abs(np.asarray(res_noconf.mesh.points)
                        - np.asarray(res_clean_noconf.mesh.points)).max()
    assert err < 0.3 * err_noconf


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


def test_mirror_map_mutuality_keeps_projection_idempotent(rng):
    """Non-involutive nearest matches (one side sampled denser) must be
    dropped: without mutuality symmetrize_displacement is not the
    orthogonal projection its contract promises (round-5 review)."""
    from facedeform_tpu.ops.symmetry import (
        mirror_map, symmetrize_displacement,
    )

    # right half dense, left half sparse: several right vertices share a
    # nearest left partner, so raw nearest-matching is not involutive
    right = rng.uniform(0.05, 1.0, (120, 3)).astype(np.float32)
    left = rng.uniform(0.05, 1.0, (30, 3)).astype(np.float32)
    left[:, 0] *= -1.0
    pts = np.concatenate([right, left])
    idx, ok = mirror_map(pts, "x", tol=0.5)
    # the map restricted to ok vertices is involutive by construction
    v = np.arange(len(pts))
    assert np.all(idx[idx[ok]] == v[ok])
    d = rng.standard_normal((len(pts), 3)).astype(np.float32)
    once = symmetrize_displacement(d, idx, ok, "x")
    twice = symmetrize_displacement(once, idx, ok, "x")
    np.testing.assert_allclose(twice, once, atol=1e-6)
    assert np.linalg.norm(once) <= np.linalg.norm(d) + 1e-5


def test_inverse_fit_rig_rejects_krylov_scale():
    """fit_rig refuses Krylov-scale / Krylov-forced configs with a clear
    error instead of an OOM or a while_loop AD crash (round-5 review)."""
    import pytest

    from facedeform_tpu import DeformConfig, DeformParams, inverse

    rest = np.zeros((8200 + 5, 3), np.float32)  # > dense limit
    with pytest.raises(ValueError, match="dense solve route"):
        inverse.fit_rig(rest, rest[:10], rest[:10],
                        DeformConfig(), DeformParams())
