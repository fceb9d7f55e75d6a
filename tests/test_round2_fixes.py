"""Round-2 regression tests: off-origin precision, param clamps, cache
refresh semantics, -1-padded faces, named point groups (ADVICE.md +
VERDICT.md items)."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from facedeform_tpu.cli import main as cli_main
from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.obj_io import load_obj, save_obj
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.geometry.topology import mesh_adjacency, unique_edges
from facedeform_tpu.node import FaceDeformNode
from facedeform_tpu.ops.kernels import pairwise_sqdist


# --------------------------------------------------------- off-origin parity
def test_pairwise_sqdist_off_origin(rng):
    """The old ||x||^2+||y||^2-2x.y form lost ~1e-2 absolute d2 accuracy at
    |x| ~ 100 (ADVICE.md high); exact differences must stay ~1e-5."""
    offset = np.float32([100.0, -250.0, 80.0])
    x = (rng.standard_normal((64, 3)).astype(np.float32) + offset)
    y = (rng.standard_normal((48, 3)).astype(np.float32) + offset)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = np.sum((x.astype(np.float64)[:, None] - y.astype(np.float64)[None]) ** 2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_deform_off_origin_parity(rng):
    """End-to-end displacement parity vs the f64 oracle for a rig far from
    the origin (production heads are rarely centered)."""
    offset = np.float32([100.0, 100.0, 100.0])
    rest = fibonacci_points(80) + offset
    deformed = rest + 0.03 * rng.standard_normal((80, 3)).astype(np.float32)
    pts = (rng.standard_normal((500, 3)).astype(np.float32) * 0.8 + offset)
    cfg, params = DeformConfig(), DeformParams()
    d = Deformer.fit(rest, deformed, cfg, params)
    got, _ = d.apply(pts)
    want, _ = oracle.deform(rest, deformed, pts, cfg, params)
    err = np.abs(np.asarray(got, np.float64) - want).max()
    assert err < 5e-5, f"off-origin displacement error {err:.2e}"


# ------------------------------------------------------------- param clamps
def test_falloffrate_clamped_nonnegative():
    p = DeformParams(falloffrate=-2.0).clamped()
    assert float(p.falloffrate) == 0.0


def test_negative_falloffrate_stays_finite(rng):
    """A vertex exactly at d2 == radius^2 with a negative rate used to
    produce 0^negative = inf (ADVICE.md)."""
    rest = fibonacci_points(30)
    deformed = rest * 1.05
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    params = DeformParams(radius=1.0, falloffrate=-1.5)
    d = Deformer.fit(rest, deformed, DeformConfig(), params)
    dist2 = np.full(64, 1.0, np.float32)  # exactly at the cutoff
    out, w = d.apply(pts, dist2=dist2)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(w)).all()


# ------------------------------------------------- solve cache + eval knobs
def _node_inputs(rng):
    mesh = uv_sphere(20, 20)
    rig = Mesh(points=fibonacci_points(20))
    drig = Mesh(points=rig.points * 1.1)
    return mesh, rig, drig


def test_eval_only_knobs_reuse_solve_but_take_effect(rng):
    """Changing falloffrate must not re-run the solve (ADVICE.md: key on
    solve_view) yet MUST change the falloff the eval applies (stale-params
    bug)."""
    mesh, rig, drig = _node_inputs(rng)
    cfg = DeformConfig(dofalloff=True)
    node = FaceDeformNode()
    r1 = node.cook([mesh, rig, drig], cfg, DeformParams(falloffrate=1.0))
    model1 = node._deformer.model
    r2 = node.cook([mesh, rig, drig], cfg, DeformParams(falloffrate=2.0))
    # solved model reused (identity), no re-fit
    assert node._deformer.model is model1
    f1 = r1.mesh.point_attrs["fd_falloff"]
    f2 = r2.mesh.point_attrs["fd_falloff"]
    mid = (f1 > 0.05) & (f1 < 0.95)
    assert mid.any()
    np.testing.assert_allclose(f2[mid], f1[mid] ** 2, atol=1e-5)


def test_eval_only_cfg_toggle_reuses_solve(rng):
    mesh, rig, drig = _node_inputs(rng)
    node = FaceDeformNode()
    node.cook([mesh, rig, drig], DeformConfig())
    model1 = node._deformer.model
    node.cook([mesh, rig, drig], DeformConfig(dofalloff=True))
    assert node._deformer.model is model1  # dofalloff is eval-view only


# --------------------------------------------------- degenerate-rig failure
def test_duplicate_markers_fail_through_node(rng):
    """Coincident control points make the interpolation system singular;
    the reference hard-fails via ALGLIB terminationtype != 1
    (src/SOP_FaceDeform.cpp:363-368) — the rebuild raises SolveFailedError
    from the backward-error health check."""
    from facedeform_tpu.utils.errors import SolveFailedError

    mesh, rig, drig = _node_inputs(rng)
    pts = rig.points.copy()
    pts[3] = pts[0]  # exact duplicate marker
    bad_rig = Mesh(points=pts)
    bad_drig = Mesh(points=pts + 0.05 * rng.standard_normal(pts.shape).astype(np.float32))
    with pytest.raises(SolveFailedError, match="backward error"):
        FaceDeformNode().cook([mesh, bad_rig, bad_drig])


def test_collinear_markers_stay_solvable(rng):
    """Collinear rigs make the LINEAR polynomial tail rank-deficient; the
    quasi-definite tail regularization keeps the saddle system solvable
    (documented deviation, PARITY.md) with a healthy backward error."""
    mesh, _, _ = _node_inputs(rng)
    t = np.linspace(-1, 1, 25, dtype=np.float32)
    rig = Mesh(points=np.stack([t, 2 * t, 3 * t], 1))
    drig = Mesh(points=rig.points + 0.05 * rng.standard_normal((25, 3)).astype(np.float32))
    res = FaceDeformNode().cook([mesh, rig, drig])
    assert np.isfinite(res.mesh.points).all()
    assert any("backward error" in m for m in res.messages)


# --------------------------------------------------------- -1-padded faces
def test_padded_faces_adjacency_and_triangles():
    pts = np.eye(4, 3, dtype=np.float32) * [[1], [1], [1], [0.5]]
    pts = np.concatenate([pts, [[1, 1, 0]]], 0).astype(np.float32)
    faces = np.array([[0, 1, 2, -1], [1, 2, 3, 4]], np.int32)  # mixed arity
    mesh = Mesh(points=pts, faces=faces)
    tris = mesh.triangles()
    assert (tris >= 0).all()
    e = unique_edges(faces)
    assert (e >= 0).all()
    indptr, indices = mesh_adjacency(mesh)  # native path must not corrupt
    assert indptr[-1] == len(indices)
    assert (indices >= 0).all() and (indices < mesh.num_points).all()


# ------------------------------------------------------- named point groups
def test_named_group_restricts_deform(rng):
    mesh, rig, drig = _node_inputs(rng)
    mask = mesh.points[:, 1] > 0.0
    mesh.set_group("upper", mask)
    res = FaceDeformNode().cook([mesh, rig, drig], group="upper")
    moved = np.linalg.norm(res.mesh.points - mesh.points, axis=1)
    assert (moved[~mask] == 0).all()
    assert moved[mask].max() > 1e-3
    # equivalent to passing the raw mask
    res2 = FaceDeformNode().cook([mesh, rig, drig], group_mask=mask)
    np.testing.assert_array_equal(res.mesh.points, res2.mesh.points)


def test_named_group_unknown_raises(rng):
    mesh, rig, drig = _node_inputs(rng)
    with pytest.raises(KeyError, match="no point group"):
        FaceDeformNode().cook([mesh, rig, drig], group="nope")
    with pytest.raises(ValueError, match="not both"):
        FaceDeformNode().cook(
            [mesh, rig, drig], group="x",
            group_mask=np.ones(mesh.num_points, bool),
        )


def test_group_from_indices_and_sidecar_roundtrip(tmp_path):
    mesh = uv_sphere(10, 10)
    mesh.set_group("tip", np.array([0, 1, 2]))  # index form
    assert mesh.group_mask("tip").sum() == 3
    save_obj(str(tmp_path / "m.obj"), mesh)
    back = load_obj(str(tmp_path / "m.obj"))
    np.testing.assert_array_equal(back.group_mask("tip"), mesh.group_mask("tip"))
    # copy() carries groups
    assert mesh.copy().group_mask("tip").sum() == 3


def test_cli_group_flag(tmp_path, rng):
    mesh = uv_sphere(16, 16)
    mask = mesh.points[:, 1] > 0.2
    mesh.set_group("upper", mask)
    rig = Mesh(points=fibonacci_points(20))
    drig = Mesh(points=rig.points * 1.15)
    for name, m in [("mesh", mesh), ("rig", rig), ("drig", drig)]:
        save_obj(str(tmp_path / f"{name}.obj"), m)
    rc = cli_main([
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "-o", str(tmp_path / "out.obj"),
        "--group", "upper",
    ])
    assert rc == 0
    out = load_obj(str(tmp_path / "out.obj"))
    moved = np.linalg.norm(out.points - mesh.points, axis=1)
    assert (moved[~mask] < 1e-7).all()
    assert moved[mask].max() > 1e-3
    # unknown group: clean CLI error, not a traceback
    rc = cli_main([
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "-o", str(tmp_path / "out2.obj"),
        "--group", "nope",
    ])
    assert rc == 1


def test_obj_g_statement_groups(tmp_path):
    """`g` statements in standard OBJ exports become named point groups
    (no sidecar needed); group-free files keep the fast native scan."""
    from facedeform_tpu.geometry.obj_io import _file_has_groups, load_obj

    p = tmp_path / "grouped.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nv 2 0 0\nv 2 1 0\n"
        "g left\nf 1 2 3\nf 2 4 3\n"
        "g right extra\nf 2 5 4\nf 5 6 4\n"
        "g\nf 1 3 4\n"
    )
    assert _file_has_groups(str(p))
    mesh = load_obj(str(p))
    left = mesh.group_mask("left")
    right = mesh.group_mask("right")
    extra = mesh.group_mask("extra")
    np.testing.assert_array_equal(left, [True, True, True, True, False, False])
    np.testing.assert_array_equal(right, [False, True, False, True, True, True])
    np.testing.assert_array_equal(right, extra)  # multi-name g statement
    assert mesh.num_points == 6 and len(mesh.faces) == 5

    # group-free file: native fast path, no groups
    q = tmp_path / "plain.obj"
    q.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert not _file_has_groups(str(q))
    assert load_obj(str(q)).point_groups == {}


def test_node_backend_choice_never_f32_for_growing_kernels(rng, monkeypatch):
    """Review regression: _choose_backend must defer growing kernels to
    apply's 'auto' (the double-float path), never route them to the f32
    Pallas kernel — that silently breaks the 5e-5 budget."""
    import jax

    from facedeform_tpu.config import RBFKernel, RBFModelType

    mesh = uv_sphere(80, 80)  # past the 4096 autotune threshold
    rig = Mesh(points=fibonacci_points(30))
    drig = Mesh(points=rig.points * 1.1)
    node = FaceDeformNode()
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE)
    params = DeformParams(radius=1.0, lam=0.01)
    # fit a deformer so _choose_backend can inspect the kernel
    node.cook([mesh, rig, drig], cfg, params)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    choice = node._choose_backend(
        mesh, node._deformer, mesh.points, None, None, None
    )
    assert choice == "auto"


def test_set_group_full_length_index_array(rng):
    """Review regression: an integer index array whose length equals V is
    still an index list, not a mask."""
    mesh = uv_sphere(10, 10)
    v = mesh.num_points
    mesh.set_group("all", np.arange(v))
    assert mesh.group_mask("all").all()
    with pytest.raises(ValueError, match="out of range"):
        mesh.set_group("bad", np.array([0, v]))
