"""General attribute transport: vectors by F, quaternions by polar(F).

The reference copies every non-P point attribute through untouched
(src/SOP_FaceDeform.cpp:438 writes positions only); these cover the
rebuild's closed-form transport extension (ops/jacobian.py)."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from facedeform_tpu.config import (
    DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType,
)
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops.jacobian import (
    polar_rotation, quaternion_from_rotation, quaternion_multiply,
    transform_quaternions, transform_vectors, infer_attr_kind,
)


def _rot(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = np.cos(ang), np.sin(ang)
    k = np.asarray([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return (np.eye(3) + s * k + (1 - c) * k @ k).astype(np.float32)


def _quat_to_mat(q):
    """(x, y, z, w) unit quaternion -> rotation matrix (numpy oracle)."""
    x, y, z, w = q
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def test_polar_rotation_recovers_rotation(rng):
    rots = np.stack([
        _rot(rng.standard_normal(3), a)
        for a in rng.uniform(-3.0, 3.0, size=16)
    ])
    # SPD stretch with eigenvalues in [0.4, 2.5]
    f = np.empty_like(rots)
    for i in range(len(rots)):
        b = _rot(rng.standard_normal(3), rng.uniform(0, 3))
        s = b @ np.diag(rng.uniform(0.4, 2.5, 3).astype(np.float32)) @ b.T
        f[i] = rots[i] @ s
    got = np.asarray(polar_rotation(jnp.asarray(f)))
    assert np.abs(got - rots).max() < 1e-4
    # orthogonality regardless
    rtr = np.einsum("vba,vbc->vac", got, got)
    assert np.abs(rtr - np.eye(3)).max() < 1e-5


def test_polar_rotation_degenerate_is_identity():
    f = np.zeros((3, 3, 3), np.float32)
    f[1] = -np.eye(3)                      # reflection: det < 0
    f[2, 0, 0] = 1.0                       # rank-1 collapse
    got = np.asarray(polar_rotation(jnp.asarray(f)))
    np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (3, 3, 3)))


def test_quaternion_from_rotation_roundtrip(rng):
    q = rng.standard_normal((64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q *= np.where(q[:, 3:4] < 0, -1.0, 1.0)           # canonical w >= 0
    mats = np.stack([_quat_to_mat(qi) for qi in q])
    got = np.asarray(quaternion_from_rotation(jnp.asarray(mats)))
    assert np.abs(got - q).max() < 1e-5


def test_quaternion_multiply_matches_matrix_compose(rng):
    qa = rng.standard_normal(4).astype(np.float32)
    qb = rng.standard_normal(4).astype(np.float32)
    qa, qb = qa / np.linalg.norm(qa), qb / np.linalg.norm(qb)
    qc = np.asarray(quaternion_multiply(jnp.asarray(qa), jnp.asarray(qb)))
    np.testing.assert_allclose(
        _quat_to_mat(qc), _quat_to_mat(qa) @ _quat_to_mat(qb), atol=2e-6
    )


def _rigid_deformer(r_mat):
    rest = fibonacci_points(40)
    return Deformer.fit(
        rest, rest @ r_mat.T,
        DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                     solver="direct", term=PolyTerm.LINEAR),
        DeformParams(radius=1.0, lam=0.01),
    )


def test_transform_attrs_rigid_rotation(rng):
    """Rigidly rotated rig: vectors rotate by R, quats compose with R,
    all through Deformer.transform_attrs' one shared Jacobian."""
    r_mat = _rot([0.3, 1.0, 0.2], 0.5)
    d = _rigid_deformer(r_mat)
    pts = fibonacci_points(50)
    v = rng.standard_normal((50, 3)).astype(np.float32)
    q = rng.standard_normal((50, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w = np.ones(50, np.float32)
    out = d.transform_attrs(pts, {"v": v, "orient": q, "N": pts}, w)
    assert set(out) == {"v", "orient", "N"}
    assert np.abs(np.asarray(out["v"]) - v @ r_mat.T).max() < 5e-3
    qr = np.asarray(quaternion_from_rotation(jnp.asarray(r_mat[None])))[0]
    want_q = np.asarray(
        quaternion_multiply(jnp.asarray(qr)[None], jnp.asarray(q))
    )
    got_q = np.asarray(out["orient"])
    # quats are sign-ambiguous: compare rotations
    flip = np.where(np.sum(got_q * want_q, 1, keepdims=True) < 0, -1.0, 1.0)
    assert np.abs(got_q * flip - want_q).max() < 5e-3
    assert np.abs(np.asarray(out["N"]) - pts @ r_mat.T).max() < 5e-3


def test_transform_attrs_stretch_semantics():
    """x -> 1.5 x: vectors scale by 1.5, quaternions stay put (stretch
    is discarded by the polar factor), normals keep direction."""
    rest = fibonacci_points(40)
    d = Deformer.fit(
        rest, (1.5 * rest).astype(np.float32),
        DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                     solver="direct", term=PolyTerm.LINEAR),
        DeformParams(radius=1.0, lam=0.01),
    )
    pts = fibonacci_points(30)
    v = pts.copy()
    q = np.tile(np.float32([0, 0, 0, 1]), (30, 1))
    out = d.transform_attrs(pts, {"v": v, "orient": q}, np.ones(30, np.float32))
    assert np.abs(np.asarray(out["v"]) - 1.5 * v).max() < 2e-2
    assert np.abs(np.asarray(out["orient"]) - q).max() < 5e-3


def test_infer_attr_kind():
    assert infer_attr_kind("N", np.zeros((5, 3))) == "normal"
    assert infer_attr_kind("v", np.zeros((5, 3))) == "vector"
    assert infer_attr_kind("orient", np.zeros((5, 4))) == "quaternion"
    assert infer_attr_kind("pscale", np.zeros(5)) is None
    assert infer_attr_kind("uv", np.zeros((5, 2))) is None


def test_node_transform_attrs(rng):
    """cook(transform_attrs=...) rewrites v/orient; unknown or
    untransportable attrs warn and are left untouched."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    r_mat = _rot([0, 0, 1], 0.4)
    mesh = uv_sphere(10, 10)
    vcount = mesh.num_points
    v = rng.standard_normal((vcount, 3)).astype(np.float32)
    mesh.set_attr("v", v)
    mesh.set_attr("pscale", np.ones(vcount, np.float32))
    rig0 = Mesh(points=fibonacci_points(40))
    rig1 = Mesh(points=(rig0.points @ r_mat.T).astype(np.float32))
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                       solver="direct", term=PolyTerm.LINEAR)
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], cfg, DeformParams(radius=1.0, lam=0.01),
        transform_attrs=("v", "pscale", "ghost"),
    )
    assert np.abs(res.mesh.attr("v") - v @ r_mat.T).max() < 1e-2
    np.testing.assert_allclose(res.mesh.attr("pscale"), 1.0)  # untouched
    assert any("ghost" in w for w in res.warnings)
    assert any("pscale" in w for w in res.warnings)


def test_node_transform_attrs_shares_pass_with_update_normals(rng):
    """update_normals + transform_attrs ride one transport pass; N uses
    the cofactor rule even when also named in transform_attrs."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    r_mat = _rot([1, 0, 0], 0.3)
    mesh = uv_sphere(8, 8)
    n_attr = (mesh.points / np.linalg.norm(
        mesh.points, axis=1, keepdims=True)).astype(np.float32)
    mesh.set_attr("N", n_attr)
    rig0 = Mesh(points=fibonacci_points(40))
    rig1 = Mesh(points=(rig0.points @ r_mat.T).astype(np.float32))
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                       solver="direct", term=PolyTerm.LINEAR)
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], cfg, DeformParams(radius=1.0, lam=0.01),
        update_normals=True, transform_attrs=("N",),
    )
    assert np.abs(res.mesh.attr("N") - n_attr @ r_mat.T).max() < 1e-2


def test_pu_transform_attrs(rng):
    """solver='pu' cooks transport attrs through the PU Jacobian."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    mesh = uv_sphere(10, 10)
    vcount = mesh.num_points
    v = rng.standard_normal((vcount, 3)).astype(np.float32)
    mesh.set_attr("v", v)
    rig0 = Mesh(points=fibonacci_points(48))
    rig1 = Mesh(points=(1.25 * rig0.points).astype(np.float32))
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], DeformConfig(solver="pu", term=PolyTerm.LINEAR),
        DeformParams(lam=0.01), transform_attrs=("v",),
    )
    assert np.abs(res.mesh.attr("v") - 1.25 * v).max() < 3e-2


def test_principal_stretches_matches_svd(rng):
    """Closed-form trig eigenvalues of F^T F vs numpy SVD, descending."""
    from facedeform_tpu.ops.jacobian import principal_stretches

    f = rng.standard_normal((32, 3, 3)).astype(np.float32)
    f += 2.0 * np.eye(3, dtype=np.float32)        # keep well-posed
    got = np.asarray(principal_stretches(jnp.asarray(f)))
    want = np.linalg.svd(f.astype(np.float64), compute_uv=False)
    assert np.abs(got - want).max() < 1e-4
    # isotropic row: p = 0 branch
    iso = np.broadcast_to(1.7 * np.eye(3, dtype=np.float32), (1, 3, 3))
    got_iso = np.asarray(principal_stretches(jnp.asarray(iso)))
    np.testing.assert_allclose(got_iso, 1.7, atol=1e-5)


def test_deformer_principal_stretches_rigid_and_scaled(rng):
    """Rigid rotation -> (1,1,1); uniform 1.4 scale -> (1.4,)*3."""
    r_mat = _rot([0.2, 1.0, -0.3], 0.6)
    d = _rigid_deformer(r_mat)
    pts = fibonacci_points(30)
    sig = np.asarray(d.principal_stretches(pts, np.ones(30, np.float32)))
    assert np.abs(sig - 1.0).max() < 5e-3

    rest = fibonacci_points(40)
    ds = Deformer.fit(
        rest, (1.4 * rest).astype(np.float32),
        DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                     solver="direct", term=PolyTerm.LINEAR),
        DeformParams(radius=1.0, lam=0.01),
    )
    sig = np.asarray(ds.principal_stretches(pts, np.ones(30, np.float32)))
    assert np.abs(sig - 1.4).max() < 2e-2


def test_node_output_stretch(rng):
    """cook(output_stretch=True) writes fd_stretch/fd_compress; a uniform
    1.3x scale gives ~1.3 everywhere, and the PU route agrees."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    mesh = uv_sphere(10, 10)
    rig0 = Mesh(points=fibonacci_points(48))
    rig1 = Mesh(points=(1.3 * rig0.points).astype(np.float32))
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                       solver="direct", term=PolyTerm.LINEAR)
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], cfg, DeformParams(radius=1.0, lam=0.01),
        output_stretch=True,
    )
    s = res.mesh.attr("fd_stretch")
    c = res.mesh.attr("fd_compress")
    assert np.abs(s - 1.3).max() < 3e-2
    assert np.abs(c - 1.3).max() < 3e-2
    assert (s >= c - 1e-5).all()

    res_pu = FaceDeformNode().cook(
        [mesh, rig0, rig1], DeformConfig(solver="pu", term=PolyTerm.LINEAR),
        DeformParams(lam=0.01), output_stretch=True,
    )
    assert np.abs(res_pu.mesh.attr("fd_stretch") - 1.3).max() < 5e-2


def test_polar_rotation_pinched_converges(rng):
    """Regression (round-3 review): det-scaled Newton must stay orthogonal
    for strongly anisotropic F — plain Newton stalled at a 1e-4
    singular-value ratio (0.16 orthogonality error) and diverged at 1e-5
    while passing the det>1e-12 guard."""
    for smin in (1e-3, 1e-4, 1e-5, 1e-6):
        rots, fs = [], []
        for _ in range(8):
            r = _rot(rng.standard_normal(3), rng.uniform(-3, 3))
            b = _rot(rng.standard_normal(3), rng.uniform(0, 3))
            s = b @ np.diag([1.5, 1.0, smin]).astype(np.float32) @ b.T
            rots.append(r)
            fs.append((r @ s).astype(np.float32))
        got = np.asarray(polar_rotation(jnp.asarray(np.stack(fs))))
        rtr = np.einsum("vba,vbc->vac", got, got)
        assert np.abs(rtr - np.eye(3)).max() < 1e-4, f"smin={smin}"
        assert np.abs(got - np.stack(rots)).max() < 1e-4, f"smin={smin}"


def test_transport_attrs_want_stretch_single_pass(rng):
    """transform_attrs(want_stretch=True) returns (attrs, stretches) off
    one Jacobian — matching the separate principal_stretches call."""
    r_mat = _rot([0.1, 0.9, 0.4], 0.7)
    d = _rigid_deformer(r_mat)
    pts = fibonacci_points(30)
    w = np.ones(30, np.float32)
    v = rng.standard_normal((30, 3)).astype(np.float32)
    moved, sig = d.transform_attrs(pts, {"v": v}, w, want_stretch=True)
    np.testing.assert_allclose(
        np.asarray(sig), np.asarray(d.principal_stretches(pts, w)), atol=0)
    np.testing.assert_allclose(
        np.asarray(moved["v"]),
        np.asarray(d.transform_attrs(pts, {"v": v}, w)["v"]), atol=0)


def test_node_recompute_normals(rng):
    """recompute_normals rebuilds N geometrically from the deformed faces
    — on a scaled sphere the geometric and transported normals agree; it
    also covers the morph pass (which transport warns about) and wins
    over update_normals when both are set."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.geometry.topology import vertex_normals
    from facedeform_tpu.node import FaceDeformNode

    mesh = uv_sphere(12, 12)
    mesh.set_attr("N", np.zeros((mesh.num_points, 3), np.float32))
    rig0 = Mesh(points=fibonacci_points(40))
    rig1 = Mesh(points=(1.2 * rig0.points).astype(np.float32))
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                       solver="direct", term=PolyTerm.LINEAR)
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], cfg, DeformParams(radius=1.0, lam=0.01),
        recompute_normals=True, update_normals=True,
    )
    got = res.mesh.attr("N")
    want = vertex_normals(res.mesh)          # geometric truth of output
    np.testing.assert_allclose(got, want, atol=0)   # recompute won
    # a uniformly scaled sphere keeps radial normals
    radial = res.mesh.points / np.linalg.norm(
        res.mesh.points, axis=1, keepdims=True)
    assert np.abs(got - radial).max() < 0.15   # coarse sphere faceting
    assert "N" in res.transported

    # point cloud: warns and skips
    cloud = Mesh(points=mesh.points.copy())
    res2 = FaceDeformNode().cook(
        [cloud, rig0, rig1], cfg, DeformParams(radius=1.0, lam=0.01),
        recompute_normals=True,
    )
    assert any("no faces" in w for w in res2.warnings)


def test_recompute_skips_analytic_n_transport(rng):
    """When recompute_normals will win (faces present), the analytic N
    transport is skipped outright: no Jacobian pass runs for N, and the
    morphspace 'transport does not reflect the morph' warning must not
    fire — the recomputed N DOES reflect the morph pass."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    mesh = uv_sphere(10, 10)
    mesh.set_attr("N", np.zeros((mesh.num_points, 3), np.float32))
    rig0 = Mesh(points=fibonacci_points(30))
    rig1 = Mesh(points=(1.1 * rig0.points).astype(np.float32))
    blend = Mesh(points=(mesh.points * 1.05).astype(np.float32))
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                       solver="direct", term=PolyTerm.LINEAR, morphspace=True)
    node = FaceDeformNode()
    res = node.cook(
        [mesh, rig0, rig1, blend], cfg, DeformParams(radius=1.0, lam=0.01),
        recompute_normals=True, update_normals=True,
    )
    # N was rebuilt geometrically (reflecting the morph), so the
    # transport-vs-morph warning would be wrong — and with the analytic
    # N transport skipped, nothing rode the Jacobian pass at all.
    assert not any("morphspace reconstruction" in w for w in res.warnings)
    assert res.transported == ("N",)
    # transform_attrs naming N explicitly is likewise superseded
    res2 = node.cook(
        [mesh, rig0, rig1],
        dataclasses.replace(cfg, morphspace=False),
        DeformParams(radius=1.0, lam=0.01),
        recompute_normals=True, transform_attrs=["N"],
    )
    assert res2.transported == ("N",)
    assert not res2.warnings


def test_vertex_normals_bincount_matches_add_at(rng):
    """The bincount scatter-add rewrite must equal the naive np.add.at."""
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.geometry.topology import vertex_normals

    mesh = uv_sphere(9, 9)
    got = vertex_normals(mesh)
    tris = mesh.triangles()
    p = mesh.points.astype(np.float64)
    fn = np.cross(p[tris[:, 1]] - p[tris[:, 0]], p[tris[:, 2]] - p[tris[:, 0]])
    n = np.zeros((mesh.num_points, 3), np.float64)
    for c in range(3):
        np.add.at(n, tris[:, c], fn)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    want = np.where(norm > 1e-20, n / np.maximum(norm, 1e-20),
                    [0.0, 0.0, 1.0]).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


# -------------------------------------------- morphspace transport (round 4)


def _analytic_blend(pts, amp=0.25):
    """Smooth analytic delta field + its exact spatial gradient.

    delta(x) = amp * [sin(2y) * zhat + 0.5 * x*x * xhat]; grad is
    closed-form so the cook's 1-ring estimate has a true oracle.
    """
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    delta = np.stack([
        0.5 * amp * x * x,
        np.zeros_like(x),
        amp * np.sin(2.0 * y),
    ], -1).astype(np.float32)
    grad = np.zeros((len(pts), 3, 3), np.float64)
    grad[:, 0, 0] = amp * x          # d(delta_x)/dx
    grad[:, 2, 1] = 2.0 * amp * np.cos(2.0 * y)   # d(delta_z)/dy
    return delta, grad


def _cof_transform(f, n):
    """Cofactor (inverse-transpose) normal rule, f64 oracle."""
    cof = np.linalg.det(f)[:, None, None] * np.linalg.inv(
        f
    ).transpose(0, 2, 1)
    out = np.einsum("vij,vj->vi", cof, n)
    return out / np.linalg.norm(out, axis=1, keepdims=True)


def test_morphspace_normal_transport_analytic_oracle(rng):
    """Morph cook with update_normals: transported N must follow the
    COMPOSED map m(x) = x + w0*delta(x) + gamma*(P(x)-x), checked against
    the analytic grad(delta) + the deformer's closed-form F_P — the
    round-3 'reflects the RBF pass' warning is gone.  Runs both gamma=0
    (pure blend projection) and gamma!=0 (dofalloff falloffradius
    residual)."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.ops.jacobian import _applied_gradient

    mesh = uv_sphere(28, 28)
    pts = mesh.points
    n0 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    mesh.set_attr("N", n0.astype(np.float32))

    # Drive the rig with the SAME analytic field the blendshape carries,
    # so the morph projection finds a substantial weight (an orthogonal
    # pair would project to w0 ~ 0 and the composition would be a no-op)
    rig0 = Mesh(points=fibonacci_points(30))
    rig_delta, _ = _analytic_blend(rig0.points)
    rig1 = Mesh(points=(rig0.points + rig_delta).astype(np.float32))
    delta, grad_true = _analytic_blend(pts)
    blend = Mesh(points=(pts + delta).astype(np.float32))

    for gamma_cfg in (
        DeformConfig(morphspace=True),
        DeformConfig(morphspace=True, dofalloff=True),
    ):
        params = DeformParams(radius=2.0, falloffradius=0.35)
        node = FaceDeformNode()
        res = node.cook(
            [mesh, rig0, rig1, blend], gamma_cfg, params,
            update_normals=True,
        )
        assert not any("reflect the RBF" in w for w in res.warnings)
        assert res.weights is not None and res.weights.shape == (1,)
        w0 = float(res.weights[0])
        assert w0 > 0.5, w0      # the projection really engaged
        gamma = 0.35 if gamma_cfg.dofalloff else 0.0

        # oracle F: analytic blend gradient + the deformer's own F_P
        falloff = res.mesh.point_attrs["fd_falloff"].astype(np.float32)
        f_p = np.asarray(_applied_gradient(
            node._deformer.jacobian(jnp.asarray(pts)), falloff,
        ), np.float64)
        eye = np.eye(3)[None]
        f_true = eye + w0 * grad_true + gamma * (f_p - eye)
        n_true = _cof_transform(f_true, n0.astype(np.float64))

        got = res.mesh.point_attrs["N"].astype(np.float64)
        got = got / np.linalg.norm(got, axis=1, keepdims=True)
        # error budget: the 1-ring LSQ gradient of the analytic field on
        # a 28x28 sphere (mesh-resolution-limited); pole rings are the
        # coarsest, so check the 99th percentile AND a loose max
        ang = np.degrees(np.arccos(np.clip((got * n_true).sum(-1), -1, 1)))
        assert np.percentile(ang, 99) < 2.0, (
            gamma, np.percentile(ang, 99),
        )
        assert ang.max() < 8.0, (gamma, ang.max())

    # Distinguishing case: an RBF pass ORTHOGONAL to the blend basis
    # (w0 ~ 0) with the dofalloff residual on.  The composed map is then
    # I + gamma*(F_P - I) — NOT F_P — and since the blend term vanishes
    # there is no 1-ring discretization error, so the check is tight.
    # anisotropic scale: an isotropic F_P would map normal DIRECTIONS
    # identically through cof at any gamma, hiding the composition
    rig_scale = Mesh(
        points=(rig0.points * np.float32([1.0, 1.4, 1.0])).astype(np.float32)
    )
    node = FaceDeformNode()
    res = node.cook(
        [mesh, rig0, rig_scale, blend],
        DeformConfig(morphspace=True, dofalloff=True),
        DeformParams(radius=2.0, falloffradius=0.35),
        update_normals=True,
    )
    w0 = float(res.weights[0])
    falloff = res.mesh.point_attrs["fd_falloff"].astype(np.float32)
    f_p = np.asarray(_applied_gradient(
        node._deformer.jacobian(jnp.asarray(pts)), falloff,
    ), np.float64)
    eye = np.eye(3)[None]
    f_true = eye + w0 * grad_true + 0.35 * (f_p - eye)
    got = res.mesh.point_attrs["N"].astype(np.float64)
    got = got / np.linalg.norm(got, axis=1, keepdims=True)
    n_true = _cof_transform(f_true, n0.astype(np.float64))
    ang = np.degrees(np.arccos(np.clip((got * n_true).sum(-1), -1, 1)))
    assert np.percentile(ang, 99) < 1.0, np.percentile(ang, 99)
    # the old (round-3) route transported through F_P itself — measure
    # how far THAT is from what the cook now produces
    n_old = _cof_transform(f_p, n0.astype(np.float64))
    ang_old = np.degrees(np.arccos(np.clip((got * n_old).sum(-1), -1, 1)))
    assert ang_old.max() > 0.5, ang_old.max()


def test_morphspace_transport_point_cloud_warns(rng):
    """No faces -> no blend-displacement gradient: the cook says so and
    falls back to the RBF-pass F (round-3 behavior)."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    sphere = uv_sphere(10, 10)
    cloud = Mesh(points=sphere.points.copy())
    n0 = cloud.points / np.linalg.norm(cloud.points, axis=1, keepdims=True)
    cloud.set_attr("N", n0.astype(np.float32))
    rig0 = Mesh(points=fibonacci_points(30))
    rig1 = Mesh(points=(1.1 * rig0.points).astype(np.float32))
    blend = Mesh(points=(cloud.points * 1.05).astype(np.float32))
    res = FaceDeformNode().cook(
        [cloud, rig0, rig1, blend], DeformConfig(morphspace=True),
        DeformParams(radius=2.0), update_normals=True,
    )
    assert any(
        "attribute transport needs mesh faces" in w
        for w in res.warnings
    )
    assert "N" in res.transported


def test_morphspace_stretch_reflects_morph(rng):
    """output_stretch on a morph cook reads the COMPOSED F: a pure blend
    map (gamma=0) with a known uniform-scale delta has analytic
    stretches."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    mesh = uv_sphere(16, 16)
    pts = mesh.points
    # rig displacement = 0.3 x matches the blend delta, so w0 ~ 1
    rig0 = Mesh(points=fibonacci_points(30))
    rig1 = Mesh(points=(1.3 * rig0.points).astype(np.float32))
    # blend delta = 0.3 * x: grad = 0.3 I, so the morph map with weight
    # w0 is (1 + 0.3 w0) I — all three stretches equal that scalar
    blend = Mesh(points=(1.3 * pts).astype(np.float32))
    node = FaceDeformNode()
    res = node.cook(
        [mesh, rig0, rig1, blend], DeformConfig(morphspace=True),
        DeformParams(radius=2.0), output_stretch=True,
    )
    w0 = float(res.weights[0])
    want = 1.0 + 0.3 * w0
    sig_max = res.mesh.point_attrs["fd_stretch"].astype(np.float64)
    sig_min = res.mesh.point_attrs["fd_compress"].astype(np.float64)
    # interior vertices recover the uniform scale; pole 1-rings are the
    # coarsest so use percentiles
    assert abs(np.median(sig_max) - want) < 0.02, (np.median(sig_max), want)
    assert abs(np.median(sig_min) - want) < 0.02



def test_psd_transport_analytic_oracle(rng):
    """PSD corrections applied after the RBF pass must show up in the
    transported normals: at an example pose the correction field equals
    the sculpt's analytic delta exactly (corrections absorb the base
    pipeline), so F = F_P + grad(delta) has a closed-form oracle."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.ops.jacobian import _applied_gradient

    mesh = uv_sphere(28, 28)
    pts = mesh.points
    n0 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    mesh.set_attr("N", n0.astype(np.float32))
    rig0 = Mesh(points=fibonacci_points(30))
    pose = Mesh(points=(rig0.points * np.float32([1.0, 1.3, 1.0])))

    base = FaceDeformNode().cook(
        [mesh, rig0, pose], DeformConfig(), DeformParams(radius=2.0)
    ).mesh
    delta, grad_true = _analytic_blend(np.asarray(base.points))
    sculpt = Mesh(points=(np.asarray(base.points) + delta))

    node = FaceDeformNode()
    res = node.cook(
        [mesh, rig0, pose], DeformConfig(), DeformParams(radius=2.0),
        examples=[(pose, sculpt)], update_normals=True,
    )
    w_psd = res.mesh.detail_attrs["psd_weights"]
    np.testing.assert_allclose(w_psd, [1.0], atol=1e-4)

    falloff = res.mesh.point_attrs["fd_falloff"].astype(np.float32)
    f_p = np.asarray(_applied_gradient(
        node._deformer.jacobian(jnp.asarray(pts)), falloff,
    ), np.float64)
    # NOTE: delta/grad were built at the DEFORMED positions (the sculpt
    # edits the cooked surface); the map composition x -> P(x) ->
    # P(x) + delta(P(x)) has gradient (I + grad_delta(P)) F_P
    f_true = np.einsum("vij,vjk->vik", np.eye(3)[None] + grad_true, f_p)
    n_true = _cof_transform(f_true, n0.astype(np.float64))

    got = res.mesh.point_attrs["N"].astype(np.float64)
    got = got / np.linalg.norm(got, axis=1, keepdims=True)
    ang = np.degrees(np.arccos(np.clip((got * n_true).sum(-1), -1, 1)))
    # the cook composes ADDITIVELY (F_P + G(delta at rest indices)) while
    # the exact chain is multiplicative through P; at this deformation
    # scale they agree to first order — mesh-resolution tolerance
    assert np.percentile(ang, 99) < 3.0, np.percentile(ang, 99)
    # and it must clearly beat the old F_P-only route
    n_old = _cof_transform(f_p, n0.astype(np.float64))
    ang_old = np.degrees(np.arccos(np.clip(
        (n_old * n_true).sum(-1), -1, 1
    )))
    assert np.percentile(ang, 99) < 0.5 * np.percentile(ang_old, 99), (
        np.percentile(ang, 99), np.percentile(ang_old, 99),
    )
