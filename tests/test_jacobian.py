"""Displacement Jacobians, r=0-safe kernel autodiff, normal transport."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facedeform_tpu.config import (
    DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType,
)
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops import kernels as K
from facedeform_tpu.ops.evaluate import evaluate_block
from facedeform_tpu.ops.jacobian import (
    deformation_gradient, displacement_jacobian, transform_normals,
)
from facedeform_tpu.ops.tangent import (
    project_to_tangents, tangent_projection_matrix,
)

ALL_KERNELS = list(RBFKernel)


@pytest.mark.parametrize("kernel", ALL_KERNELS)
def test_phi_prime_matches_finite_difference(kernel):
    s = np.asarray([1e-4, 0.03, 0.5, 0.9, 1.7, 9.0], np.float64)
    # h sized for f32 forward evals: big enough that phi's ~1e-7 relative
    # rounding stays under the 5e-3 gate, small enough for the curvature
    h = 1e-3 * np.maximum(s, 1e-2)

    # evaluate phi(s) directly: apply_kernel takes d2, so eps=1 -> s == d2
    def phi(x):
        return np.asarray(
            K.apply_kernel(
                kernel, jnp.asarray(x, jnp.float32), jnp.asarray(1.0, jnp.float32)
            ),
            np.float64,
        )

    fd = (phi(s + h) - phi(s - h)) / (2 * h)
    got = np.asarray(
        K.phi_prime_s(kernel, jnp.asarray(s, jnp.float32)), np.float64
    )
    scale = np.maximum(np.abs(fd), 1e-3)
    assert np.max(np.abs(got - fd) / scale) < 5e-3


@pytest.mark.parametrize("kernel", ALL_KERNELS)
def test_apply_kernel_jvp_finite_at_r0(kernel):
    """A query exactly on a control (d2 = 0) must yield finite tangents —
    raw autodiff of the sqrt-based kernels NaNs there (0 * inf)."""
    d2 = jnp.asarray([0.0, 0.25, 4.0], jnp.float32)
    eps = jnp.asarray(1.0, jnp.float32)
    _, tang = jax.jvp(
        lambda x: K.apply_kernel(kernel, x, eps), (d2,), (jnp.ones_like(d2),)
    )
    assert np.isfinite(np.asarray(tang)).all()
    # Wendland's ds-derivative has the nontrivial finite limit -10 at 0
    if kernel == RBFKernel.WENDLAND_C2:
        np.testing.assert_allclose(np.asarray(tang)[0], -10.0, rtol=1e-6)
    # grad w.r.t. eps finite too
    g = jax.grad(lambda e: jnp.sum(K.apply_kernel(kernel, d2, e)))(eps)
    assert np.isfinite(float(g))


@pytest.mark.parametrize("kernel", ALL_KERNELS)
def test_displacement_jacobian_matches_autodiff(rng, kernel):
    """Analytic two-matmul Jacobian == jacfwd of the tested evaluate path,
    including a query exactly at a control point."""
    rest = fibonacci_points(64)
    deformed = rest + 0.05 * rng.standard_normal((64, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=kernel, solver="direct")
    d = Deformer.fit(rest, deformed, cfg, DeformParams(radius=1.0, lam=0.01))
    pts = np.concatenate(
        [rest[:4], (0.9 * fibonacci_points(20)).astype(np.float32)]
    )
    got = np.asarray(displacement_jacobian(
        d.model, jnp.asarray(pts), kernel, cfg.term
    ))
    ref = np.asarray(jax.vmap(
        jax.jacfwd(lambda p: evaluate_block(
            d.model, p[None], kernel, cfg.term
        )[0])
    )(jnp.asarray(pts)))
    assert np.isfinite(got).all() and np.isfinite(ref).all()
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(got - ref).max() / scale < 2e-5


def test_multilayer_jacobian_matches_autodiff(rng):
    rest = fibonacci_points(48)
    deformed = rest + 0.04 * rng.standard_normal((48, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.MULTILAYER, layers=3, solver="direct")
    d = Deformer.fit(rest, deformed, cfg, DeformParams(radius=1.0, lam=0.05))
    from facedeform_tpu.ops import fit as fit_mod

    kernel = fit_mod.effective_kernel(cfg)
    pts = (1.05 * fibonacci_points(17)).astype(np.float32)
    got = np.asarray(displacement_jacobian(
        d.model, jnp.asarray(pts), kernel, cfg.term
    ))
    ref = np.asarray(jax.vmap(
        jax.jacfwd(lambda p: evaluate_block(
            d.model, p[None], kernel, cfg.term
        )[0])
    )(jnp.asarray(pts)))
    assert np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-3) < 2e-5


def test_rigid_rotation_rotates_normals(rng):
    """A rigidly rotated rig is exactly representable by the LINEAR tail:
    F = R everywhere, so transported normals are the rotated normals."""
    ang = 0.4
    c, s = np.cos(ang), np.sin(ang)
    r_mat = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    rest = fibonacci_points(40)
    d = Deformer.fit(
        rest, rest @ r_mat.T,
        DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                     solver="direct", term=PolyTerm.LINEAR),
        DeformParams(radius=1.0, lam=0.01),
    )
    pts = fibonacci_points(100)
    normals = pts  # unit sphere: normal == position
    w = np.ones(100, np.float32)
    got = np.asarray(d.deformed_normals(pts, normals, w))
    want = normals @ r_mat.T
    assert np.abs(got - want).max() < 5e-3


def test_uniform_scale_keeps_sphere_normals(rng):
    """x -> 1.3 x: F = 1.3 I, cofactor transport leaves directions alone."""
    rest = fibonacci_points(40)
    d = Deformer.fit(
        rest, (1.3 * rest).astype(np.float32),
        DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                     solver="direct", term=PolyTerm.LINEAR),
        DeformParams(radius=1.0, lam=0.01),
    )
    pts = fibonacci_points(64)
    got = np.asarray(d.deformed_normals(pts, pts, np.ones(64, np.float32)))
    assert np.abs(got - pts).max() < 5e-3


def test_tangent_projection_matrix_matches_projection(rng):
    u = rng.standard_normal((50, 3)).astype(np.float32)
    v = rng.standard_normal((50, 3)).astype(np.float32)
    n = rng.standard_normal((50, 3)).astype(np.float32)
    disp = rng.standard_normal((50, 3)).astype(np.float32)
    t = tangent_projection_matrix(jnp.asarray(u), jnp.asarray(v), jnp.asarray(n))
    got = np.asarray(jnp.einsum("vab,vb->va", t, jnp.asarray(disp)))
    want = np.asarray(project_to_tangents(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(n), jnp.asarray(disp)
    ))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_transform_normals_degenerate_falls_back():
    normals = np.asarray([[0, 0, 1], [1, 0, 0]], np.float32)
    f = np.zeros((2, 3, 3), np.float32)  # fully collapsed map
    out = np.asarray(transform_normals(jnp.asarray(normals), jnp.asarray(f)))
    np.testing.assert_allclose(out, normals)


def test_pu_jacobian_matches_finite_difference(rng):
    """PU quotient-rule Jacobian vs central differences of the PU field
    (covered region, fallback far region, and a point ON a control)."""
    from facedeform_tpu.ops import pu

    rest = fibonacci_points(300)
    disp_field = (
        0.1 * np.exp(-2 * np.sum((rest - [0, 1, 0]) ** 2, -1, keepdims=True))
        .astype(np.float32) * np.float32([0.3, 1, 0.2])
    )
    d = pu.PUDeformer.fit(
        rest, rest + disp_field, kernel=RBFKernel.THIN_PLATE,
        eps="auto", lam=1e-4, patch_size=64,
    )
    pts = np.concatenate([
        (0.97 * fibonacci_points(12)).astype(np.float32),
        rest[:3],                                   # exactly on controls
        np.float32([[3.0, 0, 0]]),                  # fallback (far) region
    ])
    got = np.asarray(d.jacobian(pts))
    assert np.isfinite(got).all()
    h = 2e-3
    fd = np.zeros((len(pts), 3, 3), np.float32)
    for b in range(3):
        e = np.zeros(3, np.float32)
        e[b] = h
        # one shared plan per side would cache-collide across b: build fresh
        dp = np.asarray(d.displacement(pts + e, backend="xla"))
        dm = np.asarray(d.displacement(pts - e, backend="xla"))
        fd[:, :, b] = (dp - dm) / (2 * h)
    scale = max(np.abs(fd).max(), 1e-2)
    assert np.abs(got - fd).max() / scale < 2e-2


def test_node_update_normals(rng):
    """node.cook(update_normals=True) rewrites N via the transport rule;
    a rigidly rotated rig rotates the normals."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    ang = 0.3
    c, s = np.cos(ang), np.sin(ang)
    r_mat = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    mesh = uv_sphere(12, 12)
    mesh.set_attr("N", mesh.points / np.linalg.norm(
        mesh.points, axis=1, keepdims=True
    ).astype(np.float32))
    rig0 = Mesh(points=fibonacci_points(40))
    rig1 = Mesh(points=(rig0.points @ r_mat.T).astype(np.float32))
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                       solver="direct", term=PolyTerm.LINEAR)
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], cfg, DeformParams(radius=1.0, lam=0.01),
        update_normals=True,
    )
    want = np.asarray(mesh.attr("N")) @ r_mat.T
    got = res.mesh.attr("N")
    assert np.abs(got - want).max() < 1e-2
    # positions rotated too (sanity that the cook actually deformed)
    assert np.abs(res.mesh.points - mesh.points @ r_mat.T).max() < 1e-2


def test_node_update_normals_warns_without_n(rng):
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    mesh = uv_sphere(8, 8)
    rig0 = Mesh(points=fibonacci_points(20))
    rig1 = Mesh(points=(rig0.points * 1.02).astype(np.float32))
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], DeformConfig(), DeformParams(),
        update_normals=True,
    )
    assert any("no N point attribute" in w for w in res.warnings)


def test_node_update_normals_pu_route(rng):
    """solver='pu' cooks transport normals through the PU Jacobian."""
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    mesh = uv_sphere(10, 10)
    n_attr = (mesh.points / np.linalg.norm(
        mesh.points, axis=1, keepdims=True
    )).astype(np.float32)
    mesh.set_attr("N", n_attr)
    rig0 = Mesh(points=fibonacci_points(48))
    rig1 = Mesh(points=(1.25 * rig0.points).astype(np.float32))
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], DeformConfig(solver="pu", term=PolyTerm.LINEAR),
        DeformParams(lam=0.01), update_normals=True,
    )
    got = res.mesh.attr("N")
    # uniform scale: directions unchanged
    assert np.abs(got - n_attr).max() < 2e-2
    assert np.abs(np.linalg.norm(got, axis=1) - 1.0).max() < 1e-5


def test_deformation_gradient_zero_weight_is_identity(rng):
    jac = rng.standard_normal((7, 3, 3)).astype(np.float32)
    f = np.asarray(deformation_gradient(
        jnp.asarray(jac), jnp.zeros(7, jnp.float32)
    ))
    np.testing.assert_allclose(f, np.broadcast_to(np.eye(3), (7, 3, 3)))


def test_padded_neighbors_degree_cap_stride_spread():
    """max_degree caps the table width via STRIDE subsampling: a fan
    vertex's kept neighbors stay angularly spread around the ring (a
    contiguous-arc truncation would leave near-collinear edge vectors
    that wreck the LSQ gradient), uncapped vertices are untouched, and
    the returned degrees are the effective slot counts."""
    from facedeform_tpu.geometry.topology import padded_neighbors

    # vertex 0 = hub of a 100-spoke fan; vertices 1..100 on a ring, each
    # also chained to its ring successor (degree 3 each)
    ring = np.arange(1, 101)
    edges = np.concatenate([
        np.stack([np.zeros(100, np.int64), ring], axis=1),
        np.stack([ring, np.roll(ring, -1)], axis=1),
    ])
    nbr, deg = padded_neighbors(101, edges, max_degree=16)
    assert nbr.shape == (101, 16)
    assert deg[0] == 16.0 and np.all(deg[1:] == 3.0)
    hub = nbr[0][nbr[0] != 0]
    assert len(set(hub.tolist())) == 16
    # ring positions of the kept neighbors: stride sampling spreads them
    # over the full circle (max angular gap ~ 2x the mean, not an arc)
    ang = np.sort(2.0 * np.pi * (hub - 1) / 100.0)
    gaps = np.diff(np.concatenate([ang, [ang[0] + 2.0 * np.pi]]))
    assert gaps.max() < 3.0 * (2.0 * np.pi / 16.0)
    # low-degree rows keep self-padding semantics
    assert np.all(nbr[1, 3:] == 1)
    # uncapped call unchanged apart from width
    full, degf = padded_neighbors(101, edges)
    assert full.shape == (101, 100) and degf[0] == 100.0


def test_mesh_field_gradient_capped_table_affine_exact(rng):
    """The 1-ring LSQ gradient stays exact for affine fields through a
    degree-capped table (any tangent-spanning neighbor subset suffices) —
    the property the TRANSPORT_MAX_DEGREE cap relies on."""
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.geometry.topology import padded_neighbors, unique_edges
    from facedeform_tpu.ops.jacobian import (
        TRANSPORT_MAX_DEGREE, mesh_field_gradient,
    )

    mesh = uv_sphere(24, 24)  # poles have degree 24 > cap
    pts = mesh.points.astype(np.float32)
    a_mat = np.asarray(
        [[0.02, 0.015, 0.0], [-0.01, -0.03, 0.005], [0.0, 0.02, 0.01]],
        np.float32,
    )
    field = pts @ a_mat.T
    nbr, _ = padded_neighbors(
        mesh.num_points, unique_edges(mesh.faces),
        max_degree=TRANSPORT_MAX_DEGREE,
    )
    assert nbr.shape[1] <= TRANSPORT_MAX_DEGREE
    g = np.asarray(mesh_field_gradient(
        jnp.asarray(pts), jnp.asarray(field), jnp.asarray(nbr)
    ))
    # tangential action exact (the normal column is ridge-damped by
    # design); compare G e against A e for the capped ring's own edges
    e = pts[nbr] - pts[:, None, :]
    want = np.einsum("ab,vdb->vda", a_mat, e)
    got = np.einsum("vab,vdb->vda", g, e)
    assert np.abs(got - want).max() < 1e-4


def test_padded_neighbors_cap_property_random_degrees():
    """Property check of the stride-subsample bookkeeping across degree
    regimes (c < cap, c == cap, c == cap+1, c >> cap): every vertex's
    capped row holds exactly min(deg, cap) distinct TRUE neighbors (a
    subset of its full ring), the rest self-padding, and the returned
    effective degrees match."""
    from facedeform_tpu.geometry.topology import padded_neighbors

    rng = np.random.default_rng(7)
    hub_degrees = [1, 3, 15, 16, 17, 31, 40, 97]
    edges, nxt = [], len(hub_degrees)
    rings = []
    for hub, degv in enumerate(hub_degrees):
        ring = np.arange(nxt, nxt + degv)
        nxt += degv
        rings.append(set(ring.tolist()))
        for r in ring:
            edges.append((hub, r))
    edges = np.asarray(edges, np.int64)
    cap = 16
    nbr, deg = padded_neighbors(nxt, edges, max_degree=cap)
    assert nbr.shape == (nxt, cap)
    for hub, degv in enumerate(hub_degrees):
        eff = min(degv, cap)
        assert deg[hub] == float(eff)
        row = nbr[hub]
        real = row[row != hub]
        assert len(real) == eff
        assert len(set(real.tolist())) == eff
        assert set(real.tolist()) <= rings[hub]
    # spoke endpoints: degree 1, their single neighbor is their hub
    for hub, degv in enumerate(hub_degrees):
        for r in rings[hub]:
            row = nbr[r]
            real = row[row != r]
            assert list(real) == [hub] and deg[r] == 1.0


def test_padded_neighbors_width_buckets_to_8():
    """Capped tables bucket their width to multiples of 8 (quad degree 4
    and tri degree ~6 share the width-8 gradient program; pole-capped
    meshes use 16) so warm --transport can precompile the whole set;
    uncapped callers (skinning Laplacian) keep the exact Dmax."""
    from facedeform_tpu.geometry.topology import padded_neighbors

    e = []
    n = 5
    for r in range(n):
        for c in range(n):
            i = r * n + c
            if c + 1 < n:
                e.append((i, i + 1))
            if r + 1 < n:
                e.append((i, i + n))
    e = np.asarray(e, np.int64)
    nbr, deg = padded_neighbors(n * n, e, max_degree=16)
    assert nbr.shape[1] == 8 and deg.max() == 4.0
    # the extra columns are inert self-pads
    interior = n * n // 2
    assert np.sum(nbr[interior] != interior) == 4
    assert padded_neighbors(n * n, e)[0].shape[1] == 4  # uncapped: exact
