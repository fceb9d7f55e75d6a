"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops import fit as fit_mod
from facedeform_tpu.parallel import batched, sharding


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    return sharding.make_mesh()


def _fit(rng, n=30):
    rest = fibonacci_points(n)
    deformed = rest + 0.1 * rng.standard_normal((n, 3)).astype(np.float32)
    return rest, deformed, Deformer.fit(rest, deformed, DeformConfig(), DeformParams())


def test_sharded_apply_matches_single_device(rng, mesh):
    """Vertex-sharded eval == single-device eval (replicated-model design)."""
    rest, deformed, d = _fit(rng)
    v = 1000  # deliberately not divisible by 8
    pts = rng.standard_normal((v, 3)).astype(np.float32)
    dist2 = np.abs(rng.standard_normal(v)).astype(np.float32)
    gate = np.ones(v, np.float32)
    ref_pts, ref_w = d.apply(pts, dist2=dist2, backend="dense")
    got_pts, got_w = sharding.sharded_apply(
        d.model, jnp.asarray(pts), jnp.asarray(dist2), jnp.asarray(gate),
        d.cfg, d.params, mesh,
    )
    np.testing.assert_allclose(np.asarray(got_pts), np.asarray(ref_pts), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), atol=1e-6)


def test_deform_step_full(rng, mesh):
    """Replicated solve + sharded eval + psum diagnostics in one jit."""
    rest, deformed, d = _fit(rng)
    pts = rng.standard_normal((512, 3)).astype(np.float32)
    new_pts, w, gmax = sharding.deform_step(
        jnp.asarray(rest), jnp.asarray(deformed), jnp.asarray(pts),
        jnp.zeros(512), jnp.ones(512), DeformConfig(), DeformParams(), mesh,
    )
    ref_pts, _ = d.apply(pts, backend="dense")
    np.testing.assert_allclose(np.asarray(new_pts), np.asarray(ref_pts), atol=1e-5)
    want_gmax = np.abs(np.asarray(ref_pts) - pts).max()
    np.testing.assert_allclose(float(gmax), want_gmax, rtol=1e-5)


def test_fit_frames_matches_per_frame(rng):
    rest = fibonacci_points(25)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((25, 3)).astype(np.float32)
        for _ in range(4)
    ])
    cfg = DeformConfig()
    model, residuals = batched.fit_frames(
        jnp.asarray(rest), jnp.asarray(frames), cfg, DeformParams()
    )
    assert model.w_rbf.shape[0] == 4
    for f in range(4):
        single, _ = fit_mod.fit(jnp.asarray(rest), jnp.asarray(frames[f]), cfg, DeformParams())
        np.testing.assert_allclose(
            np.asarray(model.w_rbf[f]), np.asarray(single.w_rbf), atol=1e-5
        )


def test_apply_frames_sharded(rng, mesh):
    rest = fibonacci_points(25)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((25, 3)).astype(np.float32)
        for _ in range(3)
    ])
    cfg = DeformConfig()
    params = DeformParams()
    model, _ = batched.fit_frames(jnp.asarray(rest), jnp.asarray(frames), cfg, params)
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    dist2 = np.abs(rng.standard_normal(300)).astype(np.float32)
    gate = np.ones(300, np.float32)

    out_sharded, w = batched.apply_frames(
        model, jnp.asarray(pts), jnp.asarray(dist2), jnp.asarray(gate),
        cfg, params, mesh,
    )
    out_local, _ = batched.apply_frames(
        model, jnp.asarray(pts), jnp.asarray(dist2), jnp.asarray(gate),
        cfg, params, None,
    )
    assert out_sharded.shape == (3, 300, 3)
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_local), atol=1e-5)
    # per-frame must equal the unbatched deformer
    for f in range(3):
        d = Deformer.fit(rest, frames[f], cfg, params)
        ref, _ = d.apply(pts, dist2=dist2, backend="dense")
        np.testing.assert_allclose(np.asarray(out_sharded[f]), np.asarray(ref), atol=2e-5)


def test_deform_frames_fused_matches_split(rng, mesh):
    """One-dispatch deform_frames == fit_frames + apply_frames, sharded
    and unsharded (the fused program exists to drop a dispatch RTT, not
    to change math)."""
    rest = fibonacci_points(25)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((25, 3)).astype(np.float32)
        for _ in range(3)
    ])
    cfg, params = DeformConfig(), DeformParams()
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    dist2 = np.abs(rng.standard_normal(300)).astype(np.float32)
    gate = np.ones(300, np.float32)
    args = (jnp.asarray(rest), jnp.asarray(frames), jnp.asarray(pts),
            jnp.asarray(dist2), jnp.asarray(gate), cfg, params)
    model, _ = batched.fit_frames(args[0], args[1], cfg, params)
    for m in (None, mesh):
        want, w_want = batched.apply_frames(
            model, args[2], args[3], args[4], cfg, params, m
        )
        got, w_got = batched.deform_frames(*args, m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_want),
                                   atol=1e-7)


def test_fit_sharded_matches_single_device(rng, mesh):
    """Control-row-sharded Krylov fit == single-device krylov fit (the
    huge-rig scaling axis, SURVEY.md section 5 'ring/partial-Phi' note)."""
    from facedeform_tpu.config import RBFKernel, RBFModelType
    from facedeform_tpu.parallel.krylov_sharded import fit_sharded

    n = 320
    rest = fibonacci_points(n)
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    for model_type in (RBFModelType.QNN, RBFModelType.KERNEL):
        cfg = DeformConfig(model=model_type, solver="krylov")
        params = DeformParams(radius=0.4, lam=0.01)
        m_ref, r_ref = fit_mod.fit(
            jnp.asarray(rest), jnp.asarray(deformed), cfg, params
        )
        m_sh, r_sh = fit_sharded(
            jnp.asarray(rest), jnp.asarray(deformed), cfg, params, mesh
        )
        assert float(r_sh.backward_error()) < 1e-5
        # same displacement field (weights may differ in near-null dirs)
        pts = rng.standard_normal((400, 3)).astype(np.float32)
        from facedeform_tpu.ops.evaluate import evaluate
        from facedeform_tpu.ops.fit import effective_kernel

        d_ref = np.asarray(evaluate(m_ref, jnp.asarray(pts), effective_kernel(cfg), cfg.term))
        d_sh = np.asarray(evaluate(m_sh, jnp.asarray(pts), effective_kernel(cfg), cfg.term))
        scale = max(np.abs(d_ref).max(), 1e-6)
        assert np.abs(d_ref - d_sh).max() < 5e-5 + 1e-3 * scale


def test_transport_frames_matches_per_frame(rng, mesh):
    """batched.transport_frames == Deformer.transform_attrs frame by
    frame (normals + vectors + quats + stretches), unsharded and on the
    8-device mesh."""
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.ops.jacobian import principal_stretches  # noqa: F401

    rest = fibonacci_points(25)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((25, 3)).astype(np.float32)
        for _ in range(3)
    ])
    cfg, params = DeformConfig(), DeformParams()
    model, _ = batched.fit_frames(
        jnp.asarray(rest), jnp.asarray(frames), cfg, params
    )
    v = 80
    pts = rng.standard_normal((v, 3)).astype(np.float32)
    n = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    vel = rng.standard_normal((v, 3)).astype(np.float32)
    q = rng.standard_normal((v, 4)).astype(np.float32)
    w = np.abs(rng.standard_normal(v)).astype(np.float32)
    kinds = ("normal", "vector", "quaternion")
    got = batched.transport_frames(
        model, jnp.asarray(pts), (n, vel, q), jnp.asarray(w), cfg, kinds,
        want_stretch=True,
    )
    got_sh = batched.transport_frames(
        model, jnp.asarray(pts), (n, vel, q), jnp.asarray(w), cfg, kinds,
        mesh=mesh, want_stretch=True,
    )
    assert len(got) == 4 and got[0].shape == (3, v, 3)
    assert got[2].shape == (3, v, 4) and got[3].shape == (3, v, 3)
    for f in range(3):
        d = Deformer.fit(rest, frames[f], cfg, params)
        want = d.transform_attrs(
            pts, {"n": n, "vel": vel, "q": q}, w,
            kinds={"n": "normal", "vel": "vector", "q": "quaternion"},
        )
        sig = d.principal_stretches(pts, w)
        for i, key in enumerate(("n", "vel", "q")):
            np.testing.assert_allclose(
                np.asarray(got[i][f]), np.asarray(want[key]), atol=2e-5,
                err_msg=f"frame {f} {key}",
            )
            np.testing.assert_allclose(
                np.asarray(got_sh[i][f]), np.asarray(want[key]), atol=2e-5,
                err_msg=f"sharded frame {f} {key}",
            )
        np.testing.assert_allclose(
            np.asarray(got[3][f]), np.asarray(sig), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got_sh[3][f]), np.asarray(sig), atol=2e-5)


def test_fit_frames_hbm_routing():
    """fit_frames routes on the vmapped fit's estimated refinement-temp
    HBM: small shots stay vmapped (faster), big-rig long shots take the
    shared-factorization path instead of OOMing at compile (4096 ctrl x
    32 frames demanded 22.6 GB on a 15.75 GB v5e)."""
    assert batched._vmap_fit_bytes(1004, 8) < batched.vmap_fit_hbm_budget
    assert batched._vmap_fit_bytes(2052, 16) < batched.vmap_fit_hbm_budget
    assert batched._vmap_fit_bytes(4100, 32) > batched.vmap_fit_hbm_budget
    assert batched._vmap_fit_bytes(4100, 16) > batched.vmap_fit_hbm_budget


def test_fit_frames_shared_factorization_all_families(rng):
    """The shared-factorization route (fit_frames_dense: one assembly + LU
    per layer, frames as RHS columns) must match per-frame fit() across
    families: QNN (adaptive radii, exact interpolation), MULTILAYER (layer
    residual chaining through the shared factor), and a growing kernel (df
    assembly + refinement, 3F-column blocked)."""
    from facedeform_tpu.config import RBFKernel, RBFModelType

    rest = fibonacci_points(30)
    frames = np.stack([
        rest + 0.04 * rng.standard_normal((30, 3)).astype(np.float32)
        for _ in range(3)
    ])
    configs = [
        DeformConfig(),
        DeformConfig(model=RBFModelType.MULTILAYER, layers=3),
        DeformConfig(model=RBFModelType.KERNEL,
                     kernel=RBFKernel.THIN_PLATE),
    ]
    params = DeformParams(radius=1.2, lam=0.05)
    for cfg in configs:
        model, resid, _ = fit_mod.fit_frames_dense(
            jnp.asarray(rest), jnp.asarray(frames), cfg.solve_view(), params
        )
        assert resid.shape == (3,)
        assert np.isfinite(np.asarray(resid)).all()
        single = None
        for f in range(3):
            single, _ = fit_mod.fit(
                jnp.asarray(rest), jnp.asarray(frames[f]),
                cfg.solve_view(), params,
            )
            w_ref = np.asarray(single.w_rbf)
            tol = 2e-5 * max(1.0, np.abs(w_ref).max())
            np.testing.assert_allclose(
                np.asarray(model.w_rbf[f]), w_ref, atol=tol,
                err_msg=f"{cfg.model.name} frame {f} weights",
            )
            if cfg.n_poly:
                np.testing.assert_allclose(
                    np.asarray(model.w_poly[f]), np.asarray(single.w_poly),
                    atol=tol, err_msg=f"{cfg.model.name} frame {f} poly",
                )
        np.testing.assert_allclose(
            np.asarray(model.eps), np.asarray(single.eps), atol=1e-7,
        )


def test_fit_frames_routed_shared_end_to_end(rng, monkeypatch):
    """With the HBM budget forced low, batched.fit_frames takes the
    shared-factorization branch and the downstream frames eval composes
    unchanged (unique rig size so the jit cache can't serve the program
    traced with the vmapped route)."""
    monkeypatch.setattr(batched, "vmap_fit_hbm_budget", 1.0)
    rest = fibonacci_points(33)
    frames = np.stack([
        rest + 0.03 * rng.standard_normal((33, 3)).astype(np.float32)
        for _ in range(4)
    ])
    cfg, params = DeformConfig(), DeformParams()
    model, resid = batched.fit_frames(
        jnp.asarray(rest), jnp.asarray(frames), cfg, params
    )
    assert resid.shape == (4,)
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    mesh = sharding.make_mesh()
    out, _ = batched.apply_frames(
        model, jnp.asarray(pts), jnp.zeros(500), jnp.ones(500),
        cfg, params, mesh
    )
    for f in range(4):
        single, rep = fit_mod.fit(
            jnp.asarray(rest), jnp.asarray(frames[f]),
            cfg.solve_view(), params,
        )
        d = Deformer(model=single, cfg=cfg, params=params, report=rep)
        ref, _ = d.apply(pts)
        np.testing.assert_allclose(
            np.asarray(out[f]), np.asarray(ref), atol=2e-5,
            err_msg=f"frame {f}",
        )
