"""Matrix-free MINRES solver tests (large-rig fit path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer, RBFModelType
from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops.assemble import assemble_rhs, assemble_system
from facedeform_tpu.ops.krylov import make_saddle_matvec, minres


def test_minres_random_symmetric_indefinite(rng):
    n = 150
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eig = np.concatenate([np.linspace(0.5, 3, n - 15), -np.linspace(0.5, 2, 15)])
    a = ((q * eig) @ q.T).astype(np.float32)
    b = rng.standard_normal((n, 3)).astype(np.float32)
    a_dev = jnp.asarray(a)
    x, report = minres(lambda v: a_dev @ v, jnp.asarray(b), maxiter=400)
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    assert np.abs(np.asarray(x) - x_ref).max() < 1e-4 * np.abs(x_ref).max() + 1e-5
    assert float(report.residual_norm) < 1e-4 * float(report.rhs_norm)


def test_saddle_matvec_matches_dense(rng):
    ctrl = jnp.asarray(fibonacci_points(200))
    eps = jnp.float32(0.5)
    lam = jnp.float32(0.05)
    mv = make_saddle_matvec(ctrl, RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, lam,
                            chunk=64)
    a = np.asarray(
        assemble_system(ctrl, RBFKernel.GAUSSIAN, PolyTerm.LINEAR,
                        jnp.full((200,), 0.5), lam),
        np.float64,
    )
    probe = rng.standard_normal((204, 2)).astype(np.float32)
    got = np.asarray(mv(jnp.asarray(probe)))
    want = a @ probe.astype(np.float64)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fit_krylov_matches_direct(rng):
    """solver='krylov' reproduces the direct fit's displacement field."""
    rest = fibonacci_points(300)
    deformed = (rest + 0.05 * rng.standard_normal((300, 3))).astype(np.float32)
    params = DeformParams(radius=0.8, lam=0.05)
    pts = rng.standard_normal((400, 3)).astype(np.float32)
    outs = {}
    for solver in ("direct", "krylov"):
        cfg = DeformConfig(model=RBFModelType.KERNEL, solver=solver)
        d = Deformer.fit(rest, deformed, cfg, params)
        outs[solver] = np.asarray(d.apply(pts, backend="dense")[0])
    err = np.abs(outs["krylov"] - outs["direct"]).max()
    assert err < 5e-5, err


def test_fit_krylov_multilayer(rng):
    rest = fibonacci_points(250)
    deformed = (rest + 0.05 * rng.standard_normal((250, 3))).astype(np.float32)
    params = DeformParams(radius=1.0, lam=0.05)
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    cfg_d = DeformConfig(model=RBFModelType.MULTILAYER, layers=2, solver="direct")
    cfg_k = DeformConfig(model=RBFModelType.MULTILAYER, layers=2, solver="krylov")
    a = np.asarray(Deformer.fit(rest, deformed, cfg_d, params).apply(pts, backend="dense")[0])
    b = np.asarray(Deformer.fit(rest, deformed, cfg_k, params).apply(pts, backend="dense")[0])
    assert np.abs(a - b).max() < 1e-4


# ------------------------------------------------- round 2: GMRES + PMINRES
def test_gmres_random_nonsymmetric(rng):
    n = 120
    # diagonally dominated: noise spectral radius ~1 << 3
    a = (np.eye(n) * 3 + rng.standard_normal((n, n)) / np.sqrt(n)).astype(np.float32)
    b = rng.standard_normal((n, 3)).astype(np.float32)
    a_dev = jnp.asarray(a)
    from facedeform_tpu.ops.krylov import gmres

    x, report = gmres(lambda v: a_dev @ v, jnp.asarray(b))
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    assert np.abs(np.asarray(x) - x_ref).max() < 1e-4 * np.abs(x_ref).max() + 1e-5
    assert float(report.backward_error()) < 1e-6


def test_block_jacobi_is_exact_for_block_diagonal(rng):
    """With block == N the preconditioner IS the (jittered) inverse."""
    from facedeform_tpu.config import PolyTerm
    from facedeform_tpu.ops.assemble import assemble_system
    from facedeform_tpu.ops.krylov import make_block_jacobi

    ctrl = jnp.asarray(fibonacci_points(64))
    eps, lam = jnp.full((64,), 0.4, jnp.float32), jnp.float32(0.05)
    msolve = make_block_jacobi(
        ctrl, RBFKernel.GAUSSIAN, PolyTerm.ZERO, eps, lam, block=64, jitter=0.0
    )
    a = np.asarray(
        assemble_system(ctrl, RBFKernel.GAUSSIAN, PolyTerm.ZERO, eps, lam),
        np.float64,
    )
    r = rng.standard_normal((64, 2)).astype(np.float32)
    got = np.asarray(msolve(jnp.asarray(r)))
    want = np.linalg.solve(a, r.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pminres_matches_minres_solution(rng):
    """Preconditioning changes the path, not the answer."""
    from facedeform_tpu.config import PolyTerm
    from facedeform_tpu.ops.krylov import (
        make_block_jacobi, make_saddle_matvec, minres, pminres,
    )

    # eps near the nearest-neighbor spacing keeps the system well enough
    # conditioned that the solution is unique to f32 accuracy — otherwise
    # both solvers are "right" with visibly different weight vectors.
    ctrl = jnp.asarray(fibonacci_points(300))
    eps, lam = jnp.float32(0.12), jnp.float32(0.02)
    mv = make_saddle_matvec(ctrl, RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, lam)
    msolve = make_block_jacobi(
        ctrl, RBFKernel.GAUSSIAN, PolyTerm.LINEAR,
        jnp.full((300,), 0.12, jnp.float32), lam, block=128,
    )
    b = jnp.asarray(rng.standard_normal((304, 3)).astype(np.float32))
    x_p, rep_p = pminres(mv, b, msolve)
    x_m, rep_m = minres(mv, b)
    assert float(rep_p.backward_error()) < 1e-6
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_m), atol=2e-4)


@pytest.mark.parametrize("model_type", [RBFModelType.QNN, RBFModelType.KERNEL])
def test_fit_krylov_matches_dense_displacement(rng, model_type):
    """solver='krylov' (GMRES for QNN, PMINRES for KERNEL-gaussian) must
    reproduce the dense path's displacement field, not just its residual.
    Lifts the round-1 QNN large-N cap (VERDICT item 2)."""
    n = 400
    rest = fibonacci_points(n)
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    params = DeformParams(radius=0.4, lam=0.01)
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    outs = {}
    for solver in ("direct", "krylov"):
        cfg = DeformConfig(model=model_type, solver=solver)
        d = Deformer.fit(rest, deformed, cfg, params)
        outs[solver] = np.asarray(d.displacement(pts))
    err = np.abs(outs["direct"] - outs["krylov"]).max()
    scale = np.abs(outs["direct"]).max()
    assert err < 5e-5 + 1e-3 * scale, (err, scale)


# ----------------------------------------------- CPD |.|-block-Jacobi (round 2)
def test_abs_block_jacobi_is_spd(rng):
    """The preconditioner operator must be SPD even when the kernel blocks
    are indefinite (TPS): materialize M^-1 and check symmetric + positive
    eigenvalues."""
    from facedeform_tpu.ops.krylov import make_abs_block_jacobi

    ctrl = jnp.asarray(rng.standard_normal((90, 3)).astype(np.float32))
    msolve = make_abs_block_jacobi(
        ctrl, RBFKernel.THIN_PLATE, PolyTerm.LINEAR,
        jnp.ones((90,), jnp.float32), jnp.float32(0.01), block=32,
    )
    m_inv = np.asarray(msolve(jnp.eye(94, dtype=jnp.float32)))
    np.testing.assert_allclose(m_inv, m_inv.T, atol=1e-5)
    w = np.linalg.eigvalsh((m_inv + m_inv.T) / 2)
    assert w.min() > 0, w.min()


def test_abs_block_jacobi_inverts_definite_block(rng):
    """With block >= N and a PD kernel the |.|-spectral inverse equals the
    plain inverse (|w| = w), so M^-1 r recovers A^-1 r."""
    from facedeform_tpu.ops.assemble import assemble_system
    from facedeform_tpu.ops.krylov import make_abs_block_jacobi

    ctrl = jnp.asarray(fibonacci_points(64))
    eps, lam = jnp.full((64,), 0.4, jnp.float32), jnp.float32(0.05)
    msolve = make_abs_block_jacobi(
        ctrl, RBFKernel.GAUSSIAN, PolyTerm.ZERO, eps, lam, block=96,
    )
    a = np.asarray(
        assemble_system(ctrl, RBFKernel.GAUSSIAN, PolyTerm.ZERO, eps, lam),
        np.float64,
    )
    r = rng.standard_normal((64, 2)).astype(np.float32)
    got = np.asarray(msolve(jnp.asarray(r)))
    want = np.linalg.solve(a, r.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_cpd_preconditioner_beats_plain_minres(rng):
    """At a fixed iteration budget on a TPS saddle system, |.|-bj-PMINRES
    must land a materially lower true residual than plain MINRES (the
    round-2 fix for the 'CPD kernels run unpreconditioned' limit)."""
    from facedeform_tpu.ops.krylov import (
        make_abs_block_jacobi, make_saddle_matvec, minres, pminres,
    )

    n = 1200
    ctrl = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    eps = jnp.ones((n,), jnp.float32)
    lam = jnp.float32(0.01)
    mv = make_saddle_matvec(ctrl, RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam)
    b = assemble_rhs(
        jnp.asarray(0.05 * rng.standard_normal((n, 3)).astype(np.float32)),
        PolyTerm.LINEAR,
    )
    msolve = make_abs_block_jacobi(
        ctrl, RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam, block=256,
    )
    x_p, _ = pminres(mv, b, msolve, maxiter=128)
    x_m, _ = minres(mv, b, maxiter=128)
    r_p = float(jnp.linalg.norm(b - mv(x_p)))
    r_m = float(jnp.linalg.norm(b - mv(x_m)))
    assert r_p < 0.5 * r_m, (r_p, r_m)


def test_fit_krylov_tps_converges(rng):
    """End-to-end: solver='krylov' TPS fit reproduces the direct (dense df)
    path's displacement field within the f32 Krylov floor."""
    n = 500
    rest = fibonacci_points(n)
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    params = DeformParams(radius=1.0, lam=0.01)
    pts = rng.standard_normal((400, 3)).astype(np.float32)
    outs = {}
    for solver in ("direct", "krylov"):
        cfg = DeformConfig(
            model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE,
            solver=solver,
        )
        d = Deformer.fit(rest, deformed, cfg, params)
        outs[solver] = np.asarray(d.displacement(pts))
    err = np.abs(outs["direct"] - outs["krylov"]).max()
    scale = np.abs(outs["direct"]).max()
    assert err < 5e-3 * scale + 1e-4, (err, scale)


def test_pminres_zero_column_converges_immediately(rng):
    """A zero RHS column (planar rig delta) must not stall pminres at
    maxiter: its tracked residual is zeroed so live columns govern the
    loop, and the returned column is exactly zero."""
    from facedeform_tpu.ops.krylov import (
        make_abs_block_jacobi, make_saddle_matvec, pminres,
    )

    n = 300
    ctrl = jnp.asarray(fibonacci_points(n))
    eps, lam = jnp.ones((n,), jnp.float32), jnp.float32(0.05)
    mv = make_saddle_matvec(ctrl, RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam)
    msolve = make_abs_block_jacobi(
        ctrl, RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam, block=128
    )
    b = np.array(assemble_rhs(
        jnp.asarray(0.05 * rng.standard_normal((n, 3)).astype(np.float32)),
        PolyTerm.LINEAR,
    ))
    b[:, 2] = 0.0  # planar deformation
    x, rep = pminres(mv, b, msolve)
    x = np.asarray(x)
    np.testing.assert_array_equal(x[:, 2], 0.0)
    assert np.isfinite(x).all()
    # live columns still solved
    r = np.asarray(mv(jnp.asarray(x))) - b
    assert np.abs(r[:, :2]).max() < 1e-2 * np.abs(b).max()


def test_df_saddle_matvec_beats_f32(rng):
    """make_saddle_matvec_df: same saddle system, phi + main products in
    double-float.  On CPU the EFTs lose ~1 ulp to fusion rematerialization
    (CLAUDE.md) so the bar here is 'strictly more accurate than f32 and
    within a few f32 ulps of f64'; exactness holds on the TPU target
    (verified on-chip: 1.1e-7 vs f64 at 4k — the f32 output rounding)."""
    import jax.numpy as jnp

    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops.krylov import make_saddle_matvec_df

    n = 600
    ctrl = fibonacci_points(n)
    x = rng.standard_normal((n + 4, 3)).astype(np.float32)
    eps = jnp.ones((n,), jnp.float32)
    lam = jnp.float32(0.01)
    mv32 = make_saddle_matvec(
        jnp.asarray(ctrl), RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam
    )
    mvdf = make_saddle_matvec_df(
        jnp.asarray(ctrl), RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam
    )
    y32 = np.asarray(mv32(jnp.asarray(x)), np.float64)
    ydf = np.asarray(mvdf(jnp.asarray(x)), np.float64)

    c = ctrl.astype(np.float64)
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    phi = np.where(d2 <= 1e-30, 0.0,
                   0.5 * d2 * np.log(np.maximum(d2, 1e-30)))
    p = np.concatenate([np.ones((n, 1)), c], 1)
    xw, xc = x[:n].astype(np.float64), x[n:].astype(np.float64)
    yref = np.concatenate(
        [phi @ xw + 0.01 * xw + p @ xc, p.T @ xw - 1e-8 * xc]
    )
    sc = np.abs(yref).max()
    err32 = np.abs(y32 - yref).max() / sc
    errdf = np.abs(ydf - yref).max() / sc
    assert errdf < err32, (errdf, err32)
    assert errdf < 1e-6


def test_df_saddle_matvec_per_marker_lam(rng):
    """The (N,) per-marker ridge broadcasts identically on both matvecs."""
    import jax.numpy as jnp

    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops.krylov import make_saddle_matvec_df

    n = 300
    ctrl = fibonacci_points(n)
    x = rng.standard_normal((n + 4, 3)).astype(np.float32)
    eps = jnp.ones((n,), jnp.float32)
    lam_v = jnp.asarray(
        0.01 / np.linspace(0.2, 1.0, n), jnp.float32
    )
    mv32 = make_saddle_matvec(
        jnp.asarray(ctrl), RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, lam_v
    )
    mvdf = make_saddle_matvec_df(
        jnp.asarray(ctrl), RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, lam_v
    )
    np.testing.assert_allclose(
        np.asarray(mvdf(jnp.asarray(x))), np.asarray(mv32(jnp.asarray(x))),
        atol=5e-5,
    )


def test_pminres_df_beats_f32_floor(rng):
    """pminres_df (df vectors + df matvec) must land a strictly lower TRUE
    residual than f32 pminres at the same iteration budget on an
    ill-conditioned TPS saddle system — the property the opt-in API
    exists for (on chip at 800 ctrl: 5.6e-4 vs 3.5e-5; the CPU bar here
    is a 2x margin since XLA:CPU costs the EFTs ~1 ulp, CLAUDE.md)."""
    import jax.numpy as jnp

    from facedeform_tpu.ops.krylov import (
        make_abs_block_jacobi, make_saddle_matvec, make_saddle_matvec_df_pair,
        pminres, pminres_df,
    )

    n = 400
    ctrl = fibonacci_points(n)
    eps = jnp.ones((n,), jnp.float32)
    lam = jnp.float32(1e-4)
    mv32 = make_saddle_matvec(
        jnp.asarray(ctrl), RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam
    )
    mvdf = make_saddle_matvec_df_pair(
        jnp.asarray(ctrl), RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam
    )
    msolve = make_abs_block_jacobi(
        ctrl, RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam, block=128
    )
    b = assemble_rhs(
        jnp.asarray(0.05 * rng.standard_normal((n, 3)).astype(np.float32)),
        PolyTerm.LINEAR,
    )

    x32, _ = pminres(mv32, b, msolve, tol=0.0, maxiter=512)
    (xh, xl), rep = pminres_df(mvdf, b, msolve, tol=0.0, maxiter=512)
    xdf = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)

    # truthful f64 ruler: dense TPS saddle system assembled in numpy
    c = ctrl.astype(np.float64)
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    phi = np.where(d2 <= 1e-30, 0.0,
                   0.5 * d2 * np.log(np.maximum(d2, 1e-30)))
    p = np.concatenate([np.ones((n, 1)), c], 1)
    a = np.zeros((n + 4, n + 4))
    a[:n, :n] = phi + float(lam) * np.eye(n)
    a[:n, n:] = p
    a[n:, :n] = p.T
    a[n:, n:] = -1e-8 * np.eye(4)
    bb = np.asarray(b, np.float64)

    def rel_res(x):
        return np.abs(a @ x - bb).max() / np.abs(bb).max()

    r32 = rel_res(np.asarray(x32, np.float64))
    rdf = rel_res(xdf)
    assert np.isfinite(rdf) and np.isfinite(r32)
    assert rdf < 0.5 * r32, (r32, rdf)
