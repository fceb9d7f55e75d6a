"""Solver tests: compensated refinement accuracy vs float64 (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from facedeform_tpu.ops.solve import (
    cholesky_solve_refined,
    lu_solve_refined,
    residual_compensated,
)
from facedeform_tpu.utils import errors


def _rbf_like_system(rng, n=400, cond_boost=0.0):
    """Gaussian kernel matrix over random points — realistically conditioned."""
    pts = rng.standard_normal((n, 3))
    d2 = np.sum((pts[:, None] - pts[None]) ** 2, -1)
    a = np.exp(-d2) + cond_boost * np.eye(n)
    b = rng.standard_normal((n, 3))
    return a.astype(np.float32), b.astype(np.float32)


def test_residual_compensated_beats_plain_f32(rng):
    a64 = rng.standard_normal((256, 256))
    x64 = rng.standard_normal((256, 3))
    b64 = a64 @ x64  # so the true residual is ~0, pure cancellation
    a, x, b = (v.astype(np.float32) for v in (a64, x64, b64))
    # truth computed in f64 from the *f32-rounded* operands
    true_r = b.astype(np.float64) - a.astype(np.float64) @ x.astype(np.float64)
    comp = np.asarray(residual_compensated(jnp.asarray(a), jnp.asarray(x), jnp.asarray(b)))
    plain = np.asarray(b - np.asarray(jnp.dot(jnp.asarray(a), jnp.asarray(x))))
    err_comp = np.abs(comp - true_r).max()
    err_plain = np.abs(plain - true_r).max()
    assert err_comp < err_plain / 4
    assert err_comp < 2e-5


def test_lu_refined_close_to_f64(rng):
    a, b = _rbf_like_system(rng, n=400, cond_boost=1e-3)
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    x, report = lu_solve_refined(jnp.asarray(a), jnp.asarray(b), n_refine=2)
    x = np.asarray(x)
    rel = np.abs(x - x_ref).max() / max(np.abs(x_ref).max(), 1e-30)
    assert rel < 1e-4, rel
    # residual should be tiny relative to rhs
    assert float(report.residual_norm) < 1e-4 * float(report.rhs_norm)


def test_refinement_actually_helps(rng):
    a, b = _rbf_like_system(rng, n=300, cond_boost=1e-5)
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    x0, _ = lu_solve_refined(jnp.asarray(a), jnp.asarray(b), n_refine=0)
    x2, _ = lu_solve_refined(jnp.asarray(a), jnp.asarray(b), n_refine=2)
    err0 = np.abs(np.asarray(x0) - x_ref).max()
    err2 = np.abs(np.asarray(x2) - x_ref).max()
    assert err2 <= err0


def test_cholesky_refined(rng):
    m = rng.standard_normal((100, 60))
    a = (m.T @ m + 0.1 * np.eye(60)).astype(np.float32)
    b = rng.standard_normal((60, 2)).astype(np.float32)
    x_ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    x, report = cholesky_solve_refined(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-4, atol=1e-5)
    errors.check_solve(report)  # should not raise


def test_check_solve_raises_on_singular():
    a = jnp.zeros((8, 8), jnp.float32)
    b = jnp.ones((8, 1), jnp.float32)
    _, report = lu_solve_refined(a, b)
    try:
        errors.check_solve(report)
    except errors.SolveFailedError:
        return
    raise AssertionError("expected SolveFailedError")
