"""Unit tests: kernel zoo values vs closed form, distance math (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu.config import RBFKernel
from facedeform_tpu.ops.kernels import apply_kernel, nearest_neighbor_dist, pairwise_sqdist

ALL_KERNELS = list(RBFKernel)


def test_pairwise_sqdist_matches_numpy(rng):
    x = rng.standard_normal((37, 3)).astype(np.float32)
    y = rng.standard_normal((23, 3)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = np.sum((x[:, None] - y[None]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (got >= 0).all()


@pytest.mark.parametrize("kernel", ALL_KERNELS)
def test_kernel_closed_form(kernel):
    d = np.array([0.0, 0.1, 0.5, 1.0, 2.0, 5.0])
    eps = 1.3
    s = (d / eps) ** 2
    got = np.asarray(apply_kernel(kernel, jnp.asarray(d * d, jnp.float32), eps))
    closed = {
        RBFKernel.GAUSSIAN: np.exp(-s),
        RBFKernel.THIN_PLATE: np.where(s > 0, 0.5 * s * np.log(np.maximum(s, 1e-300)), 0.0),
        RBFKernel.MULTIQUADRIC: np.sqrt(1 + s),
        RBFKernel.INVERSE_MULTIQUADRIC: 1 / np.sqrt(1 + s),
        RBFKernel.LINEAR: np.sqrt(s),
        RBFKernel.CUBIC: s ** 1.5,
        RBFKernel.WENDLAND_C2: np.maximum(1 - np.sqrt(s), 0) ** 4 * (4 * np.sqrt(s) + 1),
    }[kernel]
    np.testing.assert_allclose(got, closed, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("kernel", ALL_KERNELS)
def test_kernel_finite_at_zero(kernel):
    got = np.asarray(apply_kernel(kernel, jnp.zeros((4,), jnp.float32), 0.7))
    assert np.isfinite(got).all()


def test_kernel_per_point_radii_broadcast():
    d2 = jnp.ones((5, 3), jnp.float32)
    eps = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    got = np.asarray(apply_kernel(RBFKernel.GAUSSIAN, d2, eps))
    want = np.exp(-1.0 / np.array([0.25, 1.0, 4.0]))
    np.testing.assert_allclose(got, np.broadcast_to(want, (5, 3)), rtol=1e-6)


def test_nearest_neighbor_dist(rng):
    pts = rng.standard_normal((20, 3)).astype(np.float32)
    got = np.asarray(nearest_neighbor_dist(jnp.asarray(pts)))
    d = np.sqrt(np.sum((pts[:, None] - pts[None]) ** 2, -1))
    np.fill_diagonal(d, np.inf)
    np.testing.assert_allclose(got, d.min(axis=1), rtol=1e-4, atol=1e-6)


def test_evaluate_chunked_matches_block(rng):
    """lax.map chunking path == single-block path (ops/evaluate.py)."""
    import jax.numpy as jnp
    from facedeform_tpu import DeformConfig, DeformParams, Deformer
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops.evaluate import evaluate
    from facedeform_tpu.ops.fit import effective_kernel

    rest = fibonacci_points(20)
    d = Deformer.fit(rest, rest * 1.05, DeformConfig(), DeformParams())
    pts = jnp.asarray(rng.standard_normal((1000, 3)).astype(np.float32))
    kernel = effective_kernel(d.cfg)
    full = evaluate(d.model, pts, kernel, d.cfg.term, chunk=4096)
    chunked = evaluate(d.model, pts, kernel, d.cfg.term, chunk=128)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-6)
