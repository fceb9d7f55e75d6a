"""Model-family API and precise transcendental tests."""

import numpy as np
import jax.numpy as jnp

from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.models import (
    KernelZooDeformModel,
    MultilayerDeformModel,
    QNNDeformModel,
)
from facedeform_tpu.config import RBFKernel
from facedeform_tpu.ops.precise_math import precise_exp, precise_log


def test_precise_log_accuracy():
    x = np.concatenate(
        [np.linspace(1e-4, 4, 20000), np.logspace(-6, 3, 20000)]
    ).astype(np.float32)
    got = np.asarray(precise_log(jnp.asarray(x))).astype(np.float64)
    ref = np.log(x.astype(np.float64))
    m = np.abs(ref) > 1e-5
    assert (np.abs(got - ref)[m] / np.abs(ref)[m]).max() < 5e-7


def test_precise_exp_accuracy():
    x = np.linspace(-86, 3, 50000).astype(np.float32)
    got = np.asarray(precise_exp(jnp.asarray(x))).astype(np.float64)
    ref = np.exp(x.astype(np.float64))
    assert (np.abs(got - ref) / np.maximum(ref, 1e-300)).max() < 5e-7


def test_precise_exp_underflow_flush():
    got = np.asarray(precise_exp(jnp.asarray([-100.0, -500.0], jnp.float32)))
    assert (got == 0.0).all()


def test_model_families_fit_and_deform(rng):
    rest = fibonacci_points(30)
    deformed = rest + 0.1 * rng.standard_normal((30, 3)).astype(np.float32)
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    for model in (
        QNNDeformModel(qcoef=1.0, zcoef=5.0),
        MultilayerDeformModel(radius=1.5, layers=2, lam=0.05),
        KernelZooDeformModel(kernel=RBFKernel.MULTIQUADRIC, radius=1.5),
    ):
        d = model.fit(rest, deformed)
        out, _ = d.apply(pts, backend="dense")
        assert np.isfinite(np.asarray(out)).all()
        moved = np.abs(np.asarray(out) - pts).max()
        assert moved > 1e-3


def test_qnn_model_exact_interpolation(rng):
    rest = fibonacci_points(25)
    deformed = rest + 0.1 * rng.standard_normal((25, 3)).astype(np.float32)
    d = QNNDeformModel().fit(rest, deformed)
    disp = np.asarray(d.displacement(rest))
    np.testing.assert_allclose(disp, deformed - rest, atol=5e-5)
