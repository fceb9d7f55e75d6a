"""Custom-VJP fused eval: gradients match the dense path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from facedeform_tpu import DeformConfig, DeformParams, Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops.fit import effective_kernel
from facedeform_tpu.ops import pallas_eval


def _setup(rng):
    rest = fibonacci_points(20)
    deformed = rest + 0.1 * rng.standard_normal((20, 3)).astype(np.float32)
    d = Deformer.fit(rest, deformed, DeformConfig(), DeformParams())
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    return d, jnp.asarray(pts)


def test_vjp_matches_dense_grads(rng, monkeypatch):
    d, pts = _setup(rng)
    kernel = effective_kernel(d.cfg)
    v = pts.shape[0]
    dist2 = jnp.zeros(v)
    gate = jnp.ones(v)
    r = jnp.float32(2.0)
    fr = jnp.float32(1.0)

    # forward on CPU must route through interpret mode
    orig = pallas_eval.evaluate_pallas

    def interp(*args, **kw):
        kw.setdefault("interpret", True)
        kw.setdefault("tile_v", 64)
        return orig(*args, **kw)

    monkeypatch.setattr(pallas_eval, "evaluate_pallas", interp)

    def loss_pallas(w_rbf, p):
        m = d.model._replace(w_rbf=w_rbf)
        out, _ = pallas_eval.evaluate_pallas_diff(
            m, p, dist2, gate, r, fr, None, kernel, d.cfg.term, False
        )
        return jnp.sum(out ** 2)

    def loss_dense(w_rbf, p):
        m = d.model._replace(w_rbf=w_rbf)
        out, _ = pallas_eval._dense_reference(
            m, p, dist2, gate, r, fr, None, kernel, d.cfg.term, False
        )
        return jnp.sum(out ** 2)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1))(d.model.w_rbf, pts)
    g_dense = jax.grad(loss_dense, argnums=(0, 1))(d.model.w_rbf, pts)
    for a, b in zip(g_pallas, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_vjp_forward_equals_plain(rng, monkeypatch):
    d, pts = _setup(rng)
    kernel = effective_kernel(d.cfg)
    v = pts.shape[0]
    # on CPU, call the underlying kernel in interpret mode for both
    out_a = pallas_eval.evaluate_pallas(
        d.model, pts, jnp.zeros(v), jnp.ones(v), jnp.float32(2.0),
        jnp.float32(1.0), kernel, d.cfg.term, tile_v=64, interpret=True,
    )
    out_b = pallas_eval._dense_reference(
        d.model, pts, jnp.zeros(v), jnp.ones(v), jnp.float32(2.0),
        jnp.float32(1.0), None, kernel, d.cfg.term, False,
    )
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]), atol=2e-5)
