"""Fused tangent projection in the Pallas kernel vs the dense path."""

import numpy as np
import jax.numpy as jnp

from facedeform_tpu import DeformConfig, DeformParams, Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops.fit import effective_kernel
from facedeform_tpu.ops.pallas_eval import evaluate_pallas


def _unit(rng, n):
    x = rng.standard_normal((n, 3)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_pallas_tangent_matches_dense(rng):
    rest = fibonacci_points(30)
    deformed = rest + 0.1 * rng.standard_normal((30, 3)).astype(np.float32)
    cfg = DeformConfig(tangent=True)
    d = Deformer.fit(rest, deformed, cfg, DeformParams(radius=1.2))
    v = 257
    pts = rng.standard_normal((v, 3)).astype(np.float32)
    dist2 = np.abs(rng.standard_normal(v)).astype(np.float32)
    n = _unit(rng, v)
    u = np.cross(n, _unit(rng, v))
    u /= np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-9)
    tv = np.cross(n, u)
    frame = (u.astype(np.float32), tv.astype(np.float32), n.astype(np.float32))

    ref_pts, ref_w = d.apply(pts, dist2=dist2, frame=frame, backend="dense")
    got_pts, got_w = evaluate_pallas(
        d.model, jnp.asarray(pts), jnp.asarray(dist2), jnp.ones(v),
        jnp.float32(1.2), jnp.float32(1.0),
        effective_kernel(cfg), cfg.term,
        tile_v=128, interpret=True,
        frame=tuple(jnp.asarray(f) for f in frame),
    )
    np.testing.assert_allclose(np.asarray(got_pts), np.asarray(ref_pts), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), atol=1e-6)


def test_pallas_tangent_kills_normal_component(rng):
    """Projected displacement must be orthogonal to the (orthonormal) normal."""
    rest = fibonacci_points(20)
    deformed = rest + np.float32([0, 0.2, 0])
    cfg = DeformConfig(tangent=True)
    d = Deformer.fit(rest, deformed, cfg, DeformParams(radius=2.0))
    v = 128
    pts = rng.standard_normal((v, 3)).astype(np.float32)
    n = np.tile(np.float32([0, 1, 0]), (v, 1))
    u = np.tile(np.float32([1, 0, 0]), (v, 1))
    tv = np.tile(np.float32([0, 0, 1]), (v, 1))
    got_pts, _ = evaluate_pallas(
        d.model, jnp.asarray(pts), jnp.zeros(v), jnp.ones(v),
        jnp.float32(10.0), jnp.float32(1.0),
        effective_kernel(cfg), cfg.term,
        tile_v=128, interpret=True,
        frame=(jnp.asarray(u), jnp.asarray(tv), jnp.asarray(n)),
    )
    disp = np.asarray(got_pts) - pts
    # with orthonormal (u, v, n), a1=u and a2=v: y-component must vanish
    assert np.abs(disp[:, 1]).max() < 1e-5
    # but the rig moves straight +y, so unprojected displacement is ~0.2y:
    ref, _ = d.apply(pts, backend="dense")
    assert np.abs(np.asarray(ref) - pts)[:, 1].max() > 0.05
