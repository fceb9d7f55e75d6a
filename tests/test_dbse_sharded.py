"""Sharded DBSE (psum Gram reductions) vs the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facedeform_tpu.ops import dbse
from facedeform_tpu.parallel import sharding
from facedeform_tpu.utils import errors
from facedeform_tpu.parallel.dbse_sharded import (
    morph_pass_sharded,
    reconstruct_sharded,
    weights_lstsq_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    return sharding.make_mesh()


def _setup(rng, v=501, s=6):  # v deliberately not divisible by 8
    rest = rng.standard_normal((v, 3)).astype(np.float32)
    shapes = [rest + 0.1 * rng.standard_normal((v, 3)).astype(np.float32)
              for _ in range(s)]
    model = dbse.build_model(rest, shapes)
    pose = rest + 0.2 * rng.standard_normal((v, 3)).astype(np.float32)
    return rest, model, pose


def test_sharded_weights_match_single(rng, mesh):
    rest, model, pose = _setup(rng)
    w_single, rep_single = dbse.weights_lstsq(
        model, jnp.asarray(pose), jnp.asarray(rest)
    )
    w_sharded, rep_sharded = weights_lstsq_sharded(
        model.deltas, jnp.asarray(pose), jnp.asarray(rest), mesh
    )
    np.testing.assert_allclose(np.asarray(w_sharded), np.asarray(w_single),
                               rtol=1e-4, atol=1e-6)
    # Health report: both paths agree the solve is healthy, to the same
    # normwise measure (errors.check_solve consumes either identically).
    errors.check_solve(rep_sharded)
    assert float(rep_sharded.backward_error()) <= 10 * max(
        float(rep_single.backward_error()), 1e-9
    )


def test_sharded_health_check_trips_like_single(rng, mesh):
    """An ill-conditioned blend basis must fail check_solve on BOTH paths
    (the reference's terminationtype check, src/SOP_FaceDeform.cpp:363-368;
    round-2 gap: the sharded path only checked isfinite)."""
    v, s = 256, 5
    rest = rng.standard_normal((v, 3)).astype(np.float32)
    base = rng.standard_normal((v, 3)).astype(np.float32)
    # Degenerate basis: one shape's delta overflows the f32 Gram assembly
    # (|delta|^2 ~ 1e40 > f32 max) -> inf Gram -> NaN Cholesky.  The
    # single-device path already warns on this; the sharded path must too.
    shapes = [rest + 0.1 * base for _ in range(s)]
    shapes[2] = rest + np.float32(1e20) * base
    model = dbse.build_model(rest, shapes)
    pose = rest + 0.1 * base
    _, rep_single = dbse.weights_lstsq(model, jnp.asarray(pose), jnp.asarray(rest))
    _, rep_sharded = weights_lstsq_sharded(
        model.deltas, jnp.asarray(pose), jnp.asarray(rest), mesh
    )
    single_fails = sharded_fails = False
    try:
        errors.check_solve(rep_single)
    except errors.SolveFailedError:
        single_fails = True
    try:
        errors.check_solve(rep_sharded)
    except errors.SolveFailedError:
        sharded_fails = True
    assert single_fails and sharded_fails, (single_fails, sharded_fails)


def test_sharded_reconstruct_matches_single(rng, mesh):
    rest, model, pose = _setup(rng)
    w = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    single = dbse.reconstruct(model, w, None, parity_scale=False)
    shard = reconstruct_sharded(model.deltas, w, mesh)
    np.testing.assert_allclose(np.asarray(shard), np.asarray(single), atol=1e-5)


def test_sharded_morph_pass(rng, mesh):
    rest, model, pose = _setup(rng)
    new_pts, w = morph_pass_sharded(
        model, jnp.asarray(pose), jnp.asarray(rest), mesh,
        clamp=(jnp.float32(-1.0), jnp.float32(1.0)),
    )
    assert new_pts.shape == (501, 3)
    # output must lie in rest + span(deltas) with the clamped weights
    want = rest + np.einsum(
        "s,svc->vc", np.clip(np.asarray(w), -1, 1), np.asarray(model.deltas)
    )
    np.testing.assert_allclose(np.asarray(new_pts), want, atol=1e-5)
