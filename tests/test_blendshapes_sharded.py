"""Sharded PCA blendshape bake (parallel/blendshapes_sharded.py) on the
8-device CPU mesh: parity with the single-device bake, padding
correctness, and the zero-mean / no-center routes."""

import numpy as np
import pytest

from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops import blendshapes as bs
from facedeform_tpu.parallel.sharding import make_mesh


def _shot(v=403, f=9, seed=0):
    """A rank-structured shot: mean offset + 3 smooth modes + noise."""
    rng = np.random.default_rng(seed)
    rest = fibonacci_points(v)
    modes = np.stack([
        np.sin(3.0 * rest[:, 0])[:, None] * np.float32([0, 1, 0]),
        np.cos(2.0 * rest[:, 1])[:, None] * np.float32([1, 0, 0]),
        (rest[:, 2] ** 2)[:, None] * np.float32([0, 0, 1]),
    ])                                                   # (3, V, 3)
    curves = rng.normal(size=(f, 3)).astype(np.float32)
    deltas = np.einsum("fk,kvi->fvi", curves, modes)
    deltas += 0.05 * np.float32([0, 0, 1])               # mean offset
    deltas += 1e-3 * rng.normal(size=deltas.shape).astype(np.float32)
    return rest.astype(np.float32), (rest + deltas).astype(np.float32)


def test_sharded_matches_single_device():
    rest, frames = _shot()                               # 403 pads -> 408
    m1, r1 = bs.fit_blendshapes(rest, frames, rank=3)
    m8, r8 = bs.fit_blendshapes(rest, frames, rank=3, mesh=make_mesh())
    assert m8.targets.shape == m1.targets.shape == (4, 403, 3)
    # Same host eigh on (tiny-float-diff) Grams: targets and weights agree
    np.testing.assert_allclose(
        np.asarray(m8.targets), np.asarray(m1.targets), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m8.weights), np.asarray(m1.weights), atol=1e-5
    )
    assert abs(r8.rmse - r1.rmse) < 1e-6
    assert abs(r8.max_err - r1.max_err) < 1e-5
    assert abs(r8.energy - r1.energy) < 1e-6
    # leading (kept) modes match tightly; the tail sits at the Gram's
    # f32 accumulation noise floor, where summation order moves it
    np.testing.assert_allclose(
        r8.singular_values[:3], r1.singular_values[:3], rtol=1e-5
    )
    assert np.all(
        np.abs(r8.singular_values - r1.singular_values)
        < 1e-4 * r1.singular_values[0]
    )


def test_sharded_reconstruction_quality():
    rest, frames = _shot()
    m8, r8 = bs.fit_blendshapes(rest, frames, rank=3, mesh=make_mesh())
    recon = np.asarray(bs.apply_blendshapes(m8))
    # rank 3 + mean captures everything but the 1e-3 noise floor
    assert np.abs(recon - frames).max() < 5e-3
    assert r8.energy > 0.99


def test_sharded_zero_mean_skips_mean_target():
    # rest == 0 makes frames - rest exact, and a single ±delta PAIR sums
    # to an EXACTLY zero f32 mean (longer shots leave sequential-sum
    # roundoff) — the only case the mean target is skipped
    rest, frames = _shot()
    delta = frames[0] - rest
    rest0 = np.zeros_like(rest)
    sym = np.stack([delta, -delta])
    m8, _ = bs.fit_blendshapes(rest0, sym, rank=2, mesh=make_mesh())
    m1, _ = bs.fit_blendshapes(rest0, sym, rank=2)
    assert m8.n_targets == m1.n_targets == 1              # no mean target
    assert m8.target_names()[0] == "pc_000"


def test_sharded_no_center():
    rest, frames = _shot()
    m1, r1 = bs.fit_blendshapes(rest, frames, rank=4, center=False)
    m8, r8 = bs.fit_blendshapes(
        rest, frames, rank=4, center=False, mesh=make_mesh()
    )
    np.testing.assert_allclose(
        np.asarray(m8.targets), np.asarray(m1.targets), atol=1e-5
    )
    assert abs(r8.rmse - r1.rmse) < 1e-6


def test_sharded_exact_multiple_no_padding():
    rest, frames = _shot(v=400)                          # 400 % 8 == 0
    m8, r8 = bs.fit_blendshapes(rest, frames, rank=3, mesh=make_mesh())
    m1, r1 = bs.fit_blendshapes(rest, frames, rank=3)
    np.testing.assert_allclose(
        np.asarray(m8.targets), np.asarray(m1.targets), atol=1e-5
    )
    assert abs(r8.rmse - r1.rmse) < 1e-6


def test_sharded_single_frame():
    rest, frames = _shot(f=1)
    m8, r8 = bs.fit_blendshapes(rest, frames, rank=1, mesh=make_mesh())
    recon = np.asarray(bs.apply_blendshapes(m8))
    np.testing.assert_allclose(recon, frames, atol=1e-5)
