"""Sharded skinning fit (parallel/skinning_sharded.py) on the 8-device
CPU mesh: parity with the single-device fit, padding correctness, and
the zero-steady-state-collectives contract for the local stages."""

import numpy as np

from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.ops import skinning
from facedeform_tpu.parallel import skinning_sharded
from facedeform_tpu.parallel.sharding import make_mesh


def _rotation(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(angle) * k
            + (1 - np.cos(angle)) * (k @ k)).astype(np.float32)


def test_sharded_rigid_clusters_match_single_device():
    """Deterministic case: rigid two-cluster motion recovers exactly on
    both paths, with identical reconstruction (argmin ties aside, the
    hard assignment is unambiguous here)."""
    pts = fibonacci_points(403) * np.float32([2.0, 1.0, 1.0])  # pads 403->408
    left = pts[:, 0] < 0
    frames = []
    for ang in (0.2, 0.5, -0.3):
        r = _rotation([0, 0, 1], ang)
        moved = pts.copy()
        moved[left] = pts[left] @ r.T + np.float32([0.1, 0.3, 0.0]) * ang
        frames.append(moved)
    frames = np.stack(frames)

    m_sh, rep_sh = skinning_sharded.fit_skinning_sharded(
        pts, frames, make_mesh(), n_bones=2, max_influences=2, seed=3
    )
    m_1d, rep_1d = skinning.fit_skinning(
        pts, frames, n_bones=2, max_influences=2, seed=3
    )
    assert rep_sh.rmse < 1e-3 * rep_sh.bbox_diag, rep_sh
    assert abs(rep_sh.rmse - rep_1d.rmse) < 1e-4 * rep_sh.bbox_diag
    # padded rows never leak: weights are exactly (V, B) and rows sum to 1
    w = np.asarray(m_sh.weights)
    assert w.shape == (403, 2)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    # per-pose LBS output parity between the two models
    for f in range(3):
        a = np.asarray(skinning.lbs_apply(
            m_sh.weights, m_sh.rest, m_sh.rotations[f], m_sh.translations[f]
        ))
        b = np.asarray(skinning.lbs_apply(
            m_1d.weights, m_1d.rest, m_1d.rotations[f], m_1d.translations[f]
        ))
        assert np.abs(a - b).max() < 1e-4


def test_sharded_smooth_field_quality():
    """Smooth twist: reduction-order drift must not cost quality — the
    sharded fit lands in the same quality regime as single-device."""
    mesh_g = uv_sphere(16, 16)
    pts = mesh_g.points
    ang = 0.6 * (pts[:, 1] - pts[:, 1].min())
    ca, sa = np.cos(ang), np.sin(ang)
    moved = np.stack(
        [ca * pts[:, 0] - sa * pts[:, 2], pts[:, 1],
         sa * pts[:, 0] + ca * pts[:, 2]], -1
    ).astype(np.float32)
    frames = np.stack([pts + 0.5 * (moved - pts), moved])

    m_sh, rep_sh = skinning_sharded.fit_skinning_sharded(
        pts, frames, make_mesh(), n_bones=8, max_influences=4, seed=0
    )
    m_1d, rep_1d = skinning.fit_skinning(
        pts, frames, n_bones=8, max_influences=4, seed=0
    )
    assert rep_sh.rmse < 1.5 * max(rep_1d.rmse, 1e-6), (rep_sh, rep_1d)
    w = np.asarray(m_sh.weights)
    assert ((w > 1e-6).sum(-1) <= 4).all()
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)


def test_sharded_influence_cap_under_ties():
    """Pure translation (exact weight ties) through the sharded path."""
    pts = fibonacci_points(61)  # pads 61 -> 64
    frames = np.stack([pts + np.float32([0.3, 0, 0]),
                       pts + np.float32([0, 0.5, 0])])
    m, rep = skinning_sharded.fit_skinning_sharded(
        pts, frames, make_mesh(), n_bones=4, max_influences=2, seed=0
    )
    w = np.asarray(m.weights)
    assert w.shape == (61, 4)
    assert ((w > 1e-6).sum(-1) <= 2).all()
    assert rep.rmse < 1e-5
