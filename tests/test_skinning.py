"""Skinning decomposition (ops/skinning.py): bake RBF deforms to LBS.

Checks the SSDR-style alternation against constructions with known
answers (rigid clusters recover exactly), the capped-simplex weight
invariants, the projection against an f64 reference, and the LBS
reconstruction against a NumPy oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.ops import skinning


def _rotation(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(angle) * k
            + (1 - np.cos(angle)) * (k @ k)).astype(np.float32)


# ------------------------------------------------------------- projection


def _proj_simplex_ref(row):
    """f64 reference: Euclidean projection onto the probability simplex."""
    s = np.sort(row)[::-1]
    cs = np.cumsum(s)
    k = np.arange(1, len(row) + 1)
    tau = (cs - 1.0) / k
    n_active = np.max(np.nonzero(s > tau)[0]) + 1
    return np.maximum(row - tau[n_active - 1], 0.0)


def test_project_capped_simplex_matches_reference(rng):
    w = rng.normal(size=(40, 12)).astype(np.float32)
    mask = np.ones_like(w, dtype=bool)
    got = np.asarray(skinning.project_capped_simplex(
        jnp.asarray(w), jnp.asarray(mask)
    ), np.float64)
    for i in range(w.shape[0]):
        np.testing.assert_allclose(
            got[i], _proj_simplex_ref(w[i].astype(np.float64)), atol=1e-5
        )
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
    assert (got >= 0).all()


def test_project_capped_simplex_respects_mask(rng):
    w = rng.normal(size=(30, 8)).astype(np.float32)
    mask = rng.random((30, 8)) < 0.5
    mask[:, 0] = True  # at least one allowed bone per row
    got = np.asarray(skinning.project_capped_simplex(
        jnp.asarray(w), jnp.asarray(mask)
    ), np.float64)
    assert (got[~mask] == 0).all()
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
    # masked projection == reference projection of the allowed subset
    for i in range(w.shape[0]):
        sub = _proj_simplex_ref(w[i, mask[i]].astype(np.float64))
        np.testing.assert_allclose(got[i, mask[i]], sub, atol=1e-5)


# -------------------------------------------------------------- rigid cases


def test_two_rigid_clusters_recover_exactly(rng):
    """Vertices following one of two rigid motions decompose at ~zero
    error with binary weights — the SSDR sanity case."""
    pts = fibonacci_points(400) * np.float32([2.0, 1.0, 1.0])
    left = pts[:, 0] < 0
    frames = []
    for ang in (0.2, 0.5, -0.3):
        r = _rotation([0, 0, 1], ang)
        moved = pts.copy()
        moved[left] = pts[left] @ r.T + np.float32([0.1, 0.3, 0.0]) * ang
        frames.append(moved)
    frames = np.stack(frames)
    model, report = skinning.fit_skinning(
        pts, frames, n_bones=2, max_influences=2, seed=3
    )
    assert report.rmse < 1e-3 * report.bbox_diag, report
    w = np.asarray(model.weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    assert (w >= -1e-6).all()
    # weights are (near) binary: every vertex committed to one bone
    assert float(np.abs(w - w.round()).max()) < 0.05


def test_single_bone_recovers_rigid_motion(rng):
    pts = fibonacci_points(200)
    r_true = _rotation([1, 2, 0], 0.7)
    t_true = np.float32([0.4, -0.2, 1.0])
    frames = (pts @ r_true.T + t_true)[None]
    model, report = skinning.fit_skinning(
        pts, frames, n_bones=1, max_influences=1, outer_iters=2
    )
    assert report.rmse < 1e-5
    np.testing.assert_allclose(
        np.asarray(model.rotations[0, 0]), r_true, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(model.translations[0, 0]), t_true, atol=1e-4
    )


def test_off_origin_mesh_converges(rng):
    """The centered PGD must not crawl on meshes far from the origin."""
    pts = fibonacci_points(300) + np.float32([50.0, -30.0, 20.0])
    left = pts[:, 0] < 50.0
    moved = pts.copy()
    moved[left] = (pts[left] - pts.mean(0)) @ _rotation(
        [0, 1, 0], 0.4
    ).T + pts.mean(0) + np.float32([0, 0.2, 0])
    model, report = skinning.fit_skinning(
        pts, moved[None], n_bones=2, max_influences=2, seed=1
    )
    assert report.rmse < 2e-3 * report.bbox_diag, report


# ----------------------------------------------------------- smooth fields


def test_smooth_field_error_decreases_with_bones(rng):
    """A smooth bend needs several bones; more bones must fit better,
    and the influence cap must hold."""
    mesh = uv_sphere(24, 24)
    pts = mesh.points
    # smooth twist: rotation angle varies with height
    ang = 0.6 * (pts[:, 1] - pts[:, 1].min())
    ca, sa = np.cos(ang), np.sin(ang)
    moved = np.stack(
        [ca * pts[:, 0] - sa * pts[:, 2], pts[:, 1],
         sa * pts[:, 0] + ca * pts[:, 2]], -1
    ).astype(np.float32)
    frames = np.stack([pts + 0.5 * (moved - pts), moved])

    errs = {}
    for b in (4, 12):
        model, report = skinning.fit_skinning(
            pts, frames, n_bones=b, max_influences=4, seed=0
        )
        errs[b] = report.rmse
        w = np.asarray(model.weights)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
        assert ((w > 1e-6).sum(-1) <= 4).all()
    assert errs[12] < 0.7 * errs[4], errs
    assert errs[12] < 0.02 * float(np.linalg.norm(pts.max(0) - pts.min(0)))


def test_laplacian_smoothness_reduces_roughness(rng):
    """Noisy-sweep fixture: a smooth twist plus per-vertex tracker noise.
    With smooth_lambda, boundary-weight roughness must drop measurably
    while reconstruction RMSE stays essentially flat (the regularizer
    trades fitting NOISE, not signal)."""
    from facedeform_tpu.geometry.topology import unique_edges

    mesh = uv_sphere(20, 20)
    pts = mesh.points
    edges = unique_edges(mesh.faces)
    ang = 0.6 * (pts[:, 1] - pts[:, 1].min())
    ca, sa = np.cos(ang), np.sin(ang)
    moved = np.stack(
        [ca * pts[:, 0] - sa * pts[:, 2], pts[:, 1],
         sa * pts[:, 0] + ca * pts[:, 2]], -1
    ).astype(np.float32)
    frames = np.stack([pts + 0.5 * (moved - pts), moved])
    frames = frames + 0.01 * rng.standard_normal(
        frames.shape
    ).astype(np.float32)

    _, rep0 = skinning.fit_skinning(
        pts, frames, n_bones=8, max_influences=4, seed=0, edges=edges
    )
    m1, rep1 = skinning.fit_skinning(
        pts, frames, n_bones=8, max_influences=4, seed=0, edges=edges,
        smooth_lambda=0.1,
    )
    assert rep0.weight_roughness is not None
    assert rep1.weight_roughness is not None
    # measurably smoother boundaries (measured 0.61 -> 0.16 at lam 0.1)...
    assert rep1.weight_roughness < 0.5 * rep0.weight_roughness, (
        rep0.weight_roughness, rep1.weight_roughness,
    )
    # ...at near-flat reconstruction quality (measured +15%; the model
    # error of 8 bones on a smooth twist dominates, not the noise)
    assert rep1.rmse < 1.25 * rep0.rmse, (rep0.rmse, rep1.rmse)
    # invariants survive the regularizer
    w = np.asarray(m1.weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    assert ((w > 1e-6).sum(-1) <= 4).all()


def test_edges_without_lambda_only_report(rng):
    """edges= alone (lambda 0) must not change the fit — it only adds
    the roughness metric to the report."""
    from facedeform_tpu.geometry.topology import unique_edges

    mesh = uv_sphere(8, 8)
    pts = mesh.points
    frames = (pts + np.float32([0, 0.2, 0]))[None]
    edges = unique_edges(mesh.faces)
    m0, rep0 = skinning.fit_skinning(pts, frames, n_bones=2,
                                     max_influences=2, seed=0)
    m1, rep1 = skinning.fit_skinning(
        pts, frames, n_bones=2, max_influences=2, seed=0, edges=edges
    )
    np.testing.assert_array_equal(
        np.asarray(m0.weights), np.asarray(m1.weights)
    )
    assert rep0.weight_roughness is None
    assert rep1.weight_roughness is not None


def test_smooth_lambda_bad_edges_raise(rng):
    pts = fibonacci_points(20)
    frames = (pts + np.float32([0, 0.1, 0]))[None]
    # lambda without edges is an error at the API level (all entry
    # points agree; the CLI warns and zeroes it before calling)
    with pytest.raises(ValueError, match="needs mesh edges"):
        skinning.fit_skinning(pts, frames, n_bones=2, max_influences=2,
                              smooth_lambda=0.1)
    with pytest.raises(ValueError, match=r"\(E, 2\)"):
        skinning.fit_skinning(pts, frames, n_bones=2, max_influences=2,
                              edges=np.zeros((3, 3), np.int64))
    with pytest.raises(ValueError, match="outside"):
        skinning.fit_skinning(
            pts, frames, n_bones=2, max_influences=2,
            edges=np.array([[0, 99]], np.int64), smooth_lambda=1.0,
        )


def test_influence_cap_holds_under_exact_ties(rng):
    """Pure translation makes every bone's transform identical, so all
    weights tie exactly — rank-based top-k must still admit EXACTLY
    max_influences bones (a >=-threshold test would keep every tie)."""
    pts = fibonacci_points(60)
    frames = np.stack([pts + np.float32([0.3, 0, 0]),
                       pts + np.float32([0, 0.5, 0])])
    model, report = skinning.fit_skinning(
        pts, frames, n_bones=4, max_influences=2, seed=0
    )
    w = np.asarray(model.weights)
    assert ((w > 1e-6).sum(-1) <= 2).all(), (w > 1e-6).sum(-1).max()
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    assert report.rmse < 1e-5  # translation is representable exactly


# ------------------------------------------------------------------ oracle


def test_lbs_apply_matches_numpy_oracle(rng):
    v, b = 50, 6
    w = rng.random((v, b)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    rest = rng.normal(size=(v, 3)).astype(np.float32)
    r = np.stack([_rotation(rng.normal(size=3), rng.uniform(-1, 1))
                  for _ in range(b)])
    t = rng.normal(size=(b, 3)).astype(np.float32)
    got = np.asarray(skinning.lbs_apply(
        jnp.asarray(w), jnp.asarray(rest), jnp.asarray(r), jnp.asarray(t)
    ), np.float64)
    want = np.einsum(
        "vb,bvi->vi", w.astype(np.float64),
        np.einsum("bij,vj->bvi", r.astype(np.float64),
                  rest.astype(np.float64)) + t[:, None].astype(np.float64),
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


# ------------------------------------------------------------------ errors


def test_fit_skinning_validates_inputs(rng):
    pts = fibonacci_points(20)
    frames = pts[None]
    with pytest.raises(ValueError, match="rest_points"):
        skinning.fit_skinning(pts[:, :2], frames, n_bones=2)
    with pytest.raises(ValueError, match="posed_frames"):
        skinning.fit_skinning(pts, pts, n_bones=2)
    with pytest.raises(ValueError, match="n_bones"):
        skinning.fit_skinning(pts, frames, n_bones=0)
    with pytest.raises(ValueError, match="max_influences"):
        skinning.fit_skinning(pts, frames, n_bones=2, max_influences=3)
