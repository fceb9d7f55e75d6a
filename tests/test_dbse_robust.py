"""Huber-IRLS robust DBSE weights (cfg.dbse_robust).

The DBSE input is a scanned pose, and scans carry gross outliers
(occlusion holes, marker glints).  The reference's plain least squares
(dbse.cpp:31-55) lets a handful of bad vertices drag every shape weight;
ops/dbse.weights_robust must shrug them off while matching plain lstsq
exactly on clean data.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu.config import DeformConfig
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.node import FaceDeformNode
from facedeform_tpu.ops import dbse
from facedeform_tpu.parallel import sharding


W_TRUE = np.float32([0.4, -0.3, 0.6, 0.1])


def _setup(rng, v=400, s=4, outlier_frac=0.0, outlier_mag=5.0):
    """(model, rest, pose): pose composed from W_TRUE, optionally with a
    fraction of vertices replaced by gross spikes (scan glints)."""
    rest = rng.standard_normal((v, 3)).astype(np.float32)
    shapes = [
        rest + 0.1 * rng.standard_normal((v, 3)).astype(np.float32)
        for _ in range(s)
    ]
    model = dbse.build_model(rest, shapes)
    pose = rest + np.einsum("s,svc->vc", W_TRUE, np.asarray(model.deltas))
    if outlier_frac:
        n_bad = int(v * outlier_frac)
        bad = rng.choice(v, size=n_bad, replace=False)
        pose[bad] += outlier_mag * rng.standard_normal((n_bad, 3)).astype(
            np.float32
        )
    return model, rest, pose.astype(np.float32)


def test_robust_matches_lstsq_on_clean_data(rng):
    """No outliers -> every IRLS sweep keeps (almost) full vertex weights,
    so robust and plain lstsq agree to solve tolerance."""
    model, rest, pose = _setup(rng)
    w_l, _ = dbse.weights_lstsq(model, jnp.asarray(pose), jnp.asarray(rest))
    w_r, rep = dbse.weights_robust(model, jnp.asarray(pose), jnp.asarray(rest))
    np.testing.assert_allclose(np.asarray(w_r), np.asarray(w_l), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w_r), W_TRUE, atol=1e-4)
    assert np.isfinite(np.asarray(rep.residual_norm)).all()


def test_robust_shrugs_off_outliers(rng):
    """5% gross spikes: plain lstsq weights get dragged; Huber-IRLS must
    land an order of magnitude closer to the composing weights."""
    model, rest, pose = _setup(rng, outlier_frac=0.05, outlier_mag=5.0)
    w_l, _ = dbse.weights_lstsq(model, jnp.asarray(pose), jnp.asarray(rest))
    w_r, _ = dbse.weights_robust(model, jnp.asarray(pose), jnp.asarray(rest))
    err_l = np.abs(np.asarray(w_l) - W_TRUE).max()
    err_r = np.abs(np.asarray(w_r) - W_TRUE).max()
    assert err_r < 0.1 * err_l, f"robust {err_r:.3e} vs lstsq {err_l:.3e}"
    assert err_r < 5e-3, f"robust error {err_r:.3e}"


def test_robust_exact_fit_degenerate_scale(rng):
    """A pose that fits EXACTLY (all residuals ~0) collapses the MAD scale;
    the delta floor must keep full vertex weights instead of zeroing the
    Gram (u = min(1, delta/r) with r = 0 maps to 1)."""
    model, rest, pose = _setup(rng, v=120)
    w_r, _ = dbse.weights_robust(model, jnp.asarray(pose), jnp.asarray(rest))
    np.testing.assert_allclose(np.asarray(w_r), W_TRUE, atol=1e-4)


def test_robust_batched_matches_single(rng):
    model, rest, pose0 = _setup(rng, outlier_frac=0.05)
    _, _, pose1 = _setup(rng, outlier_frac=0.0)
    poses = jnp.asarray(np.stack([pose0, pose1]))
    w_b, rep = dbse.weights_robust_batched(model, poses, jnp.asarray(rest))
    assert w_b.shape == (2, len(W_TRUE))
    for f, pose in enumerate([pose0, pose1]):
        w1, _ = dbse.weights_robust(
            model, jnp.asarray(pose), jnp.asarray(rest)
        )
        np.testing.assert_allclose(
            np.asarray(w_b[f]), np.asarray(w1), atol=1e-5, err_msg=f"pose {f}"
        )


def test_robust_sharded_matches_single(rng):
    """The vertex-sharded IRLS (psum Gram + all-gathered residual median)
    must match the single-device path on the 8-device mesh — including the
    padded-tail handling in the median."""
    from facedeform_tpu.parallel.dbse_sharded import weights_robust_sharded

    # 403 vertices: NOT a multiple of 8, so the padded tail is exercised
    model, rest, pose = _setup(rng, v=403, outlier_frac=0.05)
    mesh = sharding.make_mesh()
    w_sh, rep = weights_robust_sharded(
        model.deltas, jnp.asarray(pose), jnp.asarray(rest), mesh
    )
    w1, _ = dbse.weights_robust(model, jnp.asarray(pose), jnp.asarray(rest))
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w1), atol=1e-5)
    assert np.isfinite(np.asarray(rep.residual_norm)).all()


def _node_inputs(rng, v_mesh=20):
    mesh = uv_sphere(v_mesh, v_mesh)
    rest_rig = Mesh(points=fibonacci_points(30))
    bump = 0.2 * np.exp(
        -2 * np.sum((rest_rig.points - [0, 1, 0]) ** 2, -1, keepdims=True)
    )
    deform_rig = Mesh(points=(rest_rig.points + bump * np.float32([0, 1, 0])))
    return mesh, rest_rig, deform_rig


def test_node_cook_robust_morphspace(rng):
    """cook(dbse_robust=True) routes the morph stage through the IRLS
    weights.  When the deformed pose lies IN the blend subspace (blend 0 is
    the deform delta itself) the residuals vanish, so Huber-IRLS must agree
    with the plain least-squares cook to solve tolerance.  (With an
    out-of-span pose the two legitimately differ — Huber downweights the
    unexplained residual tail — so that is not an equality case.)"""
    mesh, r0, r1 = _node_inputs(rng)
    v = mesh.num_points
    # First cook without morphspace to learn the deform delta, then hand it
    # back as blendshape 0 so the morph pose fits the basis exactly.
    res_pre = FaceDeformNode().cook([mesh, r0, r1], cfg=DeformConfig())
    delta0 = res_pre.mesh.points - mesh.points
    blends = [Mesh(points=mesh.points + delta0)]
    for i in range(2):
        delta = 0.1 * rng.standard_normal((v, 3)).astype(np.float32)
        blends.append(Mesh(points=mesh.points + delta))
    inputs = [mesh, r0, r1] + blends
    res_plain = FaceDeformNode().cook(
        inputs, cfg=DeformConfig(morphspace=True)
    )
    res_robust = FaceDeformNode().cook(
        inputs, cfg=DeformConfig(morphspace=True, dbse_robust=True)
    )
    assert res_robust.weights is not None
    assert res_robust.weights.shape == (3,)
    # in-span pose -> near-zero residuals -> IRLS keeps full vertex weights
    np.testing.assert_allclose(
        res_robust.weights, res_plain.weights, atol=1e-3
    )
    # and the fit recovers "the deform is blend 0": w ~ [1, 0, 0]
    np.testing.assert_allclose(
        res_robust.weights, [1.0, 0.0, 0.0], atol=1e-2
    )


def test_node_cook_robust_sharded_matches_unsharded(rng):
    mesh, r0, r1 = _node_inputs(rng, v_mesh=14)
    v = mesh.num_points
    blends = [
        Mesh(points=mesh.points
             + 0.1 * rng.standard_normal((v, 3)).astype(np.float32))
        for _ in range(3)
    ]
    inputs = [mesh, r0, r1] + blends
    cfg = DeformConfig(morphspace=True, dbse_robust=True)
    res_1 = FaceDeformNode().cook(inputs, cfg=cfg)
    res_n = FaceDeformNode().cook(
        inputs, cfg=cfg, mesh_devices=sharding.make_mesh()
    )
    np.testing.assert_allclose(
        res_n.mesh.points, res_1.mesh.points, atol=1e-5
    )
    np.testing.assert_allclose(res_n.weights, res_1.weights, atol=1e-5)


def test_robust_with_parity_path_warns(rng):
    """dbse_robust has no parity-recipe analogue: the cook must warn and
    run the plain parity weights."""
    mesh, r0, r1 = _node_inputs(rng, v_mesh=14)
    v = mesh.num_points
    blends = [
        Mesh(points=mesh.points
             + 0.1 * rng.standard_normal((v, 3)).astype(np.float32))
        for _ in range(3)
    ]
    res = FaceDeformNode().cook(
        [mesh, r0, r1] + blends,
        cfg=DeformConfig(morphspace=True, dbse_lstsq=False, dbse_robust=True),
    )
    assert any("dbse_robust requires" in w for w in res.warnings)
    assert res.weights is not None  # parity path still ran


def test_robust_cfg_checkpoint_roundtrip(tmp_path, rng):
    """The new config field must survive the checkpoint codec (old files
    without it keep loading via the dataclass default)."""
    import json
    from facedeform_tpu.utils.checkpoint import _cfg_from_json, _cfg_to_json

    cfg = DeformConfig(morphspace=True, dbse_robust=True)
    back = _cfg_from_json(_cfg_to_json(cfg))
    assert back.dbse_robust is True
    # an old checkpoint's JSON (no dbse_robust key) defaults to False
    d = json.loads(_cfg_to_json(cfg))
    d.pop("dbse_robust")
    assert DeformConfig(**d).dbse_robust is False
