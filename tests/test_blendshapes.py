"""PCA blendshape baking (ops/blendshapes.py) vs an f64 SVD oracle,
plus the glTF / checkpoint / CLI integrations.

The reference consumes blendshape inputs (src/dbse.cpp:9-35) but never
produces them; the bake is a rebuild extension, so correctness is defined
against numpy's f64 SVD (Eckart-Young optimality) rather than C++ parity.
"""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu.geometry.primitives import uv_sphere
from facedeform_tpu.ops.blendshapes import (
    BlendshapeModel,
    apply_blendshapes,
    blendshape_meshes,
    fit_blendshapes,
)


def _shot(rng, f_n=6, v=200, modes=3):
    """Synthetic shot with a known low-rank displacement structure."""
    rest = rng.standard_normal((v, 3)).astype(np.float32)
    basis = rng.standard_normal((modes, v, 3)).astype(np.float32)
    curves = rng.standard_normal((f_n, modes)).astype(np.float32)
    frames = rest[None] + np.einsum("fk,kvi->fvi", curves, basis)
    return rest, frames.astype(np.float32)


def test_full_rank_reconstructs_exactly(rng):
    rest, frames = _shot(rng, f_n=5, v=150, modes=5)
    model, report = fit_blendshapes(rest, frames, rank=5)
    recon = np.asarray(apply_blendshapes(model))
    scale = np.abs(frames - rest[None]).max()
    assert np.abs(recon - frames).max() <= 2e-5 * max(scale, 1.0)
    assert report.max_err <= 2e-5 * max(scale, 1.0)
    assert report.energy >= 1.0 - 1e-6


def test_rank_k_matches_f64_svd_oracle(rng):
    """Truncation error and singular spectrum must match numpy f64 SVD of
    the centered displacement matrix (Eckart-Young: PCA is optimal, so
    matching the oracle's error IS optimality)."""
    rest, frames = _shot(rng, f_n=8, v=120, modes=6)
    deltas = (frames - rest[None]).reshape(8, -1).astype(np.float64)
    mean = deltas.mean(axis=0)
    centered = deltas - mean
    s_oracle = np.linalg.svd(centered, compute_uv=False)

    for rank in (1, 2, 4):
        model, report = fit_blendshapes(rest, frames, rank=rank)
        # target 0 is the mean; rank PCA targets follow
        assert model.n_targets == rank + 1
        np.testing.assert_allclose(
            report.singular_values[:rank], s_oracle[:rank], rtol=1e-4
        )
        # oracle truncation RMSE over all frame-vertex positions
        err2 = np.sum(s_oracle[rank:] ** 2)
        rmse_oracle = np.sqrt(err2 / (8 * 120))
        assert report.rmse == pytest.approx(rmse_oracle, rel=1e-3, abs=1e-6)


def test_error_monotone_in_rank(rng):
    rest, frames = _shot(rng, f_n=8, v=100, modes=7)
    errs = [fit_blendshapes(rest, frames, rank=k)[1].rmse for k in (1, 3, 5, 7)]
    assert all(a >= b - 1e-7 for a, b in zip(errs, errs[1:]))


def test_center_mean_target(rng):
    rest, frames = _shot(rng, f_n=6, v=80, modes=2)
    model, _ = fit_blendshapes(rest, frames, rank=2, center=True)
    mean_delta = (frames - rest[None]).mean(axis=0)
    np.testing.assert_allclose(
        np.asarray(model.targets[0]), mean_delta, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(model.weights[:, 0]), 1.0)
    assert model.target_names()[0] == "mean"
    # weight curves are normalized into [-1, 1]
    assert np.abs(np.asarray(model.weights)).max() <= 1.0 + 1e-6


def test_uncentered_mode(rng):
    rest, frames = _shot(rng, f_n=5, v=60, modes=3)
    model, report = fit_blendshapes(rest, frames, rank=5, center=False)
    assert model.n_targets <= 5
    scale = np.abs(frames - rest[None]).max()
    assert report.max_err <= 2e-5 * max(scale, 1.0)
    assert model.target_names()[0] == "pc_000"


def test_constant_shot_dead_mode_guard(rng):
    """All frames identical: the centered residual is exactly zero — the
    dead-singular-value guard must keep the bake finite (no division by a
    roundoff sigma) and reproduce the constant frame through the mean."""
    rest = rng.standard_normal((50, 3)).astype(np.float32)
    frame = rest + rng.standard_normal((50, 3)).astype(np.float32)
    frames = np.repeat(frame[None], 4, axis=0)
    model, report = fit_blendshapes(rest, frames, rank=3)
    assert np.isfinite(np.asarray(model.targets)).all()
    assert np.isfinite(np.asarray(model.weights)).all()
    recon = np.asarray(apply_blendshapes(model))
    assert np.abs(recon - frames).max() <= 1e-5


def test_apply_with_explicit_weights(rng):
    rest, frames = _shot(rng, f_n=6, v=70, modes=3)
    model, _ = fit_blendshapes(rest, frames, rank=3)
    one = np.asarray(apply_blendshapes(model, model.weights[2]))
    assert one.shape == (1, 70, 3)
    np.testing.assert_allclose(one[0], frames[2], atol=1e-4)
    with pytest.raises(ValueError):
        apply_blendshapes(model, np.zeros((2, model.n_targets + 1)))


def test_validation_errors(rng):
    rest, frames = _shot(rng, f_n=4, v=40, modes=2)
    with pytest.raises(ValueError):
        fit_blendshapes(rest, frames[:, :30], rank=2)
    with pytest.raises(ValueError):
        fit_blendshapes(rest, frames[0], rank=2)


def test_blendshape_meshes_feed_morphspace(rng):
    """The baked targets materialize as blendshape meshes shaped exactly
    like the reference's inputs 3+ (src/SOP_FaceDeform.cpp:201-204)."""
    mesh = uv_sphere(12, 12)
    v = mesh.num_points
    rng2 = np.random.default_rng(7)
    frames = mesh.points[None] + 0.1 * rng2.standard_normal(
        (5, v, 3)
    ).astype(np.float32)
    model, _ = fit_blendshapes(mesh.points, frames, rank=2)
    shapes = blendshape_meshes(model, mesh)
    assert len(shapes) == model.n_targets
    for k, m in enumerate(shapes):
        assert m.num_points == v
        assert m.faces is not None and np.array_equal(m.faces, mesh.faces)
        np.testing.assert_allclose(
            m.points,
            mesh.points + np.asarray(model.targets[k]),
            atol=1e-6,
        )
    with pytest.raises(ValueError):
        blendshape_meshes(model, uv_sphere(5, 5))


def test_checkpoint_roundtrip(tmp_path, rng):
    from facedeform_tpu.utils import checkpoint

    rest, frames = _shot(rng, f_n=6, v=90, modes=3)
    model, report = fit_blendshapes(rest, frames, rank=3)
    path = str(tmp_path / "shapes.npz")
    checkpoint.save_blendshapes(path, model, report)
    assert checkpoint.kind(path) == "shapes"
    got, got_report = checkpoint.load_blendshapes(path)
    np.testing.assert_array_equal(np.asarray(got.rest), np.asarray(model.rest))
    np.testing.assert_array_equal(
        np.asarray(got.targets), np.asarray(model.targets)
    )
    np.testing.assert_array_equal(
        np.asarray(got.weights), np.asarray(model.weights)
    )
    assert got_report.rmse == pytest.approx(report.rmse)
    assert got_report.energy == pytest.approx(report.energy)
    np.testing.assert_allclose(
        got_report.singular_values, report.singular_values
    )
    # the generic loader must refuse with a pointed message
    with pytest.raises(ValueError, match="blendshape checkpoint"):
        checkpoint.load(path)
    with pytest.raises(ValueError, match="not a blendshape checkpoint"):
        d = checkpoint  # save a dense one to cross-check
        from facedeform_tpu import Deformer, DeformConfig, DeformParams
        from facedeform_tpu.geometry.primitives import fibonacci_points

        ctrl = fibonacci_points(20)
        dfm = Deformer.fit(ctrl, ctrl + 0.01, DeformConfig(), DeformParams())
        dense_path = str(tmp_path / "dense.npz")
        d.save(dense_path, dfm)
        d.load_blendshapes(dense_path)


def test_glb_targets_roundtrip(tmp_path, rng):
    """save_glb_targets writes targets + weight curves that reconstruct
    every keyframe through the glTF morph semantics."""
    from facedeform_tpu.geometry import gltf_io

    mesh = uv_sphere(10, 10)
    v = mesh.num_points
    rng2 = np.random.default_rng(3)
    frames = mesh.points[None] + 0.2 * rng2.standard_normal(
        (6, v, 3)
    ).astype(np.float32)
    model, report = fit_blendshapes(mesh.points, frames, rank=3)
    path = str(tmp_path / "bake.glb")
    gltf_io.save_glb_targets(
        path, mesh,
        np.asarray(model.targets), np.asarray(model.weights),
        fps=12.0, names=model.target_names(),
    )
    gltf, blob = gltf_io.load_glb(path)
    prim = gltf["meshes"][0]["primitives"][0]
    k_n = model.n_targets
    assert len(prim["targets"]) == k_n
    assert gltf["meshes"][0]["extras"]["targetNames"][0] == "mean"

    targets = np.stack([
        gltf_io.read_accessor(gltf, blob, prim["targets"][k]["POSITION"])
        for k in range(k_n)
    ])
    sampler = gltf["animations"][0]["samplers"][0]
    w = gltf_io.read_accessor(gltf, blob, sampler["output"]).reshape(6, k_n)
    times = gltf_io.read_accessor(gltf, blob, sampler["input"])
    np.testing.assert_allclose(times, np.arange(6) / 12.0, atol=1e-6)

    rest = gltf_io.read_accessor(
        gltf, blob, prim["attributes"]["POSITION"]
    )
    recon = rest[None] + np.einsum("fk,kvi->fvi", w, targets)
    assert np.abs(recon - np.asarray(apply_blendshapes(model))).max() <= 1e-5
    # default (static-viewer) weights are frame 0's
    np.testing.assert_allclose(
        gltf["meshes"][0]["weights"], np.asarray(model.weights[0]), atol=1e-6
    )


def test_glb_targets_validation(tmp_path, rng):
    from facedeform_tpu.geometry import gltf_io

    mesh = uv_sphere(6, 6)
    t = np.zeros((2, mesh.num_points, 3), np.float32)
    w = np.zeros((3, 2), np.float32)
    with pytest.raises(ValueError, match="weights"):
        gltf_io.save_glb_targets(
            str(tmp_path / "x.glb"), mesh, t, np.zeros((3, 5), np.float32)
        )
    with pytest.raises(ValueError, match="names"):
        gltf_io.save_glb_targets(
            str(tmp_path / "x.glb"), mesh, t, w, names=["just_one"]
        )
    with pytest.raises(ValueError, match="targets"):
        gltf_io.save_glb_targets(
            str(tmp_path / "x.glb"), mesh, t[:, :10], w
        )


def test_cli_gltf_rank(tmp_path):
    """deform-seq --gltf-rank end to end: compressed .glb + .npz bake."""
    from facedeform_tpu.geometry.obj_io import save_obj
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.geometry import gltf_io
    from facedeform_tpu.utils import checkpoint

    mesh = uv_sphere(8, 8)
    ctrl = fibonacci_points(16) * 1.1
    mesh_p = str(tmp_path / "mesh.obj")
    rig_p = str(tmp_path / "rig.obj")
    save_obj(mesh_p, mesh)
    from facedeform_tpu.geometry.mesh import Mesh

    save_obj(rig_p, Mesh(points=ctrl))
    rig_frames = []
    rng2 = np.random.default_rng(11)
    for f in range(4):
        p = str(tmp_path / f"rig_{f}.obj")
        save_obj(p, Mesh(points=ctrl + 0.02 * rng2.standard_normal(
            ctrl.shape).astype(np.float32)))
        rig_frames.append(p)

    outdir = str(tmp_path / "out")
    glb = str(tmp_path / "bake.glb")
    npz = str(tmp_path / "bake_shapes.npz")
    from facedeform_tpu import cli

    rc = cli.main([
        "deform-seq", mesh_p, rig_p, *rig_frames,
        "-o", outdir, "--gltf", glb, "--gltf-rank", "2",
        "--save-shapes", npz,
    ])
    assert rc == 0
    gltf, blob = gltf_io.load_glb(glb)
    prim = gltf["meshes"][0]["primitives"][0]
    assert 1 <= len(prim["targets"]) <= 3  # mean + <=2 PCA targets
    model, report = checkpoint.load_blendshapes(npz)
    assert model.n_frames == 4
    assert np.isfinite(report.rmse)

    # flag validation paths
    rc = cli.main([
        "deform-seq", mesh_p, rig_p, rig_frames[0],
        "-o", outdir, "--save-shapes", npz,
    ])
    assert rc == 1
    rc = cli.main([
        "deform-seq", mesh_p, rig_p, rig_frames[0],
        "-o", outdir, "--gltf-rank", "2",
    ])
    assert rc == 1
