"""OBJ I/O, checkpoint/resume, and profiling utility tests."""

import os

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer, RBFKernel, RBFModelType
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.obj_io import load_obj, save_obj
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.utils import checkpoint, profiling


def test_obj_roundtrip(tmp_path, rng):
    mesh = uv_sphere(20, 20)
    mesh.set_attr("fd_falloff", rng.random(mesh.num_points).astype(np.float32))
    mesh.detail_attrs["weights"] = np.float32([0.1, 0.2])
    path = str(tmp_path / "sphere.obj")
    save_obj(path, mesh)
    loaded = load_obj(path)
    np.testing.assert_allclose(loaded.points, mesh.points, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)
    np.testing.assert_allclose(
        loaded.point_attrs["fd_falloff"], mesh.point_attrs["fd_falloff"], atol=1e-7
    )
    np.testing.assert_allclose(loaded.detail_attrs["weights"], [0.1, 0.2])


def test_obj_mixed_arity(tmp_path):
    with open(tmp_path / "mixed.obj", "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 2 0 0\n")
        f.write("f 1 2 3 4\nf 2 5 3\n")
    mesh = load_obj(str(tmp_path / "mixed.obj"))
    assert mesh.num_points == 5
    assert mesh.faces.shape[1] == 3  # fan-triangulated
    assert len(mesh.faces) == 3


def test_checkpoint_roundtrip(tmp_path, rng):
    rest = fibonacci_points(30)
    deformed = rest + 0.1 * rng.standard_normal((30, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.MULTIQUADRIC,
                       tangent=True, strict_parity=True)
    params = DeformParams(radius=1.7, lam=0.02, falloffrate=1.5, maxedges=6)
    d = Deformer.fit(rest, deformed, cfg, params)
    path = str(tmp_path / "deformer.npz")
    checkpoint.save(path, d)
    restored = checkpoint.load(path)
    assert restored.cfg == cfg
    assert float(restored.params.radius) == pytest.approx(1.7)
    assert restored.params.maxedges == 6
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    a, _ = d.apply(pts, backend="dense")
    b, _ = restored.apply(pts, backend="dense")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_orbax_roundtrip(tmp_path, rng):
    rest = fibonacci_points(20)
    deformed = rest + 0.05 * rng.standard_normal((20, 3)).astype(np.float32)
    d = Deformer.fit(rest, deformed, DeformConfig(), DeformParams())
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save_orbax(path, d)
    restored = checkpoint.load_orbax(path)
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    a, _ = d.apply(pts, backend="dense")
    b, _ = restored.apply(pts, backend="dense")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage_times(rng):
    times = profiling.StageTimes()
    with profiling.stage("solve", times):
        _ = sum(range(1000))
    with profiling.stage("eval", times):
        pass
    with profiling.stage("eval", times):
        pass
    assert set(times.ms) == {"solve", "eval"}
    assert times.counts["eval"] == 2
    assert "solve" in times.summary()


def test_pu_checkpoint_roundtrip(tmp_path, rng):
    from facedeform_tpu.config import RBFKernel
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops.pu import PUDeformer
    from facedeform_tpu.utils import checkpoint

    rest = fibonacci_points(400)
    disp = 0.05 * rng.standard_normal((400, 3)).astype(np.float32)
    d = PUDeformer.fit(rest, rest + disp, kernel=RBFKernel.THIN_PLATE,
                       patch_size=64, lam=1e-5)
    path = str(tmp_path / "pu.npz")
    checkpoint.save_pu(path, d)
    d2 = checkpoint.load_pu(path)
    q = (fibonacci_points(300) * 1.01).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(d.displacement(q)), np.asarray(d2.displacement(q)),
        atol=1e-6,
    )
    assert float(d2.report.backward_error()) == float(d.report.backward_error())
    # non-PU loader refuses clearly
    import pytest as _pytest

    checkpoint.save(str(tmp_path / "g.npz"), _fit_small())
    with _pytest.raises(ValueError, match="not a PU"):
        checkpoint.load_pu(str(tmp_path / "g.npz"))


def _fit_small():
    from facedeform_tpu import DeformConfig, DeformParams, Deformer
    from facedeform_tpu.geometry.primitives import fibonacci_points

    rest = fibonacci_points(30)
    return Deformer.fit(rest, rest * 1.02, DeformConfig(), DeformParams())


def test_seq_checkpoint_roundtrip(tmp_path, rng):
    """save_seq/load_seq: an F-stacked fit_frames model round-trips and
    apply_frames reproduces the original shot bit-for-bit."""
    import jax.numpy as jnp

    from facedeform_tpu.parallel import batched

    rest = fibonacci_points(40)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((40, 3)).astype(np.float32)
        for _ in range(3)
    ])
    cfg = DeformConfig(tangent=False)
    params = DeformParams(radius=1.3, falloffrate=1.2)
    model, resid = batched.fit_frames(
        jnp.asarray(rest), jnp.asarray(frames), cfg, params
    )
    path = str(tmp_path / "seq.npz")
    checkpoint.save_seq(path, model, cfg, params, residuals=resid)
    model2, cfg2, params2, resid2 = checkpoint.load_seq(path)
    assert cfg2 == cfg
    assert float(params2.radius) == pytest.approx(float(params.clamped().radius))
    np.testing.assert_allclose(resid2, np.asarray(resid), atol=0)

    pts = rng.standard_normal((64, 3)).astype(np.float32)
    d2 = np.zeros(64, np.float32)
    g = np.ones(64, np.float32)
    a, _ = batched.apply_frames(model, jnp.asarray(pts), jnp.asarray(d2),
                                jnp.asarray(g), cfg, params, None)
    b, _ = batched.apply_frames(model2, jnp.asarray(pts), jnp.asarray(d2),
                                jnp.asarray(g), cfg, params, None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong-kind loaders refuse clearly
    with pytest.raises(ValueError, match="sequence checkpoint"):
        checkpoint.load(path)
    assert checkpoint.kind(path) == "seq"


def test_pu_seq_checkpoint_roundtrip(tmp_path, rng):
    """save_pu_seq/load_pu_seq: geometry stored once, (F, ...) weight
    stacks round-trip, and the restored shot evaluates identically
    through the shared-plan frames path."""
    from facedeform_tpu.ops.pu import PUSeqDeformer
    from facedeform_tpu.utils import checkpoint as ck

    rest = fibonacci_points(300)
    frames = np.stack([
        rest + 0.04 * rng.standard_normal((300, 3)).astype(np.float32)
        for _ in range(3)
    ])
    seq = PUSeqDeformer.fit(rest, frames, kernel=RBFKernel.THIN_PLATE,
                            lam=1e-5, patch_size=64)
    path = str(tmp_path / "pu_seq.npz")
    ck.save_pu_seq(path, seq)
    assert ck.kind(path) == "pu_seq"
    seq2 = ck.load_pu_seq(path)
    assert seq2.num_frames == 3
    q = (fibonacci_points(200) * 1.01).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(seq.displacement_frames(q)),
        np.asarray(seq2.displacement_frames(q)),
        atol=1e-6,
    )
    assert float(seq2.report.backward_error()) == float(
        seq.report.backward_error()
    )
    # wrong-kind loaders refuse clearly
    with pytest.raises(ValueError, match="PU sequence"):
        checkpoint.load(path)
    with pytest.raises(ValueError, match="not a PU checkpoint"):
        checkpoint.load_pu(path)
    with pytest.raises(ValueError, match="not a dense sequence"):
        checkpoint.load_seq(path)
    with pytest.raises(ValueError, match="expects a PUSeqDeformer"):
        ck.save_pu_seq(str(tmp_path / "x.npz"), object())

    # a directly-constructed shot (no fit() -> no report) still saves;
    # the restored report is None rather than an AttributeError
    from facedeform_tpu.config import PolyTerm
    from facedeform_tpu.ops.pu import PUSeqDeformer

    bare = PUSeqDeformer([p.model for p in seq.puds], seq.patches,
                         RBFKernel.THIN_PLATE, PolyTerm.LINEAR)
    p2 = str(tmp_path / "bare.npz")
    ck.save_pu_seq(p2, bare)
    bare2 = ck.load_pu_seq(p2)
    assert bare2.report is None
    np.testing.assert_allclose(
        np.asarray(bare2.displacement_frames(q)),
        np.asarray(seq.displacement_frames(q)), atol=1e-6,
    )
