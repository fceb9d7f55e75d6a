"""Temporal rig smoothing (ops/temporal.py): polynomial preservation,
noise attenuation, edge handling, CLI/serve integration."""

import numpy as np
import pytest

from facedeform_tpu.ops import temporal


def _poly_traj(f_n, n, order, rng):
    """(F, N, 3) trajectories, each coordinate a degree-`order` poly in f."""
    t = np.arange(f_n, dtype=np.float64)[:, None, None]
    out = np.zeros((f_n, n, 3))
    for k in range(order + 1):
        out += rng.standard_normal((1, n, 3)) * (t / f_n) ** k
    return out.astype(np.float32)


def test_smoothing_matrix_reproduces_polynomials():
    """Rows of S are exact on polynomials up to `order` — including the
    one-sided edge rows (mode='interp' semantics)."""
    for f_n, window, order in [(20, 5, 2), (9, 7, 3), (30, 11, 2)]:
        s = temporal.smoothing_matrix(f_n, window, order)
        t = np.arange(f_n, dtype=np.float64)
        for k in range(order + 1):
            np.testing.assert_allclose(s @ t**k, t**k, atol=1e-8,
                                       err_msg=f"F={f_n} w={window} k={k}")


def test_smooth_frames_preserves_polynomial_motion():
    rng = np.random.default_rng(0)
    frames = _poly_traj(24, 10, 2, rng)
    out = temporal.smooth_frames(frames, window=7, order=2)
    np.testing.assert_allclose(out, frames, atol=1e-4)


def test_smooth_frames_attenuates_noise():
    rng = np.random.default_rng(1)
    clean = _poly_traj(40, 15, 1, rng)
    noise = 0.01 * rng.standard_normal(clean.shape).astype(np.float32)
    out = temporal.smooth_frames(clean + noise, window=9, order=2)
    err_before = np.sqrt((noise**2).mean())
    err_after = np.sqrt(((out - clean) ** 2).mean())
    assert err_after < 0.55 * err_before  # ~sqrt(window) rms attenuation


def test_smooth_frames_short_shot_and_guards():
    rng = np.random.default_rng(2)
    one = rng.standard_normal((1, 5, 3)).astype(np.float32)
    np.testing.assert_array_equal(temporal.smooth_frames(one), one)
    # window clamped below order+1 support -> identity
    three = rng.standard_normal((3, 5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        temporal.smooth_frames(three, window=5, order=2), three, atol=1e-6
    )
    with pytest.raises(ValueError, match="odd"):
        temporal.smooth_frames(three, window=4)
    with pytest.raises(ValueError, match="order"):
        temporal.smoothing_matrix(10, 5, 0)
    with pytest.raises(ValueError, match=r"\(F, N, 3\)"):
        temporal.smooth_frames(np.zeros((4, 5)))


def test_cli_deform_seq_temporal_smooth(tmp_path):
    """--temporal-smooth: a jittered shot lands closer to the clean shot's
    deformation than the unsmoothed fit does."""
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.obj_io import load_obj, save_obj
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    rng = np.random.default_rng(3)
    mesh = uv_sphere(15, 15)
    rig = fibonacci_points(20)
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), Mesh(points=rig))
    f_n = 9
    t = np.linspace(0, 1, f_n, dtype=np.float32)[:, None, None]
    clean = rig[None] + 0.2 * t * np.float32([0, 1, 0])  # linear travel
    jitter = 0.01 * rng.standard_normal(clean.shape).astype(np.float32)
    noisy_paths, clean_paths = [], []
    for f in range(f_n):
        pn = str(tmp_path / f"noisy{f}.obj")
        pc = str(tmp_path / f"clean{f}.obj")
        save_obj(pn, Mesh(points=clean[f] + jitter[f]))
        save_obj(pc, Mesh(points=clean[f]))
        noisy_paths.append(pn)
        clean_paths.append(pc)
    base = ["deform-seq", str(tmp_path / "mesh.obj"),
            str(tmp_path / "rig.obj")]
    assert main(base + clean_paths + ["-o", str(tmp_path / "ref")]) == 0
    assert main(base + noisy_paths + ["-o", str(tmp_path / "raw")]) == 0
    assert main(base + noisy_paths + [
        "-o", str(tmp_path / "sm"), "--temporal-smooth", "7",
    ]) == 0
    err_raw, err_sm = 0.0, 0.0
    for f in range(1, f_n - 1):  # interior frames (edges fit one-sided)
        ref = load_obj(str(tmp_path / "ref" / f"frame_{f:04d}.obj")).points
        raw = load_obj(str(tmp_path / "raw" / f"frame_{f:04d}.obj")).points
        sm = load_obj(str(tmp_path / "sm" / f"frame_{f:04d}.obj")).points
        err_raw += float(((raw - ref) ** 2).mean())
        err_sm += float(((sm - ref) ** 2).mean())
    assert err_sm < 0.5 * err_raw, (err_sm, err_raw)

    # even-window guard surfaces as a clean CLI error
    assert main(base + noisy_paths + [
        "-o", str(tmp_path / "bad"), "--temporal-smooth", "4",
    ]) == 1


def test_serve_fit_seq_temporal_smooth(rng):
    """fit_seq temporal_smooth=... matches smoothing client-side."""
    from facedeform_tpu import serve as serve_mod
    from facedeform_tpu.geometry.primitives import fibonacci_points

    srv = serve_mod.DeformServer()
    rest = fibonacci_points(16)
    f_n = 7
    frames = np.stack([
        rest + 0.02 * f * np.float32([1, 0, 0])
        + 0.005 * rng.standard_normal(rest.shape).astype(np.float32)
        for f in range(f_n)
    ])
    r = srv.handle({
        "cmd": "fit_seq",
        "rest_ctrl": serve_mod.encode_array(rest),
        "deformed_frames": serve_mod.encode_array(frames),
        "temporal_smooth": 5,
    })
    assert r["ok"], r
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    r2 = srv.handle({
        "cmd": "apply_seq", "deformer": r["deformer"],
        "points": serve_mod.encode_array(pts),
    })
    assert r2["ok"], r2
    got = serve_mod.decode_array(r2["points"])

    r3 = srv.handle({
        "cmd": "fit_seq",
        "rest_ctrl": serve_mod.encode_array(rest),
        "deformed_frames": serve_mod.encode_array(
            temporal.smooth_frames(frames, window=5)
        ),
    })
    r4 = srv.handle({
        "cmd": "apply_seq", "deformer": r3["deformer"],
        "points": serve_mod.encode_array(pts),
    })
    want = serve_mod.decode_array(r4["points"])
    np.testing.assert_allclose(got, want, atol=1e-6)
