"""Regression tests for the round-3 code-review findings.

Each test pins one reviewed defect: LOOCV winner reproducibility through
the fit-time clamps (qcoef/zcoef >= 0.1, src/SOP_FaceDeform.cpp:249-250),
grid dedup after clamping, the single-factorization sweep, the native
loader's stale-.so recovery, and serve's morph contract (robust warning on
the parity path, rank-consistent single-pose outputs, transport error for
a dbse basis).
"""

from __future__ import annotations

import numpy as np
import pytest

from facedeform_tpu.config import DeformConfig, DeformParams, RBFModelType


@pytest.fixture
def rig(rng):
    rest = rng.normal(size=(30, 3)).astype(np.float32)
    dfm = rest + 0.1 * rng.normal(size=(30, 3)).astype(np.float32)
    return rest, dfm


def test_loocv_qnn_winner_survives_clamps(rig):
    """A small user qcoef must not let the sweep score candidates that
    fit() would clamp back up: the returned params reproduce the winner."""
    from facedeform_tpu.ops.loocv import autotune

    rest, dfm = rig
    params = DeformParams(qcoef=0.3, zcoef=5.0)
    new_params, diag = autotune(rest, dfm, DeformConfig(), params)
    clamped = new_params.clamped()
    assert float(clamped.qcoef) == pytest.approx(float(new_params.qcoef))
    assert float(clamped.zcoef) == pytest.approx(float(new_params.zcoef))
    # every scored candidate is reachable after the clamp
    assert (diag["factors"] * 0.3).min() >= 0.1 - 1e-6


def test_loocv_clamped_grid_dedupes(rig):
    """Candidates that collapse onto the clamp floor are scored once, and
    diag reports the APPLIED (deduped) grids."""
    from facedeform_tpu.ops.loocv import autotune

    rest, dfm = rig
    params = DeformParams(radius=0.02, lam=0.5)
    _, diag = autotune(
        rest, dfm, DeformConfig(model=RBFModelType.MULTILAYER), params,
        radius_factors=[0.125, 0.177, 0.25, 0.354, 1.0],
        ridge_values=[0.001, 0.005, 0.01, 0.1],
    )
    # 0.125..0.354 all clamp to 0.01/0.02 = 0.5
    np.testing.assert_allclose(diag["factors"], [0.5, 1.0])
    np.testing.assert_allclose(diag["ridges"], [0.01, 0.1])
    assert diag["scores"].shape == (2, 2)


def test_loocv_errors_shares_factorization(rig):
    """The closed-form inverse diagonal must come from the solve's own LU
    factors — pin the parity against an explicit f64 inverse."""
    import jax.numpy as jnp

    from facedeform_tpu.config import PolyTerm, RBFKernel
    from facedeform_tpu.ops.assemble import assemble_system
    from facedeform_tpu.ops.loocv import loocv_errors

    rest, dfm = rig
    eps = jnp.full((30,), 0.7, jnp.float32)
    lam = jnp.asarray(0.05, jnp.float32)
    e, report = loocv_errors(
        jnp.asarray(rest), jnp.asarray(dfm - rest),
        RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, lam,
    )
    a = np.asarray(
        assemble_system(jnp.asarray(rest), RBFKernel.GAUSSIAN,
                        PolyTerm.LINEAR, eps, lam), np.float64,
    )
    binv_diag = np.diagonal(np.linalg.inv(a))[:30]
    rhs = np.zeros((a.shape[0], 3), np.float64)
    rhs[:30] = (dfm - rest).astype(np.float64)
    x = np.linalg.solve(a, rhs)
    want = -x[:30] / binv_diag[:, None]
    np.testing.assert_allclose(np.asarray(e), want, rtol=2e-3, atol=2e-5)


def test_native_loader_recovers_from_stale_so(tmp_path, monkeypatch):
    """A cached .so missing a newly added symbol (mtime tie defeats the
    staleness check) must trigger one rebuild, not an AttributeError."""
    import shutil
    import subprocess

    from facedeform_tpu import native

    src = tmp_path / "fastgeo.cpp"
    lib = tmp_path / "libfastgeo.so"
    shutil.copy(native._SRC, src)
    # Build a STALE library: strip fd_dijkstra by compiling a trivial TU.
    stale_src = tmp_path / "stale.cpp"
    stale_src.write_text('extern "C" void fd_unrelated() {}\n')
    try:
        subprocess.run(
            ["g++", "-O1", "-shared", "-fPIC", str(stale_src), "-o", str(lib)],
            check=True, capture_output=True, timeout=120,
        )
    except (subprocess.SubprocessError, FileNotFoundError):
        pytest.skip("no g++ on this machine")
    # mtime tie: cp/tar-without-p scenario
    import os

    t = os.path.getmtime(src)
    os.utime(lib, (t, t))

    monkeypatch.setattr(native, "_SRC", str(src))
    monkeypatch.setattr(native, "_LIB", str(lib))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    got = native.get_lib()
    assert got is not None  # rebuilt and re-bound, not crashed
    assert hasattr(got, "fd_dijkstra")
    # restore module state for other tests
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)


@pytest.fixture
def dbse_served(rng):
    from facedeform_tpu import serve as serve_mod

    rest = rng.normal(size=(40, 3)).astype(np.float32)
    shapes = rest[None] + 0.2 * rng.normal(size=(3, 40, 3)).astype(np.float32)
    srv = serve_mod.DeformServer()
    r = srv.handle({"cmd": "fit_dbse", "rest": rest, "shapes": shapes,
                    "cfg": {"dbse_lstsq": False}}, raw=True)
    assert r["ok"]
    return srv, r["deformer"], rest, shapes


def test_morph_parity_path_warns_on_robust(dbse_served, rng):
    """Requesting dbse_robust against a parity basis must surface the
    node's warn-and-ignore contract, not silently serve plain weights."""
    srv, did, rest, _ = dbse_served
    pose = rest + 0.05 * rng.normal(size=rest.shape).astype(np.float32)
    r = srv.handle({"cmd": "morph", "deformer": did, "points": pose,
                    "cfg": {"dbse_robust": True}}, raw=True)
    assert r["ok"]
    assert any("dbse_robust" in w for w in r.get("warnings", []))


def test_morph_single_pose_rank_consistent(dbse_served, rng):
    """Single-pose morph unbatches EVERY per-pose output, including ok."""
    srv, did, rest, _ = dbse_served
    pose = rest + 0.05 * rng.normal(size=rest.shape).astype(np.float32)
    r = srv.handle({"cmd": "morph", "deformer": did, "points": pose},
                   raw=True)
    assert r["ok"]
    assert np.asarray(r["points"]).shape == rest.shape
    assert np.asarray(r["morph_ok"]).ndim == 0
    batched = srv.handle({"cmd": "morph", "deformer": did,
                          "points": pose[None]}, raw=True)
    assert np.asarray(batched["morph_ok"]).shape == (1,)


def test_binary_framing_preserves_0d_arrays():
    """np.ascontiguousarray promotes 0-d to (1,): write_frame must record
    the ORIGINAL shape so single-pose morph_ok survives the wire."""
    import io

    from facedeform_tpu import serve as serve_mod

    buf = io.BytesIO()
    serve_mod.write_frame(buf, {"ok": True}, {"x": np.asarray(np.uint8(1))})
    buf.seek(0)
    _, arrays = serve_mod.read_frame(buf)
    assert arrays["x"].shape == ()
    assert int(arrays["x"]) == 1


def test_transport_rejects_dbse_with_accurate_error(dbse_served, rng):
    srv, did, rest, _ = dbse_served
    r = srv.handle({
        "cmd": "transport", "deformer": did, "points": rest,
        "weight": np.ones(len(rest), np.float32),
        "attr:N": rng.normal(size=rest.shape).astype(np.float32),
    }, raw=True)
    assert not r["ok"]
    assert "dbse" in r["error"] and "fit_seq" not in r["error"]


# ---- reduced-regression review fixes (round-3, decimation work) --------

def test_fit_reduced_coplanar_rig_solves(rng):
    """A coplanar rig makes the polynomial-tail columns of the normal
    equations linearly dependent; the relative tail ridge must keep the
    gram solvable (the SPD analogue of the dense quasi-definite tail)."""
    from facedeform_tpu.ops.decimate import fit_reduced, fit_reduced_frames
    from facedeform_tpu.utils import errors

    n = 120
    rest = rng.standard_normal((n, 3)).astype(np.float32)
    rest[:, 2] = 0.25                      # exactly planar: [1, z] dependent
    deformed = rest + np.float32([0, 0.05, 0])
    m, rep, info = fit_reduced(rest, deformed, 20)
    errors.check_solve(rep)                # must not raise
    assert np.isfinite(np.asarray(m.w_rbf)).all()
    assert info.fit_max < 5e-3             # translation reproduced

    frames = np.stack([deformed, rest + np.float32([0, 0.08, 0])])
    m2, rep2, _ = fit_reduced_frames(rest, frames, 20)
    errors.check_solve(rep2)
    assert np.isfinite(np.asarray(m2.w_rbf)).all()


def test_reduced_flag_survives_checkpoints(tmp_path, rng):
    """The `reduced` marker must round-trip through save/load so a
    resumed K-center model doesn't re-trigger the control-count-mismatch
    checkpoint warning it exists to suppress."""
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import (
        fibonacci_points, uv_sphere,
    )
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.ops.decimate import fit_reduced
    from facedeform_tpu.utils import checkpoint

    rest = fibonacci_points(60)
    model, rep, _ = fit_reduced(rest, rest * 1.02, 15)
    d = Deformer(model=model, cfg=DeformConfig(), params=DeformParams(),
                 report=rep, reduced=True)
    p = str(tmp_path / "red.npz")
    checkpoint.save(p, d)
    d2 = checkpoint.load(p)
    assert d2.reduced is True

    res = FaceDeformNode().cook(
        [uv_sphere(8, 8), Mesh(points=rest), Mesh(points=rest * 1.02)],
        DeformConfig(), DeformParams(), deformer=d2,
    )
    assert not any("precomputed deformer" in w for w in res.warnings)
    # a genuinely foreign checkpoint still warns
    d3 = checkpoint.load(p)
    assert d3.reduced  # sanity
    import dataclasses
    d_foreign = dataclasses.replace(d3, reduced=False)
    res2 = FaceDeformNode().cook(
        [uv_sphere(8, 8), Mesh(points=rest), Mesh(points=rest * 1.02)],
        DeformConfig(), DeformParams(), deformer=d_foreign,
    )
    assert any("precomputed deformer" in w for w in res2.warnings)


def test_reduce_rig_subset_supports_pu_cfg(rng):
    """reduce_rig must not crash under solver='pu' (the report fit
    reroutes through the auto dense/Krylov solver of the same family)."""
    import dataclasses

    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops.decimate import reduce_rig

    rest = fibonacci_points(80)
    cfg = dataclasses.replace(DeformConfig(), solver="pu")
    idx, rep = reduce_rig(rest, rest * 1.03, 20, cfg, DeformParams())
    assert len(idx) == 20 and np.isfinite(rep.max_err)


def test_cli_deform_regress_symmetrize_composes(tmp_path, rng):
    """--symmetrize with --reduce-mode regress must close the rig BEFORE
    the regression fit: the output field has to be mirror-symmetric."""
    from facedeform_tpu import cli
    from facedeform_tpu.geometry import load_mesh
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.obj_io import save_obj
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(12, 12)
    # one-sided rig: 40 markers all at x > 0.1
    pts = rng.standard_normal((40, 3)).astype(np.float32)
    pts[:, 0] = 0.15 + np.abs(pts[:, 0])
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-6)
    pts[:, 0] = np.maximum(pts[:, 0], 0.15)
    posed = pts + np.float32([0, 0.05, 0])
    mesh_p = str(tmp_path / "mesh.obj")
    rest_p = str(tmp_path / "rest.obj")
    posed_p = str(tmp_path / "posed.obj")
    save_obj(mesh_p, mesh)
    save_obj(rest_p, Mesh(points=pts))
    save_obj(posed_p, Mesh(points=posed))
    out = str(tmp_path / "out.obj")
    rc = cli.main([
        "deform", mesh_p, rest_p, posed_p, "-o", out,
        "--model", "kernel", "--kernel", "gaussian", "--radius", "1.2",
        "--reduce-rig", "24", "--reduce-mode", "regress",
        "--symmetrize", "x",
    ])
    assert rc == 0
    got = load_mesh(out)
    disp = got.points - mesh.points
    # mirror pairs of the output sphere: x -> -x maps the uv grid onto
    # itself only approximately; instead check the FIELD at mirrored
    # probes directly through the saved displacement
    from scipy.spatial import cKDTree

    mirrored = mesh.points * np.float32([-1, 1, 1])
    j = cKDTree(mesh.points).query(mirrored)[1]
    ok = np.linalg.norm(mesh.points[j] - mirrored, axis=1) < 1e-4
    asym = np.abs(disp[j][ok] - disp[ok] * np.float32([-1, 1, 1])).max()
    assert asym < 1e-4

    # and regress + pu conflicts cleanly on the single-pose CLI too
    rc = cli.main([
        "deform", mesh_p, rest_p, posed_p, "-o", out,
        "--solver", "pu", "--reduce-rig", "24", "--reduce-mode", "regress",
    ])
    assert rc == 1
