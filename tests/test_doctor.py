"""Rig/mesh QC linting (facedeform_tpu/doctor.py) + the doctor CLI."""

import json

import numpy as np

from facedeform_tpu import DeformConfig, DeformParams
from facedeform_tpu.doctor import diagnose
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere


def _codes(rep):
    return {f.code for f in rep.findings}


def _clean_inputs(rng, n=30):
    mesh = uv_sphere(25, 25)
    rig = Mesh(points=fibonacci_points(n))
    posed = Mesh(points=rig.points + 0.05 * rng.standard_normal(
        (n, 3)).astype(np.float32))
    return mesh, rig, posed


def test_doctor_clean_inputs(rng):
    mesh, rig, posed = _clean_inputs(rng)
    rep = diagnose(mesh, rig, [posed])
    assert not rep.errors, rep.findings
    assert "solve-ok" in _codes(rep)
    assert rep.stats["num_markers"] == 30
    assert rep.stats["median_marker_spacing"] > 0
    assert 0 <= rep.stats["captured_fraction"] <= 1
    assert "no findings" in rep.summary() or "warning" in rep.summary() \
        or "note" in rep.summary()


def test_doctor_duplicate_markers(rng):
    mesh, rig, posed = _clean_inputs(rng)
    pts = rig.points.copy()
    pts[5] = pts[4] + 1e-6  # near-coincident pair
    rep = diagnose(mesh, Mesh(points=pts), probe_solve=False)
    assert "duplicate-markers" in _codes(rep)
    assert rep.stats["near_duplicate_markers"] >= 2


def test_doctor_no_overlap_and_scale(rng):
    mesh, rig, posed = _clean_inputs(rng)
    far = Mesh(points=rig.points + np.float32([100, 0, 0]))
    rep = diagnose(mesh, far, probe_solve=False)
    assert any(f.code == "no-overlap" and f.severity == "error"
               for f in rep.findings)
    tiny = Mesh(points=(rig.points * 1e-3 + mesh.points.mean(0)).astype(
        np.float32))
    rep2 = diagnose(mesh, tiny, probe_solve=False)
    assert "scale-mismatch" in _codes(rep2)


def test_doctor_radius_bounds(rng):
    mesh, rig, posed = _clean_inputs(rng)
    rep = diagnose(mesh, rig, params=DeformParams(radius=0.01),
                   probe_solve=False)
    assert "radius-small" in _codes(rep)
    rep2 = diagnose(mesh, rig, params=DeformParams(radius=50.0),
                    probe_solve=False)
    assert "radius-large" in _codes(rep2)
    assert rep2.stats["suggested_radius"] > 0


def test_doctor_symmetry_detection(rng):
    mesh, _, _ = _clean_inputs(rng)
    half = np.abs(fibonacci_points(20)) * np.float32([1, 1, 1])
    sym_rig = np.concatenate([half, half * np.float32([-1, 1, 1])])
    posed = sym_rig + 0.02 * rng.standard_normal(sym_rig.shape).astype(
        np.float32)
    rep = diagnose(mesh, Mesh(points=sym_rig), [Mesh(points=posed)],
                   probe_solve=False)
    assert rep.stats["symmetry_plane"] == "x"
    assert rep.stats["symmetry_pairable_fraction"] > 0.9
    assert "symmetric-rig" in _codes(rep)
    assert "pose_asymmetry" in rep.stats


def test_doctor_tracker_jitter(rng):
    mesh, rig, _ = _clean_inputs(rng)
    f_n = 9
    t = np.linspace(0, 1, f_n, dtype=np.float32)[:, None, None]
    clean = rig.points[None] + 0.01 * t * np.float32([0, 1, 0])
    noisy = clean + 0.05 * rng.standard_normal(clean.shape).astype(
        np.float32)
    rep = diagnose(mesh, rig, [Mesh(points=f) for f in noisy],
                   probe_solve=False)
    assert "tracker-jitter" in _codes(rep)
    calm = diagnose(mesh, rig, [Mesh(points=f) for f in clean],
                    probe_solve=False)
    assert "tracker-jitter" not in _codes(calm)


def test_doctor_confidence_checks(rng):
    mesh, rig, posed = _clean_inputs(rng)
    rig.set_attr("confidence", np.float32([1.5] + [0.8] * 29))
    rep = diagnose(mesh, rig, cfg=DeformConfig(), probe_solve=False)
    # default model is QNN: confidence attr is ignored there
    assert "confidence-qnn" in _codes(rep)
    assert "confidence-range" in _codes(rep)
    from facedeform_tpu.config import RBFModelType

    rep2 = diagnose(mesh, rig, [posed],
                    cfg=DeformConfig(model=RBFModelType.MULTILAYER))
    assert "confidence-qnn" not in _codes(rep2)
    assert "solve-ok" in _codes(rep2)


def test_doctor_errors_and_routing(rng):
    mesh, rig, posed = _clean_inputs(rng)
    # posed count mismatch is an error (the reference's input contract)
    bad = Mesh(points=rig.points[:-2])
    rep = diagnose(mesh, rig, [bad])
    assert any(f.severity == "error" and f.code == "rig-count-mismatch"
               for f in rep.findings)
    # NaN positions
    nan_rig = rig.points.copy()
    nan_rig[0, 0] = np.nan
    rep2 = diagnose(mesh, Mesh(points=nan_rig))
    assert "non-finite-positions" in _codes(rep2)
    # krylov-size rigs skip the probe instead of running a huge solve
    big = Mesh(points=rng.standard_normal((9000, 3)).astype(np.float32))
    rep3 = diagnose(Mesh(points=rng.standard_normal((50, 3)).astype(
        np.float32) * 5), big, [Mesh(points=big.points)], probe_solve=True)
    assert "solve-probe-skipped" in _codes(rep3)


def test_doctor_cli(tmp_path, rng, capsys):
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.obj_io import save_obj

    mesh, rig, posed = _clean_inputs(rng)
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), rig)
    save_obj(str(tmp_path / "posed.obj"), posed)
    rc = main(["doctor", str(tmp_path / "mesh.obj"),
               str(tmp_path / "rig.obj"), str(tmp_path / "posed.obj"),
               "--json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["stats"]["num_markers"] == 30
    assert all({"severity", "code", "message"} <= set(f)
               for f in out["findings"])

    # an error finding drives the exit code
    save_obj(str(tmp_path / "far.obj"),
             Mesh(points=rig.points + np.float32([100, 0, 0])))
    rc = main(["doctor", str(tmp_path / "mesh.obj"),
               str(tmp_path / "far.obj"), "--no-solve"])
    err_out = capsys.readouterr().out
    assert rc == 1
    assert "[no-overlap]" in err_out


# -------------------------------------------------- review-fix regressions
def test_doctor_fully_duplicated_rig(rng):
    """A rig exported twice (median NN spacing 0) must still be caught —
    the median-relative test alone is vacuous there."""
    mesh, rig, _ = _clean_inputs(rng)
    doubled = Mesh(points=np.concatenate([rig.points, rig.points]))
    rep = diagnose(mesh, doubled, probe_solve=False)
    assert "all-markers-coincident" in _codes(rep)
    assert rep.errors
    # partial duplication (exact copies against a healthy median)
    pts = rig.points.copy()
    pts[5] = pts[4]  # exactly coincident
    rep2 = diagnose(mesh, Mesh(points=pts), probe_solve=False)
    assert "duplicate-markers" in _codes(rep2)


def test_doctor_empty_and_single_marker(rng, tmp_path, capsys):
    mesh, rig, _ = _clean_inputs(rng)
    rep = diagnose(mesh, Mesh(points=np.zeros((0, 3), np.float32)))
    assert "empty-input" in _codes(rep) and rep.errors

    # 1-marker rig: no inf-based advice, and --json stays RFC-8259 valid
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.obj_io import save_obj

    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "one.obj"), Mesh(points=rig.points[:1]))
    rc = main(["doctor", str(tmp_path / "mesh.obj"),
               str(tmp_path / "one.obj"), "--no-solve", "--json"])
    out = capsys.readouterr().out
    assert "Infinity" not in out
    parsed = json.loads(out)
    codes = {f["code"] for f in parsed["findings"]}
    assert "tiny-rig" in codes
    assert "radius-small" not in codes
    assert rc == 0


def test_doctor_falloff_advice_respects_dofalloff(rng):
    """falloff-clips is advice about the falloff gate; with dofalloff=False
    the deform applies weight 1 everywhere, so it must not fire."""
    from facedeform_tpu.config import DeformConfig

    mesh, rig, _ = _clean_inputs(rng)
    tiny_r = DeformParams(radius=0.05)
    rep_off = diagnose(mesh, rig, params=tiny_r, probe_solve=False)
    assert "falloff-clips" not in _codes(rep_off)
    rep_on = diagnose(mesh, rig, cfg=DeformConfig(dofalloff=True),
                      params=tiny_r, probe_solve=False)
    # with real distances at a tiny radius most captured verts clip
    assert "falloff-clips" in _codes(rep_on) or \
        rep_on.stats.get("captured_beyond_radius_fraction", 1.0) <= 0.5
