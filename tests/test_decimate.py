"""Rig decimation (ops/decimate.py) vs an f64 pivoted-Cholesky oracle,
plus Mesh.subset and the CLI --reduce-rig wiring.

No reference counterpart (ALGLIB consumes whatever rig it's given,
src/SOP_FaceDeform.cpp:268-287) — correctness is defined against a plain
f64 greedy pivoted Cholesky of the same gaussian Gram matrix.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Mesh
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.ops.decimate import reduce_rig, select_markers


def _oracle_select(x, k, eps, lam=1e-6):
    """f64 greedy pivoted Cholesky on the gaussian Gram matrix."""
    x = np.asarray(x, np.float64)
    n = len(x)
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    gram = np.exp(-d2 / eps**2) + lam * np.eye(n)
    d = np.diag(gram).copy()
    low = np.zeros((n, k))
    idx = []
    for i in range(k):
        p = int(np.argmax(d))
        idx.append(p)
        c = (gram[:, p] - low[:, :i] @ low[p, :i]) / np.sqrt(d[p])
        low[:, i] = c
        d = np.maximum(d - c * c, 0.0)
        d[p] = -1.0
    return np.array(idx), np.maximum(d, 0.0)


def test_select_matches_f64_oracle(rng):
    x = rng.standard_normal((80, 3)).astype(np.float32)
    eps = 1.2
    idx, rep = select_markers(x, 12, eps=eps)
    want, resid = _oracle_select(x, 12, eps)
    np.testing.assert_array_equal(idx, want)
    assert rep.residual_trace == pytest.approx(resid.sum(), rel=1e-3)
    assert rep.residual_max == pytest.approx(resid.max(), rel=1e-3, abs=1e-6)
    assert rep.eps == eps


def test_selection_is_rkhs_fps(rng):
    """The second pick is (near-)farthest from the first — pivoted
    Cholesky on a gaussian kernel IS farthest-point sampling in the RKHS
    metric, which at step 2 is monotone in euclidean distance."""
    x = fibonacci_points(100)
    idx, _ = select_markers(x, 2, eps=0.8)
    d_picked = np.linalg.norm(x[idx[1]] - x[idx[0]])
    d_all = np.linalg.norm(x - x[idx[0]], axis=1)
    assert d_picked >= 0.99 * d_all.max()


def test_residual_trace_monotone_and_vanishes(rng):
    x = rng.standard_normal((40, 3)).astype(np.float32)
    traces = [
        select_markers(x, k, eps=1.0)[1].residual_trace
        for k in (5, 10, 20, 40)
    ]
    assert all(a >= b - 1e-5 for a, b in zip(traces, traces[1:]))
    assert traces[-1] <= 1e-3  # full selection leaves ~no kernel mass


def test_selection_covers_clusters(rng):
    """Two well-separated clusters: any reasonable budget must pick from
    both (euclidean-greedy or first-come orderings can starve one)."""
    a = rng.standard_normal((60, 3)).astype(np.float32) * 0.1
    b = a + np.float32([10.0, 0, 0])
    x = np.concatenate([a, b])
    idx, _ = select_markers(x, 6, eps=0.5)
    assert (idx < 60).any() and (idx >= 60).any()


def test_reduce_rig_error_decreases(rng):
    from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType

    rest = fibonacci_points(200)
    # smooth low-frequency deformation: a decimated rig must capture it
    deformed = rest + 0.1 * np.sin(rest[:, [1, 2, 0]] * 2.0).astype(np.float32)
    # thin-plate: the smoothest-interpolant family, so the dropped-marker
    # error meaningfully reflects the selection (QNN's local gaussians cap
    # out at ~10% here regardless of which markers are kept)
    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE,
        term=PolyTerm.LINEAR,
    )
    errs = []
    for k in (20, 60, 120):
        idx, rep = reduce_rig(rest, deformed, k, cfg, DeformParams())
        assert len(idx) == k and len(np.unique(idx)) == k
        errs.append(rep.max_err)
    assert errs[0] >= errs[-1]
    assert errs[-1] <= 0.05 * rep.motion_scale + 1e-4
    # k == N short-circuits with a zero-cost report
    idx, rep = reduce_rig(rest, deformed, 200, cfg, DeformParams())
    assert rep.max_err == 0.0 and len(idx) == 200


def test_reduce_rig_validation(rng):
    rest = fibonacci_points(30)
    with pytest.raises(ValueError):
        select_markers(rest, 0)
    with pytest.raises(ValueError):
        select_markers(rest, 31)
    with pytest.raises(ValueError):
        reduce_rig(rest, rest[:20], 5)
    with pytest.raises(ValueError):
        select_markers(rest[:, :2], 5)


def test_mesh_subset_slices_everything(rng):
    rig = Mesh(points=fibonacci_points(20))
    rig.set_attr("confidence", rng.random(20).astype(np.float32))
    rig.set_attr("class", np.arange(20, dtype=np.int32))
    rig.set_group("half", np.arange(20) < 10)
    idx = np.array([3, 17, 5])
    sub = rig.subset(idx)
    assert sub.num_points == 3 and sub.faces is None
    np.testing.assert_array_equal(sub.points, rig.points[idx])
    np.testing.assert_array_equal(
        sub.attr("confidence"), rig.attr("confidence")[idx]
    )
    np.testing.assert_array_equal(sub.attr("class"), idx.astype(np.int32))
    np.testing.assert_array_equal(
        sub.point_groups["half"], rig.point_groups["half"][idx]
    )


def test_cli_reduce_rig(tmp_path):
    from facedeform_tpu import cli
    from facedeform_tpu.geometry.obj_io import save_obj

    mesh = uv_sphere(10, 10)
    rest = fibonacci_points(60) * 1.05
    posed = rest + np.float32([0, 0.05, 0])
    mesh_p = str(tmp_path / "mesh.obj")
    rest_p = str(tmp_path / "rest.obj")
    posed_p = str(tmp_path / "posed.obj")
    save_obj(mesh_p, mesh)
    save_obj(rest_p, Mesh(points=rest))
    save_obj(posed_p, Mesh(points=posed))

    out = str(tmp_path / "out.obj")
    rc = cli.main([
        "deform", mesh_p, rest_p, posed_p, "-o", out, "--reduce-rig", "16",
    ])
    assert rc == 0

    # deform-seq: one rest-only selection slices every frame
    outdir = str(tmp_path / "seq")
    rc = cli.main([
        "deform-seq", mesh_p, rest_p, posed_p, posed_p,
        "-o", outdir, "--batch", "--reduce-rig", "16",
    ])
    assert rc == 0

    # K >= N warns and keeps the rig (still succeeds)
    rc = cli.main([
        "deform", mesh_p, rest_p, posed_p, "-o", out, "--reduce-rig", "600",
    ])
    assert rc == 0


def test_fit_reduced_recovers_true_centers(rng):
    """Data generated from K centers + linear tail is recovered exactly
    when the true centers are given: regression residual ~ f32 solve."""
    from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType
    from facedeform_tpu.ops.decimate import fit_reduced
    from facedeform_tpu.ops.evaluate import evaluate

    rest = fibonacci_points(300)
    ctr_idx = rng.choice(300, 24, replace=False)
    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
        term=PolyTerm.LINEAR,
    )
    params = DeformParams(radius=0.7, lam=0.01)
    w_true = 0.05 * rng.standard_normal((24, 3)).astype(np.float32)
    d2 = ((rest[:, None] - rest[ctr_idx][None]) ** 2).sum(-1)
    field = np.exp(-d2 / 0.7**2) @ w_true + 0.01 * rest + 0.02
    deformed = rest + field.astype(np.float32)

    model, report, info = fit_reduced(
        rest, deformed, 24, cfg, params, idx=ctr_idx
    )
    # fit residual at ALL markers tracks the ridge (lam 0.01 smooths a
    # little); solver health is clean
    assert info.fit_max <= 0.05 * info.motion_scale
    assert float(report.backward_error()) < 1e-5
    # the model is a standard RBFModel: the stock evaluator consumes it
    pred = np.asarray(
        evaluate(model, jnp.asarray(rest), RBFKernel.GAUSSIAN, cfg.term)
    )
    np.testing.assert_allclose(pred, field, atol=0.05 * np.abs(field).max())


def test_fit_reduced_beats_subset_on_noise(rng):
    """Noisy markers: regression averages ~N/K observations per dof;
    subset interpolation reproduces the kept markers' noise verbatim."""
    from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType
    from facedeform_tpu.ops.decimate import fit_reduced, select_markers
    from facedeform_tpu.ops.evaluate import evaluate
    from facedeform_tpu import Deformer

    rest = fibonacci_points(400)
    clean = 0.1 * np.sin(rest[:, [1, 2, 0]] * 2.0).astype(np.float32)
    noise = 0.01 * rng.standard_normal(rest.shape).astype(np.float32)
    deformed = rest + clean + noise

    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
        term=PolyTerm.LINEAR,
    )
    params = DeformParams(radius=0.8, lam=0.01)
    k = 60
    idx, _ = select_markers(rest, k)

    model, _, _ = fit_reduced(rest, deformed, k, cfg, params, idx=idx)
    pred_reg = np.asarray(
        evaluate(model, jnp.asarray(rest), RBFKernel.GAUSSIAN, cfg.term)
    )
    err_reg = np.linalg.norm(pred_reg - clean, axis=1)

    d_sub = Deformer.fit(rest[idx], deformed[idx], cfg, params)
    pred_sub, _ = d_sub.apply(rest)
    err_sub = np.linalg.norm(np.asarray(pred_sub) - rest - clean, axis=1)

    # regression recovers the CLEAN field better than subset interpolation
    assert np.sqrt((err_reg**2).mean()) < 0.8 * np.sqrt((err_sub**2).mean())


def test_fit_reduced_confidence_downweights_glitch(rng):
    from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType
    from facedeform_tpu.ops.decimate import fit_reduced
    from facedeform_tpu.ops.evaluate import evaluate

    rest = fibonacci_points(200)
    clean = 0.05 * np.cos(rest[:, [2, 0, 1]] * 2.0).astype(np.float32)
    deformed = rest + clean
    glitch = 7
    deformed[glitch] += np.float32([0.5, 0, 0])  # one wild tracker

    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
        term=PolyTerm.LINEAR,
    )
    params = DeformParams(radius=0.8, lam=0.01)
    conf = np.ones(200, np.float32)
    conf[glitch] = 1e-3

    m_no, _, _ = fit_reduced(rest, deformed, 40, cfg, params)
    m_c, _, _ = fit_reduced(rest, deformed, 40, cfg, params,
                            confidence=conf)
    q = rest[glitch][None]
    e_no = np.abs(np.asarray(
        evaluate(m_no, jnp.asarray(q), RBFKernel.GAUSSIAN, cfg.term)
    ) - clean[glitch]).max()
    e_c = np.abs(np.asarray(
        evaluate(m_c, jnp.asarray(q), RBFKernel.GAUSSIAN, cfg.term)
    ) - clean[glitch]).max()
    assert e_c < 0.25 * e_no


def test_fit_reduced_validation(rng):
    from facedeform_tpu.config import RBFModelType
    from facedeform_tpu.ops.decimate import fit_reduced

    rest = fibonacci_points(50)
    with pytest.raises(ValueError, match="MULTILAYER"):
        fit_reduced(rest, rest, 10,
                    DeformConfig(model=RBFModelType.MULTILAYER))
    with pytest.raises(ValueError, match="duplicate"):
        fit_reduced(rest, rest, 3, idx=np.array([1, 1, 2]))
    # wrong-length confidence goes through THE shared contract
    # (ops/fit.confidence_clipped) and raises its ShapeMismatchError
    from facedeform_tpu.utils import errors

    with pytest.raises(errors.ShapeMismatchError, match="confidence"):
        fit_reduced(rest, rest, 5, confidence=np.ones(7))


def test_fit_reduced_plugs_into_node(rng):
    """The regression model rides node.cook(deformer=...) — the external-
    deformer path the checkpoints use."""
    from facedeform_tpu import FaceDeformNode
    from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType
    from facedeform_tpu.deformer import Deformer as Dfm
    from facedeform_tpu.ops.decimate import fit_reduced

    mesh = uv_sphere(12, 12)
    rest = fibonacci_points(80) * 1.05
    deformed = rest + np.float32([0, 0.05, 0])
    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
        term=PolyTerm.LINEAR,
    )
    params = DeformParams(radius=0.8, lam=0.01)
    model, report, info = fit_reduced(rest, deformed, 20, cfg, params)
    ext = Dfm(model=model, cfg=cfg, params=params, report=report)
    node = FaceDeformNode()
    res = node.cook(
        [mesh, Mesh(points=rest), Mesh(points=deformed)], cfg, params,
        deformer=ext,
    )
    # uniform translation field: the cook must move the mesh by ~it
    moved = res.mesh.points - mesh.points
    np.testing.assert_allclose(moved[:, 1], 0.05, atol=5e-3)


def test_cli_reduce_mode_regress(tmp_path):
    from facedeform_tpu import cli
    from facedeform_tpu.geometry.obj_io import save_obj

    mesh = uv_sphere(10, 10)
    rest = fibonacci_points(80) * 1.05
    posed = rest + np.float32([0, 0.05, 0])
    mesh_p = str(tmp_path / "mesh.obj")
    rest_p = str(tmp_path / "rest.obj")
    posed_p = str(tmp_path / "posed.obj")
    save_obj(mesh_p, mesh)
    save_obj(rest_p, Mesh(points=rest))
    save_obj(posed_p, Mesh(points=posed))
    out = str(tmp_path / "out.obj")

    rc = cli.main([
        "deform", mesh_p, rest_p, posed_p, "-o", out,
        "--model", "kernel", "--kernel", "gaussian", "--radius", "0.8",
        "--reduce-rig", "20", "--reduce-mode", "regress",
    ])
    assert rc == 0
    from facedeform_tpu.geometry import load_mesh

    got = load_mesh(out)
    # uniform translation: regression model reproduces it on the mesh
    np.testing.assert_allclose(
        (got.points - mesh.points)[:, 1], 0.05, atol=5e-3
    )

    # regress without K is an error; MULTILAYER family is rejected
    rc = cli.main([
        "deform", mesh_p, rest_p, posed_p, "-o", out,
        "--reduce-mode", "regress",
    ])
    assert rc == 1
    rc = cli.main([
        "deform", mesh_p, rest_p, posed_p, "-o", out,
        "--model", "multilayer",
        "--reduce-rig", "20", "--reduce-mode", "regress",
    ])
    assert rc == 1


def test_fit_reduced_frames_matches_per_frame(rng):
    """One shared factorization (3F RHS columns) is bit-compatible with F
    independent single-pose regressions over the same centers, and the
    stacked model rides parallel/batched.apply_frames unchanged."""
    from facedeform_tpu.ops.decimate import fit_reduced, fit_reduced_frames
    from facedeform_tpu.parallel import batched
    from facedeform_tpu.utils import errors

    n, f, k = 250, 4, 50
    rest = rng.standard_normal((n, 3)).astype(np.float32)
    frames = (
        rest[None] + 0.1 * rng.standard_normal((f, n, 3))
    ).astype(np.float32)
    conf = rng.uniform(0.2, 1.0, n).astype(np.float32)
    cfg, params = DeformConfig(), DeformParams()

    m_all, rep, info = fit_reduced_frames(
        rest, frames, k, cfg, params, confidence=conf
    )
    errors.check_solve(rep)        # one report, per-column backward errors
    assert rep.col_backward.shape == (3 * f,)
    assert m_all.w_rbf.shape == (f, 1, k, 3)
    assert m_all.w_poly.shape[0] == f and m_all.ctrl.shape == (k, 3)
    assert info.fit_rms.shape == (f,) and info.resid_norms.shape == (f,)

    for fi in range(f):
        m1, _, i1 = fit_reduced(
            rest, frames[fi], k, cfg, params, confidence=conf, idx=info.idx
        )
        np.testing.assert_allclose(
            np.asarray(m_all.w_rbf[fi, 0]), np.asarray(m1.w_rbf[0]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(m_all.w_poly[fi]), np.asarray(m1.w_poly), atol=1e-6
        )
        assert info.fit_rms[fi] == pytest.approx(i1.fit_rms, rel=1e-3)

    # the stacked model is a stock frames model: apply_frames consumes it
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    out, _ = batched.apply_frames(
        m_all, jnp.asarray(pts), jnp.zeros(300, jnp.float32),
        jnp.ones(300, jnp.float32), cfg, params, None, None,
    )
    assert out.shape == (f, 300, 3)

    # the fit sees kept AND dropped markers: prediction error at a marker
    # OUTSIDE the centers stays bounded by the reported misfit
    pred, _w = batched.apply_frames(
        m_all, jnp.asarray(rest), jnp.zeros(n, jnp.float32),
        jnp.ones(n, jnp.float32), cfg, params, None, None,
    )
    err = np.linalg.norm(np.asarray(pred) - frames, axis=2)
    assert err.max() <= 1.5 * info.fit_max.max() + 1e-5


def test_fit_reduced_frames_validation(rng):
    from facedeform_tpu.config import RBFModelType
    from facedeform_tpu.ops.decimate import fit_reduced_frames

    rest = fibonacci_points(30)
    frames = np.stack([rest, rest * 1.01])
    with pytest.raises(ValueError):           # (F, N, 3) shape contract
        fit_reduced_frames(rest, frames[:, :20], 5)
    with pytest.raises(ValueError):           # MULTILAYER is interpolation
        fit_reduced_frames(
            rest, frames, 5, DeformConfig(model=RBFModelType.MULTILAYER)
        )
    with pytest.raises(ValueError):           # duplicate caller idx
        fit_reduced_frames(rest, frames, 3, idx=np.array([1, 1, 2]))


def test_cli_seq_regress(tmp_path):
    """deform-seq --reduce-mode regress: the batch and per-frame paths
    share the ONE shot factorization and agree; the checkpoint is a stock
    sequence checkpoint."""
    from facedeform_tpu import cli
    from facedeform_tpu.geometry import load_mesh
    from facedeform_tpu.geometry.obj_io import save_obj
    from facedeform_tpu.utils import checkpoint

    mesh = uv_sphere(10, 10)
    rest = fibonacci_points(60) * 1.05
    mesh_p = str(tmp_path / "mesh.obj")
    rest_p = str(tmp_path / "rest.obj")
    save_obj(mesh_p, mesh)
    save_obj(rest_p, Mesh(points=rest))
    rig_frames = []
    for f in range(3):
        p = str(tmp_path / f"posed{f}.obj")
        save_obj(p, Mesh(points=rest + np.float32([0, 0.02 * (f + 1), 0])))
        rig_frames.append(p)

    base = ["deform-seq", mesh_p, rest_p, *rig_frames,
            "--out-pattern", "f_%02d.obj",
            "--model", "kernel", "--kernel", "gaussian", "--radius", "0.8",
            "--reduce-rig", "16", "--reduce-mode", "regress"]
    ck = str(tmp_path / "shot.npz")
    assert cli.main(base + ["-o", str(tmp_path / "ref")]) == 0
    assert cli.main(base + ["-o", str(tmp_path / "bat"), "--batch",
                            "--save-deformer", ck]) == 0
    for f in range(3):
        ref = load_mesh(str(tmp_path / "ref" / f"f_{f:02d}.obj"))
        got = load_mesh(str(tmp_path / "bat" / f"f_{f:02d}.obj"))
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5,
                                   err_msg=f"frame {f}")
        # the translation itself came through
        np.testing.assert_allclose(
            (got.points - mesh.points)[:, 1], 0.02 * (f + 1), atol=5e-3
        )

    # the checkpoint is a stock dense sequence checkpoint (frame 0
    # included), sized by the K centers
    model, _cfg, _params, resid = checkpoint.load_seq(ck)
    assert model.w_rbf.shape[0] == 3 and model.ctrl.shape == (16, 3)
    assert resid is not None and np.asarray(resid).shape == (3,)

    # conflicts: regress + pu is an error; regress without K is an error
    assert cli.main(base + ["-o", str(tmp_path / "x"),
                            "--solver", "pu"]) == 1
    assert cli.main(["deform-seq", mesh_p, rest_p, *rig_frames,
                     "-o", str(tmp_path / "y"),
                     "--reduce-mode", "regress"]) == 1


def test_fit_reduced_growing_kernel_centering_parity(rng):
    """fit_reduced on a CENTERING kernel (TPS + linear tail) must impose
    P_K^T w = 0: every eval path subtracts the per-row phi mean assuming
    sum(w) = 0, so an unconstrained regression ships a model whose
    evaluated field is biased by mean(phi) * sum(w) relative to its own
    fit diagnostics (round-5 review finding)."""
    import jax.numpy as jnp

    from facedeform_tpu.config import (
        DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType,
    )
    from facedeform_tpu.ops import decimate
    from facedeform_tpu.ops.evaluate import evaluate_block

    n, k = 300, 60
    rest = fibonacci_points(n)
    field = 0.08 * np.sin(2.0 * rest[:, [1, 2, 0]]).astype(np.float32)
    deformed = rest + field
    cfg = DeformConfig(
        model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE,
        term=PolyTerm.LINEAR,
    )
    params = DeformParams(radius=1.0, lam=0.01)
    model, report, info = decimate.fit_reduced(rest, deformed, k, cfg, params)

    # the constraint itself
    w = np.asarray(model.w_rbf[0], np.float64)          # (K, 3)
    from facedeform_tpu.ops.assemble import poly_basis

    p_k = np.asarray(poly_basis(model.ctrl, cfg.term), np.float64)
    assert np.abs(p_k.T @ w).max() < 1e-4 * max(np.abs(w).max(), 1.0)

    # the consequence: the centered eval agrees with the regression's own
    # fit diagnostics (the field the info misfits were measured against)
    got = np.asarray(evaluate_block(
        model, jnp.asarray(rest), RBFKernel.THIN_PLATE, PolyTerm.LINEAR
    ))
    err = np.linalg.norm(got - field, axis=1)
    rms = float(np.sqrt(np.mean(err**2)))
    assert rms < 4.0 * max(info.fit_rms, 1e-6), (rms, info.fit_rms)


def test_resolve_centers_rejects_out_of_range():
    from facedeform_tpu.ops import decimate

    rest = fibonacci_points(10)
    with pytest.raises(ValueError, match="out of range"):
        decimate._resolve_centers(rest, 2, np.asarray([-1, 9]), None)
    with pytest.raises(ValueError, match="out of range"):
        decimate._resolve_centers(rest, 2, np.asarray([0, 10]), None)
