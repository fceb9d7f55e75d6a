"""Rig decimation (ops/decimate.py) vs an f64 pivoted-Cholesky oracle,
plus Mesh.subset and the CLI --reduce-rig wiring.

No reference counterpart (ALGLIB consumes whatever rig it's given,
src/SOP_FaceDeform.cpp:268-287) — correctness is defined against a plain
f64 greedy pivoted Cholesky of the same gaussian Gram matrix.
"""

import numpy as np
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
