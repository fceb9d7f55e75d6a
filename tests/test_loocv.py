"""LOOCV (Rippa) radius/ridge selection — ops/loocv.py.

The key correctness claim is the closed form itself: e_i = -w_i /
(B^{-1})_{ii} must equal the brute-force leave-one-out refit error for the
exact saddle system the package assembles (polynomial tail rows, the
-1e-8 quasi-definite tail regularization, ridge, per-point radii).  The
brute force here is full f64 numpy, mirroring tests/oracle.py's assembly
conventions.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu.config import (
    DeformConfig,
    DeformParams,
    PolyTerm,
    RBFKernel,
    RBFModelType,
)
from facedeform_tpu.ops import loocv
from tests import oracle


def _system_f64(ctrl, kernel, term, eps, lam):
    """f64 saddle matrix with the package's conventions (oracle.py:100)."""
    phi = oracle.apply_kernel(
        kernel, oracle.pairwise_sqdist(ctrl, ctrl), eps
    ) + lam * np.eye(len(ctrl))
    p = oracle.poly_basis(ctrl, term)
    m = p.shape[1]
    if m == 0:
        return phi, m
    return np.block([[phi, p], [p.T, -1e-8 * np.eye(m)]]), m


def _brute_loo(ctrl, delta, kernel, term, eps, lam):
    """f64 leave-one-out errors by N actual refits (the definition)."""
    n = len(ctrl)
    e = np.zeros((n, 3))
    for i in range(n):
        keep = np.arange(n) != i
        a, m = _system_f64(ctrl[keep], kernel, term, eps[keep], lam)
        b = np.concatenate([delta[keep], np.zeros((m, 3))])
        x = np.linalg.solve(a, b)
        d2 = oracle.pairwise_sqdist(ctrl[i:i + 1], ctrl[keep])
        pred = oracle.apply_kernel(kernel, d2, eps[keep]) @ x[: n - 1]
        if m:
            pred = pred + oracle.poly_basis(ctrl[i:i + 1], term) @ x[n - 1:]
        e[i] = pred[0] - delta[i]
    return e


def _rippa_f64(ctrl, delta, kernel, term, eps, lam):
    """The closed form evaluated in f64 (isolates formula correctness
    from the package's f32 arithmetic)."""
    a, m = _system_f64(ctrl, kernel, term, eps, lam)
    b = np.concatenate([delta, np.zeros((m, 3))])
    w = np.linalg.solve(a, b)[: len(ctrl)]
    diag = np.diagonal(np.linalg.inv(a))[: len(ctrl)]
    return -w / diag[:, None]


def _cloud(rng, n=40):
    ctrl = rng.standard_normal((n, 3)).astype(np.float64)
    # smooth target field + a little noise so the LOO errors are nonzero
    delta = np.stack(
        [
            np.sin(ctrl[:, 0]) * np.cos(ctrl[:, 1]),
            0.5 * ctrl[:, 2] ** 2,
            np.cos(0.7 * ctrl[:, 0] + ctrl[:, 2]),
        ],
        axis=1,
    ) + 0.01 * rng.standard_normal((n, 3))
    return ctrl, delta


@pytest.mark.parametrize(
    "kernel,term,lam",
    [
        (RBFKernel.GAUSSIAN, PolyTerm.LINEAR, 0.0),
        (RBFKernel.GAUSSIAN, PolyTerm.ZERO, 0.1),
        (RBFKernel.THIN_PLATE, PolyTerm.LINEAR, 0.0),
        (RBFKernel.MULTIQUADRIC, PolyTerm.CONSTANT, 0.01),
    ],
)
def test_rippa_formula_matches_brute_force_f64(rng, kernel, term, lam):
    """Formula correctness in f64: closed form == N refits to ~1e-9."""
    ctrl, delta = _cloud(rng)
    eps = np.full(len(ctrl), 1.2)
    e_rippa = _rippa_f64(ctrl, delta, kernel, term, eps, lam)
    e_brute = _brute_loo(ctrl, delta, kernel, term, eps, lam)
    scale = np.abs(e_brute).max()
    np.testing.assert_allclose(e_rippa, e_brute, atol=1e-9 * max(scale, 1.0))


def test_rippa_formula_per_point_radii_unsymmetric(rng):
    """QNN-style per-point radii make the collocation matrix unsymmetric;
    the derivation never used symmetry, and neither may the code."""
    ctrl, delta = _cloud(rng, n=35)
    eps = (0.8 + rng.uniform(0, 1.5, len(ctrl)))
    e_rippa = _rippa_f64(
        ctrl, delta, RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, 0.0
    )
    e_brute = _brute_loo(
        ctrl, delta, RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, 0.0
    )
    a = _system_f64(ctrl, RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, 0.0)[0]
    assert np.abs(a - a.T).max() > 1e-6  # genuinely unsymmetric
    scale = np.abs(e_brute).max()
    np.testing.assert_allclose(e_rippa, e_brute, atol=1e-9 * max(scale, 1.0))


def test_device_loocv_matches_f64_formula(rng):
    """The on-device f32 loocv_errors tracks the f64 closed form (f32
    factorization noise only — the well-conditioned gaussian case)."""
    ctrl, delta = _cloud(rng)
    eps = np.full(len(ctrl), 1.2)
    e_dev, report = loocv.loocv_errors(
        jnp.asarray(ctrl, jnp.float32),
        jnp.asarray(delta, jnp.float32),
        RBFKernel.GAUSSIAN,
        PolyTerm.LINEAR,
        jnp.asarray(eps, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    )
    e_f64 = _rippa_f64(
        ctrl, delta, RBFKernel.GAUSSIAN, PolyTerm.LINEAR, eps, 0.0
    )
    scale = np.abs(e_f64).max()
    assert np.abs(np.asarray(e_dev) - e_f64).max() < 3e-3 * scale
    assert np.isfinite(np.asarray(report.residual_norm)).all()


def test_autotune_picks_near_optimal_radius(rng):
    """Sample a smooth field on a rig; the LOOCV pick's true held-out
    error must beat both grid extremes by a wide margin."""
    rng_local = np.random.default_rng(7)
    n = 60
    ctrl = rng_local.uniform(-1, 1, (n, 3)).astype(np.float32)
    test_pts = rng_local.uniform(-0.8, 0.8, (200, 3)).astype(np.float32)

    def field(x):
        return np.stack(
            [
                np.sin(2.0 * x[:, 0]),
                np.cos(2.0 * x[:, 1]) * x[:, 2],
                0.3 * x[:, 0] * x[:, 1],
            ],
            axis=1,
        ).astype(np.float32)

    deformed = ctrl + field(ctrl)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)
    params = DeformParams(radius=1.0, lam=0.01)

    def true_err(p):
        c, w_rbf, w_poly, eps = oracle.fit(ctrl, deformed, cfg, p)
        pred = oracle.evaluate(
            c, w_rbf, w_poly, eps, test_pts, RBFKernel.GAUSSIAN, cfg.term
        )
        return np.abs(pred - field(test_pts)).max()

    tuned, diag = loocv.autotune(ctrl, deformed, cfg, params)
    err_best = true_err(tuned)
    err_lo = true_err(params._replace(radius=1.0 * diag["factors"][0]))
    err_hi = true_err(params._replace(radius=1.0 * diag["factors"][-1]))
    assert err_best < 0.5 * min(err_lo, err_hi), (
        f"tuned {err_best:.3e} vs extremes lo {err_lo:.3e} hi {err_hi:.3e} "
        f"(picked factor {diag['best_factor']})"
    )
    assert diag["scores"].shape == (len(diag["factors"]), 1)


def test_autotune_ridge_on_noisy_targets(rng):
    """Gross noise on the targets: LOOCV must not pick the smallest ridge
    (interpolating the noise), and the chosen (radius, ridge) must
    generalize better than the no-ridge-floor candidate."""
    rng_local = np.random.default_rng(3)
    n = 80
    ctrl = rng_local.uniform(-1, 1, (n, 3)).astype(np.float32)
    clean = np.stack(
        [np.sin(2 * ctrl[:, 0]), np.cos(2 * ctrl[:, 1]), 0 * ctrl[:, 2]],
        axis=1,
    ).astype(np.float32)
    noisy = clean + 0.3 * rng_local.standard_normal((n, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)
    params = DeformParams(radius=0.8, lam=0.01)
    tuned, diag = loocv.autotune(
        ctrl, ctrl + noisy, cfg, params,
        radius_factors=(1.0,),
        ridge_values=loocv.DEFAULT_RIDGE_VALUES,
    )
    assert float(tuned.lam) > 0.011, (
        f"LOOCV kept ridge {float(tuned.lam)} on 0.3-sigma noisy targets"
    )
    # and the LOO score curve must actually prefer it
    assert diag["best_score"] <= diag["scores"][0, 0]


def test_autotune_qnn_scales_q_and_z(rng):
    ctrl = rng.standard_normal((50, 3)).astype(np.float32)
    deformed = ctrl + 0.1 * rng.standard_normal((50, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.QNN)
    params = DeformParams(qcoef=1.0, zcoef=5.0)
    tuned, diag = loocv.autotune(ctrl, deformed, cfg, params)
    f = diag["best_factor"]
    assert float(tuned.qcoef) == pytest.approx(1.0 * f)
    assert float(tuned.zcoef) == pytest.approx(5.0 * f)
    with pytest.raises(ValueError, match="exact interpolation"):
        loocv.autotune(
            ctrl, deformed, cfg, params, ridge_values=(0.01, 0.1)
        )


def test_autotune_krylov_regime_refuses(rng):
    ctrl = rng.standard_normal((32, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="dense factorization"):
        loocv.autotune(
            ctrl, ctrl, DeformConfig(solver="krylov"), DeformParams()
        )


def test_cli_autotune_flag(tmp_path, rng, capsys):
    """deform --autotune runs end to end, reports the pick, and still
    writes a deformed mesh; --autotune-ridge on QNN errors cleanly."""
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.obj_io import load_obj, save_obj
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(20, 20)
    rig = Mesh(points=fibonacci_points(25))
    bump = 0.2 * np.exp(
        -2 * np.sum((rig.points - [0, 1, 0]) ** 2, -1, keepdims=True)
    )
    drig = Mesh(points=rig.points + bump * np.float32([0, 1, 0]))
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), rig)
    save_obj(str(tmp_path / "drig.obj"), drig)
    args = [
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "-o", str(tmp_path / "out.obj"),
        "--model", "kernel", "--kernel", "gaussian", "--autotune",
    ]
    rc = main(args)
    captured = capsys.readouterr()
    assert rc == 0
    assert "LOOCV autotune" in captured.err
    out = load_obj(str(tmp_path / "out.obj"))
    assert np.linalg.norm(out.points - mesh.points, axis=1).max() > 0.05

    rc = main(args[:-1] + ["--model", "qnn", "--autotune",
                           "--autotune-ridge"])
    captured = capsys.readouterr()
    assert rc == 1
    assert "exact interpolation" in captured.err


def test_fit_auto_roundtrip(rng):
    """fit_auto returns a Deformer carrying the tuned params — applying it
    reproduces a plain fit at those params exactly."""
    from facedeform_tpu.deformer import Deformer

    ctrl = rng.standard_normal((40, 3)).astype(np.float32)
    deformed = ctrl + 0.1 * rng.standard_normal((40, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)
    d, diag = loocv.fit_auto(ctrl, deformed, cfg, DeformParams(radius=1.0))
    d_ref = Deformer.fit(ctrl, deformed, cfg, d.params)
    q = rng.standard_normal((64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(d.displacement(q)), np.asarray(d_ref.displacement(q)),
        atol=1e-7,
    )
    assert diag["best_factor"] in [float(f) for f in diag["factors"]]
