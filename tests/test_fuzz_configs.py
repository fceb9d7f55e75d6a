"""Randomized cross-feature parity fuzz: every cook option against the
f64 oracle.

Individual features are unit-tested elsewhere; this sweep exercises the
INTERACTIONS (kernel x term x layers x tangent x falloff x group x
strict_parity x solver routing) that enumerated tests don't cover.  Each
trial draws a full configuration, runs the real Deformer pipeline, and
checks the displacement against tests/oracle.py within the 5e-5 budget
(scaled up by the measured f32 floor only where the oracle itself rounds
differently: strict_parity amplification can exceed 1).
"""

import numpy as np
import pytest

import oracle
from facedeform_tpu import Deformer, DeformConfig, DeformParams
from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType
from facedeform_tpu.geometry.primitives import fibonacci_points

KERNELS = list(RBFKernel)


def _random_cfg(rng):
    model = RBFModelType(int(rng.integers(0, 3)))
    return DeformConfig(
        model=model,
        kernel=KERNELS[int(rng.integers(0, len(KERNELS)))],
        term=PolyTerm(int(rng.integers(0, 3))),
        layers=int(rng.integers(1, 4)),
        tangent=bool(rng.integers(0, 2)),
        strict_parity=bool(rng.integers(0, 2)),
        solver="krylov" if rng.random() < 0.25 else "direct",
    )


@pytest.mark.parametrize("trial", range(24))
def test_fuzzed_config_matches_oracle(trial):
    rng = np.random.default_rng(1000 + trial)
    cfg = _random_cfg(rng)
    n = int(rng.integers(12, 120))
    v = int(rng.integers(50, 400))
    rest = fibonacci_points(n) * float(rng.uniform(0.5, 2.0))
    rest = rest + rng.uniform(-5, 5, 3).astype(np.float32)  # off-origin
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    params = DeformParams(
        qcoef=float(rng.uniform(0.5, 2.0)),
        zcoef=float(rng.uniform(1.0, 8.0)),
        radius=float(rng.uniform(0.3, 2.0)),
        lam=float(rng.uniform(0.01, 0.3)),
        falloffrate=float(rng.uniform(0.0, 2.0)),
    )
    pts = (rng.standard_normal((v, 3)) * rng.uniform(0.3, 1.5)).astype(
        np.float32
    ) + np.asarray(rest.mean(0))
    dist2 = None
    if rng.random() < 0.5:
        dist2 = np.abs(rng.standard_normal(v)).astype(np.float32) * float(
            params.radius
        ) ** 2
        if cfg.strict_parity and rng.random() < 0.5:
            dist2[rng.integers(0, v, v // 10)] = -1.0  # quirk-2 sentinel
    frame = None
    if cfg.tangent:
        frame = tuple(
            rng.standard_normal((v, 3)).astype(np.float32) for _ in range(3)
        )
    group_mask = None
    if rng.random() < 0.4:
        group_mask = rng.standard_normal(v) > 0

    try:
        d = Deformer.fit(rest, deformed, cfg, params)
    except Exception as e:  # solver-declared failure is a legal outcome
        from facedeform_tpu.utils.errors import SolveFailedError

        assert isinstance(e, SolveFailedError), e
        return
    got, got_w = d.apply(pts, dist2=dist2, frame=frame, group_mask=group_mask)
    want, want_w = oracle.deform(
        rest, deformed, pts, cfg, params,
        dist2=dist2, frame=frame, group_mask=group_mask,
    )
    got = np.asarray(got, np.float64)
    # Scale-aware budget: growing kernels carry |disp| up to O(|w|); the
    # 5e-5 contract is on displacement at BASELINE-like magnitudes, so
    # normalize by the oracle displacement scale when it exceeds 1.
    scale = max(1.0, np.abs(want - pts).max())
    err = np.abs(got - want).max() / scale
    assert err < 5e-5, (
        f"trial {trial}: cfg={cfg} err={err:.2e} scale={scale:.1f}"
    )
    np.testing.assert_allclose(
        np.asarray(got_w), want_w, atol=1e-5,
        err_msg=f"trial {trial} falloff mismatch",
    )


# ------------------------------------------------------------- PU route fuzz
# The PU field is a DIFFERENT interpolant from the global solve, so it gets
# its own f64 oracle (oracle.pu_deform: per-patch f64 saddle solves +
# Wendland blend + the coverage/fallback policy).  Budget: 5e-5 on
# displacement, scaled by field magnitude like the global fuzz — the f32
# tile eval at auto eps was measured equal to the df tiles (ops/pu.py).
_PU_KERNELS = [
    RBFKernel.THIN_PLATE, RBFKernel.GAUSSIAN, RBFKernel.MULTIQUADRIC,
    RBFKernel.INVERSE_MULTIQUADRIC, RBFKernel.LINEAR, RBFKernel.CUBIC,
]


@pytest.mark.parametrize("trial", range(8))
def test_fuzzed_pu_matches_pu_oracle(trial):
    from facedeform_tpu.ops import pu

    rng = np.random.default_rng(7000 + trial)
    kernel = _PU_KERNELS[int(rng.integers(0, len(_PU_KERNELS)))]
    term = PolyTerm(int(rng.integers(0, 2)))  # LINEAR/CONSTANT (PU default)
    lam = float(rng.choice([0.0, 1e-5, 1e-2]))
    patch_size = int(rng.choice([48, 64, 96]))
    n = int(rng.integers(250, 900))
    rest = fibonacci_points(n) * float(rng.uniform(0.5, 2.0))
    rest = rest + rng.uniform(-3, 3, 3).astype(np.float32)
    disp = (
        0.1 * np.exp(-2 * np.sum((rest - rest.mean(0)) ** 2, -1, keepdims=True))
    ).astype(np.float32) * rng.standard_normal(3).astype(np.float32)
    d = pu.PUDeformer.fit(
        rest, rest + disp, kernel=kernel, term=term, eps="auto", lam=lam,
        patch_size=patch_size,
    )
    v = int(rng.integers(100, 400))
    q = (rest.mean(0) + (fibonacci_points(v) * float(rng.uniform(0.8, 1.4)))
         * float(np.abs(rest - rest.mean(0)).max())).astype(np.float32)
    got = np.asarray(d.displacement(q), np.float64)
    eps_arr = np.asarray(d.model.eps)
    want = oracle.pu_deform(
        rest, rest + disp, q, d.patches, kernel, term, eps_arr, lam
    )
    scale = max(1.0, np.abs(want).max())
    err = np.abs(got - want).max() / scale
    assert err < 5e-5, (
        f"trial {trial}: kernel={kernel} term={term} lam={lam} "
        f"ps={patch_size} n={n} err={err:.2e}"
    )


@pytest.mark.parametrize("trial", range(6))
def test_fuzzed_pu_node_composition(trial):
    """solver='pu' through the NODE: falloff x tangent x group x
    strict_parity interactions must compose around the PU field exactly
    as the oracle composes them around the same displacement (budget
    1e-5 + falloff atol 1e-5 — composition is pure f32 arithmetic)."""
    from facedeform_tpu import FaceDeformNode, Mesh
    from facedeform_tpu.ops import pu

    rng = np.random.default_rng(8000 + trial)
    cfg = DeformConfig(
        solver="pu",
        model=RBFModelType(int(rng.integers(0, 3))),
        kernel=KERNELS[int(rng.integers(0, len(KERNELS)))],
        tangent=bool(rng.integers(0, 2)),
        dofalloff=True,
        strict_parity=bool(rng.integers(0, 2)),
    )
    params = DeformParams(
        radius=float(rng.uniform(0.5, 2.0)),
        lam=float(rng.uniform(0.01, 0.3)),
        falloffrate=float(rng.uniform(0.0, 2.0)),
    )
    n = int(rng.integers(200, 600))
    v = int(rng.integers(100, 400))
    rest = fibonacci_points(n)
    deformed = rest * float(rng.uniform(1.01, 1.1))
    mesh = Mesh(points=(fibonacci_points(v) * 1.02).astype(np.float32))
    if cfg.tangent:
        for name in ("tangentu", "tangentv", "N"):
            mesh.set_attr(
                name, rng.standard_normal((v, 3)).astype(np.float32)
            )
    group_mask = None
    if rng.random() < 0.5:
        group_mask = rng.standard_normal(v) > 0
    res = FaceDeformNode().cook(
        [mesh, Mesh(points=rest), Mesh(points=deformed.astype(np.float32))],
        cfg, params, group_mask=group_mask,
    )
    # oracle composition around the library's own PU displacement field
    from facedeform_tpu.ops.fit import effective_kernel

    lam = 0.0 if cfg.model == RBFModelType.QNN else float(params.clamped().lam)
    d = pu.PUDeformer.fit(
        rest, deformed, kernel=effective_kernel(cfg), term=cfg.term,
        eps="auto", lam=lam,
    )
    disp = np.asarray(d.displacement(mesh.points), np.float64)
    if cfg.tangent:
        disp = oracle.project_to_tangents(
            mesh.point_attrs["tangentu"], mesh.point_attrs["tangentv"],
            mesh.point_attrs["N"], disp,
        )
    # capture dist2 is a shared input (capture has its own unit tests);
    # the falloff/gate COMPOSITION around it is what this fuzz checks
    from facedeform_tpu.capture.capture import ProximityCapture

    pc = ProximityCapture()
    pc.init(mesh, Mesh(points=rest))
    cap = pc.capture(
        int(params.clamped().maxedges), float(params.clamped().radius),
        cfg.dofalloff, float(params.clamped().falloffrate),
        strict_parity=cfg.strict_parity,
    )
    w, _ = oracle.falloff_weight(
        cap.dist2, float(params.clamped().radius),
        float(params.clamped().falloffrate), cfg.strict_parity,
    )
    if group_mask is not None:
        w = w * group_mask
    want = mesh.points + disp * w[:, None]
    got = np.asarray(res.mesh.points, np.float64)
    scale = max(1.0, np.abs(disp).max())
    assert np.abs(got - want).max() / scale < 1e-5, f"trial {trial} cfg={cfg}"
    np.testing.assert_allclose(
        np.asarray(res.mesh.point_attrs["fd_falloff"]), w, atol=1e-5
    )


@pytest.mark.parametrize("trial", range(6))
def test_fuzzed_pu_sequence_matches_per_frame(trial):
    """Randomized any-N sequence route: fit_pu_frames (one factorization,
    3F RHS columns) must reproduce independent per-frame fit_pu models
    across the kernel/term/lam/patch-size space.  The 3-column RHS
    blocking in lu_solve_refined_against_df makes each frame's refinement
    independent given the shared LU, so agreement is at f32 program-noise
    level, not a looser analytic budget."""
    from facedeform_tpu.ops import pu

    rng = np.random.default_rng(9000 + trial)
    kernel = _PU_KERNELS[int(rng.integers(0, len(_PU_KERNELS)))]
    term = PolyTerm(int(rng.integers(0, 2)))
    lam = float(rng.choice([0.0, 1e-5, 1e-2]))
    patch_size = int(rng.choice([48, 64]))
    n = int(rng.integers(250, 700))
    f_n = int(rng.integers(2, 5))
    rest = fibonacci_points(n) * float(rng.uniform(0.5, 2.0))
    frames = np.stack([
        rest + (
            0.1 * np.exp(-2 * np.sum(
                (rest - rest.mean(0)) ** 2, -1, keepdims=True
            ))
        ).astype(np.float32) * rng.standard_normal(3).astype(np.float32)
        for _ in range(f_n)
    ])
    patches = pu.build_patches(rest, patch_size)
    models, rep = pu.fit_pu_frames(
        rest, frames, kernel, term, patches=patches, lam=lam,
    )
    assert np.asarray(rep.col_backward).shape == (3 * f_n,)
    f = int(rng.integers(0, f_n))
    ref_model, _ = pu.fit_pu(
        rest, frames[f], kernel, term, patches=patches, lam=lam,
    )
    q = (rest.mean(0) + fibonacci_points(200)
         * float(np.abs(rest - rest.mean(0)).max())).astype(np.float32)
    got = np.asarray(pu.PUDeformer(
        models[f], patches, kernel, term
    ).displacement(q), np.float64)
    want = np.asarray(pu.PUDeformer(
        ref_model, patches, kernel, term
    ).displacement(q), np.float64)
    scale = max(1.0, np.abs(want).max())
    err = np.abs(got - want).max() / scale
    assert err < 1e-5, (
        f"trial {trial}: kernel={kernel} term={term} lam={lam} "
        f"F={f_n} frame={f} err={err:.2e}"
    )


# ---------------------------------------------------- confidence-ridge fuzz
# Per-marker confidence (weighted ridge lam_i = lam / c_i) across the ridge
# families x kernels x terms x layers x solver routing, vs the same
# weighted assembly in the f64 oracle (oracle.fit confidence=).  Draws
# include out-of-range confidences to exercise the [1e-3, 1] clip contract
# (ops/fit.confidence_clipped).
@pytest.mark.parametrize("trial", range(8))
def test_fuzzed_confidence_matches_oracle(trial):
    rng = np.random.default_rng(11000 + trial)
    model = (RBFModelType.MULTILAYER if rng.random() < 0.5
             else RBFModelType.KERNEL)
    cfg = DeformConfig(
        model=model,
        kernel=KERNELS[int(rng.integers(0, len(KERNELS)))],
        term=PolyTerm(int(rng.integers(0, 3))),
        layers=int(rng.integers(1, 4)),
        solver="krylov" if rng.random() < 0.25 else "direct",
    )
    n = int(rng.integers(12, 120))
    v = int(rng.integers(50, 400))
    rest = fibonacci_points(n) * float(rng.uniform(0.5, 2.0))
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    params = DeformParams(
        radius=float(rng.uniform(0.3, 2.0)),
        lam=float(rng.uniform(0.01, 0.3)),
    )
    # mostly-confident rig with a few glitched / out-of-range entries
    confidence = rng.uniform(0.5, 1.0, n).astype(np.float32)
    confidence[rng.integers(0, n, max(n // 8, 1))] = rng.choice(
        [1e-5, 0.01, 1.5]
    )
    pts = (rng.standard_normal((v, 3)) * rng.uniform(0.3, 1.5)).astype(
        np.float32
    ) + np.asarray(rest.mean(0))
    try:
        d = Deformer.fit(rest, deformed, cfg, params, confidence=confidence)
    except Exception as e:
        from facedeform_tpu.utils.errors import SolveFailedError

        assert isinstance(e, SolveFailedError), e
        return
    got, _ = d.apply(pts)
    want, _ = oracle.deform(
        rest, deformed, pts, cfg, params, confidence=confidence
    )
    got = np.asarray(got, np.float64)
    scale = max(1.0, np.abs(want - pts).max())
    err = np.abs(got - want).max() / scale
    assert err < 5e-5, (
        f"trial {trial}: cfg={cfg} err={err:.2e} scale={scale:.1f}"
    )


# ------------------------------------------------------- symmetry-closure fuzz
# symmetrize_rig's guarantee — the fitted field commutes with the
# reflection, f(Rx) = R f(x) — must hold for EVERY family / kernel / term /
# layer-count draw, not just the enumerated cases in test_symmetry.py.
@pytest.mark.parametrize("trial", range(8))
def test_fuzzed_symmetry_closure_invariance(trial):
    from facedeform_tpu.ops import symmetry as sym

    rng = np.random.default_rng(12000 + trial)
    cfg = DeformConfig(
        model=RBFModelType(int(rng.integers(0, 3))),
        kernel=KERNELS[int(rng.integers(0, len(KERNELS)))],
        term=PolyTerm(int(rng.integers(0, 3))),
        layers=int(rng.integers(1, 4)),
    )
    plane = ("x", "y", "z")[int(rng.integers(0, 3))]
    n = int(rng.integers(15, 80))
    rest = fibonacci_points(n) * float(rng.uniform(0.5, 2.0))
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    params = DeformParams(
        qcoef=float(rng.uniform(0.5, 2.0)),
        zcoef=float(rng.uniform(1.0, 8.0)),
        radius=float(rng.uniform(0.3, 2.0)),
        lam=float(rng.uniform(0.01, 0.3)),
    )
    r2, d2_, _, rep = sym.symmetrize_rig(rest, deformed, plane)
    assert rep.n_paired + rep.n_on_plane + rep.n_appended + rep.n_skipped >= n
    try:
        d = Deformer.fit(r2, d2_, cfg, params)
    except Exception as e:
        from facedeform_tpu.utils.errors import SolveFailedError

        assert isinstance(e, SolveFailedError), e
        return
    v = int(rng.integers(50, 300))
    q = (rng.standard_normal((v, 3)) * rng.uniform(0.5, 1.5)).astype(
        np.float32
    )
    r_mat = sym.reflection_matrix(plane)
    disp_q = np.asarray(d.displacement(q), np.float64)
    disp_m = np.asarray(
        d.displacement(q @ r_mat.T.astype(np.float32)), np.float64
    )
    scale = max(1.0, np.abs(disp_q).max())
    err = np.abs(disp_m - disp_q @ r_mat.T).max() / scale
    # skipped mirrors break exact closure by construction; only demand the
    # invariance when the closure is complete (the common case)
    if rep.n_skipped == 0:
        assert err < 5e-5, (
            f"trial {trial}: cfg={cfg} plane={plane} err={err:.2e}"
        )


# ------------------------------------------------------------ pose-space fuzz
# PSD (ops/psd.py) across kernel x lam x eps x normalize x example-count
# draws, vs an f64 re-derivation of the cardinal system.  PD kernels draw
# lam = 0 (exact interpolation; weights at an example pose must be e_j);
# non-PD kernels must draw lam > 0 (fit_psd raises otherwise — asserted).
_PSD_PD = [RBFKernel.GAUSSIAN, RBFKernel.INVERSE_MULTIQUADRIC,
           RBFKernel.WENDLAND_C2]
_PSD_NON_PD = [RBFKernel.THIN_PLATE, RBFKernel.MULTIQUADRIC,
               RBFKernel.LINEAR, RBFKernel.CUBIC]


def _oracle_psd(feats, corr, kernel, eps, lam, q_feats, normalize):
    f = feats.astype(np.float64)
    d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    phi = oracle.apply_kernel(kernel, d2, eps) + lam * np.eye(len(f))
    alpha = np.linalg.solve(phi, np.eye(len(f)))
    qd2 = ((q_feats.astype(np.float64)[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    w = oracle.apply_kernel(kernel, qd2, eps) @ alpha
    if normalize:
        s = w.sum(-1, keepdims=True)
        w = w * (s / (s * s + 1e-4))  # same guard as psd_weights
    return w, np.tensordot(w, corr.astype(np.float64), axes=1)


@pytest.mark.parametrize("trial", range(8))
def test_fuzzed_psd_matches_oracle(trial):
    from facedeform_tpu.ops import psd

    rng = np.random.default_rng(13000 + trial)
    pd = rng.random() < 0.6
    kernel = (_PSD_PD[int(rng.integers(0, len(_PSD_PD)))] if pd
              else _PSD_NON_PD[int(rng.integers(0, len(_PSD_NON_PD)))])
    lam = float(rng.choice([1e-3, 1e-2, 0.1])) if not pd or rng.random() < 0.3 \
        else 0.0
    k = int(rng.integers(2, 12))
    n = int(rng.integers(5, 40))       # rig markers -> D = 3N descriptors
    v = int(rng.integers(30, 200))
    rest = fibonacci_points(n)
    poses = rest[None] + 0.3 * rng.standard_normal((k, n, 3)).astype(np.float32)
    feats = np.stack([psd.features_from_rig(rest, p) for p in poses])
    corr = 0.1 * rng.standard_normal((k, v, 3)).astype(np.float32)
    eps = None if rng.random() < 0.5 else float(rng.uniform(0.5, 3.0)) * float(
        np.sqrt(((feats[0] - feats[-1]) ** 2).sum()) + 0.1
    )
    normalize = bool(rng.integers(0, 2))

    if lam == 0.0 and not pd:
        with pytest.raises(ValueError):
            psd.fit_psd(feats, corr, kernel, eps=eps, lam=lam)
        return
    model, report = psd.fit_psd(feats, corr, kernel, eps=eps, lam=lam)
    eps_used = float(model.eps)
    # queries: the example poses themselves + nearby perturbed poses
    q = np.concatenate([
        feats,
        feats[rng.integers(0, k, 3)] + (0.2 * eps_used) * rng.standard_normal(
            (3, feats.shape[1])
        ).astype(np.float32),
    ])
    got_w = np.asarray(psd.psd_weights(model, q, kernel, normalize), np.float64)
    got_d = np.asarray(psd.psd_delta(model, q, kernel, normalize), np.float64)
    want_w, want_d = _oracle_psd(feats, corr, kernel, eps_used, lam, q, normalize)
    w_scale = max(1.0, np.abs(want_w).max())
    assert np.abs(got_w - want_w).max() / w_scale < 5e-5, (
        f"trial {trial}: kernel={kernel} lam={lam} K={k} weight err "
        f"{np.abs(got_w - want_w).max():.2e}"
    )
    d_scale = max(1.0, np.abs(want_d).max())
    assert np.abs(got_d - want_d).max() / d_scale < 5e-5, f"trial {trial}"
    if lam == 0.0:
        # cardinal property: exact sculpt reproduction at each example pose
        np.testing.assert_allclose(
            got_d[:k], corr.astype(np.float64), atol=5e-5 * d_scale,
            err_msg=f"trial {trial}: lam=0 must reproduce the sculpts",
        )
