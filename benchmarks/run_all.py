"""Run all five BASELINE.md configurations: parity + performance evidence.

Usage:  python benchmarks/run_all.py [--out BENCH_DETAIL.json]

Each config reports a parity number (vs the NumPy f64 oracle where one is
defined) and/or a throughput number measured on the current default JAX
backend.  Writes a JSON report and prints a markdown table.

Configs (BASELINE.md / BASELINE.json:6-12):
  1. Gaussian RBF deform: 50 ctrl pts, 10k-vertex sphere, assemble+solve+eval
  2. Kernel zoo: TPS / MQ / IMQ with linear polynomial augmentation
  3. Capture-region binding: per-vertex falloff masks gating deformation
  4. DBSE: least-squares blendshape-weight fit over multiple scanned poses
  5. Animated sequence: 1M verts, 1k ctrl pts, per-frame batched eval
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

PARITY_BUDGET = 5e-5


def _sync(x):
    import jax.numpy as jnp

    float(jnp.sum(jnp.ravel(x)[:1]))


def _timed_rounds(run, rounds=3):
    """Time `run()` best-of-`rounds`; returns (best_s, median_s, spread).

    spread = (max - best) / best is the contention indicator: the shared
    chip measured config 5 at 30.9 ms and 7.2 ms an hour apart on
    identical code (round-4 verdict), so every committed artifact carries
    the spread next to the best — a future reader can tell contention
    from regression without re-running.  main() re-runs a config once
    when its reported spread exceeds _SPREAD_FLAG.
    """
    times = []
    for _ in range(rounds):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times)
    return best, float(np.median(times)), (max(times) - best) / max(best, 1e-12)


_SPREAD_FLAG = 0.5


def config1_gaussian_sphere(rng):
    import oracle
    from facedeform_tpu import DeformConfig, DeformParams, Deformer
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(100, 100)
    rest = fibonacci_points(50)
    bump = 0.3 * np.exp(-2 * np.sum((rest - [0, 1, 0]) ** 2, -1, keepdims=True))
    deformed = (rest + bump * np.float32([0, 1, 0])
                + 0.02 * rng.standard_normal((50, 3))).astype(np.float32)
    cfg, params = DeformConfig(), DeformParams()
    t0 = time.time()
    d = Deformer.fit(rest, deformed, cfg, params)
    got, _ = d.apply(mesh.points)
    _sync(got)
    wall = time.time() - t0
    want, _ = oracle.deform(rest, deformed, mesh.points, cfg, params)
    err = float(np.abs(np.asarray(got) - want).max())
    return {
        "config": "1: gaussian 50ctrl/10k-sphere",
        "parity_max_err": err, "parity_budget": PARITY_BUDGET,
        "pass": err < PARITY_BUDGET, "wall_s_first": wall,
    }


def config2_kernel_zoo(rng):
    import oracle
    from facedeform_tpu import DeformConfig, DeformParams, Deformer, RBFKernel, RBFModelType
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(40, 40)
    rest = fibonacci_points(40)
    deformed = (rest + 0.1 * rng.standard_normal((40, 3))).astype(np.float32)
    results = {}
    ok = True
    for kernel in (RBFKernel.THIN_PLATE, RBFKernel.MULTIQUADRIC,
                   RBFKernel.INVERSE_MULTIQUADRIC):
        cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=kernel)
        params = DeformParams(radius=1.5, lam=0.01)
        d = Deformer.fit(rest, deformed, cfg, params)
        got, _ = d.apply(mesh.points)
        want, _ = oracle.deform(rest, deformed, mesh.points, cfg, params)
        err = float(np.abs(np.asarray(got) - want).max())
        results[kernel.name] = err
        ok &= err < PARITY_BUDGET
    return {
        "config": "2: kernel zoo + linear tail",
        "parity_max_err_per_kernel": results,
        "parity_budget": PARITY_BUDGET, "pass": ok,
    }


def config3_capture(rng):
    from facedeform_tpu import DeformConfig, DeformParams, Deformer, Mesh, ProximityCapture
    from facedeform_tpu.geometry.primitives import grid

    mesh = grid(60, 60, size=4.0)
    rig = Mesh(points=np.float32([[0, 0, 0]]))
    pc = ProximityCapture()
    pc.init(mesh, rig)
    res = pc.capture(max_edges=6, radius=1.0, dofalloff=True, falloffrate=1.0)
    d = Deformer.fit(rig.points, rig.points + np.float32([[0, 0.5, 0]]),
                     DeformConfig(), DeformParams())
    new_pts, falloff = d.apply(mesh.points, dist2=res.dist2,
                               group_mask=res.captured)
    new_pts = np.asarray(new_pts)
    frozen_ok = bool((new_pts[~res.captured] == mesh.points[~res.captured]).all())
    moved = np.linalg.norm(new_pts - mesh.points, axis=1)
    # falloff monotone in capture distance among active captured vertices
    act = res.captured & (res.dist2 <= 1.0) & (res.dist2 >= 0)
    order = np.argsort(res.dist2[act])
    w = np.asarray(falloff)[act][order]
    monotone = bool((np.diff(w) <= 1e-6).all())
    return {
        "config": "3: capture-region binding",
        "captured_vertices": int(res.captured.sum()),
        "uncaptured_frozen": frozen_ok,
        "falloff_monotone": monotone,
        "max_move": float(moved.max()),
        "pass": frozen_ok and monotone and moved.max() > 0.3,
    }


def config4_dbse(rng):
    import jax.numpy as jnp
    from facedeform_tpu.ops import dbse

    v, s, f = 2000, 8, 6
    rest = rng.standard_normal((v, 3)).astype(np.float32)
    shapes = [rest + 0.1 * rng.standard_normal((v, 3)).astype(np.float32)
              for _ in range(s)]
    model = dbse.build_model(rest, shapes)
    w_true = (0.5 * rng.standard_normal((f, s))).astype(np.float32)
    poses = rest + np.einsum("fs,svc->fvc", w_true, np.asarray(model.deltas))
    w, _ = dbse.weights_lstsq_batched(model, jnp.asarray(poses), jnp.asarray(rest))
    err = float(np.abs(np.asarray(w) - w_true).max())
    return {
        "config": "4: DBSE multi-pose lstsq",
        "poses": f, "shapes": s,
        "weight_recovery_max_err": err,
        "pass": err < 1e-3,
    }


def config5_animated(rng, n_verts=1_000_000, n_ctrl=1000, n_frames=8):
    import jax
    import jax.numpy as jnp
    from facedeform_tpu import DeformConfig, DeformParams
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.parallel import batched, sharding

    if jax.default_backend() != "tpu":
        n_verts, n_ctrl = 50_000, 100  # CPU smoke sizing
    rest = fibonacci_points(n_ctrl)
    frames = jnp.asarray(np.stack([
        rest + 0.05 * rng.standard_normal((n_ctrl, 3)).astype(np.float32)
        for _ in range(n_frames)
    ]))
    pts = jnp.asarray(rng.standard_normal((n_verts, 3)).astype(np.float32))
    cfg, params = DeformConfig(), DeformParams()
    mesh = sharding.make_mesh()
    # one dispatch for the whole sequence (batched solve fused with the
    # all-frame eval); best-of-3 like bench.py — the shared chip varies
    # 51-110+ G run to run
    rest_d = jnp.asarray(rest)
    d2 = jnp.zeros(n_verts)
    gate = jnp.ones(n_verts)
    out, _ = batched.deform_frames(rest_d, frames, pts, d2, gate,
                                   cfg, params, mesh)
    _sync(out)

    def run():
        nonlocal out
        out, _ = batched.deform_frames(rest_d, frames, pts, d2, gate,
                                       cfg, params, mesh)
        _sync(out)

    best, med, spread = _timed_rounds(run, rounds=3)
    per_frame = best / n_frames
    return {
        "config": "5: animated sequence (solve+eval per frame)",
        "verts": n_verts, "ctrl": n_ctrl, "frames": n_frames,
        "devices": int(np.prod(list(mesh.shape.values()))),
        "ms_per_frame": per_frame * 1e3,
        "ms_per_frame_median": med / n_frames * 1e3,
        "spread": spread,
        "gevals_per_sec": n_verts * n_ctrl / per_frame / 1e9,
        "pass": bool(np.isfinite(np.asarray(out)).all()),
    }


def config6_large_n(rng, n=25000):
    """Round-2 extension: the QNN large-N fit the reference gets from
    ALGLIB's any-N rbfbuildmodel (block-Jacobi GMRES, matrix-free)."""
    import time as _time

    import jax.numpy as jnp

    from facedeform_tpu.config import DeformConfig, DeformParams
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops import fit as fit_mod
    from facedeform_tpu.ops.evaluate import evaluate
    from facedeform_tpu.ops.fit import effective_kernel

    rest = jnp.asarray(fibonacci_points(n))
    delta = jnp.asarray(0.03 * rng.standard_normal((n, 3)).astype(np.float32))
    cfg, params = DeformConfig(), DeformParams()
    model, report = fit_mod.fit(rest, rest + delta, cfg.solve_view(), params)
    float(report.residual_norm)

    def run():
        nonlocal model, report
        model, report = fit_mod.fit(
            rest, rest + delta, cfg.solve_view(), params
        )
        float(report.residual_norm)

    warm_s, warm_med, spread = _timed_rounds(run, rounds=3)
    # exact-interpolation self check at the controls
    disp = np.asarray(evaluate(model, rest[:2048], effective_kernel(cfg), cfg.term))
    interp_err = float(np.abs(disp - np.asarray(delta[:2048])).max())
    back = float(report.backward_error())
    return {
        "config": "6: QNN large-N fit (GMRES, matrix-free)",
        "controls": n,
        "warm_solve_s": warm_s,
        "warm_solve_s_median": warm_med,
        "spread": spread,
        "backward_error": back,
        "interp_err_at_controls": interp_err,
        "pass": bool(back < 1e-6 and interp_err < 5e-5),
    }


def config7_growing_kernel_precision(rng, n=4096):
    """Round-2 extension: TPS at 4k controls within the 5e-5 budget via
    the double-float pipeline (VERDICT item 6 'done' criterion)."""
    import oracle

    from facedeform_tpu.config import DeformConfig, DeformParams, RBFKernel, RBFModelType
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.geometry.primitives import fibonacci_points

    rest = fibonacci_points(n)
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE,
                       solver="direct")
    params = DeformParams(radius=1.0, lam=0.01)
    d = Deformer.fit(rest, deformed, cfg, params)
    pts = (rng.standard_normal((1000, 3)) * 0.7).astype(np.float32)
    got, _ = d.apply(pts)  # auto -> double-float precise path
    want, _ = oracle.deform(rest, deformed, pts, cfg, params)
    err = float(np.abs(np.asarray(got, np.float64) - want).max())
    return {
        "config": "7: TPS @ 4k controls, double-float precision",
        "controls": n,
        "parity_max_err": err,
        "parity_budget": PARITY_BUDGET,
        "pass": bool(err < PARITY_BUDGET),
    }


def config8_cpd_preconditioned(rng, n=16384):
    """Round-2 extension: large-N growing-kernel (TPS) fit past the dense
    LU limit via |.|-block-Jacobi PMINRES (see ops/krylov.py).  Reports
    the preconditioner's fixed-budget residual win over plain MINRES plus
    the production fit's health numbers."""
    import time as _time

    import jax.numpy as jnp

    from facedeform_tpu.config import (
        DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType,
    )
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops.assemble import assemble_rhs
    from facedeform_tpu.ops.krylov import (
        make_abs_block_jacobi, make_saddle_matvec, minres, pminres,
    )

    rest = fibonacci_points(n)
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE)
    params = DeformParams(radius=1.0, lam=0.01)
    # production fit (auto -> krylov above 8192): warm time + health
    d = Deformer.fit(rest, deformed, cfg, params)
    float(d.report.residual_norm)

    def run():
        nonlocal d
        d = Deformer.fit(rest, deformed, cfg, params)
        float(d.report.residual_norm)

    warm_s, warm_med, spread = _timed_rounds(run, rounds=3)
    back = float(d.report.backward_error())

    # fixed-budget preconditioner evidence (128 iterations each)
    c = jnp.asarray(rest)
    eps = jnp.ones((n,), jnp.float32)
    lam = jnp.float32(0.01)
    mv = make_saddle_matvec(c, RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam)
    b = assemble_rhs(jnp.asarray(deformed - rest), PolyTerm.LINEAR)
    ms = make_abs_block_jacobi(c, RBFKernel.THIN_PLATE, PolyTerm.LINEAR, eps, lam)
    x_p, _ = pminres(mv, b, ms, maxiter=128)
    x_m, _ = minres(mv, b, maxiter=128)
    r_p = float(jnp.linalg.norm(b - mv(x_p)))
    r_m = float(jnp.linalg.norm(b - mv(x_m)))
    from facedeform_tpu.utils.errors import KRYLOV_CPD_BACKWARD_RTOL

    return {
        "config": "8: TPS large-N fit (|.|-block-Jacobi PMINRES)",
        "controls": n,
        "warm_fit_s": warm_s,
        "warm_fit_s_median": warm_med,
        "spread": spread,
        "backward_error": back,
        "resid_plain_minres_128it": r_m,
        "resid_precond_128it": r_p,
        "precond_residual_win": r_m / max(r_p, 1e-30),
        "pass": bool(back < KRYLOV_CPD_BACKWARD_RTOL and r_p < r_m),
    }


def config9_pu_any_n(rng, n=30000, n_query=200000):
    """Round-2 extension: partition-of-unity TPS fit past the dense limit
    at dense double-float precision (ops/pu.py) — interpolation error at
    the controls is the claim the Krylov route cannot make there."""
    import time as _time

    from facedeform_tpu.config import RBFKernel
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops.pu import PUDeformer

    rest = fibonacci_points(n)
    disp = (
        0.1
        * np.exp(-3 * np.sum((rest - [0, 1, 0]) ** 2, -1, keepdims=True))
        .astype(np.float32)
        * np.float32([0, 1, 0])
    )
    import jax.numpy as _jnp

    d = PUDeformer.fit(rest, rest + disp, kernel=RBFKernel.THIN_PLATE, lam=1e-5)
    float(_jnp.sum(d.model.w_hi))

    def run_fit():
        nonlocal d
        d = PUDeformer.fit(
            rest, rest + disp, kernel=RBFKernel.THIN_PLATE, lam=1e-5
        )
        # the device-resident fit returns without materializing: fence via
        # a scalar pull (block_until_ready does not fence the axon tunnel)
        float(_jnp.sum(d.model.w_hi))

    warm_fit_s, fit_med, fit_spread = _timed_rounds(run_fit, rounds=3)
    got = np.asarray(d.displacement(rest))
    interp_err = float(np.abs(got - disp).max())
    q = (fibonacci_points(n_query) * 1.01).astype(np.float32)
    out = np.asarray(d.displacement(q))     # cold: builds + caches the plan
    t0 = _time.time()
    out = np.asarray(d.displacement(q))
    eval_s = _time.time() - t0

    # fused Mosaic tile kernel, device-resident + explicit plan (the
    # per-frame serving shape; host-buffer round trips are tunnel-bound)
    import jax
    import jax.numpy as jnp

    from facedeform_tpu.ops.pallas_pu import plan_eval_tiles

    tiles_ms = None
    tiles_spread = 0.0
    if jax.default_backend() == "tpu":
        tplan = plan_eval_tiles(d.patches, q)
        q_dev = jnp.asarray(q)
        float(jnp.sum(q_dev))
        o = d.displacement(q_dev, plan=tplan)
        float(jnp.sum(o))

        def run_tiles():
            o = d.displacement(q_dev, plan=tplan)
            float(jnp.sum(o))

        best, _, tiles_spread = _timed_rounds(run_tiles, rounds=5)
        tiles_ms = best * 1e3
    return {
        "config": "9: PU any-N TPS (dense df per patch)",
        "controls": n,
        "patches": int(d.patches.idx.shape[0]),
        "patch_width": int(d.patches.idx.shape[1]),
        "warm_fit_s": warm_fit_s,
        "warm_fit_s_median": fit_med,
        "spread": max(fit_spread, tiles_spread),
        "interp_err_at_controls": interp_err,
        "query_points": n_query,
        "warm_eval_s": eval_s,
        "mosaic_tiles_eval_ms": tiles_ms,
        "pass": bool(interp_err < PARITY_BUDGET and np.isfinite(out).all()),
    }


def config10_pu_sequence(rng, n=20000, n_frames=8, n_query=100000):
    """Round-3 extension: any-N animated sequences.  The PU patch systems
    depend only on the rest rig (frames are pure RHS columns), so all F
    frames share one df assembly + batched LU (ops/pu.fit_pu_frames);
    the per-column df refinement still scales with F (its compensated
    residual is the solver's memory/bandwidth bound, blocked at 3
    columns), so the measured claim is an F-frame fit well under F
    independent fits (8 frames = 0.47x of 8 fits at 20k ctrl), with the
    whole shot sharing one eval plan + one Mosaic frames pass
    (PUSeqDeformer)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from facedeform_tpu.config import RBFKernel
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops import pu

    if jax.default_backend() != "tpu":
        n, n_frames, n_query = 2000, 3, 5000  # CPU smoke sizing
    rest = fibonacci_points(n)
    frames = np.stack([
        rest + (0.1 * np.exp(
            -3 * np.sum((rest - c) ** 2, -1, keepdims=True)
        ).astype(np.float32) * np.float32([0, 1, 0]))
        for c in ([0, 1, 0], [1, 0, 0], [0, 0, 1], [0, -1, 0],
                  [-1, 0, 0], [0, 0, -1], [0.7, 0.7, 0], [0, 0.7, 0.7])
        [:n_frames]
    ])
    patches = pu.build_patches(rest, 192, 1.3)

    def fence(x_hi):
        float(jnp.sum(x_hi))

    # warm single-frame fit (the baseline an F-frame shot would pay Fx)
    m1, _ = pu.fit_pu(rest, frames[0], kernel=RBFKernel.THIN_PLATE,
                      lam=1e-5, patches=patches)
    fence(m1.w_hi)

    def run_single():
        m1, _ = pu.fit_pu(rest, frames[0], kernel=RBFKernel.THIN_PLATE,
                          lam=1e-5, patches=patches)
        fence(m1.w_hi)

    single_s, _, single_spread = _timed_rounds(run_single, rounds=2)

    models, _ = pu.fit_pu_frames(rest, frames, kernel=RBFKernel.THIN_PLATE,
                                 lam=1e-5, patches=patches)
    fence(models[0].w_hi)

    def run_seq_fit():
        nonlocal models
        models, _ = pu.fit_pu_frames(
            rest, frames, kernel=RBFKernel.THIN_PLATE,
            lam=1e-5, patches=patches,
        )
        fence(models[0].w_hi)

    seq_s, _, seq_spread = _timed_rounds(run_seq_fit, rounds=2)

    seq = pu.PUSeqDeformer(models, patches, RBFKernel.THIN_PLATE,
                           pu.PolyTerm.LINEAR)
    got = np.asarray(seq.displacement_frames(rest[:2048]))
    interp_err = float(np.abs(
        got - (frames[:, :2048] - rest[None, :2048])
    ).max())

    # whole-shot eval: ONE plan build amortized over all F frames
    q = (fibonacci_points(n_query) * 1.01).astype(np.float32)
    out = seq.displacement_frames(q)          # cold: builds the shared plan
    fence(out)
    t0 = _time.time()
    out = seq.displacement_frames(q)
    fence(out)
    # host-buffer call: dominated by the q h2d + (F, V, 3) d2h through
    # the tunnel (CLAUDE.md: ~8-17 MB/s), not compute
    per_frame_eval_ms = (_time.time() - t0) / n_frames * 1e3

    # device-resident whole-shot eval: explicit plan + uploaded queries,
    # fence keeps the (F, V, 3) result on device — the serving-loop cost
    tiles_frames_ms = None
    if jax.default_backend() == "tpu":
        from facedeform_tpu.ops import pallas_pu

        tplan = pallas_pu.plan_eval_tiles(patches, q)
        q_dev = jnp.asarray(q)
        plan_args = tplan.device_arrays()
        models_t = tuple(models)

        def run():
            return pallas_pu.evaluate_pu_tiles_frames(
                models_t, q_dev, *plan_args,
                RBFKernel.THIN_PLATE, pu.PolyTerm.LINEAR,
                tplan.num_points, tplan.tile_v,
            )

        o = run(); float(jnp.sum(o))

        def run_tiles():
            o = run()
            float(jnp.sum(o))

        best, _, tiles_spread = _timed_rounds(run_tiles, rounds=5)
        tiles_frames_ms = best / n_frames * 1e3
    else:
        tiles_spread = 0.0
    return {
        "config": "10: PU animated sequence (shared patch factorization)",
        "controls": n, "frames": n_frames,
        "warm_single_fit_s": single_s,
        "warm_seq_fit_s": seq_s,
        "spread": max(single_spread, seq_spread, tiles_spread),
        "seq_fit_vs_single": seq_s / max(single_s, 1e-9),
        "seq_fit_vs_per_frame_loop": seq_s / max(n_frames * single_s, 1e-9),
        "interp_err_at_controls": interp_err,
        "query_points": n_query,
        "per_frame_eval_ms_shared_plan": per_frame_eval_ms,
        "per_frame_eval_ms_device_resident": tiles_frames_ms,
        "pass": bool(
            interp_err < PARITY_BUDGET
            and np.isfinite(np.asarray(out)).all()
            # the sharing claim: an F-frame fit must cost well under F
            # independent fits (assembly+LU shared; refinement per
            # column).  Measured 0.47x at F=8 / 20k ctrl; gate at 0.7x.
            and seq_s < 0.7 * n_frames * single_s + 0.5
        ),
    }


def config11_normal_transport(rng, n_verts=1_000_000, n_ctrl=1000):
    """Round-3 extension: deformed-normal transport through the analytic
    displacement Jacobian (ops/jacobian.py) — the reference leaves
    rest-pose normals on the deformed surface (SOP_FaceDeform.cpp:438).
    Correctness gate: a rigidly rotated rig must rotate the normals
    (F = R exactly, via the LINEAR tail).  Perf: warm per-frame
    deformed_normals wall at the 1M x 1k production shape."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from facedeform_tpu.config import (
        DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType,
    )
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    if jax.default_backend() != "tpu":
        n_verts, n_ctrl = 10000, 100  # CPU smoke sizing
    ang = 0.35
    c, s = np.cos(ang), np.sin(ang)
    r_mat = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    rest = fibonacci_points(n_ctrl)
    d = Deformer.fit(
        rest, rest @ r_mat.T,
        DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN,
                     solver="direct", term=PolyTerm.LINEAR),
        DeformParams(radius=1.0, lam=0.01),
    )
    res = max(int(np.sqrt(max(n_verts - 2, 4))), 2)
    mesh = uv_sphere(res, res)
    n_verts = mesh.num_points
    pts = jnp.asarray(mesh.points)
    normals = mesh.points / np.linalg.norm(
        mesh.points, axis=1, keepdims=True
    ).astype(np.float32)
    w = jnp.ones(n_verts, jnp.float32)
    n_dev = jnp.asarray(normals)

    out = d.deformed_normals(pts, n_dev, w)   # compile + warm
    _sync(out)

    def run_normals():
        nonlocal out
        out = d.deformed_normals(pts, n_dev, w)
        _sync(out)

    best, _, n_spread = _timed_rounds(run_normals, rounds=3)
    got = np.asarray(out)
    err = float(np.abs(got - normals @ r_mat.T).max())
    unit_err = float(np.abs(np.linalg.norm(got, axis=1) - 1.0).max())

    # Whole-shot transport: frames packed into one MXU dot per (block,
    # tile) — d2/phi' amortize over the shot (ops/pallas_jacobian.py).
    from facedeform_tpu.ops.fit import RBFModel
    from facedeform_tpu.parallel import batched

    n_frames = 8
    mf = RBFModel(
        ctrl=d.model.ctrl,
        w_rbf=jnp.stack(
            [d.model.w_rbf * (1.0 + 0.1 * f) for f in range(n_frames)]
        ),
        w_poly=jnp.stack(
            [d.model.w_poly * (1.0 + 0.1 * f) for f in range(n_frames)]
        ),
        eps=d.model.eps,
    )
    run_seq = lambda: batched.transport_frames(  # noqa: E731
        mf, pts, (n_dev,), w, d.cfg, ("normal",)
    )[0]
    outs = run_seq()
    _sync(outs)  # compile + warm

    def run_seq_timed():
        nonlocal outs
        outs = run_seq()
        _sync(outs)

    best_seq, _, seq_spread = _timed_rounds(run_seq_timed, rounds=3)
    seq0_err = float(np.abs(np.asarray(outs[0]) - got).max())

    # Morph/PSD-composed transport (node.cook's f_map path, round-4
    # feature measured here for the first time — round-4 verdict weak
    # #4): the realized map is m(x) = x + d(x) + gamma (P(x) - x) with d
    # DISCRETE (blend reconstruction + PSD corrections), so F composes as
    # I + grad(d) + gamma (F_P - I) with grad(d) one 1-ring least-squares
    # fit (ops/jacobian.mesh_field_gradient: a (V, Dmax) neighbor gather
    # + batched 3x3 solves).  Measured cost at 1M x 1k on v5e rides in
    # BENCH_DETAIL so the "transport is ms-scale" claim is a number.
    from facedeform_tpu.geometry.topology import padded_neighbors, unique_edges
    from facedeform_tpu.ops.jacobian import (
        TRANSPORT_MAX_DEGREE, apply_field_gradient, field_gradient_plan,
    )

    # degree-capped: uncapped, the uv-sphere poles (degree ~ n_verts/1000)
    # pad the (V, Dmax, 3) gather temps to ~12 GB at 1M — HBM OOM, measured
    nbr = jnp.asarray(
        padded_neighbors(n_verts, unique_edges(mesh.faces),
                         max_degree=TRANSPORT_MAX_DEGREE)[0]
    )
    # synthetic smooth discrete layer standing in for the blend + PSD
    # reconstruction (content is irrelevant to the timing)
    d_field = jnp.asarray(
        0.02 * np.sin(3.0 * mesh.points[:, [1, 2, 0]]), jnp.float32
    )
    gamma = jnp.float32(0.25)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    # the geometry half is cached per rest mesh by node.cook
    # (_transport_grad_plan); per-cook cost is the apply + transport
    grad_coeff = field_gradient_plan(pts, nbr)
    _sync(grad_coeff)

    def run_plan():
        _sync(field_gradient_plan(pts, nbr))

    best_plan, _, _ = _timed_rounds(run_plan, rounds=3)

    def run_composed():
        g_blend = apply_field_gradient(d_field, nbr, grad_coeff)

        def f_map(f):
            return eye3[None] + g_blend + gamma * (f - eye3[None])

        return d.transform_attrs(
            pts, {"N": n_dev}, w, kinds={"N": "normal"}, f_map=f_map
        )["N"]

    _sync(run_composed())  # compile + warm

    def run_composed_timed():
        _sync(run_composed())

    best_comp, _, comp_spread = _timed_rounds(run_composed_timed, rounds=3)

    # gradient-apply split so the gather cost is attributable
    _sync(apply_field_gradient(d_field, nbr, grad_coeff))

    def run_grad():
        _sync(apply_field_gradient(d_field, nbr, grad_coeff))

    best_grad, _, _ = _timed_rounds(run_grad, rounds=3)

    # correctness anchor: an affine discrete layer d(x) = A x + b over
    # gamma = 0 must transport normals by cof(I + A) (the 1-ring LS
    # gradient is exact for affine fields regardless of ring anisotropy
    # since the 3e-7 relative ridge sits below the pole cells' smallest
    # tangential Gram eigenvalue).  The field is built HOST-side in f64:
    # a device pts @ A matmul runs on the MXU in bf16 (~8e-3 relative),
    # which swamps the ~2e-5 azimuthal edge differences at the poles and
    # read as a bogus 0.026 transport error (measured)
    a_mat = jnp.asarray(
        [[0.02, 0.015, 0.0], [-0.01, -0.03, 0.005], [0.0, 0.02, 0.01]],
        jnp.float32,
    )
    d_aff = jnp.asarray(
        mesh.points.astype(np.float64) @ np.asarray(a_mat, np.float64).T
        + [0.01, -0.02, 0.005],
        jnp.float32,
    )
    g_aff = apply_field_gradient(d_aff, nbr, grad_coeff)

    def f_map_aff(f):
        return eye3[None] + g_aff + 0.0 * (f - eye3[None])

    got_aff = np.asarray(d.transform_attrs(
        pts, {"N": n_dev}, w, kinds={"N": "normal"}, f_map=f_map_aff
    )["N"])
    from facedeform_tpu.ops.jacobian import transform_normals

    want_aff = np.asarray(transform_normals(
        n_dev, jnp.broadcast_to(eye3 + a_mat, (n_verts, 3, 3))
    ))
    comp_err = float(np.abs(got_aff - want_aff).max())

    return {
        "config": "11: deformed-normal transport (analytic Jacobian)",
        "verts": n_verts, "ctrl": n_ctrl,
        "rotation_normal_err": err,
        "unit_norm_err": unit_err,
        "warm_normals_ms": best * 1e3,
        "seq_frames": n_frames,
        "seq_transport_ms_per_frame": best_seq * 1e3 / n_frames,
        "seq_frame0_vs_single_err": seq0_err,
        "morph_composed_transport_ms": best_comp * 1e3,
        "morph_field_gradient_ms": best_grad * 1e3,
        "morph_gradient_plan_ms": best_plan * 1e3,
        "morph_composed_affine_err": comp_err,
        "spread": max(n_spread, seq_spread, comp_spread),
        "pass": bool(
            err < 1e-2 and unit_err < 1e-5 and seq0_err < 1e-5
            and comp_err < 1e-3
        ),
    }


def config12_interactive_drag(rng, n_ctrl=4096, drags=8):
    """Interactive marker-drag re-solve: FitPlan.refit vs full Deformer.fit.

    The system matrix depends only on the rest rig; a drag changes the RHS
    alone, so the cached factorization turns the per-drag cost from the
    O(n^3) LU into O(n^2) solves + refinement (deformer.FitPlan).  Uses the
    TPS growing kernel at config 7's size — the most expensive dense fit
    (df assembly + GMRES-IR refinement) and the one an artist sculpting a
    dense scan rig actually pays.
    """
    import time as _time

    import jax.numpy as jnp

    from facedeform_tpu import (
        DeformConfig, DeformParams, Deformer, RBFKernel, RBFModelType,
    )
    from facedeform_tpu.deformer import FitPlan
    from facedeform_tpu.geometry.primitives import fibonacci_points

    rest = fibonacci_points(n_ctrl)
    cfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE)
    params = DeformParams(radius=1.0, lam=0.01)

    def pose(i):
        r = np.random.default_rng(100 + i)
        return (rest + 0.05 * r.standard_normal((n_ctrl, 3))).astype(np.float32)

    # Warm both programs.
    d0, plan = Deformer.fit_with_plan(rest, pose(0), cfg, params)
    _sync(d0.model.w_rbf)
    _sync(plan.refit(pose(1)).model.w_rbf)
    _sync(Deformer.fit(rest, pose(1), cfg, params).model.w_rbf)

    fit_times = []
    for i in range(3):
        p = jnp.asarray(pose(2 + i))
        t0 = _time.time()
        _sync(Deformer.fit(rest, p, cfg, params).model.w_rbf)
        fit_times.append(_time.time() - t0)
    best_fit = min(fit_times)

    refit_times = []
    last = None
    for i in range(drags):
        p = jnp.asarray(pose(2 + i))
        t0 = _time.time()
        last = plan.refit(p)
        _sync(last.model.w_rbf)
        refit_times.append(_time.time() - t0)
    best_refit = min(refit_times)
    spread = max(
        (max(fit_times) - best_fit) / best_fit,
        (max(refit_times) - best_refit) / best_refit,
    )

    # Refit must reproduce the from-scratch fit of the same pose exactly.
    ref = Deformer.fit(rest, pose(2 + drags - 1), cfg, params)
    werr = float(
        jnp.max(jnp.abs(last.model.w_rbf - ref.model.w_rbf))
        / jnp.maximum(jnp.max(jnp.abs(ref.model.w_rbf)), 1e-30)
    )
    return {
        "config": "12: interactive drag re-solve (FitPlan)",
        "controls": n_ctrl,
        "full_fit_ms": best_fit * 1e3,
        "refit_ms": best_refit * 1e3,
        "refit_ms_median": float(np.median(refit_times)) * 1e3,
        "spread": spread,
        "speedup": best_fit / best_refit,
        "refit_vs_fit_weight_relerr": werr,
        "pass": bool(werr < 1e-6 and best_refit < best_fit),
    }


def config13_skinning(rng, n_verts=50_000, n_bones=16, n_frames=4):
    """Skinning decomposition (LBS engine export): fit + engine-side eval.

    A smooth twist sweep decomposes into bones + capped weights
    (ops/skinning.fit_skinning, CLI bake-skin); records the warm
    decomposition wall time, reconstruction quality vs the 1%-of-bbox
    visually-lossless rule, and the lbs_apply per-pose cost a consuming
    engine would pay.  No reference counterpart (the plugin stops at
    deformed geometry) — the target is the documented PERFORMANCE.md
    numbers staying true on the end-state code.
    """
    import time as _time

    from facedeform_tpu.ops import skinning

    pts = rng.standard_normal((n_verts, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    frames = []
    for t in np.linspace(0.3, 1.0, n_frames):
        ang = t * 0.8 * (pts[:, 1] + 1.0)
        ca, sa = np.cos(ang), np.sin(ang)
        frames.append(np.stack(
            [ca * pts[:, 0] - sa * pts[:, 2], pts[:, 1],
             sa * pts[:, 0] + ca * pts[:, 2]], -1,
        ))
    frames = np.stack(frames).astype(np.float32)

    # first fit pays the remote compile; measure the warm refit
    _m, _ = skinning.fit_skinning(
        pts, frames, n_bones=n_bones, max_influences=4, seed=0
    )
    m = rep = None

    def run_fit():
        nonlocal m, rep
        m, rep = skinning.fit_skinning(
            pts, frames, n_bones=n_bones, max_influences=4, seed=1
        )

    fit_s, _, spread = _timed_rounds(run_fit, rounds=2)

    q = skinning.lbs_apply(
        m.weights, m.rest, m.rotations[0], m.translations[0]
    )
    _sync(q)
    t0 = _time.time()
    for _ in range(10):
        q = skinning.lbs_apply(
            m.weights, m.rest, m.rotations[0], m.translations[0]
        )
    _sync(q)
    apply_ms = (_time.time() - t0) / 10 * 1e3
    w = np.asarray(m.weights)
    cap_ok = bool(((w > 1e-6).sum(-1) <= 4).all())
    return {
        "config": "13: skinning decomposition (LBS bake)",
        "verts": n_verts,
        "bones": n_bones,
        "frames": n_frames,
        "warm_fit_s": fit_s,
        "spread": spread,
        "relative_rmse": rep.relative_rmse,
        "lbs_apply_ms": apply_ms,
        "influence_cap_ok": cap_ok,
        "pass": bool(rep.relative_rmse < 0.01 and cap_ok),
    }


def config14_blendshape_bake(rng, n_verts=500_000, n_frames=16, rank=8):
    """PCA blendshape bake (compressed engine export): fit + quality.

    A rank-8 synthetic shot at 500k vertices must bake back to rank 8
    near-exactly (Eckart-Young: the bake is optimal, so a full-rank
    recovery IS correctness), with the Gram matmul + basis matmul riding
    the MXU (ops/blendshapes.fit_blendshapes, CLI deform-seq
    --gltf-rank).  Frames are synthesized device-side — at the tunnel's
    ~8-17 MB/s a (16, 500k, 3) host upload would swamp the measurement.
    No reference counterpart (the plugin consumes blendshapes,
    src/dbse.cpp:9-35, but never produces them).
    """
    import time as _time

    import jax.numpy as jnp

    from facedeform_tpu.ops import blendshapes

    k_true = rank
    rest = jnp.asarray(rng.standard_normal((n_verts, 3)), jnp.float32)
    basis = jnp.asarray(
        rng.standard_normal((k_true, n_verts * 3)), jnp.float32
    )
    curves = jnp.asarray(
        rng.standard_normal((n_frames, k_true)), jnp.float32
    )
    frames = (
        rest[None]
        + jnp.dot(curves, basis).reshape(n_frames, n_verts, 3) * 0.01
    )
    _sync(frames)

    # first bake pays the remote compile; measure the warm re-bake
    blendshapes.fit_blendshapes(rest, frames, rank=rank)
    model = rep = None

    def run_bake():
        nonlocal model, rep
        model, rep = blendshapes.fit_blendshapes(rest, frames, rank=rank)

    fit_s, _, spread = _timed_rounds(run_bake, rounds=2)

    # Sharded route (parallel/blendshapes_sharded): on the single-chip
    # bench box the mesh is 1-device, so this measures the shard_map
    # wrapping overhead and proves route parity on-chip; multi-chip hosts
    # report their real sharded timing through the same field.
    import jax as _jax

    from facedeform_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()
    blendshapes.fit_blendshapes(rest, frames, rank=rank, mesh=mesh)
    model_s = rep_s = None

    def run_sharded():
        nonlocal model_s, rep_s
        model_s, rep_s = blendshapes.fit_blendshapes(
            rest, frames, rank=rank, mesh=mesh
        )

    sharded_s, _, sh_spread = _timed_rounds(run_sharded, rounds=2)
    spread = max(spread, sh_spread)
    shard_err = float(
        jnp.max(jnp.abs(model_s.targets - model.targets))
    )

    scale = float(jnp.max(jnp.abs(frames - rest[None])))
    return {
        "config": "14: PCA blendshape bake (compressed morph export)",
        "verts": n_verts,
        "frames": n_frames,
        "rank": rank,
        "targets": model.n_targets,
        "warm_bake_s": fit_s,
        "warm_sharded_bake_s": sharded_s,
        "spread": spread,
        "sharded_devices": len(_jax.devices()),
        "sharded_target_err": shard_err,
        "rmse": rep.rmse,
        "rel_max_err": rep.max_err / scale,
        "energy": rep.energy,
        "compression_vs_lossless": n_frames / float(model.n_targets),
        "pass": bool(
            rep.max_err / scale < 1e-4 and rep.energy > 0.999
            and shard_err / max(scale, 1e-30) < 1e-4
        ),
    }


def config15_reduced_regression(rng, n=20_000, k=1000, n_frames=8):
    """Reduced-basis regression over a tracked shot: one factorization.

    A 20k-marker tracker shot reduced to 1k centers: all N markers stay
    as observations (decimate.fit_reduced_frames, CLI `deform-seq
    --reduce-mode regress`).  The design matrix depends only on the rest
    rig, so the F frames are 3F RHS columns of ONE shared normal-system
    factorization — measured against F independent single-pose
    regressions over the same centers (which re-assemble the same Gram
    per frame).  Parity between the two routes is exact math; the pass
    criterion demands it plus a real speedup.  No reference counterpart
    (ALGLIB refits whatever rig it is given per cook,
    src/SOP_FaceDeform.cpp:330-368).

    Parity is judged on the DISPLACEMENT FIELD, not raw weights: the
    20k->1k regression Gram squares the kernel system's condition, so
    the two routes' f32 factorizations (3F-blocked shared vs per-frame)
    legitimately differ along near-null-space weight directions that
    barely move the field — measured on chip: weight relerr up to
    1.4e-3 while the field agrees to 1.6e-5..6.7e-5 relative.  The
    field is the product; weights stay reported as a diagnostic.
    """
    import time as _time

    from facedeform_tpu import DeformConfig, DeformParams
    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.ops import decimate

    rest = fibonacci_points(n)
    noise = 0.005
    frames = np.stack([
        rest + 0.1 * np.sin(rest[:, [1, 2, 0]] * (2.0 + 0.3 * f))
        + noise * rng.standard_normal((n, 3))
        for f in range(n_frames)
    ]).astype(np.float32)
    cfg, params = DeformConfig(), DeformParams()

    # selection once (shared by both routes), then warm both programs
    idx = decimate._resolve_centers(
        np.asarray(rest, np.float32), k, None, None
    )
    m_all, rep, info = decimate.fit_reduced_frames(
        rest, frames, k, cfg, params, idx=idx
    )
    _sync(m_all.w_rbf)
    decimate.fit_reduced(rest, frames[0], k, cfg, params, idx=idx)

    def run_shared():
        nonlocal m_all, rep, info
        m_all, rep, info = decimate.fit_reduced_frames(
            rest, frames, k, cfg, params, idx=idx
        )
        _sync(m_all.w_rbf)

    shared_s, _, spread = _timed_rounds(run_shared, rounds=2)

    per = None

    def run_perframe():
        nonlocal per
        per = [
            decimate.fit_reduced(rest, frames[f], k, cfg, params, idx=idx)[0]
            for f in range(n_frames)
        ]
        _sync(per[-1].w_rbf)

    perframe_s, _, pf_spread = _timed_rounds(run_perframe, rounds=2)
    spread = max(spread, pf_spread)

    import jax.numpy as jnp

    from facedeform_tpu.ops import fit as _fit_mod
    from facedeform_tpu.ops.evaluate import evaluate as _evaluate

    werr = max(
        float(jnp.max(jnp.abs(m_all.w_rbf[f, 0] - per[f].w_rbf[0]))
              / jnp.maximum(jnp.max(jnp.abs(per[f].w_rbf)), 1e-30))
        for f in range(n_frames)
    )
    kern = _fit_mod.effective_kernel(cfg)
    q = jnp.asarray(fibonacci_points(500) * 1.01)
    ferr = 0.0
    for f in range(n_frames):
        m_f = per[f]._replace(
            w_rbf=m_all.w_rbf[f], w_poly=m_all.w_poly[f]
        )
        d_sh = np.asarray(_evaluate(m_f, q, kern, cfg.term))
        d_pf = np.asarray(_evaluate(per[f], q, kern, cfg.term))
        ferr = max(ferr, float(
            np.abs(d_sh - d_pf).max() / max(np.abs(d_pf).max(), 1e-30)
        ))
    return {
        "config": "15: reduced-basis regression shot (shared factorization)",
        "markers": n,
        "centers": k,
        "frames": n_frames,
        "shared_fit_s": shared_s,
        "perframe_fit_s": perframe_s,
        "spread": spread,
        "speedup": perframe_s / shared_s,
        "field_parity_relerr": ferr,
        "weight_parity_relerr": werr,
        "worst_frame_fit_rms": float(info.fit_rms.max()),
        "noise_floor": noise,
        "pass": bool(
            ferr < 2e-4
            and perframe_s > shared_s
            and info.fit_rms.max() < 4.0 * noise
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", type=int, default=None, metavar="N",
                    choices=range(1, 16),
                    help="run a single config (1-15) for iteration")
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    results = []
    configs = (config1_gaussian_sphere, config2_kernel_zoo, config3_capture,
               config4_dbse, config5_animated, config6_large_n,
               config7_growing_kernel_precision, config8_cpd_preconditioned,
               config9_pu_any_n, config10_pu_sequence,
               config11_normal_transport, config12_interactive_drag,
               config13_skinning, config14_blendshape_bake,
               config15_reduced_regression)
    if args.only is not None:
        configs = (configs[args.only - 1],)
    for fn in configs:
        t0 = time.time()
        r = fn(rng)
        r["bench_wall_s"] = round(time.time() - t0, 2)
        # Contention guard: a spread past _SPREAD_FLAG means another
        # tenant touched the shared chip mid-config — rerun once and
        # keep the calmer run, recording that it happened.
        if r.get("spread", 0.0) > _SPREAD_FLAG:
            print(
                f"[RERUN] {r['config']}: spread "
                f"{r['spread'] * 100:.0f}% > {_SPREAD_FLAG * 100:.0f}% "
                "(shared-chip contention suspected)"
            )
            t0 = time.time()
            r2 = fn(rng)
            r2["bench_wall_s"] = round(time.time() - t0, 2)
            pick = r2 if r2.get("spread", 0.0) <= r.get("spread", 0.0) else r
            pick["rerun_spreads"] = [r.get("spread"), r2.get("spread")]
            r = pick
        results.append(r)
        status = "PASS" if r.get("pass") else "FAIL"
        print(f"[{status}] {r['config']}  ({r['bench_wall_s']}s)")
        for k, v in r.items():
            if k not in ("config", "pass", "bench_wall_s"):
                print(f"    {k}: {v}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                results, f, indent=2,
                default=lambda o: o.item() if hasattr(o, "item") else str(o),
            )
        print(f"wrote {args.out}")
    if not all(r.get("pass") for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
