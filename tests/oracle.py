"""Pure NumPy float64 oracle for parity testing.

Stands in for the C++/double semantics of the reference (SURVEY.md section 4:
golden/parity strategy).  Implements the *same* math as facedeform_tpu — the
explicit kernel-matrix RBF formulation — entirely in float64, so the TPU
f32(+compensated-refinement) path can be checked to the <=5e-5
max-displacement budget from BASELINE.md.

Deliberately simple and slow: np.linalg.solve, dense V x N kernel matrices.
"""

from __future__ import annotations

import numpy as np

from facedeform_tpu.config import DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType

_TINY = 1e-300


def apply_kernel(kernel: RBFKernel, d2: np.ndarray, eps) -> np.ndarray:
    kernel = RBFKernel(kernel)
    d2 = np.maximum(d2, 0.0)
    s = d2 / (np.asarray(eps, np.float64) ** 2)
    if kernel == RBFKernel.GAUSSIAN:
        return np.exp(-s)
    if kernel == RBFKernel.THIN_PLATE:
        return np.where(s > _TINY, 0.5 * s * np.log(np.maximum(s, _TINY)), 0.0)
    if kernel == RBFKernel.MULTIQUADRIC:
        return np.sqrt(1.0 + s)
    if kernel == RBFKernel.INVERSE_MULTIQUADRIC:
        return 1.0 / np.sqrt(1.0 + s)
    if kernel == RBFKernel.LINEAR:
        return np.sqrt(s)
    if kernel == RBFKernel.CUBIC:
        return s * np.sqrt(s)
    if kernel == RBFKernel.WENDLAND_C2:
        t = np.sqrt(s)
        base = np.maximum(1.0 - t, 0.0)
        return base ** 4 * (4.0 * t + 1.0)
    raise ValueError(kernel)


def pairwise_sqdist(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    diff = x[:, None, :] - y[None, :, :]
    return np.sum(diff * diff, axis=-1)


def poly_basis(pts: np.ndarray, term: PolyTerm) -> np.ndarray:
    term = PolyTerm(term)
    v = pts.shape[0]
    if term == PolyTerm.LINEAR:
        return np.concatenate([np.ones((v, 1)), pts], axis=1)
    if term == PolyTerm.CONSTANT:
        return np.ones((v, 1))
    return np.zeros((v, 0))


def qnn_radii(ctrl: np.ndarray, q: float, z: float) -> np.ndarray:
    if ctrl.shape[0] == 1:
        nn = np.ones(1)
        return np.minimum(q * nn, z * np.mean(nn))
    d2 = pairwise_sqdist(ctrl, ctrl)
    np.fill_diagonal(d2, np.inf)
    nn = np.sqrt(np.min(d2, axis=1))
    scale = max(np.max(nn), 1e-6)
    nn = np.maximum(nn, 1e-4 * scale)
    eps = q * nn
    return np.minimum(eps, z * np.mean(nn))


def fit(rest_ctrl, deformed_ctrl, cfg: DeformConfig, params: DeformParams = DeformParams(),
        confidence=None):
    """Returns (ctrl, w_rbf (L,N,3), w_poly (m,3), eps (L,N))."""
    q = max(float(params.qcoef), 0.1)
    z = max(float(params.zcoef), 0.1)
    radius = max(float(params.radius), 0.01)
    lam = max(float(params.lam), 0.01)
    ctrl = np.asarray(rest_ctrl, np.float64)
    delta = np.asarray(deformed_ctrl, np.float64) - ctrl
    n = ctrl.shape[0]

    if cfg.model == RBFModelType.QNN:
        eps0, lam0, kernel = qnn_radii(ctrl, q, z), 0.0, RBFKernel.GAUSSIAN
    elif cfg.model == RBFModelType.MULTILAYER:
        eps0, lam0, kernel = np.full(n, radius), lam, RBFKernel.GAUSSIAN
    else:
        eps0, lam0, kernel = np.full(n, radius), lam, cfg.kernel
    if confidence is not None:
        # weighted ridge lam_i = lam / c_i, c clipped to [1e-3, 1]
        # (ops/fit.confidence_clipped, the library-wide contract); ridge
        # families only — the API rejects QNN before this point
        c = np.clip(np.asarray(confidence, np.float64).reshape(-1), 1e-3, 1.0)
        lam0 = lam0 / c

    n_layers = cfg.n_layers
    w_layers, eps_layers = [], []
    w_poly = np.zeros((cfg.n_poly, 3))
    target = delta.copy()
    d2 = pairwise_sqdist(ctrl, ctrl)
    for layer in range(n_layers):
        eps_l = eps0 * 0.5 ** layer
        # np.diag broadcasts both the scalar and per-marker ridge shapes
        phi = apply_kernel(kernel, d2, eps_l) + np.diag(
            np.broadcast_to(np.asarray(lam0, np.float64), (n,))
        )
        term = cfg.term if layer == 0 else PolyTerm.ZERO
        p = poly_basis(ctrl, term)
        m = p.shape[1]
        a = np.block([[phi, p], [p.T, -1e-8 * np.eye(m)]]) if m else phi
        b = np.concatenate([target, np.zeros((m, 3))]) if m else target
        x = np.linalg.solve(a, b)
        w_l = x[:n]
        w_layers.append(w_l)
        eps_layers.append(eps_l)
        if layer == 0 and m:
            w_poly = x[n:]
        if layer + 1 < n_layers:
            pred = apply_kernel(kernel, d2, eps_l) @ w_l
            if layer == 0 and cfg.n_poly:
                pred = pred + poly_basis(ctrl, cfg.term) @ w_poly
            target = target - pred
    return ctrl, np.stack(w_layers), w_poly, np.stack(eps_layers)


def evaluate(ctrl, w_rbf, w_poly, eps, points, kernel: RBFKernel, term: PolyTerm):
    points = np.asarray(points, np.float64)
    d2 = pairwise_sqdist(points, ctrl)
    disp = np.zeros((points.shape[0], 3))
    for l in range(w_rbf.shape[0]):
        disp += apply_kernel(kernel, d2, eps[l]) @ w_rbf[l]
    if w_poly.shape[0]:
        disp += poly_basis(points, term) @ w_poly
    return disp


def jacobian_fd(ctrl, w_rbf, w_poly, eps, points, kernel: RBFKernel,
                term: PolyTerm, h: float = 1e-5):
    """f64 central-difference Jacobian of the displacement field,
    (V, 3, 3) with J[v, a, b] = d disp_a / d x_b.

    Deliberately DERIVATIVE-FREE: an analytic oracle would share the
    phi'(s) derivation with the code under test; central differences on
    the f64 value oracle catch a wrong formula, not just a transcription
    slip.  Truncation is O(h^2) ~ 1e-10 at unit scale — far below the f32
    budgets it referees."""
    points = np.asarray(points, np.float64)
    jac = np.zeros((points.shape[0], 3, 3))
    for b in range(3):
        step = np.zeros(3)
        step[b] = h
        hi = evaluate(ctrl, w_rbf, w_poly, eps, points + step, kernel, term)
        lo = evaluate(ctrl, w_rbf, w_poly, eps, points - step, kernel, term)
        jac[:, :, b] = (hi - lo) / (2.0 * h)
    return jac


def project_to_tangents(u, v, n, disp):
    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-20)

    u, v, n = norm(np.asarray(u, np.float64)), norm(np.asarray(v, np.float64)), norm(np.asarray(n, np.float64))

    def dot_b(x):
        return (
            np.sum(x * u, -1, keepdims=True) * u
            + np.sum(x * v, -1, keepdims=True) * v
            + np.sum(x * n, -1, keepdims=True) * n
        )

    a1, a2 = norm(dot_b(u)), norm(dot_b(v))
    return a1 * np.sum(disp * a1, -1, keepdims=True) + a2 * np.sum(disp * a2, -1, keepdims=True)


def falloff_weight(dist2, radius, rate, strict_parity=False):
    dist2 = np.asarray(dist2, np.float64)
    r2 = float(radius) ** 2
    if not strict_parity:
        dist2 = np.maximum(dist2, 0.0)
    active = dist2 <= r2
    ratio = np.minimum(dist2 / r2, 1.0)
    base = (1.0 - ratio) if strict_parity else np.maximum(1.0 - ratio, 0.0)
    w = base ** float(rate)
    return np.where(active, w, 0.0), active


def deform(rest_ctrl, deformed_ctrl, points, cfg: DeformConfig,
           params: DeformParams = DeformParams(), dist2=None, frame=None,
           group_mask=None, confidence=None):
    """Full oracle pipeline mirroring Deformer.fit + Deformer.apply."""
    ctrl, w_rbf, w_poly, eps = fit(rest_ctrl, deformed_ctrl, cfg, params,
                                   confidence=confidence)
    from facedeform_tpu.ops.fit import effective_kernel

    kernel = effective_kernel(cfg)
    points = np.asarray(points, np.float64)
    disp = evaluate(ctrl, w_rbf, w_poly, eps, points, kernel, cfg.term)
    if cfg.tangent and frame is not None:
        disp = project_to_tangents(*frame, disp)
    if dist2 is None:
        dist2 = np.zeros(points.shape[0])
    radius = max(float(params.radius), 0.01)
    # falloffrate clamped >= 0 like DeformParams.clamped() (the reference UI
    # restricts the exponent to [0, 2], src/SOP_FaceDeform.cpp:96).
    rate = max(float(params.falloffrate), 0.0)
    w, active = falloff_weight(dist2, radius, rate, cfg.strict_parity)
    if group_mask is not None:
        active = np.logical_and(active, group_mask)
    w = np.where(active, w, 0.0)
    return points + disp * w[:, None], w


# ---------------------------------------------------------------- PU oracle
def pu_fit_patch(ctrl_k, rhs_k, center, kernel, term, eps, lam,
                 tail_reg=1e-8):
    """One patch's f64 saddle solve on centered coordinates — mirrors
    ops.pu._assemble_patch_df / lu_solve_refined_against_df semantics
    (including the quasi-definite -tail_reg tail)."""
    local = np.asarray(ctrl_k, np.float64) - np.asarray(center, np.float64)
    p = local.shape[0]
    phi = apply_kernel(kernel, pairwise_sqdist(local, local), eps)
    phi = phi + lam * np.eye(p)
    pb = poly_basis(local, term)
    m = pb.shape[1]
    a = np.block([
        [phi, pb],
        [pb.T, -tail_reg * np.eye(m)],
    ]) if m else phi
    b = np.concatenate([np.asarray(rhs_k, np.float64), np.zeros((m, 3))])
    x = np.linalg.solve(a, b)
    return x[:p], x[p:], local


def pu_deform(rest_ctrl, deformed_ctrl, points, patches, kernel, term,
              eps_arr, lam, margin=0.9999):
    """f64 partition-of-unity displacement field.

    `patches` supplies the combinatorial plan only (kd-cell membership,
    centers, radii — shared input with the implementation under test);
    every solve, kernel evaluation, Wendland blend weight and the
    coverage/fallback policy (points whose best patch distance exceeds
    margin * R fall back to the nearest-relative patch's local
    interpolant, ops.pu.coverage_and_fallback) are recomputed here in
    float64.
    """
    rest = np.asarray(rest_ctrl, np.float64)
    delta = np.asarray(deformed_ctrl, np.float64) - rest
    pts = np.asarray(points, np.float64)
    k_ = patches.centers.shape[0]
    centers = np.asarray(patches.centers, np.float64)
    radii = np.asarray(patches.radii, np.float64)
    eps_arr = np.asarray(eps_arr, np.float64)

    sols = []
    for k in range(k_):
        idx = patches.idx[k]
        idx = idx[idx >= 0]
        w, poly, _ = pu_fit_patch(
            rest[idx], delta[idx], centers[k], kernel, term,
            float(eps_arr[k]), lam,
        )
        sols.append((idx, w, poly))

    def eval_patch(k, x):
        idx, w, poly = sols[k]
        local_x = x - centers[k]
        d2 = np.sum((rest[idx] - x) ** 2, axis=-1)
        phi = apply_kernel(kernel, d2, float(eps_arr[k]))
        s = phi @ w
        pb = poly_basis(local_x[None], term)[0]
        if pb.size:
            s = s + pb @ poly
        return s

    out = np.zeros((pts.shape[0], 3))
    d_all = np.sqrt(
        np.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    )                                                   # (V, K)
    rel = d_all / radii[None, :]
    for i, x in enumerate(pts):
        covered = rel[i] <= margin
        if covered.any():
            t = np.minimum(rel[i][covered], 1.0)
            base = np.maximum(1.0 - t, 0.0)
            wk = base ** 4 * (4.0 * t + 1.0)            # Wendland C2
            num = np.zeros(3)
            for k, wv in zip(np.nonzero(covered)[0], wk):
                num = num + wv * eval_patch(int(k), x)
            out[i] = num / np.sum(wk)
        else:
            # nearest-RELATIVE patch among the 4 nearest centers (the
            # coverage_and_fallback pick policy, ops/pu.py)
            kq = min(4, k_)
            near = np.argsort(d_all[i])[:kq]
            out[i] = eval_patch(int(near[np.argmin(rel[i][near])]), x)
    return out
