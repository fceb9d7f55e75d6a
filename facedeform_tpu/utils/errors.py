"""Structured error / warning types.

The reference reports failures through Houdini node errors and warnings
(addError/addWarning call sites: src/SOP_FaceDeform.cpp:231-234, 201-204,
295-297, 314-321, 328, 338, 366, 397-398, 451-452).  The rebuild raises
typed exceptions from host-side checks and collects non-fatal conditions as
warnings on the node object (see node.py).
"""

from __future__ import annotations


class FaceDeformError(Exception):
    """Base class for all framework errors."""


class ShapeMismatchError(FaceDeformError):
    """Rest/deform rig point counts differ ("Rest and deform geometry should
    match.", src/SOP_FaceDeform.cpp:231-234)."""


class SolveFailedError(FaceDeformError):
    """RBF system solve did not converge ("Can't solve the problem.",
    src/SOP_FaceDeform.cpp:363-368).  TPUs don't throw from device code, so
    the residual from the SolveReport is checked host-side."""


class CaptureError(FaceDeformError):
    """Capture initialization/flood-fill failure ("Can't capture geometry
    with a rig!", src/SOP_FaceDeform.cpp:314-321)."""


# Normwise backward error ||r|| / (||A|| ||X|| + ||B||) above which a solve
# is declared failed.  The reference's binary terminationtype != 1 check
# (src/SOP_FaceDeform.cpp:363-368) maps onto this threshold: a healthy
# f32 + compensated-refinement solve lands near 1e-9 (measured across the
# kernel zoo at N = 40..1000), a singular/degenerate rig lands at NaN or
# >> 1e-6, so 1e-6 separates the populations by ~3 orders each way.
# Note ||B|| alone is the wrong denominator: smooth/global kernels carry
# ||X|| >> ||B||, where f32 solution *storage* already floors the residual
# at ~u ||A|| ||X|| — a correct solve would misreport as failed.
SOLVE_BACKWARD_RTOL = 1e-6

# The matrix-free Krylov solves of the CONDITIONALLY-positive-definite
# kernels (TPS/MQ/linear/cubic) sit at the f32 Krylov noise floor
# eps * kappa_eff, not at the refined-LU floor: measured healthy backward
# errors are ~5e-6 at N=500 growing to ~1e-4 at N=6k (|.|-block-Jacobi
# PMINRES, see ops/krylov.py).  A degenerate rig still lands at NaN or
# >> 1e-2, so 1e-3 keeps the populations separated on that path.
KRYLOV_CPD_BACKWARD_RTOL = 1e-3

# Legacy rhs-relative threshold, used only for reports lacking scale_norm.
SOLVE_RESIDUAL_RTOL = 1e-3


def check_solve(report, rtol: float = SOLVE_BACKWARD_RTOL) -> None:
    """Host-side solver health check; raises SolveFailedError on blow-up.

    Checks the normwise backward error plus each RHS column's backward
    error (a single degenerate displacement axis must not hide inside the
    Frobenius aggregate)."""
    import numpy as np

    import jax.numpy as jnp

    if getattr(report, "scale_norm", None) is None:
        vals = np.asarray(jnp.stack([report.residual_norm, report.rhs_norm]))
        res, rhs = float(vals[0]), float(vals[1])
        if not np.isfinite(res) or (
            rhs > 0 and res > SOLVE_RESIDUAL_RTOL * max(rhs, 1e-30)
        ):
            raise SolveFailedError(
                f"RBF solve failed: residual {res:.3e} vs rhs {rhs:.3e} "
                f"(rtol {SOLVE_RESIDUAL_RTOL:g}) — singular or "
                "ill-conditioned system"
            )
        return

    # One device->host pull for all scalars (each separate float() costs a
    # full round-trip on tunneled TPU runtimes).
    col = report.col_backward
    k = 0 if col is None else int(col.shape[0])
    parts = [
        jnp.ravel(report.residual_norm), jnp.ravel(report.rhs_norm),
        jnp.ravel(report.scale_norm),
    ]
    if k:
        parts.append(jnp.ravel(col))
    vals = np.asarray(jnp.concatenate([jnp.asarray(p, jnp.float32) for p in parts]))
    res, rhs, scale = float(vals[0]), float(vals[1]), float(vals[2])
    col_worst = float(vals[3:3 + k].max()) if k else 0.0
    backward = res / max(scale, 1e-30)
    if (
        not np.isfinite(res)
        or not np.isfinite(col_worst)
        or backward > rtol
        or col_worst > rtol
    ):
        cond = getattr(report, "cond_est", None)
        cond_txt = ""
        if cond is not None:
            c = float(np.asarray(cond))
            cond_txt = f", cond estimate {c:.2e}"
        raise SolveFailedError(
            f"RBF solve failed: backward error {backward:.3e} "
            f"(worst column {col_worst:.3e}, rtol {rtol:g}; residual "
            f"{res:.3e}, rhs {rhs:.3e}{cond_txt}) — singular or degenerate "
            "system (duplicate/coincident markers?)"
        )


def check_frames(resid_norms, rest_ctrl, frames) -> None:
    """Per-frame health check for batched RBF sequence fits.

    batched.fit_frames returns only per-frame residual NORMS (the vmapped
    SolveReports' scale info is reduced away), so this mirrors
    check_solve's no-scale branch frame-wise: the saddle RHS is the
    displacement columns over zero tail rows, so ||rhs_f|| is
    ||deformed_f - rest||_F.  Raises SolveFailedError naming the bad
    frames — without it a degenerate rig ships a NaN model stack with
    ok=true and the first symptom is NaN positions out of apply_seq
    (round-5 review finding: the serve fit_seq dense route and the CLI
    dense sequence path both skipped any health check)."""
    import numpy as np

    r = np.asarray(resid_norms, np.float64).reshape(-1)
    rest = np.asarray(rest_ctrl, np.float64)
    rhs = np.linalg.norm(
        np.asarray(frames, np.float64) - rest[None], axis=(1, 2)
    )
    bad = ~np.isfinite(r) | (
        (rhs > 0) & (r > SOLVE_RESIDUAL_RTOL * np.maximum(rhs, 1e-30))
    )
    if bad.any():
        idx = np.nonzero(bad)[0]
        shown = ", ".join(str(int(i)) for i in idx[:8])
        more = f" (+{len(idx) - 8} more)" if len(idx) > 8 else ""
        worst = int(idx[np.argmax(np.where(np.isfinite(r[idx]),
                                           r[idx], np.inf))])
        raise SolveFailedError(
            f"sequence RBF solve failed on frame(s) {shown}{more}: "
            f"frame {worst} residual {r[worst]:.3e} vs rhs "
            f"{rhs[worst]:.3e} (rtol {SOLVE_RESIDUAL_RTOL:g}) — singular "
            "or ill-conditioned system"
        )


def frames_solve_ok(report, rtol: float = SOLVE_BACKWARD_RTOL):
    """Per-frame health mask for a vmapped SolveReport stack.

    The animated-sequence batch path solves all frames' DBSE weights in one
    vmapped dispatch (ops.dbse.weights_lstsq_batched), so the report leaves
    carry a leading frame axis.  Unlike check_solve this does not raise: a
    shot skips the morph pass only on the frames whose weight solve failed,
    matching the per-frame node behavior ("Can't compute weights ..."
    warning + ignore, the reference's terminationtype contract at
    src/SOP_FaceDeform.cpp:363-368 applied per cook).

    Returns a boolean (F,) numpy mask.  One device->host pull for the
    whole stack (each separate float() costs a full round-trip on tunneled
    TPU runtimes).
    """
    import jax.numpy as jnp
    import numpy as np

    f = int(report.residual_norm.shape[0])
    if getattr(report, "scale_norm", None) is None:
        # same criterion as check_solve's legacy branch: a zero-RHS frame
        # passes on any finite residual (rhs > 0 gates the ratio test)
        vals = np.asarray(jnp.concatenate([
            jnp.ravel(report.residual_norm), jnp.ravel(report.rhs_norm),
        ]).astype(jnp.float32))
        res, rhs = vals[:f], vals[f:]
        return np.isfinite(res) & ~(
            (rhs > 0) & (res > SOLVE_RESIDUAL_RTOL * np.maximum(rhs, 1e-30))
        )

    col = report.col_backward
    k = 0 if col is None else int(col.shape[-1])
    parts = [jnp.ravel(report.residual_norm), jnp.ravel(report.scale_norm)]
    if k:
        parts.append(jnp.ravel(col))
    vals = np.asarray(jnp.concatenate(
        [jnp.asarray(p, jnp.float32) for p in parts]
    ))
    res, scale = vals[:f], vals[f:2 * f]
    backward = res / np.maximum(scale, 1e-30)
    ok = np.isfinite(res) & (backward <= rtol)
    if k:
        colv = vals[2 * f:].reshape(f, k)
        with np.errstate(invalid="ignore"):
            ok &= np.isfinite(colv).all(axis=1) & (colv.max(axis=1) <= rtol)
    return ok
