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


# Relative residual above which a solve is declared failed.  The reference's
# binary terminationtype != 1 check maps onto this threshold.
SOLVE_RESIDUAL_RTOL = 1e-3


def check_solve(report, rtol: float = SOLVE_RESIDUAL_RTOL) -> None:
    """Host-side solver health check; raises SolveFailedError on blow-up."""
    import numpy as np

    import jax.numpy as jnp

    # One device->host pull for both scalars (each separate float() costs a
    # full round-trip on tunneled TPU runtimes).
    vals = np.asarray(jnp.stack([report.residual_norm, report.rhs_norm]))
    res, rhs = float(vals[0]), float(vals[1])
    if not np.isfinite(res) or (rhs > 0 and res > rtol * max(rhs, 1e-30)):
        raise SolveFailedError(
            f"RBF solve failed: residual {res:.3e} vs rhs {rhs:.3e} "
            f"(rtol {rtol:g}) — singular or ill-conditioned system"
        )
