"""On-device linear solve: f32 LU + f64-compensated iterative refinement.

The reference relies on ALGLIB's internal double-precision solvers
(rbfbuildmodel, src/SOP_FaceDeform.cpp:363).  TPUs natively compute in f32,
so to hit the <=5e-5 displacement-parity budget (BASELINE.md) on
ill-conditioned RBF systems the rebuild factorizes once in f32 and then runs
iterative refinement where the residual  r = B - A @ X  is evaluated in
emulated double precision ("double-float" arithmetic):

  * operands are Dekker-split into 12-bit-mantissa high parts whose pairwise
    products are *exact* in f32;
  * those exact products are reduced with a double-float (TwoSum-based)
    pairwise tree, carrying a compensation term at every level, so the
    dominant partial sum is accurate to ~2^-45 relative instead of f32's
    2^-24;
  * the three low-order cross products are small enough (<= 2^-12 relative)
    that plain f32 matmuls suffice for them.

Each refinement sweep multiplies the error by O(cond * u_f32); 2 sweeps are
ample for N ~ 1e3 RBF systems.

TPU precision note: every matmul here runs under Precision.HIGHEST (or an
explicit default_matmul_precision scope for the LAPACK-style factorizations),
because the MXU's default f32 path computes in bf16 — a 4e-3 relative error
that would both destabilize the LU preconditioner and defeat refinement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SolveReport(NamedTuple):
    """Structured solver outcome (stand-in for ALGLIB's rbfreport whose
    termination type the reference surfaces as a node message,
    src/SOP_FaceDeform.cpp:363-373).

    The health criterion is the normwise *backward error*
    residual / (||A|| ||X|| + ||B||): RBF weight vectors legitimately carry
    ||X|| >> ||B|| on smooth/global kernels, where an f32-stored solution
    cannot push the residual below ~u ||A|| ||X|| no matter how well it
    solves the system — comparing against ||B|| alone misreports those
    solves as failures (and lets genuinely singular systems hide behind a
    large ||B||)."""

    residual_norm: jnp.ndarray  # ||B - A X||_F after refinement (compensated)
    rhs_norm: jnp.ndarray       # ||B||_F
    # ||A||_F ||X||_F + ||B||_F — backward-error denominator.
    scale_norm: Optional[jnp.ndarray] = None
    # max |diag U| / min |diag U| from the LU factors: a cheap growth-factor
    # condition indicator, surfaced as a node message (observability only;
    # the quasi-definite tail regularization makes legitimate coplanar rigs
    # report large values, so it is not a failure criterion).
    cond_est: Optional[jnp.ndarray] = None
    # per-column backward errors ||r_c|| / (||A|| ||x_c|| + ||b_c||), (k,).
    col_backward: Optional[jnp.ndarray] = None

    def backward_error(self):
        """Normwise backward error (traced or concrete)."""
        denom = self.scale_norm if self.scale_norm is not None else self.rhs_norm
        return self.residual_norm / jnp.maximum(denom, 1e-30)


def _report_from(a_norm, lu_diag, a, x, b, r) -> SolveReport:
    """Assemble the full report given the factor diagonal and residual."""
    x_norm = jnp.linalg.norm(x)
    b_norm = jnp.linalg.norm(b)
    absd = jnp.abs(lu_diag)
    cond = jnp.max(absd) / jnp.maximum(jnp.min(absd), 1e-30)
    col_scale = a_norm * jnp.linalg.norm(x, axis=0) + jnp.linalg.norm(b, axis=0)
    col_back = jnp.linalg.norm(r, axis=0) / jnp.maximum(col_scale, 1e-30)
    return SolveReport(
        residual_norm=jnp.linalg.norm(r),
        rhs_norm=b_norm,
        scale_norm=a_norm * x_norm + b_norm,
        cond_est=cond,
        col_backward=col_back,
    )


def _split_hi(a: jnp.ndarray) -> jnp.ndarray:
    """Dekker split: high part of `a` with the low 12 mantissa bits zeroed,
    so hi*hi products of two split operands are exact in f32."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFFF000), jnp.float32)


def _df_tree_sum(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Double-float pairwise-tree sum over axis 0 of `p`.

    Returns (hi, lo) with hi + lo ~= sum(p) to ~2^-45 relative.  Each tree
    level performs a vectorized TwoSum of the high words and accumulates the
    rounding errors into the low words — O(n log n) VPU work, fully parallel
    per level, no sequential scan.
    """
    hi = p
    lo = jnp.zeros_like(p)
    while hi.shape[0] > 1:
        n = hi.shape[0]
        if n % 2:
            pad = [(0, 1)] + [(0, 0)] * (hi.ndim - 1)
            hi = jnp.pad(hi, pad)
            lo = jnp.pad(lo, pad)
            n += 1
        a, b = hi[0::2], hi[1::2]
        al, bl = lo[0::2], lo[1::2]
        s = a + b
        # Knuth TwoSum error term (branch-free, works for any magnitudes).
        bb = s - a
        e = (a - (s - bb)) + (b - bb)
        hi, lo = s, al + bl + e
    return hi[0], lo[0]


def residual_compensated(a: jnp.ndarray, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compute  B - A @ X  with double-float accuracy (all f32 storage).

    The cancellation B ~= A @ X is exactly where the extra precision lives:
    the subtraction exposes low-order bits that survive because the dominant
    hi*hi contribution was accumulated in double-float.

    Memory: materializes the (N, M, K) exact-product tensor; callers keep
    K (the RHS column count) small — 3 for displacement solves.
    """
    a_hi = _split_hi(a)
    a_lo = a - a_hi
    x_hi = _split_hi(x)
    x_lo = x - x_hi
    # Exact products: (M, N) x (N, K) -> (N, M, K) elementwise outer slabs.
    prods = a_hi.T[:, :, None] * x_hi[:, None, :]
    s, comp = _df_tree_sum(prods)
    hp = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    cross = (
        jnp.dot(a_hi, x_lo, **hp) + jnp.dot(a_lo, x_hi, **hp) + jnp.dot(a_lo, x_lo, **hp)
    )
    return ((b - s) - comp) - cross


@functools.partial(jax.jit, static_argnames=("n_refine",))
def lu_solve_refined(
    a: jnp.ndarray, b: jnp.ndarray, n_refine: int = 2
) -> tuple[jnp.ndarray, SolveReport]:
    """Solve A X = B (A: (n, n), B: (n, k)) in f32 with compensated refinement.

    Returns the solution and a SolveReport; callers should check
    report.residual_norm against report.rhs_norm (see errors.check_solve).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    with jax.default_matmul_precision("highest"):
        lu, piv = jax.scipy.linalg.lu_factor(a)
        x = jax.scipy.linalg.lu_solve((lu, piv), b)
        for _ in range(n_refine):
            r = residual_compensated(a, x, b)
            dx = jax.scipy.linalg.lu_solve((lu, piv), r)
            x = x + dx
    r = residual_compensated(a, x, b)
    return x, _report_from(jnp.linalg.norm(a), jnp.diagonal(lu), a, x, b, r)


@functools.partial(jax.jit, static_argnames=("n_refine",))
def cholesky_solve_refined(
    a: jnp.ndarray, b: jnp.ndarray, n_refine: int = 2
) -> tuple[jnp.ndarray, SolveReport]:
    """Symmetric positive-definite variant (used for DBSE normal equations)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    with jax.default_matmul_precision("highest"):
        c, lower = jax.scipy.linalg.cho_factor(a)
        x = jax.scipy.linalg.cho_solve((c, lower), b)
        for _ in range(n_refine):
            r = residual_compensated(a, x, b)
            dx = jax.scipy.linalg.cho_solve((c, lower), r)
            x = x + dx
    r = residual_compensated(a, x, b)
    # Cholesky factor diagonal enters cond squared (A = L L^T).
    diag_sq = jnp.diagonal(c) * jnp.diagonal(c)
    return x, _report_from(jnp.linalg.norm(a), diag_sq, a, x, b, r)
