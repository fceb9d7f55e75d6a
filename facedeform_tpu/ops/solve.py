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


def _report_from(a_norm, lu_diag, x, b, r) -> SolveReport:
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


# the rounding-critical EFT primitives live in ONE place (ops/dfloat.py:
# its header documents the compiler-interference policy — barriers, the
# Pallas no-barrier switch); solve.py used to carry private byte-identical
# copies that a future dfloat fix would silently miss (round-5 review)
from facedeform_tpu.ops.dfloat import _df_sum_axis0, _split_hi


def _df_tree_sum(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Double-float pairwise-tree sum over axis 0 of `p`; (hi, lo) with
    hi + lo ~= sum(p) to ~2^-45 relative.  Thin alias over
    dfloat._df_sum_axis0 with a zero low word."""
    return _df_sum_axis0(p, jnp.zeros_like(p))


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
    # Guarded cancellation chain: b - s exposes the low-order bits; an
    # exact-arithmetic rewrite of ((b - s) - comp) - cross (e.g. into
    # b - (s + comp + cross)) would round comp/cross away against s.
    t = jax.lax.optimization_barrier(b - s)
    t = jax.lax.optimization_barrier(t - comp)
    return t - cross


def _map_col_blocks(refine_fn, b: jnp.ndarray, kb: int = 3):
    """Run `refine_fn((n, kb) block) -> (x_hi, x_lo, r)` over B's columns in
    consecutive kb-column groups under a sequential lax.map.

    Columns are independent given a shared factorization, and
    residual_compensated materializes pairwise-tree temps of size
    (n/2, n, K) PER LEVEL — at K = 3F frame columns (fit_pu_frames /
    fit_frames_dense) that tensor alone reached 17.6 GB of HBM at F=8,
    chunk=128, n=751.  Blocking the RHS into kb-column groups caps peak
    memory at the single-pose case no matter how many frames ride the
    solve.  kb=3 keeps one pose's xyz together (the packed frame layout is
    frame-major 3-column groups).
    """
    k = b.shape[1]
    if k <= kb:
        return refine_fn(b)
    pad = (-k) % kb
    b_pad = jnp.pad(b, ((0, 0), (0, pad)))
    nb = b_pad.shape[1] // kb
    # (n, nb*kb) -> (nb, n, kb) consecutive-column blocks
    blocks = b_pad.T.reshape(nb, kb, -1).transpose(0, 2, 1)
    xh, xl, rr = jax.lax.map(refine_fn, blocks)

    def unblk(a):
        return a.transpose(0, 2, 1).reshape(nb * kb, -1).T[:, :k]

    return unblk(xh), unblk(xl), unblk(rr)


@functools.partial(jax.jit, static_argnames=("n_refine",))
def lu_solve_refined(
    a: jnp.ndarray, b: jnp.ndarray, n_refine: int = 2
) -> tuple[jnp.ndarray, SolveReport]:
    """Solve A X = B (A: (n, n), B: (n, k)) in f32 with compensated refinement.

    Returns the solution and a SolveReport; callers should check
    report.residual_norm against report.rhs_norm (see errors.check_solve).
    """
    (x, _), report, _ = _lu_refined_impl(a, b, n_refine, want_lo=False)
    return x, report


@functools.partial(jax.jit, static_argnames=("n_refine",))
def lu_solve_refined_df(
    a: jnp.ndarray, b: jnp.ndarray, n_refine: int = 2
) -> tuple[tuple[jnp.ndarray, jnp.ndarray], SolveReport]:
    """lu_solve_refined returning a double-float solution (x_hi, x_lo).

    x_lo is the final refinement correction left UNROUNDED into x_hi —
    the sub-f32 bits of the solution.  Growing-kernel systems carry
    ||X|| >> ||displacement||, so rounding X to f32 alone costs
    ~u ||Phi|| ||X|| of displacement accuracy; the precise eval path
    (ops/precise_eval.py) contracts against (x_hi + x_lo) to keep it.
    Costs one extra pair of triangular solves.
    """
    x_df, report, _ = _lu_refined_impl(a, b, n_refine, want_lo=True)
    return x_df, report


@functools.partial(jax.jit, static_argnames=("n_refine",))
def lu_solve_refined_factored(
    a: jnp.ndarray, b: jnp.ndarray, n_refine: int = 2
) -> tuple[jnp.ndarray, SolveReport, tuple[jnp.ndarray, jnp.ndarray]]:
    """lu_solve_refined that also returns the (lu, piv) factors for reuse.

    LOOCV scoring (ops/loocv.py) needs both the refined solve AND the
    inverse diagonal of the SAME matrix; returning the factors lets it
    derive the inverse with two triangular solves instead of paying a
    second full factorization per candidate.
    """
    (x, _), report, lu_piv = _lu_refined_impl(a, b, n_refine, want_lo=False)
    return x, report, lu_piv


@functools.partial(jax.jit, static_argnames=())
def lu_factor_hp(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 LU factorization under HIGHEST matmul precision.

    The precision scope matters: the blocked LAPACK-style factorization
    runs its panel updates through the MXU, and the default bf16 pass
    would destabilize the factors as a refinement preconditioner.  This
    is THE factor step of the pose-independent fit plan (ops/fit.prepare):
    the system matrix depends only on the rest rig + solve params, so an
    interactive marker drag (deformed rig moved, rest rig unchanged) can
    reuse these factors and pay only triangular solves + refinement
    (lu_resolve_* below).
    """
    with jax.default_matmul_precision("highest"):
        return jax.scipy.linalg.lu_factor(a.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_refine",))
def lu_resolve_refined_df(
    lu_piv: tuple[jnp.ndarray, jnp.ndarray],
    a: jnp.ndarray,
    b: jnp.ndarray,
    n_refine: int = 2,
) -> tuple[tuple[jnp.ndarray, jnp.ndarray], SolveReport]:
    """lu_solve_refined_df against PRECOMPUTED (lu, piv) factors of `a`.

    Same refinement arithmetic as the factoring entry — only the O(n^3)
    factorization is skipped, so a re-solve for a new RHS (marker drag:
    same rest rig, new pose delta) costs O(n^2 * sweeps).
    """
    x_df, report, _ = _lu_refined_impl(a, b, n_refine, want_lo=True,
                                       lu_piv=lu_piv)
    return x_df, report


@functools.partial(jax.jit, static_argnames=("n_refine", "gmres_ir"))
def lu_resolve_refined_against_df(
    lu_piv: tuple[jnp.ndarray, jnp.ndarray],
    a_hi: jnp.ndarray,
    a_lo: jnp.ndarray,
    b: jnp.ndarray,
    n_refine: int = 3,
    gmres_ir: bool = True,
) -> tuple[tuple[jnp.ndarray, jnp.ndarray], SolveReport]:
    """lu_solve_refined_against_df against PRECOMPUTED factors of a_hi."""
    return _lu_against_df_impl(a_hi, a_lo, b, n_refine, gmres_ir,
                               lu_piv=lu_piv)


@functools.partial(jax.jit, static_argnames=("n_refine", "gmres_ir"))
def lu_solve_refined_against_df(
    a_hi: jnp.ndarray,
    a_lo: jnp.ndarray,
    b: jnp.ndarray,
    n_refine: int = 3,
    gmres_ir: bool = True,
) -> tuple[tuple[jnp.ndarray, jnp.ndarray], SolveReport]:
    """Solve (A_hi + A_lo) X = B with an f32 LU of A_hi and df-x refinement.

    Refining against the f32 matrix caps the forward error at
    cond * u * ||X|| regardless of sweeps, because the f32 ASSEMBLY error
    u*|A| is baked into the system being solved.  With the residual
    evaluated against the double-float matrix (assemble_system_df) the
    target is right; and because stationary refinement stalls when
    cond * u ~ 1 (hit by a cond 1.7e7 multiquadric at 4k: weights stuck at
    7.8e-4 relative), the correction equation is solved by LU-PRECONDITIONED
    GMRES (GMRES-IR, Carson & Higham), which converges for conditioning far
    beyond the stationary limit — measured 7.8e-4 -> 2.3e-6 relative weight
    error in 2 sweeps on that system.

    gmres_ir=False runs STATIONARY df-IR instead (one preconditioned
    correction per sweep, no inner Krylov): ~30x fewer triangular solves
    and matvecs per sweep.  Correct ONLY when cond * u < 1 so the
    stationary iteration contracts — the PU patch solves at the auto
    spacing-scale shape parameter (cond ~2e6, contraction ~0.24/sweep)
    qualify, and their residual-type interp error at the controls reaches
    the same ~u ||A|| ||X|| floor (measured: identical 7.45e-8 interp at
    30k controls, warm fit 5.0 s -> 0.68 s on v5e).  Forced-global-eps
    fits (cond ~5e10) MUST keep GMRES-IR.
    """
    return _lu_against_df_impl(a_hi, a_lo, b, n_refine, gmres_ir)


def _lu_against_df_impl(a_hi, a_lo, b, n_refine, gmres_ir, lu_piv=None):
    """Shared body of lu_solve_refined_against_df / lu_resolve_...: factor
    a_hi unless precomputed (lu, piv) factors were passed."""
    from facedeform_tpu.ops.krylov import gmres

    a_hi = a_hi.astype(jnp.float32)
    a_lo = a_lo.astype(jnp.float32)
    b = b.astype(jnp.float32)
    hp = dict(
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    with jax.default_matmul_precision("highest"):
        lu, piv = (jax.scipy.linalg.lu_factor(a_hi)
                   if lu_piv is None else lu_piv)

        def msolve(v):
            return jax.scipy.linalg.lu_solve((lu, piv), v)

        def _dot_pair(u, v):
            """dot(a_hi, u) + dot(a_lo, v) with the partial products kept
            apart: under a whole-program jit XLA's linearity rewrite merges
            dot(A, x) + dot(B, x) into dot(A + B, x), and a_hi + a_lo
            rounds a_lo clean away in f32 — silently undoing the entire
            double-float assembly (observed: weight error 2e-6 -> 8e-4).
            The optimization barrier pins the two dots as separate values.
            """
            d1 = jnp.dot(a_hi, u, **hp)
            d2 = jnp.dot(a_lo, v, **hp)
            d1, d2 = jax.lax.optimization_barrier((d1, d2))
            return d1 + d2

        def matvec(v):
            return _dot_pair(v, v)

        from facedeform_tpu.ops.dfloat import _two_sum as _guarded_two_sum

        def _refine(b_blk):
            """Full refinement of one column block against the shared LU.

            Columns are independent given the factorization, and
            residual_compensated materializes pairwise-tree temps of size
            (n/2, n, K) PER LEVEL — at K = 3F frame columns
            (fit_pu_frames) that tensor alone reached 17.6 GB of HBM at
            F=8, chunk=128, n=751.  Blocking the RHS into 3-column groups
            under a sequential lax.map caps peak memory at the
            single-pose case no matter how many frames ride the solve.
            """
            x_hi = msolve(b_blk)
            x_lo = jnp.zeros_like(x_hi)

            def residual(x_hi, x_lo):
                return residual_compensated(a_hi, x_hi, b_blk) - _dot_pair(
                    x_lo, x_hi + x_lo
                )

            for _ in range(n_refine):
                if gmres_ir:
                    dx, _ = gmres(
                        matvec, residual(x_hi, x_lo), msolve=msolve,
                        restart=16, max_restarts=2,
                    )
                else:
                    dx = msolve(residual(x_hi, x_lo))
                s, e = _guarded_two_sum(x_hi, dx)
                x_hi, x_lo = s, x_lo + e
            return x_hi, x_lo, residual(x_hi, x_lo)

        x_hi, x_lo, r = _map_col_blocks(_refine, b)
    report = _report_from(
        jnp.linalg.norm(a_hi), jnp.diagonal(lu), x_hi, b, r
    )
    return (x_hi, x_lo), report


def _lu_refined_impl(a, b, n_refine, want_lo, lu_piv=None):
    """Iterative refinement with the solution kept in DOUBLE-FLOAT.

    Folding each correction into an f32 x re-rounds the solution every
    sweep (u ||x|| error re-introduced), stalling the FORWARD error near
    u * cond even though the backward error converges.  Carrying
    (x_hi, x_lo) across sweeps — residuals evaluated against the full df
    value — converges the forward error to ~cond * u^2 instead (measured
    on a cond 1.7e7 multiquadric system: 1.9e-4 -> 2.7e-6 relative after
    2 sweeps).  This is what lets growing-kernel weights meet the 5e-5
    displacement budget at 4k controls.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    hp = dict(
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    with jax.default_matmul_precision("highest"):
        lu, piv = (jax.scipy.linalg.lu_factor(a)
                   if lu_piv is None else lu_piv)
        from facedeform_tpu.ops.dfloat import _two_sum as _guarded_two_sum

        def _refine(b_blk):
            x_hi = jax.scipy.linalg.lu_solve((lu, piv), b_blk)
            x_lo = jnp.zeros_like(x_hi)
            for _ in range(n_refine):
                # df-accurate residual of (x_hi + x_lo): compensated for
                # the dominant x_hi part, plain f32 for the u-sized x_lo.
                r = residual_compensated(a, x_hi, b_blk) - jnp.dot(a, x_lo, **hp)
                dx = jax.scipy.linalg.lu_solve((lu, piv), r)
                # guarded TwoSum: bits of dx lost rounding into s go to x_lo
                s, e = _guarded_two_sum(x_hi, dx)
                x_hi, x_lo = s, x_lo + e
            r = residual_compensated(a, x_hi, b_blk) - jnp.dot(a, x_lo, **hp)
            return x_hi, x_lo, r

        # Wide RHS (3F frame columns) refines in 3-column blocks so the
        # compensated-residual temps stay single-pose-sized (_map_col_blocks).
        x_hi, x_lo, r = _map_col_blocks(_refine, b)
        if not want_lo:
            # the caller receives x_hi ALONE — report the residual of
            # that f32 solution, not of the internal df pair (which is
            # up to u^2-level smaller and would overstate the accuracy
            # of the returned weights; round-5 review finding).  One
            # extra HIGHEST matmul restores the dropped A x_lo term.
            r = r + jnp.dot(a, x_lo, **hp)
    report = _report_from(jnp.linalg.norm(a), jnp.diagonal(lu), x_hi, b, r)
    if not want_lo:
        x_lo = jnp.zeros_like(x_hi)
    return (x_hi, x_lo), report, (lu, piv)


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
    return x, _report_from(jnp.linalg.norm(a), diag_sq, x, b, r)
