"""RBF interpolation system assembly.

The reference hands system assembly to ALGLIB (rbfsetpoints + rbfbuildmodel,
src/SOP_FaceDeform.cpp:336,363).  Here the system is explicit:

    [ Phi + lam*I   P ] [ w ]   [ delta ]
    [ P^T           0 ] [ c ] = [   0   ]

with Phi[i,j] = phi(||x_i - x_j|| / eps_j), P the polynomial tail selected by
the reference's `term` parameter (rbfset{lin,const,zero}term,
src/SOP_FaceDeform.cpp:351-361), and lam the ridge standing in for QNN's q/z
smoothing and multilayer's lambda.

Everything here is pure f32 JAX, jit-friendly, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.kernels import apply_kernel, pairwise_sqdist


def poly_basis(pts: jnp.ndarray, term: PolyTerm) -> jnp.ndarray:
    """Polynomial tail basis rows for a point set; shape (V, n_poly).

    LINEAR -> [1, x, y, z]; CONSTANT -> [1]; ZERO -> (V, 0).
    """
    term = PolyTerm(term)
    v = pts.shape[0]
    ones = jnp.ones((v, 1), dtype=pts.dtype)
    if term == PolyTerm.LINEAR:
        return jnp.concatenate([ones, pts], axis=-1)
    if term == PolyTerm.CONSTANT:
        return ones
    return jnp.zeros((v, 0), dtype=pts.dtype)


def assemble_system(
    ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    tail_reg: float = 1e-8,
) -> jnp.ndarray:
    """Build the (N + m, N + m) saddle-point system matrix.

    Args:
      ctrl: (N, 3) control points.
      kernel: static kernel id.
      term: static polynomial tail choice.
      eps: per-control radii (N,) or scalar.
      lam: ridge added to the Phi diagonal (0 for exact interpolation).
      tail_reg: -tail_reg*I in the zero block makes the system
        quasi-definite, so rank-deficient tails (coplanar or < m control
        points with a LINEAR term — common for flat facial marker layouts)
        solve to a minimal-norm tail instead of blowing up.  ALGLIB absorbs
        this case inside its least-squares machinery; the perturbation to
        the interpolation rows is zero, so exactness at control points is
        unaffected.
    """
    n = ctrl.shape[0]
    d2 = pairwise_sqdist(ctrl, ctrl)
    phi = apply_kernel(kernel, d2, eps)
    phi = phi + lam * jnp.eye(n, dtype=phi.dtype)
    p = poly_basis(ctrl, term)
    m = p.shape[1]
    if m == 0:
        return phi
    tail = -tail_reg * jnp.eye(m, dtype=phi.dtype)
    top = jnp.concatenate([phi, p], axis=1)
    bot = jnp.concatenate([p.T, tail], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def assemble_system_df(
    ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    tail_reg: float = 1e-8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """assemble_system in double-float: returns (A_hi, A_lo).

    For growing kernels the f32 rounding of phi itself, amplified by the
    system's conditioning, caps the FORWARD accuracy of any solve against
    the f32 matrix (measured 6e-4 relative weight error on a cond 1.7e7
    multiquadric at 4k despite a fully converged backward error).  The
    fix is to refine against the df-assembled system (see
    ops.solve.lu_solve_refined_against_df); A_lo costs one extra N^2 f32
    buffer.  The polynomial tail rows are exact in f32 already (values
    1/x/y/z), so only the phi block carries a lo part.
    """
    from facedeform_tpu.ops.dfloat import (
        _phi_df, _sqdist_df, _two_prod, df_mul, df_recip,
    )

    n = ctrl.shape[0]
    eps = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (n,))
    d2 = _sqdist_df(ctrl, ctrl)
    eps2 = _two_prod(eps, eps)
    inv_eps2 = df_recip(eps2)
    s = df_mul(d2, (inv_eps2[0][None, :], inv_eps2[1][None, :]))
    phi_hi, phi_lo = _phi_df(kernel, s)
    # + lam I: lam is an exact f32 scalar; TwoSum the diagonal (barrier:
    # EFT guard against exact-arithmetic folding, see ops/dfloat.py).
    import jax

    old_diag = jnp.diagonal(phi_hi)
    diag = jax.lax.optimization_barrier(old_diag + lam)
    bb = diag - old_diag
    diag_err = (old_diag - (diag - bb)) + (lam - bb)
    idx = jnp.arange(n)
    phi_hi = phi_hi.at[idx, idx].set(diag)
    phi_lo = phi_lo.at[idx, idx].add(diag_err)
    p = poly_basis(ctrl, term)
    m = p.shape[1]
    if m == 0:
        return phi_hi, phi_lo
    tail = -tail_reg * jnp.eye(m, dtype=phi_hi.dtype)
    top = jnp.concatenate([phi_hi, p], axis=1)
    bot = jnp.concatenate([p.T, tail], axis=1)
    a_hi = jnp.concatenate([top, bot], axis=0)
    a_lo = jnp.zeros_like(a_hi).at[:n, :n].set(phi_lo)
    return a_hi, a_lo


def assemble_rhs(delta: jnp.ndarray, term: PolyTerm) -> jnp.ndarray:
    """Right-hand side (N + m, 3): control displacements, zero-padded for the tail."""
    term = PolyTerm(term)
    m = {PolyTerm.LINEAR: 4, PolyTerm.CONSTANT: 1, PolyTerm.ZERO: 0}[term]
    if m == 0:
        return delta
    pad = jnp.zeros((m, delta.shape[1]), dtype=delta.dtype)
    return jnp.concatenate([delta, pad], axis=0)
