"""Matrix-free Krylov solvers: RBF solves past the dense-factorization limit.

XLA's LU panel factorization runs out of VMEM near N ~ 16k controls, and a
dense (N, N) system stops fitting HBM long before truly large rigs (N=100k
-> 40 GB).  The scalable path never materializes the system: a chunked
kernel matvec

    (A x)_i = sum_j phi(|c_i - c_j| / eps_j) x_j + lam x_i + (P c)_i

computed with the same fused distance->phi->contract structure as the eval
path, O(chunk x N) memory, drives

  * MINRES (Paige & Saunders) for the symmetric saddle systems of the
    MULTILAYER/KERNEL families (shared radii), optionally preconditioned
    with a block-Jacobi SPD preconditioner (PD kernels only);
  * restarted GMRES for QNN, whose per-point radii make the system
    non-symmetric (column j carries eps_j), block-Jacobi right-
    preconditioned.

Per-iteration cost is one N^2 kernel sweep, so a 50k-control solve is
~2.5e9 evals/iteration — milliseconds on a v5e.  Used by ops.fit above the
dense threshold for every model family.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.assemble import poly_basis
from facedeform_tpu.ops.kernels import apply_kernel, pairwise_sqdist
from facedeform_tpu.ops.solve import SolveReport


def make_saddle_matvec(
    ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    tail_reg: float = 1e-8,
    chunk: int = 2048,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Matvec for the (N + m, N + m) saddle system, never materialized.

    eps must be a scalar / uniform vector (symmetry requirement); callers
    enforce that (MULTILAYER/KERNEL modes).
    """
    n = ctrl.shape[0]
    p = poly_basis(ctrl, term)  # (N, m)
    m = p.shape[1]
    pad = (-n) % chunk
    ctrl_pad = jnp.pad(ctrl, ((0, pad), (0, 0)))
    n_chunks = ctrl_pad.shape[0] // chunk
    ctrl_chunks = ctrl_pad.reshape(n_chunks, chunk, 3)
    # Per-marker ridge (confidence weighting, ops/fit._family_radii) is a
    # (N,) vector: shape it to broadcast over the RHS columns.
    lam = jnp.asarray(lam, jnp.float32)
    lam = lam[:, None] if lam.ndim == 1 else lam

    def matvec(x: jnp.ndarray) -> jnp.ndarray:  # (N + m, k)
        xw, xc = x[:n], x[n:]

        def row_chunk(c_rows):
            d2 = pairwise_sqdist(c_rows, ctrl)      # (chunk, N)
            phi = apply_kernel(kernel, d2, eps)
            return jnp.dot(
                phi, xw,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        y_top = jax.lax.map(row_chunk, ctrl_chunks).reshape(-1, x.shape[1])[:n]
        y_top = y_top + lam * xw
        if m:
            y_top = y_top + jnp.dot(
                p, xc, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            y_bot = jnp.dot(
                p.T, xw, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ) - tail_reg * xc
            return jnp.concatenate([y_top, y_bot], axis=0)
        return y_top

    return matvec


def make_saddle_matvec_df(
    ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    tail_reg: float = 1e-8,
    chunk: int = 512,
    ctrl_block: int = 512,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Double-float (compensated) saddle matvec: same system as
    make_saddle_matvec, with phi computed in df arithmetic and the
    contraction's main products error-free (Dekker split + compensated
    tree sum), rounded to f32 on return.

    Why it exists: the f32 Krylov path for the CPD/growing kernels
    (TPS/MQ/linear/cubic) stalls at a ~1e-3 backward-error floor — the
    eps*kappa noise of the MATVEC, dominated for these kernels by phi's
    evaluation error (f32 pairwise d2 cancellation feeding log/sqrt).
    df-IR *around* f32 inner solves cannot pass that floor (measured,
    round 3): classic IR needs kappa * eps_solve < 1.  Lowering the
    matvec's own error attacks the floor directly (Greenbaum: the
    attainable residual of a Krylov recurrence tracks the error of
    applying A, not the factorization error there is none of).  The
    remaining f32 terms are the recurrence axpys and the x storage —
    O(eps) level, far below 1e-3.

    Structure mirrors ops/precise_eval.evaluate_precise (df distances ->
    df phi -> exact main products + f32 cross terms), specialized to
    query points == control points and a runtime (N + m, k) operand.
    ~10x the VPU ops of the f32 matvec.  NOT on the default fit route:
    production CPD fits stay f32 (health-checked at the documented
    backward-error floor) with PU as the full-precision escape; this
    matvec is the building block of the OPT-IN df path — standalone
    residual sweeps, and make_saddle_matvec_df_pair inside pminres_df
    (see docs/PERFORMANCE.md's round-5 experiment table for why it is
    not the default: block-Jacobi convergence RATE, not precision, is
    the practical wall at scale).

    eps must be uniform (symmetry), like make_saddle_matvec.

    Implemented as the f32 collapse of make_saddle_matvec_df_pair on a
    zero low word — ONE df sweep implementation instead of two ~45-line
    copies that had to be edited in lockstep (round-5 review).  Costs
    one f32 sweep of the zero low word (~10% of the df sweep's work);
    the pair path also carries the ridge/tail terms in df, so this is
    marginally MORE accurate than the old standalone body (f32 tail
    adds).
    """
    pair = make_saddle_matvec_df_pair(
        ctrl, kernel, term, eps, lam, tail_reg, chunk, ctrl_block
    )

    def matvec(x: jnp.ndarray) -> jnp.ndarray:  # (N + m, k)
        x = x.astype(jnp.float32)
        hi, lo = pair((x, jnp.zeros_like(x)))
        return hi + lo

    return matvec


# ------------------------------------------------------------ block-Jacobi
def make_block_jacobi(
    ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    block: int = 512,
    jitter: float = 1e-5,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Block-Jacobi approximate inverse of the saddle system's top block.

    Extracts the (block x block) diagonal blocks of Phi + (lam + jitter) I,
    inverts them batched (jnp.linalg.inv: blocks are strongly diagonally
    dominated for the radii the model families produce, so the explicit
    inverse is stable and its application is one batched matmul — much
    faster on TPU than batched triangular solves), and applies identity on
    the polynomial-tail rows.  Memory: N x block f32.

    Valid as a MINRES preconditioner only for PD kernels (gaussian, IMQ,
    wendland: diagonal blocks SPD); usable unconditionally for GMRES.
    Handles per-point radii (QNN): block (b, i, j) uses eps of column j.
    """
    n = ctrl.shape[0]
    m = poly_basis(ctrl, term).shape[1]
    eps = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (n,))
    # per-marker ridge (confidence weighting): (N,) vector forms diag(lam)
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (n,))
    pad = (-n) % block
    ctrl_p = jnp.pad(ctrl, ((0, pad), (0, 0)))
    # Padded radii of 1 with identity diagonal keep padded blocks invertible.
    eps_p = jnp.pad(eps, (0, pad), constant_values=1.0)
    # edge-pad the ridge: the padded all-at-origin rows share the last
    # block with real markers, and zero-padding would leave that mixed
    # block's padded sub-matrix (all-ones gaussian) with only the 1e-5
    # jitter on its diagonal — cond ~lam/jitter worse than the real system
    lam_p = jnp.pad(lam, (0, pad), mode="edge") if pad else lam
    nb = ctrl_p.shape[0] // block
    cb = ctrl_p.reshape(nb, block, 3)
    eb = eps_p.reshape(nb, block)
    lb = lam_p.reshape(nb, block)

    def one_block(c, e, l):
        d2 = pairwise_sqdist(c, c)
        phi = apply_kernel(kernel, d2, e)  # eps broadcasts over columns
        # (block,) * eye broadcasts down the columns -> diag(l + jitter)
        return phi + (l + jitter) * jnp.eye(block, dtype=jnp.float32)

    blocks = jax.vmap(one_block)(cb, eb, lb)          # (nb, B, B)
    with jax.default_matmul_precision("highest"):
        inv_blocks = jnp.linalg.inv(blocks)           # batched

    def msolve(r: jnp.ndarray) -> jnp.ndarray:        # (N + m, k)
        top, tail = r[:n], r[n:]
        top = jnp.pad(top, ((0, pad), (0, 0))).reshape(nb, block, -1)
        out = jnp.einsum(
            "bij,bjk->bik", inv_blocks, top,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(-1, r.shape[1])[:n]
        return jnp.concatenate([out, tail], axis=0) if m else out

    return msolve


def make_abs_block_jacobi(
    ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    block: int = 512,
    spatial: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Absolute-value block-Jacobi: an SPD preconditioner for CPD kernels.

    The growing kernels (TPS/MQ/linear/cubic) are only conditionally
    positive definite, so their diagonal blocks are symmetric INDEFINITE
    and `make_block_jacobi`'s plain inverse is not a valid MINRES
    preconditioner (MINRES requires M SPD).  The standard fix
    (absolute-value preconditioning, Vecharynski & Knyazev) is the
    spectral absolute value of each block: B = Q diag(w) Q^T gives
    M_b^-1 = Q diag(1/max(|w|, floor)) Q^T — SPD by construction, and its
    application is two batched matmuls per iteration (the batched eigh
    runs once at setup).  The floor is relative (1e-7 |w|_max per block)
    so near-null directions are damped, not amplified.

    `spatial=True` Z-orders the control points first (ops/morton) so each
    block covers a spatial neighborhood rather than an arbitrary index
    range — blocks then capture the kernel's strong short-range coupling.
    The permutation costs two (N, k) gathers per application, negligible
    next to the O(N^2) matvec.

    Measured (TPS, N=6k random ctrl, 512 MINRES iterations, CPU f64-free):
    plain MINRES stalls at max interp residual 3.96; with this
    preconditioner 0.207 — ~19x, at <20% extra wall per iteration.  Both
    sit at the f32 Krylov noise floor eps*kappa; see the README's
    known-limits note.

    Identity on the polynomial-tail rows, like make_block_jacobi.
    """
    n = ctrl.shape[0]
    m = poly_basis(ctrl, term).shape[1]
    eps = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (n,))
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (n,))
    if spatial:
        from facedeform_tpu.ops.morton import spatial_order

        perm, inv_perm = spatial_order(ctrl)
        ctrl = ctrl[perm]
        eps = eps[perm]
        lam = lam[perm]  # per-marker ridge rides the Z-order too
    pad = (-n) % block
    ctrl_p = jnp.pad(ctrl, ((0, pad), (0, 0)))
    eps_p = jnp.pad(eps, (0, pad), constant_values=1.0)
    # pad value is irrelevant here (the valid mask decouples padded
    # rows/cols to the identity) but edge mode keeps it finite
    lam_p = jnp.pad(lam, (0, pad), mode="edge") if pad else lam
    valid = (jnp.arange(n + pad) < n)
    nb = ctrl_p.shape[0] // block
    cb = ctrl_p.reshape(nb, block, 3)
    eb = eps_p.reshape(nb, block)
    lb = lam_p.reshape(nb, block)
    vb = valid.reshape(nb, block)

    def one_block(c, e, l, v):
        d2 = pairwise_sqdist(c, c)
        phi = apply_kernel(kernel, d2, e)
        phi = phi + l * jnp.eye(block, dtype=jnp.float32)
        # Decouple padded rows/cols to the identity so the (single) mixed
        # block's spectrum is the real sub-block's plus unit eigenvalues.
        mask = v[:, None] & v[None, :]
        return jnp.where(mask, phi, jnp.eye(block, dtype=jnp.float32))

    blocks = jax.vmap(one_block)(cb, eb, lb, vb)      # (nb, B, B)
    with jax.default_matmul_precision("highest"):
        w_eig, q = jnp.linalg.eigh(blocks)            # batched, once
    amax = jnp.max(jnp.abs(w_eig), axis=-1, keepdims=True)
    inv_abs = 1.0 / jnp.maximum(
        jnp.abs(w_eig), jnp.maximum(amax * 1e-7, 1e-20)
    )

    hp = dict(
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )

    def msolve(r: jnp.ndarray) -> jnp.ndarray:        # (N + m, k)
        top, tail = r[:n], r[n:]
        if spatial:
            top = top[perm]
        t = jnp.pad(top, ((0, pad), (0, 0))).reshape(nb, block, -1)
        u = jnp.einsum("bji,bjk->bik", q, t, **hp)    # Q^T r
        u = u * inv_abs[..., None]
        out = jnp.einsum("bij,bjk->bik", q, u, **hp)  # Q |w|^-1 Q^T r
        out = out.reshape(-1, r.shape[1])[:n]
        if spatial:
            out = out[inv_perm]
        return jnp.concatenate([out, tail], axis=0) if m else out

    return msolve


@functools.partial(jax.jit, static_argnames=("matvec", "msolve", "maxiter"))
def pminres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    msolve: Callable[[jnp.ndarray], jnp.ndarray],
    tol: float = 1e-7,
    maxiter: int = 256,
    x0: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, SolveReport]:
    """Preconditioned MINRES (SPD preconditioner), multi-RHS lockstep.

    Standard recurrence (Elman/Silvester/Wathen formulation): Lanczos on
    M^-1 A in the M-inner product; per-column (k,) Givens scalars.  The
    tracked residual |eta| lives in the M^-1 norm; the report carries the
    true final residual.
    """
    b = b.astype(jnp.float32)
    n, k = b.shape
    r = b if x0 is None else b - matvec(x0.astype(jnp.float32))
    z = msolve(r)
    zr = jnp.sum(z * r, axis=0)                                    # (k,)
    # Dead-column guard (mirrors minres): an exactly-zero (or converged)
    # RHS column floors gamma1 at 1e-15, which never decays through the
    # Givens recurrence — without zeroing its tracked residual the loop
    # would run to maxiter for every solve containing a zero column
    # (planar rig deltas are common).  The column's update stays 0.
    alive0 = zr > 1e-25
    gamma1 = jnp.where(alive0, jnp.sqrt(jnp.maximum(zr, 1e-30)), 1.0)
    eta0 = jnp.where(alive0, gamma1, 0.0)
    bnorm = jnp.linalg.norm(b, axis=0)

    state = dict(
        x=jnp.zeros_like(b),
        v=r, v_prev=jnp.zeros_like(b),       # unpreconditioned residual pair
        z=z,                                 # z_j = M^-1 v_j
        gamma=gamma1, gamma_prev=jnp.ones((k,), jnp.float32),
        eta=eta0,
        c1=jnp.ones((k,), jnp.float32), c0=jnp.ones((k,), jnp.float32),
        s1=jnp.zeros((k,), jnp.float32), s0=jnp.zeros((k,), jnp.float32),
        w=jnp.zeros_like(b), w_prev=jnp.zeros_like(b),
        it=jnp.asarray(0, jnp.int32),
        resid=eta0,
        anorm=jnp.zeros((k,), jnp.float32),
    )

    def cond(st):
        return jnp.logical_and(
            st["it"] < maxiter,
            jnp.any(st["resid"] > tol * jnp.maximum(bnorm, 1e-30)),
        )

    def body(st):
        gamma, gamma_prev = st["gamma"], st["gamma_prev"]
        zj = st["z"] / gamma
        azj = matvec(zj)
        delta = jnp.sum(zj * azj, axis=0)                       # (k,)
        v_new = (
            azj
            - (delta / gamma) * st["v"]
            - (gamma / gamma_prev) * st["v_prev"]
        )
        z_new = msolve(v_new)
        gamma_new = jnp.sqrt(jnp.maximum(jnp.sum(z_new * v_new, axis=0), 1e-30))

        c1, c0, s1, s0 = st["c1"], st["c0"], st["s1"], st["s0"]
        alpha0 = c1 * delta - c0 * s1 * gamma
        alpha1 = jnp.maximum(
            jnp.sqrt(alpha0 * alpha0 + gamma_new * gamma_new), 1e-30
        )
        alpha2 = s1 * delta + c0 * c1 * gamma
        alpha3 = s0 * gamma
        c1n = alpha0 / alpha1
        s1n = gamma_new / alpha1
        w_new = (zj - alpha3 * st["w_prev"] - alpha2 * st["w"]) / alpha1
        x = st["x"] + (c1n * st["eta"]) * w_new
        eta = -s1n * st["eta"]

        return dict(
            x=x, v=v_new, v_prev=st["v"], z=z_new,
            gamma=gamma_new, gamma_prev=gamma,
            eta=eta, c1=c1n, c0=c1, s1=s1n, s0=s1,
            w=w_new, w_prev=st["w"],
            it=st["it"] + 1,
            resid=jnp.abs(eta),
            anorm=jnp.maximum(
                st["anorm"],
                jnp.sqrt(delta * delta + gamma * gamma + gamma_new * gamma_new),
            ),
        )

    st = jax.lax.while_loop(cond, body, state)
    x = st["x"] if x0 is None else st["x"] + x0.astype(jnp.float32)
    r_final = b - matvec(x)
    xnorm = jnp.linalg.norm(x, axis=0)
    # the Lanczos estimate measures the PRECONDITIONED operator
    # ||M^-1/2 A M^-1/2|| (~1 by block-Jacobi construction), not ||A|| —
    # without the Rayleigh-style correction the backward-error scale
    # shrinks by ||A|| and healthy solves read as failures (gmres already
    # corrects this way; round-5 review finding)
    ax_norm = jnp.linalg.norm(b - r_final, axis=0)
    anorm = jnp.maximum(
        jnp.max(st["anorm"]),
        jnp.max(ax_norm / jnp.maximum(xnorm, 1e-30)),
    )
    col_scale = anorm * xnorm + jnp.linalg.norm(b, axis=0)
    report = SolveReport(
        residual_norm=jnp.linalg.norm(r_final),
        rhs_norm=jnp.linalg.norm(b),
        scale_norm=anorm * jnp.linalg.norm(x) + jnp.linalg.norm(b),
        cond_est=None,
        col_backward=jnp.linalg.norm(r_final, axis=0)
        / jnp.maximum(col_scale, 1e-30),
    )
    return x, report


# ---------------------------------------------------------- df-MINRES
def make_saddle_matvec_df_pair(
    ctrl: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    tail_reg: float = 1e-8,
    chunk: int = 512,
    ctrl_block: int = 512,
):
    """Double-float matvec over a DF OPERAND, returning a df pair.

    y = A (x_hi + x_lo) with A x_hi computed by the compensated sweep
    (make_saddle_matvec_df) kept as (hi, lo) before the final rounding,
    and A x_lo added through the plain f32 sweep (x_lo is already at
    eps relative of x_hi, so f32 accuracy there is below the df tail).
    This is the pminres_df workhorse: one df + one f32 kernel sweep per
    iteration.
    """
    from facedeform_tpu.ops.dfloat import (
        _df_sum_axis0, _phi_df, _sqdist_df, _two_prod, df, df_add,
        df_mul, df_recip,
    )

    n = ctrl.shape[0]
    p = poly_basis(ctrl, term)  # (N, m)
    m = p.shape[1]
    lam = jnp.asarray(lam, jnp.float32)
    lam = lam[:, None] if lam.ndim == 1 else lam

    n_pad = (-n) % ctrl_block
    ctrl_pad = jnp.pad(ctrl.astype(jnp.float32), ((0, n_pad), (0, 0)))
    nb = ctrl_pad.shape[0] // ctrl_block
    eps_v = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (n,))
    eps_pad = jnp.pad(eps_v, (0, n_pad), constant_values=1.0)
    e2 = _two_prod(eps_pad, eps_pad)
    inv_e2 = df_recip(e2)

    v_pad = (-n) % chunk
    pts_pad = jnp.pad(ctrl.astype(jnp.float32), ((0, v_pad), (0, 0)))
    row_chunks = pts_pad.reshape(-1, chunk, 3)
    f32_mv = make_saddle_matvec(ctrl, kernel, term, eps_v, lam, tail_reg,
                                chunk=2048)

    hp = dict(
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def matvec(x):
        x_hi, x_lo = x
        k = x_hi.shape[1]
        xw = x_hi[:n]
        xc = x_hi[n:]
        xw_pad = jnp.pad(xw, ((0, n_pad), (0, 0)))

        def row_chunk(pts):
            c = pts.shape[0]

            def block_body(bk, acc):
                acc_hi, acc_lo = acc
                lo_idx = bk * ctrl_block
                cblk = jax.lax.dynamic_slice(
                    ctrl_pad, (lo_idx, 0), (ctrl_block, 3)
                )
                ie_hi = jax.lax.dynamic_slice(
                    inv_e2[0], (lo_idx,), (ctrl_block,)
                )[None, :]
                ie_lo = jax.lax.dynamic_slice(
                    inv_e2[1], (lo_idx,), (ctrl_block,)
                )[None, :]
                xb = jax.lax.dynamic_slice(
                    xw_pad, (lo_idx, 0), (ctrl_block, k)
                )
                d2 = _sqdist_df(pts, cblk)
                s = df_mul(d2, (ie_hi, ie_lo))
                phi = _phi_df(kernel, s)
                valid = (jnp.arange(ctrl_block) + lo_idx < n)[None, :]
                phi = (jnp.where(valid, phi[0], 0.0),
                       jnp.where(valid, phi[1], 0.0))
                pm, em = _two_prod(phi[0].T[:, :, None], xb[:, None, :])
                s_hi, s_lo = _df_sum_axis0(pm, em)
                cross = jnp.dot(phi[1], xb, **hp)
                return df_add((acc_hi, acc_lo),
                              df_add((s_hi, s_lo), df(cross)))

            zero = jnp.zeros((c, k), jnp.float32)
            hi, lo = jax.lax.fori_loop(0, nb, block_body, (zero, zero))
            return jnp.stack([hi, lo])

        y = jax.lax.map(row_chunk, row_chunks)          # (nc, 2, chunk, k)
        y_hi = y[:, 0].reshape(-1, k)[:n]
        y_lo = y[:, 1].reshape(-1, k)[:n]
        # ridge + polynomial coupling on the hi part, in df
        lam_prod = _two_prod(jnp.broadcast_to(lam, xw.shape), xw)
        top = df_add((y_hi, y_lo), lam_prod)
        if m:
            pxc = jnp.dot(p, xc, **hp)
            top = df_add(top, df(pxc))
            bot_hi = jnp.dot(p.T, xw, **hp) - tail_reg * xc
            out_hi = jnp.concatenate([top[0], bot_hi], axis=0)
            out_lo = jnp.concatenate(
                [top[1], jnp.zeros_like(bot_hi)], axis=0
            )
        else:
            out_hi, out_lo = top
        # + A x_lo through the f32 sweep (x_lo ~ eps * x_hi)
        alo = f32_mv(x_lo)
        return df_add((out_hi, out_lo), df(alo))

    return matvec


@functools.partial(jax.jit, static_argnames=("matvec_df", "msolve", "maxiter"))
def pminres_df(
    matvec_df: Callable,
    b: jnp.ndarray,
    msolve: Callable[[jnp.ndarray], jnp.ndarray],
    tol: float = 1e-11,
    maxiter: int = 256,
    x0: jnp.ndarray | None = None,
) -> tuple[tuple[jnp.ndarray, jnp.ndarray], SolveReport]:
    """Preconditioned MINRES carried ENTIRELY in double-float vectors.

    Why: f32 PMINRES on the growing (CPD) kernels stalls at a true
    relative residual of eps32 * ||A|| * ||x|| / ||b|| — measured ~5e-2
    at 16k TPS controls, where ||x|| ~ 1e2 ||b|| and kappa ~ 1e7 (the
    1e-3 BACKWARD-error health floor maps to percent-level interpolation
    residual there).  Upgrading only the matvec moved 5.4e-2 -> 4.4e-2
    (measured): the f32 STORAGE of the iterate and Lanczos basis pins
    the same floor (Greenbaum: attainable residual tracks the precision
    of the recurrence, not just of A).  Here every vector — x, the
    Lanczos pair v/v_prev, the update directions w/w_prev, z = M^-1 v —
    is an (hi, lo) pair updated with compensated axpys, and A applies
    through make_saddle_matvec_df_pair (df sweep on hi + f32 sweep on
    lo).  Per-iteration cost stays dominated by the one df kernel sweep;
    the elementwise df vector work is O(N k).

    The preconditioner stays f32 (it only shapes convergence, not the
    attainable accuracy); scalars (Lanczos/Givens coefficients) are f32
    from df dot products — their rounding perturbs the ITERATION, which
    preconditioned MINRES absorbs, not the floor.

    Returns ((x_hi, x_lo), report); the report's residual is evaluated
    through the df matvec — a truthful ruler (the f32 self-evaluation
    cannot see below its own noise floor).
    """
    from facedeform_tpu.ops.dfloat import (
        _df_sum_axis0, _two_prod, df, df_add,
    )

    def df_scale(x, c):
        """(hi, lo) * (k,) f32 row-broadcast scalar, compensated."""
        p, e = _two_prod(x[0], jnp.broadcast_to(c, x[0].shape))
        return p, e + x[1] * c

    def df_dot(x, y):
        """sum_i x_i y_i over axis 0 -> (k,) f32 (df-accurate sum)."""
        p, e = _two_prod(x[0], y[0])
        cross = x[0] * y[1] + x[1] * y[0]
        hi, lo = _df_sum_axis0(p, e + cross)
        return hi + lo

    b = b.astype(jnp.float32)
    n, k = b.shape
    bd = df(b)
    if x0 is not None:
        x0d = (x0[0].astype(jnp.float32), x0[1].astype(jnp.float32)) \
            if isinstance(x0, tuple) else df(x0.astype(jnp.float32))
        ax0 = matvec_df(x0d)
        rd = df_add(bd, (-ax0[0], -ax0[1]))
    else:
        x0d = None
        rd = bd
    z0 = msolve(rd[0] + rd[1])
    zd = df(z0)
    zr = df_dot(zd, rd)
    alive0 = zr > 1e-30
    gamma1 = jnp.where(alive0, jnp.sqrt(jnp.maximum(zr, 1e-30)), 1.0)
    eta0 = jnp.where(alive0, gamma1, 0.0)
    bnorm = jnp.linalg.norm(b, axis=0)
    zero = df(jnp.zeros_like(b))

    state = dict(
        x=zero,
        v=rd, v_prev=zero,
        z=zd,
        gamma=gamma1, gamma_prev=jnp.ones((k,), jnp.float32),
        eta=eta0,
        c1=jnp.ones((k,), jnp.float32), c0=jnp.ones((k,), jnp.float32),
        s1=jnp.zeros((k,), jnp.float32), s0=jnp.zeros((k,), jnp.float32),
        w=zero, w_prev=zero,
        it=jnp.asarray(0, jnp.int32),
        resid=eta0,
        anorm=jnp.zeros((k,), jnp.float32),
    )

    def cond(st):
        return jnp.logical_and(
            st["it"] < maxiter,
            jnp.any(st["resid"] > tol * jnp.maximum(bnorm, 1e-30)),
        )

    def body(st):
        gamma, gamma_prev = st["gamma"], st["gamma_prev"]
        inv_g = 1.0 / gamma
        zj = df_scale(st["z"], inv_g)
        azj = matvec_df(zj)
        delta = df_dot(zj, azj)
        v_new = df_add(
            azj,
            df_add(
                df_scale(st["v"], -delta * inv_g),
                df_scale(st["v_prev"], -gamma / gamma_prev),
            ),
        )
        z_new = df(msolve(v_new[0] + v_new[1]))
        gamma_new = jnp.sqrt(
            jnp.maximum(df_dot(z_new, v_new), 1e-30)
        )

        c1, c0, s1, s0 = st["c1"], st["c0"], st["s1"], st["s0"]
        alpha0 = c1 * delta - c0 * s1 * gamma
        alpha1 = jnp.maximum(
            jnp.sqrt(alpha0 * alpha0 + gamma_new * gamma_new), 1e-30
        )
        alpha2 = s1 * delta + c0 * c1 * gamma
        alpha3 = s0 * gamma
        c1n = alpha0 / alpha1
        s1n = gamma_new / alpha1
        w_new = df_scale(
            df_add(
                zj,
                df_add(
                    df_scale(st["w_prev"], -alpha3),
                    df_scale(st["w"], -alpha2),
                ),
            ),
            1.0 / alpha1,
        )
        x = df_add(st["x"], df_scale(w_new, c1n * st["eta"]))
        eta = -s1n * st["eta"]

        return dict(
            x=x, v=v_new, v_prev=st["v"], z=z_new,
            gamma=gamma_new, gamma_prev=gamma,
            eta=eta, c1=c1n, c0=c1, s1=s1n, s0=s1,
            w=w_new, w_prev=st["w"],
            it=st["it"] + 1,
            resid=jnp.abs(eta),
            anorm=jnp.maximum(
                st["anorm"],
                jnp.sqrt(delta * delta + gamma * gamma
                         + gamma_new * gamma_new),
            ),
        )

    st = jax.lax.while_loop(cond, body, state)
    x = st["x"] if x0d is None else df_add(st["x"], x0d)
    ax = matvec_df(x)
    r_hi, r_lo = df_add(bd, (-ax[0], -ax[1]))
    # ONE compensated self-dot: col_r is the per-column 2-norm, the
    # Frobenius r_norm follows from it (the O((N+m)k) df reduction used
    # to run twice; round-5 review)
    col_r = jnp.sqrt(jnp.maximum(
        df_dot((r_hi, r_lo), (r_hi, r_lo)), 0.0
    ))
    r_norm = jnp.sqrt(jnp.sum(col_r * col_r))
    x_f = x[0] + x[1]
    xnorm = jnp.linalg.norm(x_f, axis=0)
    # same ||A|| correction as f32 pminres: the Lanczos estimate measures
    # the preconditioned operator, not A
    ax_norm = jnp.linalg.norm(ax[0] + ax[1], axis=0)
    anorm = jnp.maximum(
        jnp.max(st["anorm"]),
        jnp.max(ax_norm / jnp.maximum(xnorm, 1e-30)),
    )
    col_scale = anorm * xnorm + jnp.linalg.norm(b, axis=0)
    report = SolveReport(
        residual_norm=r_norm,
        rhs_norm=jnp.linalg.norm(b),
        scale_norm=anorm * jnp.linalg.norm(x_f) + jnp.linalg.norm(b),
        cond_est=None,
        col_backward=col_r / jnp.maximum(col_scale, 1e-30),
    )
    return x, report


# ----------------------------------------------------------------- GMRES
@functools.partial(
    jax.jit, static_argnames=("matvec", "msolve", "restart", "max_restarts")
)
def gmres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    msolve: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    tol: float = 1e-7,
    restart: int = 32,
    max_restarts: int = 16,
    x0: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, SolveReport]:
    """Right-preconditioned restarted GMRES(restart), multi-RHS lockstep.

    For the NON-symmetric QNN system (per-point radii): solves
    A M^-1 u = b, x = M^-1 u.  Arnoldi uses classical Gram-Schmidt with
    one reorthogonalization pass (CGS2 — vectorizes as two matmuls per
    step, numerically comparable to MGS).  The small (restart+1, restart)
    least-squares is solved per column with lstsq on device.

    All RHS columns share matvecs; per-column Hessenberg/progress.
    """
    b = b.astype(jnp.float32)
    n, k = b.shape
    m = restart
    bnorm = jnp.linalg.norm(b, axis=0)                     # (k,)
    if msolve is None:
        def msolve(v):
            return v

    x_init = jnp.zeros_like(b) if x0 is None else x0.astype(jnp.float32)
    # TPU f32 contractions default to bf16 MXU passes (~8e-3 relative) —
    # fatal for Gram-Schmidt orthogonality and the solution reconstruction.
    hp = dict(
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )

    def arnoldi(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r, axis=0)                  # (k,)
        # Dead-column guard: a column converged to ~1e-20 residual makes
        # ||r|| underflow in f32 — dividing by the 1e-30 floor then leaves
        # a ~1e9-scale "unit" vector whose Gram-Schmidt cascade overflows
        # to inf/NaN within a few products.  Zero the basis instead (its
        # Hessenberg column is inert and the update is 0).
        alive0 = beta > 1e-25
        v0 = jnp.where(alive0, r / jnp.maximum(beta, 1e-30), 0.0)
        beta = jnp.where(alive0, beta, 0.0)
        basis = jnp.zeros((m + 1, n, k), jnp.float32).at[0].set(v0)
        hess = jnp.zeros((m + 1, m, k), jnp.float32)

        def step(j, carry):
            basis, hess = carry
            w = matvec(msolve(basis[j]))
            # CGS2: rows > j of `basis` are zero, so the full-matrix
            # projections are exact for the active prefix.
            h1 = jnp.einsum("ink,nk->ik", basis, w, **hp)  # (m+1, k)
            w = w - jnp.einsum("ink,ik->nk", basis, h1, **hp)
            h2 = jnp.einsum("ink,nk->ik", basis, w, **hp)
            w = w - jnp.einsum("ink,ik->nk", basis, h2, **hp)
            h = h1 + h2
            hlast = jnp.linalg.norm(w, axis=0)             # (k,)
            # Arnoldi breakdown guard: once the residual is fully captured
            # (early convergence within a restart window), w collapses to
            # ~0 and dividing by a denormal norm manufactures inf/NaN —
            # emit a zero vector instead (its Hessenberg column is inert).
            alive = hlast > 1e-20
            w = jnp.where(alive, w / jnp.maximum(hlast, 1e-30), 0.0)
            hlast = jnp.where(alive, hlast, 0.0)
            h = h.at[j + 1].set(hlast)
            basis = basis.at[j + 1].set(w)
            hess = hess.at[:, j].set(h)
            return basis, hess

        basis, hess = jax.lax.fori_loop(0, m, step, (basis, hess))
        return basis, hess, beta

    def lstsq_update(basis, hess, beta):
        # min_y || beta e1 - H y || per column via normal equations on the
        # tiny (m+1, m) Hessenberg (well-conditioned: columns have unit-ish
        # scale after Arnoldi).
        hT = jnp.transpose(hess, (2, 1, 0))                # (k, m, m+1)
        g = jnp.zeros((k, m + 1, 1), jnp.float32).at[:, 0, 0].set(beta)
        hth = jnp.einsum("kij,kmj->kim", hT, hT, **hp) + 1e-12 * jnp.eye(m)
        htg = jnp.einsum("kij,kjo->kio", hT, g, **hp)
        # the tiny solve's INTERNAL matmuls need the precision scope too:
        # jnp.linalg.solve takes no precision= and its blocked updates
        # default to bf16 MXU passes — the comment above already calls
        # that fatal for the reconstruction (round-5 review finding)
        with jax.default_matmul_precision("highest"):
            y = jnp.linalg.solve(hth, htg)[..., 0]         # (k, m)
        dx = jnp.einsum("ink,ki->nk", basis[:m], y, **hp)
        return msolve(dx)

    def restart_body(st):
        basis, hess, beta = arnoldi(st["x"])
        x = st["x"] + lstsq_update(basis, hess, beta)
        r = b - matvec(x)
        # ||A||_F proxy from the Hessenberg (H = V^T A M^-1 V extract).
        anorm = jnp.maximum(
            st["anorm"], jnp.max(jnp.linalg.norm(hess, axis=(0, 1)))
        )
        return dict(
            x=x, resid=jnp.linalg.norm(r, axis=0),
            it=st["it"] + 1, anorm=anorm,
        )

    def cond(st):
        return jnp.logical_and(
            st["it"] < max_restarts,
            jnp.any(st["resid"] > tol * jnp.maximum(bnorm, 1e-30)),
        )

    # Warm starts compute the true initial residual (one matvec) so an
    # already-converged x0 exits without paying a full restart window of
    # ~restart matvecs; cold starts know it is ||b||.
    resid0 = (
        bnorm if x0 is None
        else jnp.linalg.norm(b - matvec(x_init), axis=0)
    )
    st = jax.lax.while_loop(
        cond,
        restart_body,
        dict(
            x=x_init, resid=resid0,
            it=jnp.asarray(0, jnp.int32),
            anorm=jnp.zeros((), jnp.float32),
        ),
    )
    x = st["x"]
    r_final = b - matvec(x)
    xnorm = jnp.linalg.norm(x, axis=0)
    # anorm from the preconditioned Hessenberg underestimates ||A||; take
    # the max with the per-column Rayleigh-style bound ||Ax|| / ||x||.
    ax_norm = jnp.linalg.norm(b - r_final, axis=0)
    anorm = jnp.maximum(
        st["anorm"], jnp.max(ax_norm / jnp.maximum(xnorm, 1e-30))
    )
    col_scale = anorm * xnorm + jnp.linalg.norm(b, axis=0)
    report = SolveReport(
        residual_norm=jnp.linalg.norm(r_final),
        rhs_norm=jnp.linalg.norm(b),
        scale_norm=anorm * jnp.linalg.norm(x) + jnp.linalg.norm(b),
        cond_est=None,
        col_backward=jnp.linalg.norm(r_final, axis=0)
        / jnp.maximum(col_scale, 1e-30),
    )
    return x, report


@functools.partial(jax.jit, static_argnames=("matvec", "maxiter"))
def minres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    tol: float = 1e-7,
    maxiter: int = 256,
    x0: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, SolveReport]:
    """MINRES for symmetric (possibly indefinite) systems, multi-RHS.

    All Lanczos/Givens scalars carry a trailing (k,) axis so the RHS
    columns iterate in lockstep (one matvec per iteration serves all k).
    Stops at maxiter (jit-static); the returned report carries the true
    final residual for host-side health checks.  An optional warm start
    x0 restarts the Krylov space on the current residual (used by fit's
    correction sweeps to recover f32 Lanczos drift).
    """
    b = b.astype(jnp.float32)
    n, k = b.shape
    b_full = b
    if x0 is not None:
        b = b - matvec(x0.astype(jnp.float32))
    bnorm = jnp.linalg.norm(b_full, axis=0)  # (k,): stop relative to the full rhs

    beta1 = jnp.linalg.norm(b, axis=0)
    safe_beta1 = jnp.where(beta1 > 0, jnp.maximum(beta1, 1e-30), 1.0)

    # Standard MINRES recurrence (Paige & Saunders), per-column scalars (k,).
    state = dict(
        x=jnp.zeros_like(b),
        v=b / safe_beta1,                     # v_j
        v_prev=jnp.zeros_like(b),             # v_{j-1}
        beta=beta1,                           # beta_j
        eta=beta1,
        gamma1=jnp.ones((k,), jnp.float32),   # c_{j-1}
        gamma0=jnp.ones((k,), jnp.float32),   # c_{j-2}
        sigma1=jnp.zeros((k,), jnp.float32),  # s_{j-1}
        sigma0=jnp.zeros((k,), jnp.float32),  # s_{j-2}
        w=jnp.zeros_like(b),                  # w_{j-1}
        w_old=jnp.zeros_like(b),              # w_{j-2}
        it=jnp.asarray(0, jnp.int32),
        resid=beta1,
        # running ||A||_2 estimate (Paige/Saunders: max_j ||T e_j||),
        # feeds the backward-error denominator in the report
        anorm=jnp.zeros((k,), jnp.float32),
    )

    def cond(st):
        return jnp.logical_and(
            st["it"] < maxiter,
            jnp.any(st["resid"] > tol * jnp.maximum(bnorm, 1e-30)),
        )

    def body(st):
        v, v_prev, beta = st["v"], st["v_prev"], st["beta"]
        av = matvec(v)
        alpha = jnp.sum(v * av, axis=0)                      # (k,)
        av = av - alpha * v - beta * v_prev
        beta_new = jnp.linalg.norm(av, axis=0)
        v_new = av / jnp.maximum(beta_new, 1e-30)

        gamma1, gamma0 = st["gamma1"], st["gamma0"]
        sigma1, sigma0 = st["sigma1"], st["sigma0"]
        delta = gamma1 * alpha - gamma0 * sigma1 * beta
        rho1 = jnp.maximum(jnp.sqrt(delta * delta + beta_new * beta_new), 1e-30)
        rho2 = sigma1 * alpha + gamma0 * gamma1 * beta
        rho3 = sigma0 * beta
        gamma2 = delta / rho1
        sigma2 = beta_new / rho1

        w_new = (v - rho3 * st["w_old"] - rho2 * st["w"]) / rho1
        x = st["x"] + (gamma2 * st["eta"]) * w_new
        eta = -sigma2 * st["eta"]

        return dict(
            x=x, v=v_new, v_prev=v, beta=beta_new, eta=eta,
            gamma1=gamma2, gamma0=gamma1, sigma1=sigma2, sigma0=sigma1,
            w=w_new, w_old=st["w"],
            it=st["it"] + 1,
            resid=jnp.abs(eta),
            anorm=jnp.maximum(
                st["anorm"],
                jnp.sqrt(alpha * alpha + beta * beta + beta_new * beta_new),
            ),
        )

    st = jax.lax.while_loop(cond, body, state)
    x = st["x"] if x0 is None else st["x"] + x0.astype(jnp.float32)
    r_final = b_full - matvec(x)
    anorm = jnp.max(st["anorm"])
    # Report against the FULL rhs: on warm restarts b was shifted to the
    # correction rhs, whose tiny norm would corrupt rhs_norm/backward_error.
    col_scale = anorm * jnp.linalg.norm(x, axis=0) + jnp.linalg.norm(
        b_full, axis=0
    )
    report = SolveReport(
        residual_norm=jnp.linalg.norm(r_final),
        rhs_norm=jnp.linalg.norm(b_full),
        scale_norm=anorm * jnp.linalg.norm(x) + jnp.linalg.norm(b_full),
        cond_est=None,  # no factorization to read a growth indicator from
        col_backward=jnp.linalg.norm(r_final, axis=0)
        / jnp.maximum(col_scale, 1e-30),
    )
    return x, report
