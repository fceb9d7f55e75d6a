"""Matrix-free MINRES: RBF solves past the dense-factorization limit.

XLA's LU panel factorization runs out of VMEM near N ~ 16k controls, and a
dense (N, N) system stops fitting HBM long before truly large rigs (N=100k
-> 40 GB).  The scalable path never materializes the system: MINRES
(Paige & Saunders, symmetric indefinite — exactly our saddle-point shape
[[Phi + lam I, P], [P^T, -delta I]] when radii are shared) driven by a
chunked kernel matvec

    (A x)_i = sum_j phi(|c_i - c_j| / eps) x_j + lam x_i + (P c)_i

computed with the same fused distance->phi->contract structure as the eval
path, O(chunk x N) memory.  Per-iteration cost is one N^2 kernel sweep, so
a 100k-control solve is ~1e10 evals/iteration — seconds on a v5e.

Used by ops.fit for MULTILAYER/KERNEL models above the dense threshold
(QNN's per-point radii make the system non-symmetric; its dense limit is
documented instead).
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
    col_scale = anorm * jnp.linalg.norm(x, axis=0) + jnp.linalg.norm(b, axis=0)
    report = SolveReport(
        residual_norm=jnp.linalg.norm(r_final),
        rhs_norm=jnp.linalg.norm(b),
        scale_norm=anorm * jnp.linalg.norm(x) + jnp.linalg.norm(b),
        cond_est=None,  # no factorization to read a growth indicator from
        col_backward=jnp.linalg.norm(r_final, axis=0)
        / jnp.maximum(col_scale, 1e-30),
    )
    return x, report
