"""Double-float (compensated f32) dense evaluation for growing kernels.

TPS/MQ/linear/cubic kernels grow with distance, so the solved weights
carry ||w|| orders of magnitude above the displacement they produce
(measured sum|w| ~ 3.5e4 for TPS @ 4k controls, displacement ~ 0.05).  An
f32 evaluation then loses the 5e-5 parity budget three separate ways —
phi rounding (~3e-4 displacement error at 4k), w storage rounding, and
contraction cancellation.  The reference never sees this because ALGLIB/
Eigen run in C++ doubles (/root/reference/src/dbse.cpp:31, ALGLIB
internals).  TPUs have no f64, so this path emulates it with double-float
arithmetic: every value is an (hi, lo) pair of f32 with value hi + lo and
|lo| <= ulp(hi)/2, giving ~2^-45 effective relative precision at ~10x the
VPU ops of the plain path — still far cheaper than host evaluation, and
only selected for the kernels/sizes that need it (Deformer.apply "auto").

The weights' own lo parts come from ops.solve.lu_solve_refined_df; without
them (e.g. Krylov-path fits) the eval-side error is still removed and the
w-storage term remains (documented).

All primitives are the classic error-free transforms (Knuth TwoSum, Dekker
split products) — the same machinery ops/solve.py uses for compensated
residuals — vectorized over arrays and fully XLA-fusable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.assemble import poly_basis
from facedeform_tpu.ops.fit import RBFModel
from facedeform_tpu.ops.dfloat import (
    _df_sum_axis0,
    _phi_df,
    _sqdist_df,
    _two_prod,
    df,
    df_add,
    df_mul,
    df_recip,
)

# Kernels whose growth makes f32 evaluation budget-breaking at scale.
GROWING_KERNELS = (
    RBFKernel.THIN_PLATE,
    RBFKernel.MULTIQUADRIC,
    RBFKernel.LINEAR,
    RBFKernel.CUBIC,
)

# ------------------------------------------------------------- evaluation
@functools.partial(
    jax.jit, static_argnames=("kernel", "term", "chunk", "ctrl_block")
)
def evaluate_precise(
    model: RBFModel,
    points: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    chunk: int = 512,
    ctrl_block: int = 512,
) -> jnp.ndarray:
    """Displacement at `points` (V, 3) -> (V, 3) in double-float.

    Semantics match ops.evaluate.evaluate to ~2^-45 relative: phi computed
    in df (exact-difference distances, df log/sqrt), contracted against
    df weights (w_rbf + w_rbf_lo) with exact split products and a
    compensated tree reduction per control block, df-accumulated across
    blocks.  Cites the doubles the reference gets for free from
    Eigen/ALGLIB (/root/reference/src/dbse.cpp:31).
    """
    kernel = RBFKernel(kernel)
    points = points.astype(jnp.float32)
    v = points.shape[0]
    n = model.ctrl.shape[0]
    n_layers = model.w_rbf.shape[0]

    w_lo = model.w_rbf_lo
    if w_lo is None:
        w_lo = jnp.zeros_like(model.w_rbf)
    wp_lo = model.w_poly_lo
    if wp_lo is None:
        wp_lo = jnp.zeros_like(model.w_poly)

    n_pad = (-n) % ctrl_block
    ctrl = jnp.pad(model.ctrl, ((0, n_pad), (0, 0)))
    w_hi_all = jnp.pad(model.w_rbf, ((0, 0), (0, n_pad), (0, 0)))
    w_lo_all = jnp.pad(w_lo, ((0, 0), (0, n_pad), (0, 0)))
    inv_eps2 = []
    for layer in range(n_layers):
        eps = model.eps[layer]
        eps2 = _two_prod(eps, eps)
        inv = df_recip(eps2)
        inv_eps2.append(
            (jnp.pad(inv[0], (0, n_pad), constant_values=1.0),
             jnp.pad(inv[1], (0, n_pad)))
        )
    nb = ctrl.shape[0] // ctrl_block

    def eval_chunk(pts):
        c = pts.shape[0]

        def block_body(b, acc):
            acc_hi, acc_lo = acc
            lo_idx = b * ctrl_block
            cblk = jax.lax.dynamic_slice(
                ctrl, (lo_idx, 0), (ctrl_block, 3)
            )
            d2 = _sqdist_df(pts, cblk)                       # df (c, B)
            out_hi = acc_hi
            out_lo = acc_lo
            for layer in range(n_layers):
                ie_hi = jax.lax.dynamic_slice(
                    inv_eps2[layer][0], (lo_idx,), (ctrl_block,)
                )[None, :]
                ie_lo = jax.lax.dynamic_slice(
                    inv_eps2[layer][1], (lo_idx,), (ctrl_block,)
                )[None, :]
                s = df_mul(d2, (ie_hi, ie_lo))
                phi = _phi_df(kernel, s)                     # df (c, B)
                w_hi = jax.lax.dynamic_slice(
                    w_hi_all, (layer, lo_idx, 0), (1, ctrl_block, 3)
                )[0]
                w_l = jax.lax.dynamic_slice(
                    w_lo_all, (layer, lo_idx, 0), (1, ctrl_block, 3)
                )[0]
                # exact main products phi_hi * w_hi, tree-summed over B
                p, e = _two_prod(
                    phi[0].T[:, :, None], w_hi[:, None, :]
                )                                            # (B, c, 3)
                s_hi, s_lo = _df_sum_axis0(p, e)
                # cross terms are <= u relative — plain f32 matmuls
                hp = dict(
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                cross = (
                    jnp.dot(phi[0], w_l, **hp)
                    + jnp.dot(phi[1], w_hi + w_l, **hp)
                )
                out_hi, out_lo = df_add(
                    (out_hi, out_lo),
                    df_add((s_hi, s_lo), df(cross)),
                )
            return out_hi, out_lo

        zero = jnp.zeros((c, 3), jnp.float32)
        disp_hi, disp_lo = jax.lax.fori_loop(
            0, nb, block_body, (zero, zero)
        )

        # polynomial tail in df (4 terms, cheap)
        if model.w_poly.shape[0] > 0:
            basis = poly_basis(pts, term)                    # (c, m)
            for j in range(model.w_poly.shape[0]):
                wj = (model.w_poly[j][None, :], wp_lo[j][None, :])
                p, e = _two_prod(basis[:, j:j + 1], wj[0])
                contrib = df_add((p, e), df(basis[:, j:j + 1] * wj[1]))
                disp_hi, disp_lo = df_add((disp_hi, disp_lo), contrib)
        return disp_hi + disp_lo

    if v <= chunk:
        return eval_chunk(points)
    pad = (-v) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    out = jax.lax.map(eval_chunk, pts.reshape(-1, chunk, 3))
    return out.reshape(-1, 3)[:v]
