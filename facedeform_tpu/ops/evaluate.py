"""Dense XLA evaluation path: displacement of arbitrary points under an RBFModel.

The reference's hottest loop is the per-vertex rbfcalc sweep
(src/SOP_FaceDeform.cpp:404-439).  The rebuild evaluates all vertices at once
as matmuls — phi(V, N) @ w(N, 3) on the MXU — chunked along V so the kernel
matrix never materializes at full (V, N) size in HBM.

This is the portable path (CPU tests / any backend / reverse-mode autodiff);
ops/pallas_eval.py provides the fused TPU kernel for peak throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.assemble import poly_basis
from facedeform_tpu.ops.fit import RBFModel
from facedeform_tpu.ops.kernels import apply_kernel, pairwise_sqdist


def _center_phi(kernel: RBFKernel, term: PolyTerm) -> bool:
    """Centering is valid only under the sum(w) = 0 tail constraint and
    only pays off for kernels that grow with distance (decaying kernels
    like gaussian/IMQ/wendland have no large-term cancellation)."""
    return PolyTerm(term) != PolyTerm.ZERO and RBFKernel(kernel) in (
        RBFKernel.THIN_PLATE,
        RBFKernel.MULTIQUADRIC,
        RBFKernel.LINEAR,
        RBFKernel.CUBIC,
    )


def evaluate_block(
    model: RBFModel,
    points: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
) -> jnp.ndarray:
    """Displacement at `points` (V, 3) -> (V, 3); materializes phi (V, N)."""
    d2 = pairwise_sqdist(points.astype(jnp.float32), model.ctrl)  # (V, N)
    # eps: (L, N) -> broadcast over the V axis.
    phi = apply_kernel(kernel, d2[None, :, :], model.eps[:, None, :])  # (L, V, N)
    if _center_phi(kernel, term):
        # The polynomial-tail constraint P^T w = 0 includes a ones row, so
        # sum_j w_j = 0 and any per-row constant can be subtracted from phi
        # without changing the result.  Centering shrinks the cancelling
        # terms of growing kernels (MQ/TPS carry |w| >> |disp|), cutting
        # f32 summation error severalfold.  Only layer 0 carries the tail
        # constraint (fit.py attaches the tail to the first layer only).
        phi0 = phi[0] - jnp.mean(phi[0], axis=-1, keepdims=True)
        phi = jnp.concatenate([phi0[None], phi[1:]], axis=0)
    disp = jnp.einsum(
        "lvn,lnc->vc", phi, model.w_rbf,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if model.w_poly.shape[0] > 0:
        disp = disp + jnp.dot(
            poly_basis(points.astype(jnp.float32), term),
            model.w_poly,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return disp


@functools.partial(jax.jit, static_argnames=("kernel", "term", "chunk"))
def evaluate(
    model: RBFModel,
    points: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    chunk: int = 65536,
) -> jnp.ndarray:
    """Chunked dense evaluation; bounds scratch to chunk*N f32 per step.

    V is padded to a multiple of `chunk` and swept with lax.map so XLA
    compiles a single chunk program regardless of V.
    """
    v = points.shape[0]
    if v <= chunk:
        return evaluate_block(model, points, kernel, term)
    pad = (-v) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pts = pts.reshape(-1, chunk, 3)
    out = jax.lax.map(
        lambda p: evaluate_block(model, p, kernel, term), pts
    )
    return out.reshape(-1, 3)[:v]
