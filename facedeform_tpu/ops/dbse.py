"""DBSE — Direct Blendshape Edit / morph-space projection (component F).

The reference (dbse.cpp) builds a blendshape delta matrix B in R^{3V x S}
(dbse.cpp:18-30), Householder-QR-factorizes it (dbse.cpp:31), then derives
per-shape weights and reconstructs P = rest + sum_s B[:, s] * clamp(3 w_s)
(dbse.cpp:60-75, applied at src/SOP_FaceDeform.cpp:460-472).

Two weight paths (SURVEY.md quirk 3):

  * lstsq (default, BASELINE config 4): a genuine least-squares fit
        w = argmin ||B w - d||_2
    solved via the S x S normal equations on device (S is small — the
    shape count — so Gram assembly is one HIGHEST-precision einsum and the
    solve is ops.solve.cholesky_solve_refined).  Reconstruction uses w
    directly (no magic x3).

  * parity: reproduces the reference's actual (buggy) computation —
    column sums of the delta-scaled *packed* Householder QR factor
        w = sum_i d_i * QRpacked[i, s]          (dbse.cpp:53-55)
    followed by the x3 scaling at reconstruction (dbse.cpp:69).  The packed
    factor (R in the upper triangle, essential Householder vectors below)
    is built host-side in f64 with Eigen's exact HouseholderQR pivot-free
    convention, then pushed to device as a constant.

Batched poses: weights_lstsq vmaps over a leading pose axis — the
"least-squares fit over multiple scanned poses" of BASELINE config 4.

Rebuild extension (cfg.dbse_robust): weights_robust runs Huber-IRLS on the
same Gram solve so scan outliers (occlusion holes, marker glints) can't
drag the shape weights — the robustness the reference's raw QR projection
lacks entirely.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facedeform_tpu.ops.solve import SolveReport, cholesky_solve_refined

_HP = dict(preferred_element_type=jnp.float32)


def householder_packed(b: np.ndarray) -> np.ndarray:
    """Eigen-convention HouseholderQR packed factor of b (M, S), float64.

    Matches Eigen::HouseholderQR::matrixQR() (dbse.cpp:31 + dbse.hpp:12):
    column j holds beta_j on the diagonal, R above, and the *essential*
    part of the Householder vector (implicit leading 1) below.
    """
    a = np.array(b, dtype=np.float64, copy=True)
    m, s = a.shape
    for j in range(min(m - 1, s)):
        c0 = a[j, j]
        tail = a[j + 1 :, j]
        tail_sq = float(tail @ tail)
        if tail_sq == 0.0:
            continue  # beta = c0, tau = 0, essential = 0 — nothing to do
        beta = np.sqrt(c0 * c0 + tail_sq)
        if c0 >= 0.0:
            beta = -beta
        essential = tail / (c0 - beta)
        tau = (beta - c0) / beta
        # Apply H = I - tau v v^T to the trailing columns (v = [1; essential]).
        if j + 1 < s:
            block = a[j:, j + 1 :]
            v = np.concatenate([[1.0], essential])
            block -= tau * np.outer(v, v @ block)
        a[j, j] = beta
        a[j + 1 :, j] = essential
    return a


class DBSEModel(NamedTuple):
    """Device-resident blendshape basis.

    deltas: (S, V, 3) per-shape displacement fields (B reshaped);
    packed_qr: (3V, S) Eigen-style packed factor (parity path) or a (1, S)
    zero placeholder when running the lstsq path.
    """

    deltas: jnp.ndarray
    packed_qr: jnp.ndarray


def build_model(
    rest_points: np.ndarray,
    shapes: Sequence[np.ndarray],
    parity: bool = False,
) -> DBSEModel:
    """Assemble the blendshape delta basis (dbse.cpp:9-35).

    Shapes whose point count mismatches the rest mesh must be filtered by
    the caller (the node layer warns and skips them, mirroring
    src/SOP_FaceDeform.cpp:201-204).
    """
    rest = np.asarray(rest_points, np.float64)
    deltas = np.stack([np.asarray(s, np.float64) - rest for s in shapes])  # (S, V, 3)
    s, v, _ = deltas.shape
    if parity:
        b = deltas.reshape(s, 3 * v).T  # (3V, S), interleaved xyz like dbse.cpp:26-28
        packed = householder_packed(b).astype(np.float32)
    else:
        packed = np.zeros((1, s), np.float32)
    return DBSEModel(
        deltas=jnp.asarray(deltas, jnp.float32),
        packed_qr=jnp.asarray(packed),
    )


@functools.partial(jax.jit, static_argnames=("n_refine",))
def weights_lstsq(
    model: DBSEModel,
    current: jnp.ndarray,
    rest: jnp.ndarray,
    ridge: float = 1e-6,
    n_refine: int = 2,
) -> tuple[jnp.ndarray, SolveReport]:
    """Least-squares blendshape weights for one pose.

    d = (current - rest) flattened; w = (B^T B + ridge*tr/S I)^-1 B^T d.
    The Gram matrix is S x S — assembly is the only O(V) work and it's a
    single fused einsum.
    """
    d = (current - rest).astype(jnp.float32)  # (V, 3)
    g = jnp.einsum(
        "svc,tvc->st", model.deltas, model.deltas,
        precision=jax.lax.Precision.HIGHEST, **_HP,
    )
    c = jnp.einsum(
        "svc,vc->s", model.deltas, d,
        precision=jax.lax.Precision.HIGHEST, **_HP,
    )
    s = g.shape[0]
    reg = ridge * jnp.trace(g) / s + 1e-30
    w, report = cholesky_solve_refined(
        g + reg * jnp.eye(s, dtype=g.dtype), c[:, None], n_refine=n_refine
    )
    return w[:, 0], report


@jax.jit
def weights_parity(
    model: DBSEModel, current: jnp.ndarray, rest: jnp.ndarray
) -> jnp.ndarray:
    """The reference's column-sum weights (dbse.cpp:53-55), verbatim:
    w_s = sum_i d_i * packedQR[i, s] with d the interleaved-xyz delta."""
    d = (current - rest).astype(jnp.float32).reshape(-1)  # (3V,)
    return jnp.dot(
        d, model.packed_qr, precision=jax.lax.Precision.HIGHEST, **_HP
    )


def huber_scale(r: jnp.ndarray) -> jnp.ndarray:
    """Huber threshold delta from nonnegative residual norms r (V,).

    delta = 1.345 * sigma_hat with sigma_hat the MAD scale estimate
    (1.4826 * median |r - median r|) — the textbook 95%-Gaussian-efficiency
    tuning.  When the MAD collapses (over half the vertices fit exactly,
    e.g. a pose that only moves the jaw) the floor 1e-3 * mean(r) keeps
    delta > 0; a uniform u rescale cancels between Gram and RHS, so the
    floor can only ever push the iteration TOWARD plain least squares,
    never corrupt it.
    """
    med = jnp.median(r)
    sigma = 1.4826 * jnp.median(jnp.abs(r - med))
    return jnp.maximum(1.345 * sigma, 1e-3 * jnp.mean(r))


def huber_vertex_weights(r: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """IRLS per-vertex weights u_v = psi(r)/r for the Huber loss:
    1 inside the threshold, delta/r beyond it (r = 0 safely maps to 1)."""
    return jnp.where(r <= delta, 1.0, delta / jnp.maximum(r, 1e-20))


@functools.partial(jax.jit, static_argnames=("n_iter", "n_refine"))
def weights_robust(
    model: DBSEModel,
    current: jnp.ndarray,
    rest: jnp.ndarray,
    ridge: float = 1e-6,
    n_iter: int = 4,
    n_refine: int = 2,
) -> tuple[jnp.ndarray, SolveReport]:
    """Huber-IRLS blendshape weights — robust to scan outliers.

    The DBSE workflow's input is a scanned pose (BASELINE config 4), and
    scans carry gross outliers: occlusion holes, marker glints, stray
    reconstruction spikes.  The reference's plain least squares
    (dbse.cpp:31-55) lets a handful of bad vertices drag every shape
    weight; this minimizes sum_v huber(||B_v w - d_v||) instead, by
    iteratively reweighted least squares on the same S x S Gram solve:

        u_v = min(1, delta / r_v)   (Huber psi/r, delta re-estimated
                                     each sweep from the residual MAD)
        w   = solve(B^T U B + reg,  B^T U d)

    n_iter reweight sweeps after the plain-lstsq init (unrolled in the
    trace — each sweep is one O(V S^2) fused einsum pair plus the tiny
    refined Cholesky).  Written in pure collective-free jnp so GSPMD
    shards it transparently when the inputs arrive device-sharded; the
    explicit-mesh variant lives in parallel/dbse_sharded.weights_robust_sharded.
    """
    d = (current - rest).astype(jnp.float32)  # (V, 3)
    deltas = model.deltas
    s = deltas.shape[0]
    eye = jnp.eye(s, dtype=jnp.float32)
    hp = dict(precision=jax.lax.Precision.HIGHEST, **_HP)

    def solve(u):
        g = jnp.einsum("svc,v,tvc->st", deltas, u, deltas, **hp)
        c = jnp.einsum("svc,v,vc->s", deltas, u, d, **hp)
        reg = ridge * jnp.trace(g) / s + 1e-30
        return cholesky_solve_refined(
            g + reg * eye, c[:, None], n_refine=n_refine
        )

    u = jnp.ones(d.shape[0], jnp.float32)
    w, report = solve(u)
    for _ in range(n_iter):
        r = jnp.linalg.norm(
            jnp.einsum("s,svc->vc", w[:, 0], deltas, **hp) - d, axis=1
        )
        u = huber_vertex_weights(r, huber_scale(r))
        w, report = solve(u)
    return w[:, 0], report


def weights_robust_batched(
    model: DBSEModel, poses: jnp.ndarray, rest: jnp.ndarray, ridge: float = 1e-6
) -> tuple[jnp.ndarray, SolveReport]:
    """(F, V, 3) scanned poses -> (F, S) Huber-IRLS weights; report leaves
    carry a leading frame axis (check with errors.frames_solve_ok)."""
    return jax.vmap(lambda p: weights_robust(model, p, rest, ridge))(poses)


def weights_lstsq_batched(
    model: DBSEModel, poses: jnp.ndarray, rest: jnp.ndarray, ridge: float = 1e-6
) -> tuple[jnp.ndarray, SolveReport]:
    """(F, V, 3) scanned poses -> (F, S) weights (BASELINE config 4).

    The returned SolveReport's leaves carry a leading frame axis; check it
    with errors.frames_solve_ok (per-frame mask), not check_solve.
    """
    return jax.vmap(lambda p: weights_lstsq(model, p, rest, ridge))(poses)


def weights_parity_batched(
    model: DBSEModel, poses: jnp.ndarray, rest: jnp.ndarray
) -> jnp.ndarray:
    """(F, V, 3) poses -> (F, S) reference-recipe weights (dbse.cpp:53-55)."""
    return jax.vmap(lambda p: weights_parity(model, p, rest))(poses)


@functools.partial(jax.jit, static_argnames=("parity_scale",))
def reconstruct(
    model: DBSEModel,
    weights: jnp.ndarray,
    clamp: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    parity_scale: bool,
) -> jnp.ndarray:
    """Displacement field from weights: sum_s deltas[s] * cw_s (dbse.cpp:60-75).

    parity_scale applies the reference's magic x3 (dbse.cpp:69); clamping
    (doclampweight/weightrange, src/SOP_FaceDeform.cpp:454-458) applies to
    the scaled weight, matching SYSclamp(w, lo, hi) at dbse.cpp:71.
    A None clamp changes the pytree structure, so jit re-specializes on it.

    Accepts leading batch axes on weights: (S,) -> (V, 3), and an animated
    shot's (F, S) -> (F, V, 3) in one HIGHEST-precision einsum.
    """
    w = weights * 3.0 if parity_scale else weights
    if clamp is not None:
        lo, hi = clamp
        w = jnp.clip(w, lo, hi)
    return jnp.einsum(
        "...s,svc->...vc", w.astype(jnp.float32), model.deltas,
        precision=jax.lax.Precision.HIGHEST, **_HP,
    )


def morph_apply(
    model: DBSEModel,
    positions: jnp.ndarray,
    rest: jnp.ndarray,
    weights: jnp.ndarray,
    cfg,
    params,
) -> jnp.ndarray:
    """Shared morph-stage tail: clamp setup -> reconstruct -> morph_pass.

    The single-frame node stage (node.py cook) and the animated-shot batch
    path (cli deform-seq --batch) both route through here, so the clamp
    tuple construction, the parity x3 scale, and the dofalloff-gated
    falloffradius residual (src/SOP_FaceDeform.cpp:454-472) stay locked
    together.  positions/weights may carry a leading frame axis:
    (F, V, 3) with (F, S) morphs a whole shot.
    """
    clamp = None
    if cfg.doclampweight:
        clamp = (jnp.asarray(params.weight_lo), jnp.asarray(params.weight_hi))
    disp = reconstruct(model, weights, clamp, parity_scale=not cfg.dbse_lstsq)
    return morph_pass(
        positions, rest, disp,
        jnp.asarray(bool(cfg.dofalloff)),
        jnp.asarray(float(params.falloffradius), jnp.float32),
    )


@jax.jit
def morph_pass(
    positions: jnp.ndarray,
    rest: jnp.ndarray,
    disp: jnp.ndarray,
    dofalloff: jnp.ndarray,
    falloffradius: jnp.ndarray,
) -> jnp.ndarray:
    """The morph-space position update (src/SOP_FaceDeform.cpp:460-472):

        P = rest + disp [+ (P_current - rest) * falloffradius]

    The bracketed residual term only fires when dofalloff is on and
    falloffradius != 0 (:467-470) — the reference's falloffradius is
    morph-space-only despite its name (SURVEY.md quirk 5).

    Broadcasts over a leading frame axis: (F, V, 3) positions/disp with
    (V, 3) rest morph a whole shot in one call.
    """
    residual = (positions - rest) * falloffradius
    use = jnp.logical_and(dofalloff, falloffradius != 0.0)
    return rest + disp + jnp.where(use, residual, 0.0)
