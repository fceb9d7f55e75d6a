"""Pose-space deformation (PSD): sculpted corrections driven by rig pose.

Extension over the reference: symek/facedeform interpolates marker
displacements over the mesh (one pose at a time); production face rigs
additionally need *sculpt corrections* — an artist poses the rig, sculpts
the mesh the deformer got wrong, and expects that fix to (a) reproduce
exactly whenever the rig hits that pose again and (b) blend smoothly into
nearby poses.  That is classic pose-space deformation (Lewis/Cordner/Fong,
SIGGRAPH 2000), and it is the natural companion of the reference's
marker-RBF deform (src/SOP_FaceDeform.cpp:330-439): the same RBF
machinery, applied in POSE space instead of model space.

Design (TPU-first, reusing the owned RBF stack):

* A pose is described by the rig displacement flattened to a feature
  vector f = (posed_rig - rest_rig).ravel() in R^(3N) — translation of
  the whole rig IS a pose change for tracked markers, so no gauge fixing.
* K example poses give features F (K, D) and correction fields
  C (K, V, 3) = sculpt_k - full_pipeline_output(pose_k).  The corrections
  absorb everything the base pipeline does at the example poses (capture
  gating, tangent projection, morph pass), so adding the interpolated
  correction on top reproduces each sculpt EXACTLY at its own pose.
* Cardinal RBF interpolation in pose space: solve
  (Phi + lam I) A = I_K with Phi_jk = phi(|f_j - f_k| / eps) — the same
  kernel zoo (ops/kernels.py) and compensated LU (ops/solve.py) as the
  model-space fit; K is small (tens), so the solve is trivial next to the
  mesh eval.  Weights at a query pose q: w = phi_q @ A, with
  w(f_j) = e_j by construction (exact sculpt reproduction at lam = 0).
* The mesh-space apply is one (K) x (K, 3V) contraction — an
  MXU-friendly matvec streaming the corrections once from HBM.

Default kernel is GAUSSIAN (positive definite, so lam = 0 is solvable and
weights fade to zero far from every example — corrections never leak into
unrelated poses).  `normalize=True` rescales weights toward partition of
unity where their sum is significant (Sloan/Rose-style normalized RBF),
fading smoothly to the raw weights where all examples are out of reach.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facedeform_tpu.config import RBFKernel
from facedeform_tpu.ops.kernels import apply_kernel, kernel_is_pd
from facedeform_tpu.ops.solve import SolveReport, lu_solve_refined

_HIGHEST = jax.lax.Precision.HIGHEST

# Host-vs-device apply routing for node cooks.  The host route caches a
# (K, V, 3) host copy of the corrections and contracts with host BLAS —
# per-cook it beats the device route on a tunneled runtime (K scalars up
# vs a ~12 MB/1M-vert (V, 3) pull at the tunnel's ~8-17 MB/s ≈ 1 s), but
# the cache duplicates the whole tensor in host RAM (192 MB at 1M × 16).
# Above this budget the node keeps corrections device-resident (sharded
# over mesh_devices when given) and pays the one (V, 3) pull per cook.
PSD_HOST_BYTES_MAX = 128 * 2**20


def psd_apply_on_host(n_examples: int, n_verts: int) -> bool:
    """True when the (K, V, 3) f32 host corrections cache fits the budget."""
    return n_examples * n_verts * 3 * 4 <= PSD_HOST_BYTES_MAX


def pairwise_sqdist_nd(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(A, D), (B, D) -> (A, B) exact-difference squared distances.

    kernels.pairwise_sqdist is specialized (and now guarded) to 3-D
    geometry; pose descriptors live in R^(3N), so the general form is
    needed here.  Same numerics contract: per-coordinate differences
    (translation-invariant, no ||x||^2 cancellation); K and D are tiny
    next to the mesh eval, so the (A, B, D) broadcast is irrelevant."""
    d = x[:, None, :] - y[None, :, :]
    return jnp.sum(d * d, axis=-1)


class PSDModel(NamedTuple):
    """Solved pose-space interpolation (a pytree; kernel id kept static).

    features:    (K, D) f32 example pose descriptors.
    alpha:       (K, K) f32 cardinal solve (Phi + lam I)^-1.
    corrections: (K, V, 3) f32 sculpt-minus-base deltas, rest order.
    eps:         () f32 kernel radius in pose space.
    """

    features: jnp.ndarray
    alpha: jnp.ndarray
    corrections: jnp.ndarray
    eps: jnp.ndarray


def features_from_rig(rest_rig: np.ndarray, posed_rig: np.ndarray) -> np.ndarray:
    """Pose descriptor: flattened marker displacement (D = 3N)."""
    rest = np.asarray(rest_rig, np.float32)
    posed = np.asarray(posed_rig, np.float32)
    if rest.shape != posed.shape:
        raise ValueError(
            f"posed rig shape {posed.shape} != rest rig shape {rest.shape}"
        )
    return (posed - rest).reshape(-1)


def rigid_align(rest_rig: np.ndarray, posed_rig: np.ndarray):
    """Best-fit rigid registration of a posed rig onto the rest rig.

    Kabsch in f64 on host (N is rig-sized): returns `(aligned, r)` where
    `aligned = (posed - posed_mean) @ r + rest_mean` is the posed rig with
    its rigid motion removed and `r` is the rest->posed rotation in ROW
    convention — a row vector expressed in the rest (head-local) frame
    maps to world as `v_world = v_local @ r.T`, so a world-space field
    moves into the local frame as `c_local = c_world @ r`.

    Proper rotation is enforced (det +1 via the sign-flip column), so
    mirror-image poses align through the nearest rotation, never a
    reflection.  Requires >= 3 markers (fewer leave the rotation
    underdetermined).
    """
    rest = np.asarray(rest_rig, np.float64)
    posed = np.asarray(posed_rig, np.float64)
    if rest.shape != posed.shape:
        raise ValueError(
            f"posed rig shape {posed.shape} != rest rig shape {rest.shape}"
        )
    if rest.ndim != 2 or rest.shape[1] != 3 or rest.shape[0] < 3:
        raise ValueError(
            "rigid_align needs an (N>=3, 3) rig; got "
            f"{rest.shape} (a rotation is underdetermined below 3 markers)"
        )
    rest_c = rest - rest.mean(0)
    posed_mean = posed.mean(0)
    posed_c = posed - posed_mean
    h = rest_c.T @ posed_c                      # (3, 3) covariance
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    # rest->posed rotation (column convention R = V diag(1,1,d) U^T);
    # posed_c ~= rest_c @ r.T in row convention
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    aligned = posed_c @ r + rest.mean(0)
    return aligned.astype(np.float32), r.astype(np.float32)


def auto_eps(features: np.ndarray) -> float:
    """Median pairwise example distance — the package's auto-radius
    convention (cf. ops/pu.py eps='auto'), here over the K examples."""
    f = np.asarray(features, np.float64)
    d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    off = d2[~np.eye(len(f), dtype=bool)]
    if off.size == 0:  # single example: any positive scale works (w(f_0)=1)
        return float(max(np.sqrt((f[0] ** 2).sum()), 1.0))
    return float(max(np.sqrt(np.median(off)), 1e-12))


def fit_psd(
    features: np.ndarray,
    corrections: np.ndarray,
    kernel: RBFKernel = RBFKernel.GAUSSIAN,
    eps: Optional[float] = None,
    lam: float = 0.0,
) -> tuple[PSDModel, SolveReport]:
    """Solve the pose-space cardinal system (Phi + lam I) A = I_K.

    Raises ValueError on duplicate example poses (the system is exactly
    singular at lam = 0, and even with a ridge two identical poses with
    different sculpts are a contradiction the artist should resolve).
    """
    feats = np.asarray(features, np.float32)
    corr = np.asarray(corrections, np.float32)
    if feats.ndim != 2:
        raise ValueError(f"features must be (K, D), got {feats.shape}")
    k = feats.shape[0]
    if corr.shape[:1] != (k,) or corr.ndim != 3 or corr.shape[-1] != 3:
        raise ValueError(
            f"corrections must be (K={k}, V, 3), got {corr.shape}"
        )
    kernel = RBFKernel(kernel)
    if eps is None:
        eps = auto_eps(feats)
    if not np.isfinite(eps) or eps <= 0:
        raise ValueError(f"psd eps must be positive, got {eps}")

    # Duplicate-pose check on host (K is tiny): scale-relative tolerance.
    d2 = ((feats.astype(np.float64)[:, None, :]
           - feats.astype(np.float64)[None, :, :]) ** 2).sum(-1)
    scale2 = max(float(d2.max()), 1e-30)
    iu = np.triu_indices(k, 1)
    dup = np.flatnonzero(d2[iu] <= 1e-12 * scale2)
    if dup.size:
        a, b = iu[0][dup[0]], iu[1][dup[0]]
        raise ValueError(
            f"duplicate example poses {int(a)} and {int(b)}: pose-space "
            "distance ~0; merge the sculpts or perturb one pose"
        )
    if float(lam) == 0.0 and not kernel_is_pd(kernel):
        raise ValueError(
            f"kernel {kernel.name} is not positive definite; pose-space "
            "fits have no polynomial tail, pass lam > 0"
        )

    model, report = _fit_psd_device(
        jnp.asarray(feats), jnp.asarray(corr), kernel,
        jnp.float32(eps), jnp.float32(lam),
    )
    return model, report


@functools.partial(jax.jit, static_argnames=("kernel",))
def _fit_psd_device(feats, corr, kernel, eps, lam):
    phi = apply_kernel(kernel, pairwise_sqdist_nd(feats, feats), eps)
    k = phi.shape[0]
    a = phi + lam * jnp.eye(k, dtype=phi.dtype)
    alpha, report = lu_solve_refined(a, jnp.eye(k, dtype=phi.dtype))
    return PSDModel(feats, alpha, corr, eps), report


@functools.partial(jax.jit, static_argnames=("kernel", "normalize"))
def psd_weights(
    model: PSDModel,
    feats: jnp.ndarray,
    kernel: RBFKernel = RBFKernel.GAUSSIAN,
    normalize: bool = False,
) -> jnp.ndarray:
    """Pose-space weights for one (D,) or a batch (..., D) of poses.

    normalize=True rescales to sum(w) = 1 where the sum is significant:
    w / sign(s)·max(|s|, delta) is EXACTLY w / s once |s| >= delta = 1e-2
    and fades to zero with the raw weights when every example is out of
    kernel reach — it never divides by a vanishing sum (the f32
    dead-column guard rule, CLAUDE.md).  At an example pose w = e_j sums
    to 1, so normalization preserves exact sculpt reproduction (an
    earlier soft form s/(s^2 + 1e-4) scaled the sculpt by 1/(1+1e-4)
    even at s = 1 — a 1e-4 error, double the 5e-5 parity budget;
    round-5 review finding).
    """
    feats = jnp.asarray(feats, jnp.float32)
    squeeze = feats.ndim == 1
    q = jnp.atleast_2d(feats)
    phi = apply_kernel(kernel, pairwise_sqdist_nd(q, model.features), model.eps)
    w = jnp.matmul(phi, model.alpha, precision=_HIGHEST)
    if normalize:
        s = jnp.sum(w, axis=-1, keepdims=True)
        denom = jnp.where(jnp.abs(s) >= 1e-2, s,
                          jnp.where(s < 0, -1e-2, 1e-2))
        # blend to identity (raw w) as |s| -> 0 so far-from-example poses
        # keep the fade-out instead of being amplified by 1/delta
        gate = jnp.minimum(jnp.abs(s) / 1e-2, 1.0)
        w = w * (gate / denom + (1.0 - gate))
    return w[0] if squeeze else w


@functools.partial(jax.jit, static_argnames=("kernel", "normalize"))
def psd_delta(
    model: PSDModel,
    feats: jnp.ndarray,
    kernel: RBFKernel = RBFKernel.GAUSSIAN,
    normalize: bool = False,
) -> jnp.ndarray:
    """Blended correction field: (V, 3) for one pose, (F, V, 3) batched.

    One (..., K) x (K, V*3) contraction under HIGHEST precision — the
    corrections stream from HBM exactly once per call, so a whole shot
    should batch its poses into one call rather than loop.
    """
    w = psd_weights(model, feats, kernel, normalize)
    kk, v, _ = model.corrections.shape
    flat = model.corrections.reshape(kk, v * 3)
    out = jnp.matmul(jnp.atleast_2d(w), flat, precision=_HIGHEST)
    out = out.reshape(w.shape[:-1] + (v, 3)) if w.ndim > 1 else out.reshape(v, 3)
    return out


def pose_feature(
    rest_rig: np.ndarray, posed_rig: np.ndarray, align: bool = False
):
    """(feature (D,), rotation (3, 3) | None) for one query pose.

    With `align=True` the pose descriptor is computed on the
    rigid-registered pose (rigid_align), making it INVARIANT to head
    motion — and the returned rest->posed rotation is what maps a
    rest-frame correction field back to world (`c_world = c_local @ r.T`).
    """
    if not align:
        return features_from_rig(rest_rig, posed_rig), None
    aligned, r = rigid_align(rest_rig, posed_rig)
    return features_from_rig(rest_rig, aligned), r


@dataclasses.dataclass(frozen=True)
class PSDDeformer:
    """Solved PSD artifact: model pytree + static kernel/normalize knobs.

    Checkpoints via utils/checkpoint.save_psd/load_psd; apply composes on
    top of any base pipeline output (node.cook wires it automatically
    when `examples=` are passed).

    `align=True` makes the model rigid-EQUIVARIANT: pose descriptors are
    computed on Kabsch-registered poses (head motion does not move the
    query through pose space) and the stored corrections live in the rest
    (head-local) frame, rotated back to world by each query pose's own
    rigid rotation — the same expression with the head turned reproduces
    the sculpt turned with the head.
    """

    model: PSDModel
    kernel: RBFKernel = RBFKernel.GAUSSIAN
    normalize: bool = False
    report: Optional[SolveReport] = None
    align: bool = False

    @staticmethod
    def fit(
        rest_rig: np.ndarray,
        posed_rigs: np.ndarray,
        corrections: np.ndarray,
        kernel: RBFKernel = RBFKernel.GAUSSIAN,
        eps: Optional[float] = None,
        lam: float = 0.0,
        normalize: bool = False,
        align: bool = False,
    ) -> "PSDDeformer":
        """posed_rigs: (K, N, 3) example rig poses; corrections: (K, V, 3)
        world-space sculpt deltas (rotated into the rest frame internally
        when align=True)."""
        posed = np.asarray(posed_rigs, np.float32)
        corr = np.asarray(corrections, np.float32)
        feats, corr_fit = [], []
        for i in range(posed.shape[0]):
            f, r = pose_feature(rest_rig, posed[i], align)
            feats.append(f)
            corr_fit.append(corr[i] @ r if r is not None else corr[i])
        model, report = fit_psd(
            np.stack(feats), np.stack(corr_fit), kernel, eps, lam
        )
        return PSDDeformer(model, kernel, normalize, report, align)

    def weights(self, rest_rig: np.ndarray, posed_rig: np.ndarray) -> jnp.ndarray:
        f, _ = pose_feature(rest_rig, posed_rig, self.align)
        return psd_weights(self.model, f, self.kernel, self.normalize)

    def delta(self, rest_rig: np.ndarray, posed_rig: np.ndarray) -> jnp.ndarray:
        f, r = pose_feature(rest_rig, posed_rig, self.align)
        d = psd_delta(self.model, f, self.kernel, self.normalize)
        if r is not None:
            d = jnp.matmul(d, jnp.asarray(r.T), precision=_HIGHEST)
        return d

    def delta_frames(
        self, rest_rig: np.ndarray, posed_rigs: np.ndarray
    ) -> jnp.ndarray:
        """(F, V, 3) corrections for a whole shot in ONE dispatch."""
        posed = np.asarray(posed_rigs, np.float32)
        feats, rots = [], []
        for i in range(posed.shape[0]):
            f, r = pose_feature(rest_rig, posed[i], self.align)
            feats.append(f)
            rots.append(r)
        d = psd_delta(self.model, np.stack(feats), self.kernel, self.normalize)
        if self.align:
            # per-frame world rotation: (F, V, 3) x (F, 3, 3) -> (F, V, 3)
            d = jnp.einsum(
                "fvc,fdc->fvd", d, jnp.asarray(np.stack(rots)),
                precision=_HIGHEST,
            )
        return d
