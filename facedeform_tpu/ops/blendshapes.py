"""Blendshape basis extraction: PCA/SVD compression of a deformed shot.

Bake F frames of deformed positions down to K morph targets plus per-frame
weight curves — the compressed engine-export route sitting between the
lossless per-frame morphs (geometry/gltf_io.save_glb_morph: exact, O(F·V)
bytes) and the LBS skin (ops/skinning.py: compact and riggable, but with an
LBS residual).  A rank-K bake is the L2-optimal K-target approximation of
the shot (Eckart–Young), costs O(K·V) bytes, and the targets drop straight
into any morph-target pipeline.

It also closes a loop the reference leaves open: symek/facedeform CONSUMES
an existing blendshape basis for its morph-space projection
(src/dbse.cpp:9-35 builds B from blendshape inputs 3+) but never produces
one — its output is deformed positions only (src/SOP_FaceDeform.cpp:404-439).
`blendshape_meshes()` turns a baked model into exactly that kind of input,
so a baked shot can feed the rebuild's own (or the reference's) morphspace
pass.

TPU design.  The displacement matrix D is (F, 3V) — 3V runs to millions
while F is a few hundred at most, so the economical factorization is the
Gram route: G = D Dᵀ is (F, F) via ONE large MXU matmul (HIGHEST precision;
this is where all the FLOPs are), the symmetric eigendecomposition of the
tiny G runs on host in f64 (numerically the right tool — jnp.linalg.svd of
a (F, 3V) slab would lower to an all-device one-sided Jacobi over a padded
matrix), and the basis B = Dᵀ U Σ⁻¹ is a second large MXU matmul.  No
randomized sketching is needed because rank ≤ F by construction.  The
Gram route squares the condition number, but shot displacement matrices
are tiny-rank and f64 eigh of an (F, F) matrix is exact to ~1e-14 —
measured full-rank reconstruction lands at f32 roundoff (see
tests/test_blendshapes.py).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


class BlendshapeModel(NamedTuple):
    """A baked morph-target basis for one rest mesh.

    frame f reconstructs as ``rest + weights[f] @ targets`` (einsum
    ``k,kvi->vi``).  Targets are rest-relative deltas, scaled so every
    weight lies in [-1, 1] (DCC-friendly ranges); when the bake was
    centered, target 0 is the mean displacement and its weight column is
    identically 1.
    """

    rest: jnp.ndarray      # (V, 3) f32
    targets: jnp.ndarray   # (K, V, 3) f32 rest-relative deltas
    weights: jnp.ndarray   # (F, K) f32 per-frame weight curves

    @property
    def n_targets(self) -> int:
        return int(self.targets.shape[0])

    @property
    def n_frames(self) -> int:
        return int(self.weights.shape[0])

    def target_names(self) -> List[str]:
        names = [f"pc_{k:03d}" for k in range(self.n_targets)]
        if bool(self.weights.shape[0]) and self.n_targets:
            w0 = np.asarray(self.weights[:, 0])
            if np.allclose(w0, 1.0):
                names[0] = "mean"
        return names


class BlendshapeReport(NamedTuple):
    """Quality of a rank-K bake, measured against the input frames."""

    rmse: float            # RMS vertex-position error over all frames
    max_err: float         # max |reconstructed - input| over all frames
    energy: float          # fraction of displacement energy captured [0, 1]
    singular_values: np.ndarray  # full spectrum of the (centered) deltas

    @property
    def ok(self) -> bool:
        return bool(np.isfinite(self.rmse))


def _gram_eigh(d_flat: jnp.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition of D Dᵀ: returns (s, u) with s descending.

    The (F, 3V)x(3V, F) Gram product is the MXU-heavy step; the (F, F)
    eigh runs on host in f64.  Returns singular values s = sqrt(eig) and
    the left singular vectors U of D.
    """
    gram = jnp.dot(d_flat, d_flat.T, precision=_HIGHEST)
    g64 = np.asarray(gram, np.float64)
    g64 = 0.5 * (g64 + g64.T)
    eigval, eigvec = np.linalg.eigh(g64)
    order = np.argsort(eigval)[::-1]
    eigval = np.maximum(eigval[order], 0.0)
    return np.sqrt(eigval), eigvec[:, order]


def fit_blendshapes(
    rest,
    frame_points,
    rank: int,
    center: bool = True,
    mesh=None,
) -> tuple[BlendshapeModel, BlendshapeReport]:
    """Bake a shot to a rank-`rank` morph-target basis.

    rest:          (V, 3) rest positions the targets are relative to.
    frame_points:  (F, V, 3) deformed positions (a cooked shot).
    rank:          number of PCA targets to keep (clamped to [1, F]).
    center:        if True (default), the mean displacement is split off
                   as an always-on target 0 (weight column == 1) and the
                   PCA runs on the residual — the classic PCA model, which
                   spends the rank budget on *variation* rather than the
                   shot's average offset.  The returned model then has
                   rank+1 targets (unless the mean is exactly zero).
    mesh:          optional jax.sharding.Mesh — shards the (F, 3V) slab
                   over the vertex axis (one Gram psum, row-local basis
                   matmul; parallel/blendshapes_sharded.py).

    Returns (BlendshapeModel, BlendshapeReport).  Everything heavy runs as
    two HIGHEST-precision device matmuls (see module docstring).
    """
    rest = jnp.asarray(rest, jnp.float32)
    frames = jnp.asarray(frame_points, jnp.float32)
    if frames.ndim != 3 or frames.shape[-1] != 3:
        raise ValueError(f"frame_points must be (F, V, 3), got {frames.shape}")
    if rest.shape != frames.shape[1:]:
        raise ValueError(
            f"rest {rest.shape} does not match frames {frames.shape[1:]}"
        )
    f_n, v = int(frames.shape[0]), int(frames.shape[1])
    if f_n < 1:
        raise ValueError("need at least one frame")
    rank = max(1, min(int(rank), f_n))

    if mesh is not None:
        from facedeform_tpu.parallel.blendshapes_sharded import (
            fit_blendshapes_sharded,
        )

        return fit_blendshapes_sharded(rest, frames, rank, mesh, center)

    deltas = frames - rest[None]              # (F, V, 3)
    d_flat = deltas.reshape(f_n, 3 * v)       # (F, 3V)

    mean_flat = None
    mean_max = None
    if center:
        # Centering by an exactly-zero mean is a no-op, so ALWAYS subtract
        # and decide whether to emit the mean target after the Gram pull —
        # the max rides the same host sync instead of blocking mid-fit.
        mean_flat = jnp.mean(d_flat, axis=0)  # (3V,)
        mean_max = jnp.max(jnp.abs(mean_flat))
        d_flat = d_flat - mean_flat[None]

    s, u = _gram_eigh(d_flat)                 # s (F,), u (F, F) f64 host
    # An exactly-zero mean (e.g. symmetric oscillation around rest) would
    # add a useless all-zero target; skip it then.  mean_max finished with
    # the Gram dispatch, so this float() costs nothing extra.
    mean_target = (
        mean_flat if center and float(mean_max) > 0.0 else None
    )

    # Dead-mode guard: a converged/constant shot has trailing singular
    # values at roundoff; dividing the basis by them would blow up.  Keep
    # only modes carrying > f32-eps relative energy, never fewer than one.
    s_max = float(s[0]) if s.size else 0.0
    alive = int(np.sum(s > max(s_max, 1e-30) * 1e-7))
    k = max(1, min(rank, max(alive, 1)))

    u_k = jnp.asarray(u[:, :k], jnp.float32)            # (F, k)
    inv_s = jnp.asarray(
        np.where(s[:k] > 0.0, 1.0 / np.maximum(s[:k], 1e-30), 0.0),
        jnp.float32,
    )
    # Basis column j = Dᵀ u_j / s_j — the second big MXU matmul.
    basis = jnp.dot(d_flat.T, u_k * inv_s[None, :], precision=_HIGHEST)
    w = u_k * jnp.asarray(s[:k], jnp.float32)[None, :]   # (F, k) projections

    # Scale each target so its weight curve spans [-1, 1].
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-30)  # (k,)
    targets = (basis * scale[None, :]).T.reshape(k, v, 3)
    weights = w / scale[None, :]

    if mean_target is not None:
        targets = jnp.concatenate(
            [mean_target.reshape(1, v, 3), targets], axis=0
        )
        weights = jnp.concatenate(
            [jnp.ones((f_n, 1), jnp.float32), weights], axis=1
        )

    model = BlendshapeModel(rest=rest, targets=targets, weights=weights)

    recon = apply_blendshapes(model)                     # (F, V, 3)
    err = recon - frames
    rmse = float(jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1))))
    max_err = float(jnp.max(jnp.abs(err)))
    total = float(np.sum(s * s))
    energy = 1.0 if total == 0.0 else float(np.sum(s[:k] * s[:k]) / total)
    report = BlendshapeReport(
        rmse=rmse, max_err=max_err, energy=min(energy, 1.0),
        singular_values=np.asarray(s, np.float64),
    )
    return model, report


def apply_blendshapes(
    model: BlendshapeModel, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Reconstruct positions from weight rows.

    weights: (F, K) — defaults to the model's own fitted curves.  Returns
    (F, V, 3).  One (F, K)x(K, 3V) MXU matmul.
    """
    w = model.weights if weights is None else jnp.asarray(weights, jnp.float32)
    if w.ndim == 1:
        w = w[None]
    k, v = model.targets.shape[0], model.targets.shape[1]
    if w.shape[-1] != k:
        raise ValueError(f"weights have {w.shape[-1]} columns, model has {k}")
    flat = jnp.dot(
        w, model.targets.reshape(k, 3 * v), precision=_HIGHEST
    ).reshape(-1, v, 3)
    return model.rest[None] + flat


def blendshape_meshes(model: BlendshapeModel, mesh) -> List:
    """Materialize the baked targets as blendshape MESHES (rest + delta).

    Returns one Mesh per target, sharing `mesh`'s topology — exactly the
    shape of the reference's blendshape inputs 3+ (src/SOP_FaceDeform.cpp:
    201-204, consumed by DirectBSEdit at src/dbse.cpp:18-30), so a baked
    shot can drive the morphspace projection pass.
    """
    if mesh.num_points != int(model.rest.shape[0]):
        raise ValueError(
            f"mesh has {mesh.num_points} points, model rest has "
            f"{int(model.rest.shape[0])}"
        )
    rest = np.asarray(model.rest, np.float32)
    out = []
    for k in range(model.n_targets):
        m = mesh.copy()
        m.set_points(rest + np.asarray(model.targets[k], np.float32))
        out.append(m)
    return out
