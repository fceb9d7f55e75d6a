"""PCA blendshape bake over the device mesh: vertices shard, Gram psums.

`ops/blendshapes.fit_blendshapes` is two big MXU matmuls around a tiny
host eigh; both matmuls contract over the 3V axis, which is exactly the
axis that shards (3V runs to millions, F stays a few hundred):

  * stage 1: each device forms its local (F, F) partial Gram
    G_l = D_l D_lᵀ; ONE `lax.psum` replicates the full Gram — the only
    collective in the fit;
  * the (F, F) eigh plus every (F, k)-space quantity (projections,
    weight curves, per-target scales) runs on host in f64, identical to
    the single-device route;
  * stage 2: the basis matmul Dᵀ(U_k Σ⁻¹) is row-local — targets come
    back sharded over vertices with zero collectives; the quality report
    reduces with one more psum (error sums) riding the same dispatch.

The centering mean is a per-vertex column mean over F — local both
times; padded vertices carry zero deltas, which drop out of the Gram,
the mean, and the error sums without a validity mask.  Peak per-chip
memory for the (F, 3V) displacement slab drops by the device count,
which is what lets 1M+-vertex shots bake with hundreds of frames.

Reference: the reference CONSUMES a blendshape basis (src/dbse.cpp:9-35)
but never produces one; this is the rebuild's bake extension
(ops/blendshapes.py) promoted to chips, same sharding contract as
parallel/skinning_sharded.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from facedeform_tpu.parallel.sharding import VERTEX_AXIS

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("mesh", "center"))
def stage1_gram(dp, mesh, center: bool):
    """Jitted stage-1 program: local centered Gram + ONE psum (+ the
    mean-max pmax riding the same dispatch).  Module-level jit with the
    mesh static so repeated bakes hit the trace cache instead of
    re-lowering two shard_map programs per call (the dbse_sharded.py
    pattern); tests/test_collectives_audit.py lowers the REAL program."""

    def stage1(d_l):
        d_flat = d_l.reshape(d_l.shape[0], -1)            # (F, 3·Vl)
        if center:
            mean_l = jnp.mean(d_flat, axis=0)
            d_flat = d_flat - mean_l[None]
            mmax = jax.lax.pmax(jnp.max(jnp.abs(mean_l)), VERTEX_AXIS)
        else:
            mmax = jnp.float32(0.0)
        gram_l = jnp.dot(d_flat, d_flat.T, precision=_HIGHEST)
        return jax.lax.psum(gram_l, VERTEX_AXIS), mmax

    return jax.shard_map(
        stage1, mesh=mesh,
        in_specs=P(None, VERTEX_AXIS),
        out_specs=(P(), P()),
    )(dp)


@functools.partial(jax.jit, static_argnames=("mesh", "center", "use_mean"))
def stage2_basis(dp, u_scaled, w_all, mesh, center: bool, use_mean: bool):
    """Jitted stage-2 program: row-local basis matmul (targets come back
    vertex-sharded, zero collectives) + the report's error psum/pmax.
    Module-level jit, same caching rationale as stage1_gram."""

    def stage2(d_l, u_sc, w_full):
        d_flat = d_l.reshape(d_l.shape[0], -1)            # (F, 3·Vl)
        v_l = d_l.shape[1]
        k = u_sc.shape[1]
        if center:
            mean_l = jnp.mean(d_flat, axis=0)
            d_c = d_flat - mean_l[None]
        else:
            d_c = d_flat
        tgt = jnp.dot(d_c.T, u_sc, precision=_HIGHEST)    # (3·Vl, k)
        targets_l = tgt.T.reshape(k, v_l, 3)
        if use_mean:
            targets_l = jnp.concatenate(
                [mean_l.reshape(1, v_l, 3), targets_l], axis=0
            )
        # Quality report rides the same dispatch: padded vertices have
        # zero deltas AND zero targets, so their error is exactly zero.
        recon = jnp.dot(
            w_full, targets_l.reshape(targets_l.shape[0], -1),
            precision=_HIGHEST,
        )
        err = recon - d_flat
        err2 = jax.lax.psum(jnp.sum(err * err), VERTEX_AXIS)
        emax = jax.lax.pmax(jnp.max(jnp.abs(err)), VERTEX_AXIS)
        return targets_l, err2, emax

    return jax.shard_map(
        stage2, mesh=mesh,
        in_specs=(P(None, VERTEX_AXIS), P(), P()),
        out_specs=(P(None, VERTEX_AXIS), P(), P()),
    )(dp, u_scaled, w_all)


def fit_blendshapes_sharded(rest, frame_points, rank, mesh, center=True):
    """`ops.blendshapes.fit_blendshapes` sharded over `mesh`; same contract.

    Validation happens in the caller (fit_blendshapes routes here when
    `mesh=` is given).  Returns (BlendshapeModel, BlendshapeReport) with
    GLOBAL arrays; `targets` stays device-resident sharded over vertices.
    """
    from facedeform_tpu.ops import blendshapes as bs

    rest = jnp.asarray(rest, jnp.float32)
    frames = jnp.asarray(frame_points, jnp.float32)
    f_n, v = int(frames.shape[0]), int(frames.shape[1])
    rank = max(1, min(int(rank), f_n))

    # Device-resident throughout: a host round trip of the (F, V, 3) slab
    # would cost seconds at the tunnel's ~8-17 MB/s (the round-2 PU
    # chauffeur lesson) — only the (F, F) Gram ever reaches the host.
    n_dev = mesh.shape[VERTEX_AXIS]
    pad = (-v) % n_dev
    deltas = frames - rest[None]
    dp = (
        jnp.pad(deltas, ((0, 0), (0, pad), (0, 0))) if pad else deltas
    )

    gram, mmax = stage1_gram(dp, mesh, center)

    g64 = np.asarray(gram, np.float64)       # the one fit-time host pull
    use_mean = center and float(mmax) > 0.0
    g64 = 0.5 * (g64 + g64.T)
    eigval, eigvec = np.linalg.eigh(g64)
    order = np.argsort(eigval)[::-1]
    s = np.sqrt(np.maximum(eigval[order], 0.0))
    u = eigvec[:, order]

    # Mode selection + every (F, k)-space quantity: host f64, identical
    # to the single-device route (ops/blendshapes.fit_blendshapes).
    s_max = float(s[0]) if s.size else 0.0
    alive = int(np.sum(s > max(s_max, 1e-30) * 1e-7))
    k = max(1, min(rank, max(alive, 1)))
    u_k = u[:, :k]
    inv_s = np.where(s[:k] > 0.0, 1.0 / np.maximum(s[:k], 1e-30), 0.0)
    w = u_k * s[:k][None, :]                              # (F, k)
    scale = np.maximum(np.max(np.abs(w), axis=0), 1e-30)  # (k,)
    # Fold Σ⁻¹ and the target scale into one replicated (F, k) factor so
    # stage 2's basis matmul lands directly on the scaled targets.
    u_scaled = jnp.asarray(u_k * (inv_s * scale)[None, :], jnp.float32)
    weights = (w / scale[None, :]).astype(np.float32)
    if use_mean:
        weights = np.concatenate(
            [np.ones((f_n, 1), np.float32), weights], axis=1
        )
    w_dev = jnp.asarray(weights)

    targets, err2, emax = stage2_basis(
        dp, u_scaled, w_dev, mesh, center, use_mean
    )
    if pad:
        targets = targets[:, :v]

    model = bs.BlendshapeModel(
        rest=rest, targets=targets, weights=jnp.asarray(weights)
    )
    total = float(np.sum(s * s))
    energy = 1.0 if total == 0.0 else float(np.sum(s[:k] * s[:k]) / total)
    report = bs.BlendshapeReport(
        rmse=float(np.sqrt(float(err2) / (f_n * v))),
        max_err=float(emax),
        energy=min(energy, 1.0),
        singular_values=np.asarray(s, np.float64),
    )
    return model, report
