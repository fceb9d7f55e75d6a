"""Skinning decomposition over the device mesh: vertices shard, bones psum.

`ops/skinning.fit_skinning` is one jit program whose every stage is a
(V, B)-shaped contraction — exactly the shape that vertex-shards.  Here
the SAME functions run inside a `jax.shard_map` over the vertex axis:

  * k-means assignment, the per-bone error, and the whole PGD weight
    solve are per-vertex LOCAL — zero collectives;
  * only the Procrustes moments and k-means centroid sums reduce over
    vertices — `ops/skinning._allsum` turns into `lax.psum` there, after
    which every (B,)-space quantity is replicated and the tiny 3x3 SVDs
    run identically on each device (the same replicated-model design as
    `parallel/sharding.py` eval).

V pads to the device count; padded rows carry `valid = 0`, which zeroes
them out of every moment (see `_ssdr_rounds`' contract).  Peak per-chip
memory for the dominant (V, B, 3) frame-basis temporaries drops by the
device count, which is what lets film-res meshes fit many bones.

Reference: the thread pool the reference ships disabled
(src/SOP_FaceDeform.hpp:116-188) promoted to chips, for the rebuild's
LBS-export extension (no reference counterpart).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from facedeform_tpu.ops import skinning as sk
from facedeform_tpu.parallel.sharding import VERTEX_AXIS


def fit_skinning_sharded(
    rest_points: np.ndarray,
    posed_frames: np.ndarray,
    mesh,
    n_bones: int = 16,
    max_influences: int = 4,
    outer_iters: int = 8,
    pgd_iters: int = 24,
    kmeans_iters: int = 15,
    hard_rounds: int = 5,
    k_neighbors: int = 8,
    seed: int = 0,
):
    """fit_skinning sharded over `mesh`'s vertex axis; same contract.

    Init (k-NN rigid features + k-means++ seeding) stays host/global —
    it is a one-time cost and the seeding is sequential by nature; the
    centroids it produces replicate into the shard_map.  Returns
    (SkinningModel, SkinningReport) with GLOBAL arrays, exactly like the
    single-device fit.
    """
    x, p = sk.validate_inputs(rest_points, posed_frames, n_bones,
                              max_influences)
    v = x.shape[0]

    feats = sk._local_rigid_features(x, p, k_neighbors)
    rng = np.random.default_rng(seed)
    init_idx = sk._kmeanspp_indices(feats.astype(np.float64), n_bones, rng)
    cent0 = feats[init_idx]

    n_dev = mesh.shape[VERTEX_AXIS]
    pad = (-v) % n_dev
    xp = np.pad(x, ((0, pad), (0, 0)))
    pp = np.pad(p, ((0, 0), (0, pad), (0, 0)))
    fp = np.pad(feats, ((0, pad), (0, 0)))
    valid = np.zeros(v + pad, np.float32)
    valid[:v] = 1.0

    def body(x_l, p_l, f_l, val_l, cent):
        labels = sk._kmeans_labels(
            f_l, cent, n_bones, int(kmeans_iters), val_l,
            axis_name=VERTEX_AXIS,
        )
        w0 = (jax.nn.one_hot(labels, n_bones, dtype=jnp.float32)
              * val_l[:, None])
        return sk._ssdr_rounds(
            x_l, p_l, w0, int(outer_iters), int(pgd_iters),
            int(max_influences), int(hard_rounds), val_l,
            axis_name=VERTEX_AXIS,
        )

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(VERTEX_AXIS), P(None, VERTEX_AXIS), P(VERTEX_AXIS),
                  P(VERTEX_AXIS), P()),
        out_specs=(P(VERTEX_AXIS), P(), P()),
    ))
    w, r, t = fn(jnp.asarray(xp), jnp.asarray(pp), jnp.asarray(fp),
                 jnp.asarray(valid), jnp.asarray(cent0))
    model = sk.SkinningModel(w[:v], r, t, jnp.asarray(x))

    err2 = sk._reconstruction_err2(model, jnp.asarray(p))
    err2_host = np.asarray(err2, np.float64)
    bbox = float(np.linalg.norm(x.max(0) - x.min(0)))
    report = sk.SkinningReport(
        rmse=float(np.sqrt(err2_host.mean())),
        max_err=float(np.sqrt(err2_host.max())),
        bbox_diag=bbox,
    )
    return model, report
