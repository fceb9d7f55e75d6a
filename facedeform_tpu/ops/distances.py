"""Device-side closest-point distance queries (capture's distance half).

The reference computes, per captured vertex, the squared distance to the
nearest rig *primitive* via HDK's GU_RayIntersect::minimumPoint bounded by
radius^2 (capture.cpp:77-88).  That per-vertex KD/ray query is irregular and
TPU-hostile; the rebuild recasts it as dense, regular math that maps onto
the MXU/VPU:

  * point rigs   -> min over pairwise squared distances (one MXU matmul);
  * triangle rigs -> closed-form point-to-triangle distance over all (V, T)
    pairs, chunked over V.  T (rig primitive count) is small by construction
    — rigs are sparse marker sets — so dense beats trees on this hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedeform_tpu.ops.kernels import pairwise_sqdist


@jax.jit
def min_sqdist_to_points(points: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """(V,) min squared distance from each point to any target point."""
    return jnp.min(pairwise_sqdist(points, targets), axis=-1)


# Below this pair count the host beats the device: jit specializes on exact
# shapes, and capture's vertex count changes with every radius/maxedges
# tweak — each change would trigger a full (remote) compile of a trivial
# kernel.  Above it, pad V to a bucket so compiles are reused.
_HOST_PAIR_LIMIT = 5_000_000
_V_BUCKET = 65_536


def min_sqdist_to_points_auto(points, targets):
    """min_sqdist_to_points with host fallback + shape bucketing.

    Returns a numpy array; callers are host-side (capture)."""
    import numpy as np

    points = np.asarray(points, np.float32)
    targets = np.asarray(targets, np.float32)
    v, n = points.shape[0], targets.shape[0]
    if v * n <= _HOST_PAIR_LIMIT:
        d2 = (
            np.sum(points * points, axis=1, keepdims=True)
            + np.sum(targets * targets, axis=1)[None, :]
            - 2.0 * points @ targets.T
        )
        return np.maximum(d2, 0.0).min(axis=1)
    pad = (-v) % _V_BUCKET
    pts = np.pad(points, ((0, pad), (0, 0)))
    out = np.asarray(min_sqdist_to_points(jnp.asarray(pts), jnp.asarray(targets)))
    return out[:v]


def _point_triangle_sqdist_np(p, tris):
    """Host numpy twin of _point_triangle_sqdist, vectorized over BOTH
    axes: points (C, 3) x tris (T, 3, 3) -> (C, T).  Same branch-free
    Eberly region math, np.where instead of jnp.where."""
    import numpy as np

    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]          # (T, 3)
    ab, ac = b - a, c - a
    p = p[:, None, :]                                      # (C, 1, 3)
    ap, bp, cp = p - a, p - b, p - c                       # (C, T, 3)
    d1 = np.sum(ab * ap, -1)
    d2 = np.sum(ac * ap, -1)
    d3 = np.sum(ab * bp, -1)
    d4 = np.sum(ac * bp, -1)
    d5 = np.sum(ab * cp, -1)
    d6 = np.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = np.maximum(va + vb + vc, 1e-30)
    v = (vb / denom)[..., None]
    w = (vc / denom)[..., None]
    closest = a + v * ab + w * ac
    t_ab = np.clip(d1 / np.maximum(d1 - d3, 1e-30), 0.0, 1.0)[..., None]
    t_ac = np.clip(d2 / np.maximum(d2 - d6, 1e-30), 0.0, 1.0)[..., None]
    t_bc = np.clip(
        (d4 - d3) / np.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0
    )[..., None]
    closest = np.where(
        ((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None],
        b + t_bc * (c - b), closest)
    closest = np.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None],
                       a + t_ac * ac, closest)
    closest = np.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None],
                       a + t_ab * ab, closest)
    closest = np.where(((d6 >= 0) & (d5 <= d6))[..., None],
                       np.broadcast_to(c, closest.shape), closest)
    closest = np.where(((d3 >= 0) & (d4 <= d3))[..., None],
                       np.broadcast_to(b, closest.shape), closest)
    closest = np.where(((d1 <= 0) & (d2 <= 0))[..., None],
                       np.broadcast_to(a, closest.shape), closest)
    diff = p - closest
    return np.sum(diff * diff, -1)


def min_sqdist_to_triangles_auto(points, tris):
    """min_sqdist_to_triangles with host fallback + V-bucketing — the
    triangle twin of min_sqdist_to_points_auto, for the same reason:
    capture's vertex count churns with every radius/maxedges tweak and
    the exact-shape jit would pay a (remote) compile per tweak.  The rig
    triangle count is topology-stable, so only V buckets.  Returns numpy;
    callers are host-side (capture)."""
    import numpy as np

    points = np.asarray(points, np.float32)
    tris = np.asarray(tris, np.float32)
    v, t = points.shape[0], tris.shape[0]
    # triangle pair math is ~15x the point-distance op count: keep the
    # host below the same wall-clock by scaling the pair limit down
    if v * t <= _HOST_PAIR_LIMIT // 8:
        out = np.empty(v, np.float32)
        step = max(1, (_HOST_PAIR_LIMIT // 8) // max(t, 1))
        for lo in range(0, v, step):
            out[lo:lo + step] = _point_triangle_sqdist_np(
                points[lo:lo + step], tris
            ).min(axis=1)
        return np.maximum(out, 0.0)
    pad = (-v) % _V_BUCKET
    pts = np.pad(points, ((0, pad), (0, 0)))
    out = np.asarray(
        min_sqdist_to_triangles(jnp.asarray(pts), jnp.asarray(tris))
    )
    return out[:v]


def _point_triangle_sqdist(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Squared distance from points (V, 3) to ONE triangle (3, 3).

    Branch-free Eberly-style closest-point-on-triangle, vectorized over V;
    all control flow is jnp.where so it fuses on the VPU.
    """
    a, b, c = tri[0], tri[1], tri[2]
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom
    closest = a + v[:, None] * ab + w[:, None] * ac  # interior case

    # Edge/vertex regions override the interior barycentric point.
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    on_ab = a + t_ab[:, None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    on_ac = a + t_ac[:, None] * ac
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0)
    on_bc = b + t_bc[:, None] * (c - b)

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    closest = jnp.where(in_edge_bc[:, None], on_bc, closest)
    closest = jnp.where(in_edge_ac[:, None], on_ac, closest)
    closest = jnp.where(in_edge_ab[:, None], on_ab, closest)
    closest = jnp.where(in_vert_c[:, None], c, closest)
    closest = jnp.where(in_vert_b[:, None], b, closest)
    closest = jnp.where(in_vert_a[:, None], a, closest)
    diff = p - closest
    return jnp.sum(diff * diff, -1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def min_sqdist_to_triangles(
    points: jnp.ndarray, tris: jnp.ndarray, chunk: int = 8192
) -> jnp.ndarray:
    """(V,) min squared distance from each point to any triangle.

    Args:
      points: (V, 3).
      tris: (T, 3, 3) triangle vertex coordinates.
      chunk: V-axis chunk so the (chunk, T) scratch stays small.
    """
    points = points.astype(jnp.float32)
    tris = tris.astype(jnp.float32)

    def one_chunk(p):
        d = jax.vmap(lambda t: _point_triangle_sqdist(p, t))(tris)  # (T, chunk)
        return jnp.min(d, axis=0)

    v = points.shape[0]
    if v <= chunk:
        return one_chunk(points)
    pad = (-v) % chunk
    p = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    out = jax.lax.map(one_chunk, p)
    return out.reshape(-1)[:v]
