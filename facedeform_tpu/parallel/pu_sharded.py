"""Vertex-sharded partition-of-unity eval: PU tiles across the ICI mesh.

The PU tile plan is already a list of (vertex tile, patch) items sorted
by vertex tile, so the multichip promotion is the same replicated-model /
sharded-vertices design as the main eval path (parallel/sharding.py):
split the VERTEX TILES contiguously across the device mesh, replicate the
(small) per-patch model operands, and run the scatter-free Mosaic
accumulator kernel per shard — zero steady-state collectives, exactly
like the dense path.

Item counts differ per device, so each device's item list is padded to
the max with dead items (patch id -1): the kernel gates their weight to
zero and their vertex tile repeats the shard's last tile, so they neither
re-init an accumulator nor contribute.  Empty vertex tiles from the
sharding pad get one dead item each (the accumulator must still be
zero-initialized for its store).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.parallel.sharding import VERTEX_AXIS


class PUShardedPlan(NamedTuple):
    """Per-device tiling of a PUTilePlan (host-built; cache with it)."""

    item_patch: np.ndarray   # (D, Tmax) int32, -1 dead padding
    item_vt: np.ndarray      # (D, Tmax) int32 LOCAL vertex-tile indices
    forced_patch: np.ndarray # (Vp,) int32, Z order, padded
    perm: np.ndarray         # (V,)
    inv_perm: np.ndarray
    num_points: int
    tile_v: int
    vp: int                  # padded point count (multiple of D * tile_v)


def shard_tile_plan(tplan, n_devices: int) -> PUShardedPlan:
    """Split a pallas_pu.PUTilePlan across n_devices contiguous vt ranges."""
    tile_v = tplan.tile_v
    v = tplan.num_points
    # vp pads to a multiple of n_devices * tile_v, so every device owns
    # at least one (possibly all-padding) vertex tile — small inputs are
    # padded out rather than rejected.
    vp = v + ((-v) % (n_devices * tile_v))
    n_vt = vp // tile_v
    per_dev = n_vt // n_devices

    fp = np.full(vp, -1, np.int32)
    fp[: tplan.forced_patch.shape[0]] = tplan.forced_patch

    dev_items: list[list[tuple[int, int]]] = [[] for _ in range(n_devices)]
    for ip, vt in zip(tplan.item_patch, tplan.item_vt):
        d = min(int(vt) // per_dev, n_devices - 1)
        dev_items[d].append((int(ip), int(vt) - d * per_dev))
    # every LOCAL tile needs >= 1 item (accumulator init): add dead items
    for d in range(n_devices):
        have = {vt for _, vt in dev_items[d]}
        for vt in range(per_dev):
            if vt not in have:
                dev_items[d].append((-1, vt))
        dev_items[d].sort(key=lambda t: t[1])
    tmax = max(len(items) for items in dev_items)
    item_patch = np.full((n_devices, tmax), -1, np.int32)
    item_vt = np.zeros((n_devices, tmax), np.int32)
    for d, items in enumerate(dev_items):
        for j, (ip, vt) in enumerate(items):
            item_patch[d, j] = ip
            item_vt[d, j] = vt
        if len(items) < tmax:
            # dead tail repeats the last tile: no re-init, no contribution
            item_vt[d, len(items):] = items[-1][1]
    return PUShardedPlan(
        item_patch=item_patch, item_vt=item_vt, forced_patch=fp,
        perm=tplan.perm, inv_perm=tplan.inv_perm,
        num_points=v, tile_v=tile_v, vp=vp,
    )


def sharded_pu_displacement(
    model,
    points: jnp.ndarray,       # (V, 3) original order
    item_patch: jnp.ndarray,   # (D, Tmax)
    item_vt: jnp.ndarray,      # (D, Tmax)
    forced_patch: jnp.ndarray, # (Vp,)
    perm: jnp.ndarray,
    inv_perm: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    num_points: int,
    tile_v: int,
    vp: int,
    mesh: Mesh,
) -> jnp.ndarray:
    """PU displacement, vertex tiles sharded over the 1-D device mesh.

    One pose is the F=1 case of the sharded frames pipeline (the kernel's
    column count follows the weight operand), so this delegates — one
    shard_map/tile-call/normalize implementation to maintain."""
    return _sharded_pu_frames_jit(
        (model,), points, item_patch, item_vt, forced_patch, perm,
        inv_perm, RBFKernel(kernel), PolyTerm(term), num_points, tile_v,
        vp, mesh,
    )[0]


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "term", "num_points", "tile_v", "vp", "mesh"),
)
def _sharded_pu_frames_jit(
    models,                    # tuple of PUModel pytrees (shared geometry)
    points: jnp.ndarray,
    item_patch: jnp.ndarray,
    item_vt: jnp.ndarray,
    forced_patch: jnp.ndarray,
    perm: jnp.ndarray,
    inv_perm: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    num_points: int,
    tile_v: int,
    vp: int,
    mesh: Mesh,
) -> jnp.ndarray:
    """(F, V, 3) whole-shot PU displacement, vertex tiles sharded over the
    device mesh: the frames trick (3F weight columns per kernel item,
    pallas_pu._pack_frames_operands) composed with the replicated-model /
    sharded-vertices design above.  All kernel work is collective-free;
    the single communication step is one explicit tiled all_gather of the
    (Vp, 3F) result so the global inverse tile-order permutation runs on
    a replicated array (see the comment in body)."""
    from facedeform_tpu.ops.pallas_pu import (
        _blocked_vertex_operands, _pack_frames_operands, _tiles_pallas_call,
    )

    v = num_points
    f_n = len(models)
    pts_blocks, lane = _blocked_vertex_operands(
        points, perm, forced_patch, v, vp, tile_v
    )
    packed = _pack_frames_operands(models)
    use_interpret = (
        np.asarray(mesh.devices).flat[0].platform != "tpu"
    )

    def body(ip, ivt, pts_b, lane_b, *packed_b):
        acc_d, acc_w = _tiles_pallas_call(
            ip[0], ivt[0], pts_b, lane_b, packed_b,
            RBFKernel(kernel), tile_v, use_interpret,
        )
        n_loc = pts_b.shape[0]
        d_flat = acc_d.transpose(0, 2, 1).reshape(n_loc * tile_v, 3 * f_n)
        w_flat = acc_w.reshape(n_loc * tile_v)
        out_local = jnp.where(
            (w_flat > 1e-30)[:, None],
            d_flat / jnp.maximum(w_flat, 1e-30)[:, None],
            0.0,
        )
        # Gather to replicated HERE, explicitly: the consumer needs the
        # full (V, 3F) result in original vertex order (falloff multiply,
        # host pull), and the inverse tile-order permutation below is a
        # GLOBAL shuffle — applying it to a sharded array makes GSPMD
        # invent a collective-permute chain (measured 21 permutes + 2
        # all-reduces at 8 devices); one tiled all_gather is the whole
        # O(V * 3F) transfer (tests/test_collectives_audit.py).
        return jax.lax.all_gather(out_local, VERTEX_AXIS, tiled=True)

    out_z = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(VERTEX_AXIS), P(VERTEX_AXIS),
            P(VERTEX_AXIS), P(VERTEX_AXIS),
        ) + (P(),) * len(packed),
        out_specs=P(),
        check_vma=False,
    )(item_patch, item_vt, pts_blocks, lane, *packed)
    out = out_z[:v][inv_perm]                      # (V, 3F)
    return out.reshape(v, f_n, 3).transpose(1, 0, 2)


def pu_displacement_frames_sharded(seq, points, mesh: Mesh, splan=None):
    """Sharded whole-shot eval for a PUSeqDeformer: one Mosaic pass per
    <=frames_per_dispatch chunk per shard, vertex tiles split across the
    mesh.  Mirrors ops/pu.PUSeqDeformer.displacement_frames semantics."""
    from facedeform_tpu.ops.pallas_pu import (
        frames_per_dispatch, plan_eval_tiles,
    )

    points_np = np.asarray(points, np.float32)
    if splan is None:
        tplan = plan_eval_tiles(seq.patches, points_np)
        splan = shard_tile_plan(tplan, mesh.shape[VERTEX_AXIS])
    models = tuple(p.model for p in seq.puds)
    args = (
        jnp.asarray(points_np),
        jnp.asarray(splan.item_patch), jnp.asarray(splan.item_vt),
        jnp.asarray(splan.forced_patch), jnp.asarray(splan.perm),
        jnp.asarray(splan.inv_perm), seq.kernel, seq.term,
        splan.num_points, splan.tile_v, splan.vp, mesh,
    )
    chunks = [
        _sharded_pu_frames_jit(models[f0:f0 + frames_per_dispatch], *args)
        for f0 in range(0, len(models), frames_per_dispatch)
    ]
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)


def pu_displacement_sharded(pud, points, mesh: Mesh, splan=None):
    """Convenience wrapper: build/split the plan and run the sharded eval.

    pud: a fitted ops.pu.PUDeformer; splan may be passed in (cache it with
    the plan, like the single-device paths)."""
    from facedeform_tpu.ops.pallas_pu import plan_eval_tiles

    points_np = np.asarray(points, np.float32)
    if splan is None:
        tplan = plan_eval_tiles(pud.patches, points_np)
        splan = shard_tile_plan(tplan, mesh.shape[VERTEX_AXIS])
    return sharded_pu_displacement(
        pud.model, jnp.asarray(points_np),
        jnp.asarray(splan.item_patch), jnp.asarray(splan.item_vt),
        jnp.asarray(splan.forced_patch), jnp.asarray(splan.perm),
        jnp.asarray(splan.inv_perm), pud.kernel, pud.term,
        splan.num_points, splan.tile_v, splan.vp, mesh,
    )
