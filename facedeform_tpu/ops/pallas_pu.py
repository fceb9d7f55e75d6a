"""Fused Mosaic kernel for the partition-of-unity tile eval.

The XLA composition in ops/pu.evaluate_pu (lax.map over per-patch tiles
plus a 1.4M-row segment_sum) sustains ~10 Gpair-ops/s on v5e.  This
kernel runs the whole plan as ONE pallas_call over (vertex tile, patch)
ITEMS sorted by vertex tile:

  * patch indirection by scalar prefetch — each per-patch operand's
    index_map picks block item_patch[i] (the block-sparse / MoE expert
    gather pattern);
  * the OUTPUT block's index_map returns item_vt[i], which repeats for
    consecutive items, so Mosaic keeps the accumulator resident in VMEM
    across a tile's items (the matmul-k-loop revisiting rule) — the
    kernel accumulates w * s_k(x) and w in place and NO scatter /
    segment_sum exists anywhere;
  * a first-visit @pl.when zero-initializes each accumulator block, and
    a tile-level early-out skips patches that only graze the tile.

Per item, the body mirrors ops/pallas_eval's VPU-only layout: (3, TV)
points against (P, 3) patch controls via broadcast squared differences,
phi on the VPU (+ transcendental unit), weighted sublane reductions for
the contraction, centered polynomial tail, Wendland-C2 partition weight.

f32 only: this is the eps="auto" fast path (well-conditioned local
bases, measured equal to the df tiles at 7.5e-8 — see
PUDeformer.displacement); precise=True stays on the XLA df tiles.

Measured (v5e, 20k-control TPS, 500k device-resident query points,
explicit PUTilePlan): 138 ms vs 363 ms for the XLA composition (whose
segment_sum alone measures ~600 ms at full plan width) — and both paths
are tunnel-transfer-bound (~0.6 s per 6 MB h2d) when callers re-upload
host points per frame; keep points device-resident and pass the plan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.pallas_eval import _phi


# ------------------------------------------------- vertex-tile-major variant
class PUTilePlan:
    """Vertex-tile-major eval plan (host-built; cache alongside the model).

    The per-patch plan above needs a 1.4M-row segment_sum to scatter tile
    contributions back to vertices — measured comparable to the whole
    compute on v5e.  This plan inverts the nesting: the grid walks
    (vertex_tile, patch) ITEMS sorted by vertex tile, the output block's
    index_map returns the vertex tile, and Mosaic's revisiting rule keeps
    that block resident in VMEM across its consecutive items — the kernel
    ACCUMULATES displacement and partition weight in place and the final
    normalize is one elementwise op.  No scatter anywhere.

    Query points should be spatially ordered (the builder Z-orders
    internally and records the permutation) so each vertex tile intersects
    few patch balls.
    """

    def __init__(self, item_patch, item_vt, forced_patch, perm, inv_perm,
                 num_points, tile_v):
        self.item_patch = item_patch      # (T',) int32
        self.item_vt = item_vt            # (T',) int32, sorted ascending
        self.forced_patch = forced_patch  # (Vp,) int32 (-1 = none)
        self.perm = perm                  # (V,) Z-order permutation
        self.inv_perm = inv_perm
        self.num_points = num_points
        self.tile_v = tile_v
        self._device = None

    def device_arrays(self):
        """The plan's arrays as device-resident jnp arrays, uploaded ONCE
        (per-frame re-wrapping would pay ~6 MB h2d per call at 500k
        points on a tunneled link)."""
        if self._device is None:
            self._device = tuple(
                jnp.asarray(a)
                for a in (self.item_patch, self.item_vt, self.forced_patch,
                          self.perm, self.inv_perm)
            )
        return self._device


def plan_eval_tiles(patches, points, tile_v: int = 256) -> PUTilePlan:
    """Build a PUTilePlan: Z-order the queries, list (vertex tile, patch)
    items, and the per-point nearest-patch fallback assignments."""
    import numpy as np

    points = np.asarray(points, np.float32)
    v = points.shape[0]
    # host Z-order (cheap mirror of ops.morton on numpy)
    lo, hi = points.min(0), points.max(0)
    scale = 1023.0 / np.maximum(hi - lo, 1e-12)
    q = np.clip((points - lo) * scale, 0, 1023).astype(np.uint32)

    def expand(x):
        x = x.astype(np.uint32)
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x

    code = expand(q[:, 0]) | (expand(q[:, 1]) << 1) | (expand(q[:, 2]) << 2)
    perm = np.argsort(code, kind="stable").astype(np.int32)
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(v, dtype=np.int32)
    pz = points[perm]

    vp = v + ((-v) % tile_v)
    n_vt = vp // tile_v
    point_vt = np.arange(v) // tile_v                  # in Z order

    from facedeform_tpu.ops.pu import coverage_and_fallback

    vt_sets: list[set] = [set() for _ in range(n_vt)]
    per_patch, covered, (un, pick) = coverage_and_fallback(patches, pz)
    for k, hits in enumerate(per_patch):
        if hits.size:
            for vt in np.unique(point_vt[hits]):
                vt_sets[vt].add(int(k))
    forced_patch = np.full(vp, -1, np.int32)
    forced_patch[un] = pick.astype(np.int32)
    for vi, k in zip(un, pick):
        vt_sets[point_vt[vi]].add(int(k))

    item_vt, item_patch = [], []
    for vt in range(n_vt):
        ks = sorted(vt_sets[vt]) or [0]   # empty tile: one no-op item
        item_vt.extend([vt] * len(ks))
        item_patch.extend(ks)
    return PUTilePlan(
        item_patch=np.asarray(item_patch, np.int32),
        item_vt=np.asarray(item_vt, np.int32),
        forced_patch=forced_patch,
        perm=perm, inv_perm=inv_perm,
        num_points=v, tile_v=tile_v,
    )


def _pu_accum_kernel(
    item_patch_ref,    # (T',) SMEM
    item_vt_ref,       # (T',) SMEM
    pts_ref,           # (1, 3, TV) VMEM: this vertex tile's points (Z order)
    lane_ref,          # (1, 2, TV): row 0 valid, row 1 forced patch id (f32)
    ctrl_ref,          # (1, P, 3)
    cvalid_ref,        # (1, 1, P)
    w_ref,             # (1, P, C)  C=3 one pose, 3F animated shot
    poly_ref,          # (1, 4, C)
    geom_ref,          # (1, 1, 8)
    out_ref,           # (1, C, TV) accumulator (revisited across items)
    wout_ref,          # (1, 1, TV)
    *,
    kernel: RBFKernel,
):
    i = pl.program_id(0)
    vt = item_vt_ref[i]
    prev_vt = item_vt_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, vt != prev_vt)

    @pl.when(first)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])
        wout_ref[0] = jnp.zeros_like(wout_ref[0])

    pts = pts_ref[0]
    geom = geom_ref[0, 0]
    cx, cy, cz = geom[0], geom[1], geom[2]
    inv_eps2 = geom[3]
    inv_r2 = geom[4]

    xl0 = pts[0:1, :] - cx
    xl1 = pts[1:2, :] - cy
    xl2 = pts[2:3, :] - cz

    # this item's partition weight at the tile's points: Wendland of the
    # center distance, or 1 where this patch is the point's forced fallback
    d2c = xl0 * xl0 + xl1 * xl1 + xl2 * xl2
    bw = _phi(RBFKernel.WENDLAND_C2, d2c, inv_r2)
    lane_valid = lane_ref[0, 0:1, :]
    forced_k = lane_ref[0, 1:2, :]
    kf = item_patch_ref[i].astype(jnp.float32)
    w = jnp.where(forced_k == kf, 1.0, bw) * lane_valid
    # dead items (patch id -1: sharded-plan padding) contribute nothing —
    # gate BEFORE the forced comparison could match a -1 forced sentinel
    w = jnp.where(kf >= 0.0, w, 0.0)

    # Tile-level early out: this patch may touch only a corner of the tile
    @pl.when(jnp.max(w) > 0.0)
    def _contrib():
        ctrl = ctrl_ref[0]
        cvalid = cvalid_ref[0]
        lc0 = (ctrl[:, 0:1] - cx) * cvalid.T
        lc1 = (ctrl[:, 1:2] - cy) * cvalid.T
        lc2 = (ctrl[:, 2:3] - cz) * cvalid.T
        dx = lc0 - xl0
        dy = lc1 - xl1
        dz = lc2 - xl2
        d2 = dx * dx + dy * dy + dz * dz
        phi = _phi(kernel, d2, inv_eps2) * cvalid.T
        w_loc = w_ref[0]
        # column count is whatever the weight operand carries: 3 for one
        # pose, 3F for an animated shot (evaluate_pu_tiles_frames) — phi
        # is computed ONCE and contracted against every column
        disp = jnp.concatenate(
            [
                jnp.sum(phi * w_loc[:, c : c + 1], axis=0, keepdims=True)
                for c in range(w_loc.shape[1])
            ],
            axis=0,
        )
        wp = poly_ref[0]
        disp = (
            disp
            + wp[0][:, None]
            + wp[1][:, None] * xl0
            + wp[2][:, None] * xl1
            + wp[3][:, None] * xl2
        )
        out_ref[0] = out_ref[0] + disp * w
        wout_ref[0] = wout_ref[0] + w


def evaluate_pu_tiles(
    model,
    points: jnp.ndarray,       # (V, 3) ORIGINAL order
    item_patch: jnp.ndarray,   # (T',)
    item_vt: jnp.ndarray,      # (T',) sorted
    forced_patch: jnp.ndarray, # (Vp,) int32 in Z order
    perm: jnp.ndarray,
    inv_perm: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    num_points: int,
    tile_v: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scatter-free PU displacement: (V, 3) in the caller's point order.

    One pose is the F=1 case of the frames pipeline (the kernel's column
    count is whatever the weight operand carries), so this delegates to
    _tiles_frames_jit with a single model — one implementation of the
    block/call/normalize math to maintain.

    Note on the Z-order round trip: CLAUDE.md bans per-frame gathers on
    the MAIN mesh eval path (8 ms/1M-row permute vs a 8-23 ms kernel);
    here the kernel itself runs 74+ ms on PU-scale rigs and the two
    permutes cost <10% — accepted, and callers can amortize by passing
    pre-Z-ordered points whose plan permutation is the identity.
    """
    if points.shape[0] != num_points:
        raise ValueError(
            f"plan was built for {num_points} points, got "
            f"{points.shape[0]} — stale plan? (a mismatched gather would "
            "clamp out of range and return garbage silently on TPU)"
        )
    return _tiles_frames_jit(
        (model,), points, item_patch, item_vt, forced_patch, perm,
        inv_perm, RBFKernel(kernel), PolyTerm(term), num_points, tile_v,
        interpret,
    )[0]


def _pack_frames_operands(models):
    """Pack F per-frame PUModels (shared geometry, distinct weights) into
    one operand set with 3F weight/poly columns: frame f's weights occupy
    columns 3f..3f+2, matching fit_pu_frames' RHS layout."""
    base = models[0]
    k_, p_, _ = base.ctrl.shape
    p_pad = (-p_) % 8
    ctrl = jnp.pad(base.ctrl, ((0, 0), (0, p_pad), (0, 0)))
    cvalid = jnp.pad(base.valid, ((0, 0), (0, p_pad)))[:, None, :]
    w_loc = jnp.concatenate(
        [jnp.pad(m.w_hi + m.w_lo, ((0, 0), (0, p_pad), (0, 0)))
         for m in models],
        axis=2,
    )
    m_ = base.poly_hi.shape[1]
    poly = jnp.zeros((k_, 4, 3 * len(models)), jnp.float32)
    if m_:
        poly_all = jnp.concatenate(
            [m.poly_hi + m.poly_lo for m in models], axis=2
        )
        poly = poly.at[:, :m_].set(poly_all)
    inv_eps2 = 1.0 / jnp.maximum(base.eps * base.eps, 1e-30)
    inv_r2 = 1.0 / jnp.maximum(base.radii * base.radii, 1e-30)
    geom = jnp.concatenate(
        [
            base.centers.astype(jnp.float32),
            inv_eps2[:, None].astype(jnp.float32),
            inv_r2[:, None].astype(jnp.float32),
            jnp.zeros((k_, 3), jnp.float32),
        ],
        axis=1,
    )[:, None, :]
    return ctrl, cvalid, w_loc, poly, geom


# Frame-axis chunking bound for evaluate_pu_tiles_frames: the output
# accumulator block is (3F, TV) and the weight operand (P, 3F) — at
# tile_v=256, P~200 this is ~(3F+0.8F) KB per block, trivially VMEM-safe
# to F=32; beyond that chunk (still one jit program per chunk size).
frames_per_dispatch = 32


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "term", "num_points", "tile_v", "interpret"),
)
def _tiles_frames_jit(models, points, item_patch, item_vt, forced_patch,
                      perm, inv_perm, kernel, term, num_points, tile_v,
                      interpret):
    v = num_points
    vp = v + ((-v) % tile_v)
    pts_blocks, lane = _blocked_vertex_operands(
        points, perm, forced_patch, v, vp, tile_v
    )
    f_n = len(models)
    acc_d, acc_w = _tiles_pallas_call(
        item_patch, item_vt, pts_blocks, lane,
        _pack_frames_operands(models),
        RBFKernel(kernel), tile_v, interpret,
    )
    acc_d = acc_d.transpose(0, 2, 1).reshape(vp, 3 * f_n)[:v]
    acc_w = acc_w.reshape(vp)[:v]
    out_z = jnp.where(
        (acc_w > 1e-30)[:, None],
        acc_d / jnp.maximum(acc_w, 1e-30)[:, None],
        0.0,
    )[inv_perm]
    return out_z.reshape(v, f_n, 3).transpose(1, 0, 2)


def evaluate_pu_tiles_frames(
    models,
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
    interpret: bool = False,
) -> jnp.ndarray:
    """(F, V, 3) PU displacement for F frames in ONE kernel pass per
    frame chunk: phi/partition weights are computed once per (tile,
    patch) item and contracted against all 3F weight columns — the PU
    analogue of ops/pallas_eval.evaluate_pallas_frames.  `models` share
    geometry (fit_pu_frames output); only weights differ per frame."""
    if points.shape[0] != num_points:
        raise ValueError(
            f"plan was built for {num_points} points, got "
            f"{points.shape[0]} — stale plan?"
        )
    chunks = [
        _tiles_frames_jit(
            tuple(models[f0:f0 + frames_per_dispatch]), points,
            item_patch, item_vt, forced_patch, perm, inv_perm,
            RBFKernel(kernel), term, num_points, tile_v, interpret,
        )
        for f0 in range(0, len(models), frames_per_dispatch)
    ]
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)


def _tiles_pallas_call(item_patch, item_vt, pts_blocks, lane, packed,
                       kernel, tile_v, interpret):
    """The raw accumulating pallas_call over (vertex tile, patch) items.

    item_vt indexes pts_blocks/lane/output blocks LOCALLY (whatever tiling
    the caller passed — global for the single-device path, shard-local for
    the sharded one).  Dead items (patch -1) are index-clamped and weight-
    gated to zero.
    """
    ctrl, cvalid, w_loc, poly, geom = packed
    t_ = item_patch.shape[0]
    n_vt = pts_blocks.shape[0]
    c_ = w_loc.shape[2]      # 3 for one pose, 3F for an animated shot

    def by_vt(i, ip, ivt):
        return (ivt[i], 0, 0)

    def by_patch(i, ip, ivt):
        return (jnp.maximum(ip[i], 0), 0, 0)   # dead items clamp to 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_,),
        in_specs=[
            pl.BlockSpec((1, 3, tile_v), by_vt),
            pl.BlockSpec((1, 2, tile_v), by_vt),
            pl.BlockSpec((1, ctrl.shape[1], 3), by_patch),
            pl.BlockSpec((1, 1, ctrl.shape[1]), by_patch),
            pl.BlockSpec((1, ctrl.shape[1], c_), by_patch),
            pl.BlockSpec((1, 4, c_), by_patch),
            pl.BlockSpec((1, 1, 8), by_patch),
        ],
        out_specs=[
            pl.BlockSpec((1, c_, tile_v), by_vt),
            pl.BlockSpec((1, 1, tile_v), by_vt),
        ],
    )
    return pl.pallas_call(
        functools.partial(_pu_accum_kernel, kernel=kernel),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_vt, c_, tile_v), jnp.float32),
            jax.ShapeDtypeStruct((n_vt, 1, tile_v), jnp.float32),
        ],
        interpret=interpret,
    )(item_patch.astype(jnp.int32), item_vt.astype(jnp.int32),
      pts_blocks, lane, ctrl, cvalid, w_loc, poly, geom)


def _blocked_vertex_operands(points, perm, forced_patch, v, vp, tile_v):
    """(pts_blocks (n_vt, 3, TV), lane (n_vt, 2, TV)) for the tile kernel:
    Z-ordered padded points plus the [valid, forced-patch-id] lane rows.
    Shared by the single-device and vertex-sharded callers."""
    pz = points.astype(jnp.float32)[perm]
    pz = jnp.pad(pz, ((0, vp - v), (0, 0)))
    pts_blocks = pz.T.reshape(3, vp // tile_v, tile_v).transpose(1, 0, 2)
    lane = jnp.stack(
        [
            (jnp.arange(vp) < v).astype(jnp.float32).reshape(-1, tile_v),
            forced_patch.astype(jnp.float32).reshape(-1, tile_v),
        ],
        axis=1,
    )
    return pts_blocks, lane
