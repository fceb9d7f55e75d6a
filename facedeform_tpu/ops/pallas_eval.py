"""Fused Pallas TPU kernel for per-vertex RBF evaluation (the hot path).

The reference's hottest loop calls ALGLIB's rbfcalc once per mesh vertex
(src/SOP_FaceDeform.cpp:404-439), and its disabled threaded path shards
vertices over CPU threads (src/SOP_FaceDeform.hpp:116-188).  This kernel is
the TPU promotion of that loop: one fused pass per vertex tile that

    1. computes squared distances to all control points (never
       materializing the (V, N) kernel matrix in HBM),
    2. applies the radial basis phi on the VPU (per-layer radii),
    3. contracts phi against the solved weights,
    4. adds the polynomial tail,
    5. applies the capture falloff  (1 - min(d2/r^2, 1))^rate  and gate,
    6. writes  P + falloff * disp  and the fd_falloff attribute.

Layout: vertices ride the 128-lane axis — positions are passed transposed
as (3, V) and control data as (N, 3)/(N,) so every big intermediate is
(N, TILE_V) with N on sublanes, V on lanes.  Control points, weights and
radii are tiny (N <= a few k) and live replicated in VMEM across the grid.

This workload is VPU-bound: the rank-3 geometry makes both candidate
matmuls pad-dominated MXU slivers (see the comment in _eval_kernel), so
the whole kernel deliberately runs on the VPU.  Measured 147 Gevals/s per
v5e chip at N=1024 — 147x the BASELINE >= 1e9 evals/s target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.fit import RBFModel

# Lanes-axis tile.  Swept on v5e (round 2): 1024 beats 512 by 14-23% at
# every measured rig size (N = 1k: 132 vs 116 G; N = 2k: 177 vs 145 G;
# culled N = 4k: 306 vs 254 G effective; N = 50k culled: 77 vs 85 ms) —
# the fori-loop reuses one (block, TILE_V) buffer set so VMEM stays in
# budget even at the 2048-row control slabs.  2048 lanes OOMs VMEM.
_TILE_V = 1024
_CTRL_BLOCK = 2048  # control-axis slab; bounds VMEM for large rigs



def _pad_frame_inputs(frame, v_pad, tile_v):
    """Pad + transpose tangent-frame arrays to (3, Vp) and build their
    vertex-tiled VMEM BlockSpecs (shared by the dense, culled and
    double-float kernels)."""
    inputs = []
    specs = []
    if frame is None:
        return inputs, specs
    for f in frame:
        inputs.append(
            jnp.pad(f.astype(jnp.float32), ((0, v_pad), (0, 0))).T  # (3, Vp)
        )
        specs.append(
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
    return inputs, specs

def _phi(kernel: RBFKernel, d2: jnp.ndarray, inv_eps2: jnp.ndarray) -> jnp.ndarray:
    """phi((r/eps)^2) on the VPU; mirrors ops.kernels.apply_kernel with the
    division pre-hoisted into inv_eps2 = 1/eps^2."""
    s = d2 * inv_eps2
    if kernel == RBFKernel.GAUSSIAN:
        return jnp.exp(-s)
    if kernel == RBFKernel.THIN_PLATE:
        from facedeform_tpu.ops.precise_math import precise_log

        # hardware log is ~3.6e-4 relative on TPU — see precise_math.py
        return jnp.where(s > 1e-30, 0.5 * s * precise_log(jnp.maximum(s, 1e-30)), 0.0)
    if kernel == RBFKernel.MULTIQUADRIC:
        return jnp.sqrt(1.0 + s)
    if kernel == RBFKernel.INVERSE_MULTIQUADRIC:
        return jax.lax.rsqrt(1.0 + s)
    if kernel == RBFKernel.LINEAR:
        return jnp.sqrt(s)
    if kernel == RBFKernel.CUBIC:
        return s * jnp.sqrt(s)
    if kernel == RBFKernel.WENDLAND_C2:
        t = jnp.sqrt(s)
        base = jnp.maximum(1.0 - t, 0.0)
        b2 = base * base
        return b2 * b2 * (4.0 * t + 1.0)
    raise ValueError(kernel)


def _normalize_cols(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalize (3, TV) column vectors on the VPU."""
    return x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=0, keepdims=True), eps)
    )


def _frame_axes(u_raw, v_raw, n_raw):
    """The oblique-projection axes a1, a2 from raw (3, TV) tangent
    attributes (component G, SOP_FaceDeform.hpp:28-41): with unit u, v, n
    and B = [u; v; n], a1 = norm(u.B), a2 = norm(v.B).  Displacement-
    independent, so multi-frame callers compute them once."""
    u = _normalize_cols(u_raw)
    tv = _normalize_cols(v_raw)
    nn = _normalize_cols(n_raw)

    def dot_b(x):
        return (
            jnp.sum(x * u, axis=0, keepdims=True) * u
            + jnp.sum(x * tv, axis=0, keepdims=True) * tv
            + jnp.sum(x * nn, axis=0, keepdims=True) * nn
        )

    return _normalize_cols(dot_b(u)), _normalize_cols(dot_b(tv))


def _project_cols(disp, a1, a2):
    """disp' = a1 (disp.a1) + a2 (disp.a2) on (3, TV) columns — the
    reference's oblique projection verbatim."""
    return (
        a1 * jnp.sum(disp * a1, axis=0, keepdims=True)
        + a2 * jnp.sum(disp * a2, axis=0, keepdims=True)
    )


def _project_frame_cols(disp, u_raw, v_raw, n_raw):
    """Fused tangent projection on (3, TV) columns (see _frame_axes)."""
    return _project_cols(disp, *_frame_axes(u_raw, v_raw, n_raw))


def _eval_kernel(
    # scalar prefetch: none; SMEM params first per in_specs ordering
    scalars_ref,   # (2,) SMEM: [radius^2, falloffrate]
    pts_ref,       # (3, TILE_V) VMEM: vertex positions, transposed
    dist2_ref,     # (1, TILE_V) VMEM: capture squared distances
    gate_ref,      # (1, TILE_V) VMEM: 0/1 group-mask gate
    ctrl_ref,      # (N, 3) VMEM: control points (replicated)
    w_ref,         # (L, N, 3) VMEM: per-layer RBF weights
    inv_eps2_ref,  # (L, N) VMEM: per-layer 1/eps^2
    w_poly_ref,    # (4, 3) VMEM: polynomial tail (zero-padded)
    *refs,         # [u_ref, v_ref, n_ref,] out_ref, falloff_ref
    kernel: RBFKernel,
    n_layers: int,
    strict_parity: bool,
    has_frame: bool,
    center_phi: bool,
):
    if has_frame:
        u_ref, vt_ref, nrm_ref, out_ref, falloff_ref = refs
    else:
        out_ref, falloff_ref = refs
    # Everything below is VPU-only by design.  The "obvious" MXU mapping
    # (K=3 distance matmul + M=3 weight contraction at HIGHEST precision)
    # measured 92 Gevals/s on v5e because both matmuls are pad-dominated
    # slivers; broadcast squared-differences + weighted sublane reductions
    # measured 147 Gevals/s at equal (5.6e-6) accuracy, and sidestep the
    # bf16 demotion of DEFAULT-precision MXU f32 matmuls entirely.
    # (Measured: the exp itself is FREE — the transcendental unit runs in
    # parallel with the VPU ALU ops; phi=exp vs phi=identity is 144.4 vs
    # 144.0 Gevals/s.)
    #
    # The control axis is processed in CTRL_BLOCK slabs so the (block, TV)
    # intermediates stay within VMEM for arbitrary N (N = 8192 OOMs the
    # single-slab layout).
    pts = pts_ref[:]                                   # (3, TV)
    n_total = ctrl_ref.shape[0]
    n_blocks = pl.cdiv(n_total, _CTRL_BLOCK) if n_total > _CTRL_BLOCK else 1
    block = n_total if n_blocks == 1 else _CTRL_BLOCK

    # Capture gating, computed FIRST: the reference's eval loop skips
    # vertices beyond the capture radius entirely (`continue`,
    # src/SOP_FaceDeform.cpp:404-410).  The tile-level equivalent: when no
    # lane in this tile is active (all captured distances beyond radius,
    # or the whole tile group-masked off), skip the contraction outright —
    # production capture workflows deform a small mesh region, so most
    # tiles take the early exit.
    r2 = scalars_ref[0]
    rate = scalars_ref[1]
    cap_d2 = dist2_ref[:]                              # (1, TV)
    if not strict_parity:
        cap_d2 = jnp.maximum(cap_d2, 0.0)
    active = (cap_d2 <= r2).astype(jnp.float32) * gate_ref[:]
    tile_alive = jnp.max(active) > 0.0

    def block_d2(lo):
        ctrl = ctrl_ref[pl.ds(lo, block)]              # (B, 3)
        dx = ctrl[:, 0:1] - pts[0:1, :]                # (B, TV) broadcasts
        dy = ctrl[:, 1:2] - pts[1:2, :]
        dz = ctrl[:, 2:3] - pts[2:3, :]
        return dx * dx + dy * dy + dz * dz             # exact f32, no cancellation

    def block_contrib(lo, disp, center):
        """center: (1, TV) per-vertex constant subtracted from layer-0 phi —
        valid under the sum(w) = 0 tail constraint; see
        ops.evaluate._center_phi.  Subtracting INSIDE the per-block sum is
        what shrinks the cancelling f32 terms (growing kernels carry
        |w| >> |disp|); a post-hoc correction would not."""
        d2 = block_d2(lo)
        for layer in range(n_layers):
            phi = _phi(kernel, d2, inv_eps2_ref[layer, pl.ds(lo, block)][:, None])
            if center is not None and layer == 0:
                phi = phi - center
            w_l = w_ref[layer, pl.ds(lo, block)]       # (B, 3)
            disp = disp + jnp.concatenate(
                [
                    jnp.sum(phi * w_l[:, i : i + 1], axis=0, keepdims=True)
                    for i in range(3)
                ],
                axis=0,
            )
        return disp

    def compute_disp(_):
        disp = jnp.zeros((3, pts.shape[1]), jnp.float32)
        if n_blocks == 1:
            center = None
            if center_phi:
                phi0 = _phi(
                    kernel, block_d2(0), inv_eps2_ref[0, pl.ds(0, block)][:, None]
                )
                center = jnp.mean(phi0, axis=0, keepdims=True)
            disp = block_contrib(0, disp, center)
        else:
            # fori_loop (not an unrolled python loop): Mosaic then reuses
            # one (block, TV) buffer set instead of keeping every slab live.
            if center_phi:
                # Pass 1: per-vertex mean of layer-0 phi over ALL controls,
                # so blocked mode keeps the same centering accuracy as the
                # dense path (an extra distance+phi sweep; no contraction).
                def mean_body(b, acc):
                    phi = _phi(
                        kernel,
                        block_d2(b * block),
                        inv_eps2_ref[0, pl.ds(b * block, block)][:, None],
                    )
                    return acc + jnp.sum(phi, axis=0, keepdims=True)
                row_sum = jax.lax.fori_loop(
                    0, n_blocks, mean_body,
                    jnp.zeros((1, pts.shape[1]), jnp.float32),
                )
                center = row_sum / (n_blocks * block)
            else:
                center = None
            disp = jax.lax.fori_loop(
                0,
                n_blocks,
                lambda b, acc: block_contrib(b * block, acc, center),
                disp,
            )
        # Polynomial tail: w_poly rows [1, x, y, z]; contributions (3, TV).
        wp = w_poly_ref[:]                             # (4, 3)
        disp = (
            disp
            + wp[0][:, None]
            + wp[1][:, None] * pts[0:1, :]
            + wp[2][:, None] * pts[1:2, :]
            + wp[3][:, None] * pts[2:3, :]
        )
        if has_frame:
            disp = _project_frame_cols(disp, u_ref[:], vt_ref[:], nrm_ref[:])
        return disp

    disp = jax.lax.cond(
        tile_alive, compute_disp,
        lambda _: jnp.zeros((3, pts.shape[1]), jnp.float32), 0,
    )
    ratio = jnp.minimum(cap_d2 / r2, 1.0)
    base = (1.0 - ratio) if strict_parity else jnp.maximum(1.0 - ratio, 0.0)
    w = jnp.power(base, rate) * active                 # (1, TV)
    falloff_ref[:] = w
    out_ref[:] = pts + disp * w


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "term", "strict_parity", "tile_v", "interpret"),
)
def evaluate_pallas(
    model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    radius: jnp.ndarray,
    falloffrate: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    strict_parity: bool = False,
    tile_v: int = _TILE_V,
    interpret: bool = False,
    frame=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused deform step on TPU: returns (new_points (V, 3), falloff (V,)).

    Semantics identical to deformer.apply_fn's dense path (eval loop
    src/SOP_FaceDeform.cpp:404-439).  An optional frame=(u, v, n) of
    (V, 3) tangent attributes fuses the tangent-space projection into the
    kernel (applied to the raw displacement, before falloff, matching
    :416-422).
    """
    v = points.shape[0]
    n = model.ctrl.shape[0]
    n_layers = model.w_rbf.shape[0]

    # Pad N to the f32 sublane quantum (or to whole control slabs when the
    # rig exceeds one slab); zero-weight padding contributes 0.
    n_pad = (-n) % (8 if n <= _CTRL_BLOCK else _CTRL_BLOCK)
    ctrl = jnp.pad(model.ctrl, ((0, n_pad), (0, 0)))
    w_rbf = jnp.pad(model.w_rbf, ((0, 0), (0, n_pad), (0, 0)))
    # Padded rows get inv_eps2 = 1 to keep phi finite; weight 0 kills them.
    inv_eps2 = 1.0 / jnp.maximum(model.eps * model.eps, 1e-30)
    inv_eps2 = jnp.pad(inv_eps2, ((0, 0), (0, n_pad)), constant_values=1.0)
    # Polynomial tail to fixed (4, 3): LINEAR keeps all, CONSTANT row 0,
    # ZERO none — absent rows are zero and contribute nothing.
    m = model.w_poly.shape[0]
    w_poly = jnp.zeros((4, 3), jnp.float32)
    if m > 0:
        w_poly = w_poly.at[:m].set(model.w_poly)

    v_pad = (-v) % tile_v
    pts_t = jnp.pad(points.astype(jnp.float32), ((0, v_pad), (0, 0))).T  # (3, Vp)
    d2_in = jnp.pad(dist2.astype(jnp.float32), (0, v_pad))[None, :]      # (1, Vp)
    gate_in = jnp.pad(gate.astype(jnp.float32), (0, v_pad))[None, :]
    vp = pts_t.shape[1]
    grid = (vp // tile_v,)

    scalars = jnp.stack(
        [
            (radius * radius).astype(jnp.float32),
            jnp.asarray(falloffrate, jnp.float32),
        ]
    )

    has_frame = frame is not None
    frame_inputs, frame_specs = _pad_frame_inputs(frame, v_pad, tile_v)

    from facedeform_tpu.ops.evaluate import _center_phi

    kern = functools.partial(
        _eval_kernel,
        kernel=RBFKernel(kernel),
        n_layers=n_layers,
        strict_parity=strict_parity,
        has_frame=has_frame,
        center_phi=_center_phi(kernel, term),
    )
    flops_per_tile = 2 * (ctrl.shape[0] * tile_v * 3) * (1 + n_layers)
    out_t, falloff = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # scalars
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # ctrl
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # inv_eps2
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w_poly
        ] + frame_specs,
        out_specs=[
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * grid[0],
            bytes_accessed=vp * 3 * 4 * 2,
            transcendentals=ctrl.shape[0] * vp * n_layers,
        ),
        interpret=interpret,  # CPU-testable path (tests/conftest forces cpu)
    )(scalars, pts_t, d2_in, gate_in, ctrl, w_rbf, inv_eps2, w_poly, *frame_inputs)
    return out_t.T[:v], falloff[0, :v]


# ---------------------------------------------------------- frames-batched
def _eval_frames_kernel(
    scalars_ref,   # (2,) SMEM: [radius^2, falloffrate]
    pts_ref,       # (3, TILE_V) VMEM
    dist2_ref,     # (1, TILE_V) VMEM
    gate_ref,      # (1, TILE_V) VMEM
    ctrl_ref,      # (N, 3) VMEM (frame-invariant)
    w_ref,         # (L, N, 3F) VMEM: weights, frames packed on columns
    inv_eps2_ref,  # (L, N) VMEM (frame-invariant: radii depend on rest rig)
    w_poly_ref,    # (4, 3F) VMEM
    *refs,         # [u_ref, v_ref, n_ref,] out_ref, falloff_ref
    kernel: RBFKernel,
    n_layers: int,
    n_frames: int,
    strict_parity: bool,
    has_frame: bool,
    center_phi: bool,
):
    """All-frames eval in one pass: distances + phi computed ONCE per
    (control block x vertex tile), contracted against every frame's
    weights in a single MXU matmul.

    An animated shot shares ctrl/eps across frames (the rest rig is
    fixed), so phi — the expensive VPU/transcendental chain — amortizes
    over the frame axis, and the contraction becomes a (3F, B) x (B, TV)
    dot.  The single-frame kernel rejects the MXU because a 3-column
    matmul is a pad-dominated sliver (see _eval_kernel); at 3F = 24+
    columns the sliver argument flips and one HIGHEST-precision dot beats
    3F separate VPU reductions (measured: the unrolled-reduction variant
    ran 19.5 G effective; this one 291 G at F=8).  An optional tangent
    frame (u, v, n) applies the reference's oblique projection to each
    frame's 3-row group of the packed displacement, before falloff
    (src/SOP_FaceDeform.cpp:416-422).  Reference context: the per-cook
    model rebuild this replaces, src/SOP_FaceDeform.cpp:330-439.
    """
    if has_frame:
        u_ref, vt_ref, nrm_ref, out_ref, falloff_ref = refs
    else:
        out_ref, falloff_ref = refs
    pts = pts_ref[:]
    n_total = ctrl_ref.shape[0]
    n_blocks = pl.cdiv(n_total, _CTRL_BLOCK) if n_total > _CTRL_BLOCK else 1
    block = n_total if n_blocks == 1 else _CTRL_BLOCK
    f3 = 3 * n_frames

    r2 = scalars_ref[0]
    rate = scalars_ref[1]
    cap_d2 = dist2_ref[:]
    if not strict_parity:
        cap_d2 = jnp.maximum(cap_d2, 0.0)
    active = (cap_d2 <= r2).astype(jnp.float32) * gate_ref[:]
    tile_alive = jnp.max(active) > 0.0

    def block_d2(lo):
        ctrl = ctrl_ref[pl.ds(lo, block)]
        dx = ctrl[:, 0:1] - pts[0:1, :]
        dy = ctrl[:, 1:2] - pts[1:2, :]
        dz = ctrl[:, 2:3] - pts[2:3, :]
        return dx * dx + dy * dy + dz * dz

    def block_contrib(lo, disp, center):
        d2 = block_d2(lo)
        for layer in range(n_layers):
            phi = _phi(kernel, d2, inv_eps2_ref[layer, pl.ds(lo, block)][:, None])
            if center is not None and layer == 0:
                phi = phi - center
            w_l = w_ref[layer, pl.ds(lo, block)]         # (B, 3F)
            disp = disp + jax.lax.dot_general(
                w_l, phi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                            # (3F, TV)
        return disp

    def compute_disp(_):
        disp = jnp.zeros((f3, pts.shape[1]), jnp.float32)
        if n_blocks == 1:
            center = None
            if center_phi:
                phi0 = _phi(
                    kernel, block_d2(0), inv_eps2_ref[0, pl.ds(0, block)][:, None]
                )
                center = jnp.mean(phi0, axis=0, keepdims=True)
            disp = block_contrib(0, disp, center)
        else:
            if center_phi:
                def mean_body(b, acc):
                    phi = _phi(
                        kernel,
                        block_d2(b * block),
                        inv_eps2_ref[0, pl.ds(b * block, block)][:, None],
                    )
                    return acc + jnp.sum(phi, axis=0, keepdims=True)
                row_sum = jax.lax.fori_loop(
                    0, n_blocks, mean_body,
                    jnp.zeros((1, pts.shape[1]), jnp.float32),
                )
                center = row_sum / (n_blocks * block)
            else:
                center = None
            disp = jax.lax.fori_loop(
                0,
                n_blocks,
                lambda b, acc: block_contrib(b * block, acc, center),
                disp,
            )
        # per-frame polynomial tails: w_poly rows [1, x, y, z] x (3F,)
        wp = w_poly_ref[:]                               # (4, 3F)
        disp = (
            disp
            + wp[0][:, None]
            + wp[1][:, None] * pts[0:1, :]
            + wp[2][:, None] * pts[1:2, :]
            + wp[3][:, None] * pts[2:3, :]
        )
        if has_frame:
            # axes are displacement-independent: compute once, project
            # every frame's 3-row group
            a1, a2 = _frame_axes(u_ref[:], vt_ref[:], nrm_ref[:])
            disp = jnp.concatenate([
                _project_cols(disp[3 * f : 3 * f + 3], a1, a2)
                for f in range(n_frames)
            ], axis=0)
        return disp

    disp = jax.lax.cond(
        tile_alive, compute_disp,
        lambda _: jnp.zeros((f3, pts.shape[1]), jnp.float32), 0,
    )
    ratio = jnp.minimum(cap_d2 / r2, 1.0)
    base = (1.0 - ratio) if strict_parity else jnp.maximum(1.0 - ratio, 0.0)
    w = jnp.power(base, rate) * active                   # (1, TV)
    falloff_ref[:] = w
    pts_rep = jnp.concatenate([pts] * n_frames, axis=0)  # (3F, TV)
    out_ref[:] = pts_rep + disp * w


def frames_per_dispatch(
    n_ctrl: int,
    n_layers: int,
    tile_v: int = _TILE_V,
    budget_bytes: int = 8 << 20,
) -> int:
    """Max frames one evaluate_pallas_frames call may carry within VMEM.

    The frames kernel keeps the whole (L, Npad, 3F) weight stack VMEM-
    resident plus three (3F, TILE_V) tile buffers (disp accumulator,
    replicated points, output block) — all linear in F.  At QNN defaults
    (L=4, N=1k, tile_v=1024) that is ~96 KB/frame, so a 200-frame shot
    alone would claim ~19 MB of the 16 MB VMEM and fail to compile.
    Callers chunk the frame axis at this bound (half of VMEM, leaving the
    F-independent phi/d2 slabs and double buffering their usual room).
    """
    n_pad = n_ctrl + ((-n_ctrl) % (8 if n_ctrl <= _CTRL_BLOCK else _CTRL_BLOCK))
    per_frame = n_layers * n_pad * 12 + tile_v * 48
    return max(1, budget_bytes // per_frame)


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "term", "strict_parity", "tile_v", "interpret"),
)
def evaluate_pallas_frames(
    model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    radius: jnp.ndarray,
    falloffrate: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    strict_parity: bool = False,
    tile_v: int = _TILE_V,
    interpret: bool = False,
    frame=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ALL-FRAMES deform step: model carries a leading frame axis on
    w_rbf (F, L, N, 3) / w_poly (F, m, 3) (parallel.batched.fit_frames);
    returns ((F, V, 3) positions, (V,) falloff).  frame=(u, v, n) of
    (V, 3) tangent attrs fuses the tangent projection per frame.

    Must match vmapping evaluate_pallas over the frame axis exactly — the
    kernel only reorders the contraction, distances and phi are computed
    identically (tests/test_sharding.py fused-parity test).
    """
    v = points.shape[0]
    n = model.ctrl.shape[0]
    n_frames, n_layers = model.w_rbf.shape[0], model.w_rbf.shape[1]

    n_pad = (-n) % (8 if n <= _CTRL_BLOCK else _CTRL_BLOCK)
    ctrl = jnp.pad(model.ctrl, ((0, n_pad), (0, 0)))
    # pack frames onto the weight columns: (F, L, N, 3) -> (L, N, 3F)
    # with column f*3+i, so the kernel contracts every frame in one
    # (3F, B) x (B, TV) MXU dot and row f*3+i of its output is frame f's
    # component i
    w_rbf = jnp.transpose(model.w_rbf, (1, 2, 0, 3)).reshape(
        n_layers, n, 3 * n_frames
    )
    w_rbf = jnp.pad(w_rbf, ((0, 0), (0, n_pad), (0, 0)))
    inv_eps2 = 1.0 / jnp.maximum(model.eps * model.eps, 1e-30)
    inv_eps2 = jnp.pad(inv_eps2, ((0, 0), (0, n_pad)), constant_values=1.0)
    m = model.w_poly.shape[1]
    w_poly = jnp.zeros((n_frames, 4, 3), jnp.float32)
    if m > 0:
        w_poly = w_poly.at[:, :m].set(model.w_poly)
    w_poly = jnp.transpose(w_poly, (1, 0, 2)).reshape(4, 3 * n_frames)

    v_pad = (-v) % tile_v
    pts_t = jnp.pad(points.astype(jnp.float32), ((0, v_pad), (0, 0))).T
    d2_in = jnp.pad(dist2.astype(jnp.float32), (0, v_pad))[None, :]
    gate_in = jnp.pad(gate.astype(jnp.float32), (0, v_pad))[None, :]
    vp = pts_t.shape[1]
    grid = (vp // tile_v,)

    scalars = jnp.stack(
        [
            (radius * radius).astype(jnp.float32),
            jnp.asarray(falloffrate, jnp.float32),
        ]
    )

    from facedeform_tpu.ops.evaluate import _center_phi

    has_frame = frame is not None
    frame_inputs, frame_specs = _pad_frame_inputs(frame, v_pad, tile_v)

    kern = functools.partial(
        _eval_frames_kernel,
        kernel=RBFKernel(kernel),
        n_layers=n_layers,
        n_frames=n_frames,
        strict_parity=strict_parity,
        has_frame=has_frame,
        center_phi=_center_phi(kernel, term),
    )
    flops_per_tile = 2 * (ctrl.shape[0] * tile_v * 3) * (1 + n_layers * n_frames)
    out_t, falloff = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # ctrl
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # inv_eps2
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w_poly
        ] + frame_specs,
        out_specs=[
            pl.BlockSpec(
                (3 * n_frames, tile_v), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3 * n_frames, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * grid[0],
            bytes_accessed=vp * 3 * 4 * (1 + n_frames),
            transcendentals=ctrl.shape[0] * vp * n_layers,
        ),
        interpret=interpret,
    )(scalars, pts_t, d2_in, gate_in, ctrl, w_rbf, inv_eps2, w_poly,
      *frame_inputs)
    # rows f*3+i -> (F, Vp, 3)
    out = out_t.reshape(n_frames, 3, vp)
    return jnp.swapaxes(out, 1, 2)[:, :v], falloff[0, :v]


# ------------------------------------------------------------- culled eval
# For decaying kernels (gaussian, wendland) a control point contributes
# nothing measurable beyond a cutoff radius.  With vertices in Z-order
# (ops/morton.py) and control points sorted + sliced into small slabs,
# each vertex tile can skip whole slabs whose bounding box lies beyond the
# cutoff — dense-kernel speed-of-light no longer binds on localized rigs.

# Control-slab granularity for bbox tests.  128 is the floor: Mosaic
# requires dynamic lane-dimension slices (inv_eps2 is (L, N)) to be
# 128-aligned.  Measured on a localized 4096-point rig over a 1M-vertex
# Z-ordered sphere: 2.3x over the dense kernel (394 G-effective) at
# 1.2e-7 truncation error.
_CULL_BLOCK = 128

# phi(s) <= 1e-12 beyond these squared-normalized-distance cutoffs.
_CULL_S_CUTOFF = {
    RBFKernel.GAUSSIAN: 27.7,      # exp(-s) = 1e-12
    RBFKernel.WENDLAND_C2: 1.0,    # compact support (exact)
}


def kernel_is_cullable(kernel: RBFKernel) -> bool:
    """True when phi decays fast enough for slab culling to be exact to
    <= 1e-12 (gaussian) or exactly (compact support)."""
    return RBFKernel(kernel) in _CULL_S_CUTOFF


def _eval_kernel_culled(
    scalars_ref,   # (2,) SMEM: [radius^2, falloffrate]
    bbox_ref,      # (NB, 8) SMEM: slab lo.xyz, hi.xyz, cutoff^2, pad
    pts_ref,       # (3, TILE_V) VMEM
    dist2_ref,     # (1, TILE_V) VMEM
    gate_ref,      # (1, TILE_V) VMEM
    ctrl_ref,      # (N, 3) VMEM (Z-order sorted, slab-padded)
    w_ref,         # (L, N, 3) VMEM
    inv_eps2_ref,  # (L, N) VMEM
    w_poly_ref,    # (4, 3) VMEM
    *refs,         # [u_ref, v_ref, n_ref,] out_ref, falloff_ref
    kernel: RBFKernel,
    n_layers: int,
    strict_parity: bool,
    has_frame: bool,
):
    if has_frame:
        u_ref, vt_ref, nrm_ref, out_ref, falloff_ref = refs
    else:
        out_ref, falloff_ref = refs
    pts = pts_ref[:]                                   # (3, TV)
    # Tile bounding box (scalars via full-vector reductions).
    tx_lo = jnp.min(pts[0, :]); tx_hi = jnp.max(pts[0, :])
    ty_lo = jnp.min(pts[1, :]); ty_hi = jnp.max(pts[1, :])
    tz_lo = jnp.min(pts[2, :]); tz_hi = jnp.max(pts[2, :])

    n_blocks = ctrl_ref.shape[0] // _CULL_BLOCK

    # Capture gating (see _eval_kernel): a fully inactive tile skips both
    # the slab tests and the contraction — the reference's per-vertex
    # `continue` promoted to tiles (src/SOP_FaceDeform.cpp:404-410).
    r2 = scalars_ref[0]
    rate = scalars_ref[1]
    cap_d2 = dist2_ref[:]
    if not strict_parity:
        cap_d2 = jnp.maximum(cap_d2, 0.0)
    active = (cap_d2 <= r2).astype(jnp.float32) * gate_ref[:]
    tile_alive = jnp.max(active) > 0.0

    def slab_contrib(b, disp):
        lo = b * _CULL_BLOCK
        ctrl = ctrl_ref[pl.ds(lo, _CULL_BLOCK)]
        dx = ctrl[:, 0:1] - pts[0:1, :]
        dy = ctrl[:, 1:2] - pts[1:2, :]
        dz = ctrl[:, 2:3] - pts[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        for layer in range(n_layers):
            phi = _phi(kernel, d2, inv_eps2_ref[layer, pl.ds(lo, _CULL_BLOCK)][:, None])
            w_l = w_ref[layer, pl.ds(lo, _CULL_BLOCK)]
            disp = disp + jnp.concatenate(
                [
                    jnp.sum(phi * w_l[:, i : i + 1], axis=0, keepdims=True)
                    for i in range(3)
                ],
                axis=0,
            )
        return disp

    def body(b, disp):
        gx = jnp.maximum(jnp.maximum(bbox_ref[b, 0] - tx_hi, tx_lo - bbox_ref[b, 3]), 0.0)
        gy = jnp.maximum(jnp.maximum(bbox_ref[b, 1] - ty_hi, ty_lo - bbox_ref[b, 4]), 0.0)
        gz = jnp.maximum(jnp.maximum(bbox_ref[b, 2] - tz_hi, tz_lo - bbox_ref[b, 5]), 0.0)
        slab_d2 = gx * gx + gy * gy + gz * gz
        # lax.cond (not pl.when + scratch): the accumulator stays a loop
        # carry in vector registers, avoiding a VMEM read+write per slab.
        return jax.lax.cond(
            slab_d2 <= bbox_ref[b, 6],
            lambda d: slab_contrib(b, d),
            lambda d: d,
            disp,
        )

    def compute_disp(_):
        # Start from the polynomial tail.
        wp = w_poly_ref[:]
        disp0 = (
            wp[0][:, None]
            + wp[1][:, None] * pts[0:1, :]
            + wp[2][:, None] * pts[1:2, :]
            + wp[3][:, None] * pts[2:3, :]
        )
        disp = jax.lax.fori_loop(0, n_blocks, body, disp0)
        if has_frame:
            disp = _project_frame_cols(disp, u_ref[:], vt_ref[:], nrm_ref[:])
        return disp

    disp = jax.lax.cond(
        tile_alive, compute_disp,
        lambda _: jnp.zeros((3, pts.shape[1]), jnp.float32), 0,
    )
    ratio = jnp.minimum(cap_d2 / r2, 1.0)
    base = (1.0 - ratio) if strict_parity else jnp.maximum(1.0 - ratio, 0.0)
    w = jnp.power(base, rate) * active
    falloff_ref[:] = w
    out_ref[:] = pts + disp * w


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "term", "strict_parity", "tile_v", "interpret"),
)
def evaluate_pallas_culled(
    model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    radius: jnp.ndarray,
    falloffrate: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    strict_parity: bool = False,
    tile_v: int = _TILE_V,
    interpret: bool = False,
    frame=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Culled fused eval for decaying kernels.

    Semantics match evaluate_pallas to within phi <= 1e-12 truncation.
    Callers should pass `points` in Z-order (ops.morton.spatial_order) —
    arbitrary order stays CORRECT but loses the culling win.  Control
    points are Morton-sorted internally (the weight permutation is
    applied consistently; the sum is order-invariant).  An optional
    frame=(u, v, n) of (V, 3) tangent attributes — in the SAME order as
    `points` — fuses the tangent projection like evaluate_pallas.
    """
    if RBFKernel(kernel) not in _CULL_S_CUTOFF:
        raise ValueError(
            f"culled eval needs a decaying kernel, got {RBFKernel(kernel).name}"
        )
    from facedeform_tpu.ops.morton import morton_codes

    v = points.shape[0]
    n = model.ctrl.shape[0]
    n_layers = model.w_rbf.shape[0]

    # Morton-sort control points for tight slab bboxes.
    order = jnp.argsort(morton_codes(model.ctrl))
    ctrl = model.ctrl[order]
    w_rbf = model.w_rbf[:, order]
    inv_eps2 = 1.0 / jnp.maximum(model.eps * model.eps, 1e-30)
    inv_eps2 = inv_eps2[:, order]
    eps_sorted = model.eps[:, order]

    # Pad N to whole slabs with edge-replicated ctrl (tight bboxes) and
    # zero weights (no contribution).
    n_pad = (-n) % _CULL_BLOCK
    if n_pad:
        ctrl = jnp.concatenate([ctrl, jnp.repeat(ctrl[-1:], n_pad, axis=0)])
        w_rbf = jnp.pad(w_rbf, ((0, 0), (0, n_pad), (0, 0)))
        inv_eps2 = jnp.pad(inv_eps2, ((0, 0), (0, n_pad)), constant_values=1.0)
        eps_sorted = jnp.pad(eps_sorted, ((0, 0), (0, n_pad)), constant_values=1e-6)
    nb = ctrl.shape[0] // _CULL_BLOCK

    # Per-slab bbox + squared cutoff (max eps over layers & slab).
    slab_pts = ctrl.reshape(nb, _CULL_BLOCK, 3)
    lo = jnp.min(slab_pts, axis=1)                     # (nb, 3)
    hi = jnp.max(slab_pts, axis=1)
    eps_slab = jnp.max(eps_sorted.reshape(n_layers, nb, _CULL_BLOCK), axis=(0, 2))
    s_cut = _CULL_S_CUTOFF[RBFKernel(kernel)]
    cutoff2 = (eps_slab * eps_slab) * s_cut            # (nb,)
    bbox = jnp.concatenate(
        [lo, hi, cutoff2[:, None], jnp.zeros((nb, 1), jnp.float32)], axis=1
    )

    m = model.w_poly.shape[0]
    w_poly = jnp.zeros((4, 3), jnp.float32)
    if m > 0:
        w_poly = w_poly.at[:m].set(model.w_poly)

    v_pad = (-v) % tile_v
    pts_t = jnp.pad(points.astype(jnp.float32), ((0, v_pad), (0, 0))).T
    d2_in = jnp.pad(dist2.astype(jnp.float32), (0, v_pad))[None, :]
    gate_in = jnp.pad(gate.astype(jnp.float32), (0, v_pad))[None, :]
    vp = pts_t.shape[1]

    scalars = jnp.stack(
        [(radius * radius).astype(jnp.float32),
         jnp.asarray(falloffrate, jnp.float32)]
    )
    has_frame = frame is not None
    frame_inputs, frame_specs = _pad_frame_inputs(frame, v_pad, tile_v)
    kern = functools.partial(
        _eval_kernel_culled,
        kernel=RBFKernel(kernel),
        n_layers=n_layers,
        strict_parity=strict_parity,
        has_frame=has_frame,
    )
    out_t, falloff = pl.pallas_call(
        kern,
        grid=(vp // tile_v,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # bbox
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # ctrl
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # inv_eps2
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w_poly
        ] + frame_specs,
        out_specs=[
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, vp), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, bbox, pts_t, d2_in, gate_in, ctrl, w_rbf, inv_eps2, w_poly,
      *frame_inputs)
    return out_t.T[:v], falloff[0, :v]


# --------------------------------------------------------------- custom VJP
# The fused kernel is forward-only; gradients (inverse rigging, learned-rig
# pipelines) flow through a mathematically identical dense composition.
# Pattern per the pallas guide: fast pallas forward + XLA backward.


def _dense_reference(
    model, points, dist2, gate, radius, falloffrate, frame,
    kernel, term, strict_parity,
):
    """Differentiable XLA twin of the fused kernel's semantics."""
    from facedeform_tpu.ops.evaluate import evaluate
    from facedeform_tpu.ops.falloff import falloff_weight
    from facedeform_tpu.ops.tangent import project_to_tangents

    disp = evaluate(model, points, kernel, term)
    if frame is not None:
        disp = project_to_tangents(*frame, disp)
    w, _ = falloff_weight(dist2, radius, falloffrate, strict_parity=strict_parity)
    w = w * gate
    return points + disp * w[:, None], w


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def evaluate_pallas_diff(
    model, points, dist2, gate, radius, falloffrate, frame,
    kernel, term, strict_parity,
):
    """evaluate_pallas with gradients: same fused forward, dense backward.

    Differentiable wrt model (all leaves), points, dist2, gate, radius,
    falloffrate and frame; kernel/term/strict_parity are static.
    """
    return evaluate_pallas(
        model, points, dist2, gate, radius, falloffrate, kernel, term,
        strict_parity=strict_parity, frame=frame,
    )


def _diff_fwd(model, points, dist2, gate, radius, falloffrate, frame,
              kernel, term, strict_parity):
    out = evaluate_pallas_diff(
        model, points, dist2, gate, radius, falloffrate, frame,
        kernel, term, strict_parity,
    )
    return out, (model, points, dist2, gate, radius, falloffrate, frame)


def _diff_bwd(kernel, term, strict_parity, residuals, cotangents):
    model, points, dist2, gate, radius, falloffrate, frame = residuals
    _, vjp = jax.vjp(
        lambda m, p, d, g, r, fr, f: _dense_reference(
            m, p, d, g, r, fr, f, kernel, term, strict_parity
        ),
        model, points, dist2, gate, radius, falloffrate, frame,
    )
    return vjp(cotangents)


evaluate_pallas_diff.defvjp(_diff_fwd, _diff_bwd)
