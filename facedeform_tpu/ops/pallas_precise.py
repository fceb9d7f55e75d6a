"""Fused Pallas double-float evaluation for growing kernels.

ops/precise_eval.py establishes the math (df distances, df phi, df
weights, compensated contraction) as XLA elementwise code; this kernel
fuses the same pipeline into VMEM tiles like ops/pallas_eval.py does for
the f32 path.  Mosaic preserves the error-free transforms without guards
(verified on hardware: a df chain inside a Pallas kernel matches eager to
1e-14 relative — see ops/dfloat.py), so the kernel body simply runs the
dfloat toolkit under `no_barrier()`.

Structure per vertex tile (3, TILE_V), control blocks of _BLOCK rows:
    d2   = sum_k TwoDiff(ctrl_k, pts_k)^2            df (B, TV)
    s    = d2 * inv_eps2                             df
    phi  = phi_df(kernel, s)                         df
    per component c:
        products TwoProd(phi_hi, w_hi_c)             exact pairs
        + f32 cross terms phi_hi*w_lo + phi_lo*w     (u-sized)
        tree-halving df reduction over the block rows
    df-accumulate across blocks; poly tail in df; falloff in f32.

VMEM: ~6 live df (B, TV) intermediates -> B=256, TV=512 stays ~6 MB.
Includes the same capture-gated tile early-out as the f32 kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops import dfloat
from facedeform_tpu.ops.fit import RBFModel

_TILE_V = 512
_BLOCK = 256  # control rows per df sweep (VMEM-bounded)


def _df_reduce_rows(hi, lo):
    """Tree-halving df sum over axis 0 of an (R, TV) df pair -> (1, TV).

    Contiguous-half splits only (Mosaic dislikes strided sublane slices);
    R must be a power of two.
    """
    r = hi.shape[0]
    while r > 1:
        half = r // 2
        hi, lo = dfloat.df_add((hi[:half], lo[:half]), (hi[half:], lo[half:]))
        r = half
    return hi, lo


def _precise_kernel(
    scalars_ref,   # (2,) SMEM: [radius^2, falloffrate]
    pts_ref,       # (3, TILE_V) VMEM
    dist2_ref,     # (1, TILE_V) VMEM
    gate_ref,      # (1, TILE_V) VMEM
    ctrl_ref,      # (N, 3) VMEM (block-padded)
    w_hi_ref,      # (L, N, 3) VMEM
    w_lo_ref,      # (L, N, 3) VMEM
    ie_hi_ref,     # (L, N) VMEM  df inv_eps2 high words
    ie_lo_ref,     # (L, N) VMEM  df inv_eps2 low words
    wp_ref,        # (8, 3) VMEM: poly tail df, rows 0-3 hi / 4-7 lo
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
    tv = pts.shape[1]
    n_blocks = ctrl_ref.shape[0] // _BLOCK

    r2 = scalars_ref[0]
    rate = scalars_ref[1]
    cap_d2 = dist2_ref[:]
    if not strict_parity:
        cap_d2 = jnp.maximum(cap_d2, 0.0)
    active = (cap_d2 <= r2).astype(jnp.float32) * gate_ref[:]
    tile_alive = jnp.max(active) > 0.0

    def compute_disp(_):
      with dfloat.no_barrier():
        def block_body(b, acc):
            acc_hi, acc_lo = acc
            lo_idx = b * _BLOCK
            ctrl = ctrl_ref[pl.ds(lo_idx, _BLOCK)]     # (B, 3)
            # df squared distances, exact diffs
            d2 = dfloat.df(jnp.zeros((_BLOCK, tv), jnp.float32))
            for k in range(3):
                dx = dfloat._two_sum(ctrl[:, k:k + 1], -pts[k:k + 1, :])
                d2 = dfloat.df_add(d2, dfloat.df_mul(dx, dx))
            out_hi, out_lo = acc_hi, acc_lo
            for layer in range(n_layers):
                ie = (
                    ie_hi_ref[layer, pl.ds(lo_idx, _BLOCK)][:, None],
                    ie_lo_ref[layer, pl.ds(lo_idx, _BLOCK)][:, None],
                )
                s = dfloat.df_mul(d2, ie)
                phi = dfloat._phi_df(kernel, s)        # df (B, TV)
                w_hi = w_hi_ref[layer, pl.ds(lo_idx, _BLOCK)]  # (B, 3)
                w_lo = w_lo_ref[layer, pl.ds(lo_idx, _BLOCK)]
                rows_hi = []
                rows_lo = []
                for c in range(3):
                    p, e = dfloat._two_prod(phi[0], w_hi[:, c:c + 1])
                    cross = phi[0] * w_lo[:, c:c + 1] + phi[1] * (
                        w_hi[:, c:c + 1] + w_lo[:, c:c + 1]
                    )
                    s_hi, s_lo = _df_reduce_rows(p, e + cross)
                    rows_hi.append(s_hi)
                    rows_lo.append(s_lo)
                contrib = (
                    jnp.concatenate(rows_hi, axis=0),  # (3, TV)
                    jnp.concatenate(rows_lo, axis=0),
                )
                out_hi, out_lo = dfloat.df_add((out_hi, out_lo), contrib)
            return out_hi, out_lo

        zero = jnp.zeros((3, tv), jnp.float32)
        disp_hi, disp_lo = jax.lax.fori_loop(
            0, n_blocks, block_body, (zero, zero)
        )
        # polynomial tail in df: basis rows [1, x, y, z]
        wp = wp_ref[:]                                 # (8, 3)
        basis = [jnp.ones((1, tv), jnp.float32), pts[0:1], pts[1:2], pts[2:3]]
        for j in range(4):
            wj_hi = wp[j][:, None]                     # (3, 1)
            wj_lo = wp[4 + j][:, None]
            p, e = dfloat._two_prod(
                jnp.broadcast_to(basis[j], (3, tv)), wj_hi
            )
            contrib = dfloat.df_add((p, e), dfloat.df(basis[j] * wj_lo))
            disp_hi, disp_lo = dfloat.df_add((disp_hi, disp_lo), contrib)
        disp = disp_hi + disp_lo
        if has_frame:
            from facedeform_tpu.ops.pallas_eval import _project_frame_cols

            disp = _project_frame_cols(disp, u_ref[:], vt_ref[:], nrm_ref[:])
        return disp

    disp = jax.lax.cond(
        tile_alive, compute_disp, lambda _: jnp.zeros((3, tv), jnp.float32), 0
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
def evaluate_pallas_precise(
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
    """Fused double-float deform step: (new_points (V, 3), falloff (V,)).

    Semantics match the dense_precise path (ops/precise_eval.evaluate_precise
    composed with falloff/tangent) to df accuracy; measured ~4-6x faster on
    v5e because the df intermediates stay in VMEM instead of streaming
    through HBM between XLA fusions.
    """
    kernel = RBFKernel(kernel)
    v = points.shape[0]
    n = model.ctrl.shape[0]
    n_layers = model.w_rbf.shape[0]

    w_lo = model.w_rbf_lo
    if w_lo is None:
        w_lo = jnp.zeros_like(model.w_rbf)
    wp_lo = model.w_poly_lo
    if wp_lo is None:
        wp_lo = jnp.zeros_like(model.w_poly)

    n_pad = (-n) % _BLOCK
    ctrl = jnp.pad(model.ctrl, ((0, n_pad), (0, 0)))
    w_hi_all = jnp.pad(model.w_rbf, ((0, 0), (0, n_pad), (0, 0)))
    w_lo_all = jnp.pad(w_lo, ((0, 0), (0, n_pad), (0, 0)))
    eps2 = dfloat._two_prod(model.eps, model.eps)
    inv = dfloat.df_recip(eps2)
    ie_hi = jnp.pad(inv[0], ((0, 0), (0, n_pad)), constant_values=1.0)
    ie_lo = jnp.pad(inv[1], ((0, 0), (0, n_pad)))

    m = model.w_poly.shape[0]
    wp = jnp.zeros((8, 3), jnp.float32)
    if m > 0:
        wp = wp.at[:m].set(model.w_poly).at[4:4 + m].set(wp_lo)

    v_pad = (-v) % tile_v
    pts_t = jnp.pad(points.astype(jnp.float32), ((0, v_pad), (0, 0))).T
    d2_in = jnp.pad(dist2.astype(jnp.float32), (0, v_pad))[None, :]
    gate_in = jnp.pad(gate.astype(jnp.float32), (0, v_pad))[None, :]
    vp = pts_t.shape[1]

    scalars = jnp.stack(
        [(radius * radius).astype(jnp.float32),
         jnp.asarray(falloffrate, jnp.float32)]
    )
    from facedeform_tpu.ops.pallas_eval import _pad_frame_inputs

    has_frame = frame is not None
    frame_inputs, frame_specs = _pad_frame_inputs(frame, v_pad, tile_v)
    kern = functools.partial(
        _precise_kernel,
        kernel=kernel,
        n_layers=n_layers,
        strict_parity=strict_parity,
        has_frame=has_frame,
    )
    out_t, falloff = pl.pallas_call(
        kern,
        grid=(vp // tile_v,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # scalars
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # ctrl
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w_hi
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # w_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # ie_hi
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # ie_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # wp
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
    )(scalars, pts_t, d2_in, gate_in, ctrl, w_hi_all, w_lo_all,
      ie_hi, ie_lo, wp, *frame_inputs)
    return out_t.T[:v], falloff[0, :v]
