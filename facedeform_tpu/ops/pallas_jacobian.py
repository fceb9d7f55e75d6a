"""Fused Pallas TPU kernel for displacement-field Jacobians.

The XLA path (ops/jacobian.py displacement_jacobian) assembles J through
two einsums that materialize the (L, chunk, N) `g` tensor in HBM and
contract it on 3- and 9-column MXU slivers — at 1M vertices x 1k controls
that measured ~39 ms warm on v5e, 5x the fused eval's 7.4 ms for the same
pair count.  This kernel is the eval kernel's sibling (ops/pallas_eval.py):
one pass per vertex tile that recomputes squared distances on the VPU,
turns them into  g = 2 phi'(s) / eps^2  in registers (never touching HBM),
and accumulates the twelve per-vertex Jacobian moments

    A[a]    = sum_j g_j w_ja            (3 columns)
    T[ab]   = sum_j g_j w_ja c_jb       (9 columns)
    J[a,b]  = A[a] x_b - T[ab] (+ linear-tail constant, added outside)

Column-count economics mirror the eval family (measured there, round 2/3):
a single frame's 12 columns ride VPU sublane reductions (the 12-row MXU
dot is a pad-dominated sliver, like eval's 3-row one); an animated shot
packs F frames' columns into one (12F, B) x (B, TV) HIGHEST-precision MXU
dot — d2 and phi' are frame-invariant (the rest rig fixes ctrl/eps), so
the pair math amortizes over the shot exactly as in _eval_frames_kernel.

Semantics match ops.jacobian.jacobian_block to f32 reduction-order noise;
reference context: the rest-pose attributes the reference leaves stale
after moving P (src/SOP_FaceDeform.cpp:438 writes positions only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.fit import RBFModel
# phi_prime_s is a plain traceable function (no custom_jvp wrapper, unlike
# apply_kernel) so it lowers through Mosaic unchanged — the kernel uses
# the SAME derivative definitions as the XLA/oracle path by construction.
from facedeform_tpu.ops.kernels import phi_prime_s
from facedeform_tpu.ops.pallas_eval import _CTRL_BLOCK, _TILE_V


def _jac_kernel(
    pts_ref,       # (3, TILE_V) VMEM: vertex positions, transposed
    ctrl_ref,      # (Npad, 3) VMEM: control points (replicated)
    u_ref,         # (L, Npad, 12F) VMEM: packed moment columns (replicated)
    inv_eps2_ref,  # (L, Npad) VMEM: per-layer 1/eps^2
    out_ref,       # (9F, TILE_V) VMEM: row f*9 + 3a + b = J_f[a, b]
    *,
    kernel: RBFKernel,
    n_layers: int,
    n_frames: int,
):
    pts = pts_ref[:]                                   # (3, TV)
    n_total = ctrl_ref.shape[0]
    n_blocks = pl.cdiv(n_total, _CTRL_BLOCK) if n_total > _CTRL_BLOCK else 1
    block = n_total if n_blocks == 1 else _CTRL_BLOCK
    cols = 12 * n_frames

    def block_contrib(lo, acc):
        ctrl = ctrl_ref[pl.ds(lo, block)]              # (B, 3)
        dx = ctrl[:, 0:1] - pts[0:1, :]                # (B, TV) broadcasts
        dy = ctrl[:, 1:2] - pts[1:2, :]
        dz = ctrl[:, 2:3] - pts[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        for layer in range(n_layers):
            inv_e2 = inv_eps2_ref[layer, pl.ds(lo, block)][:, None]  # (B, 1)
            g = 2.0 * phi_prime_s(kernel, d2 * inv_e2) * inv_e2      # (B, TV)
            u_l = u_ref[layer, pl.ds(lo, block)]                     # (B, 12F)
            if n_frames == 1:
                # 12 sublane reductions: the 12-row MXU dot is a
                # pad-dominated sliver at HIGHEST precision (the eval
                # kernel measured the same trade at 3 rows: 92 vs 147 G)
                acc = acc + jnp.concatenate(
                    [
                        jnp.sum(g * u_l[:, i : i + 1], axis=0, keepdims=True)
                        for i in range(cols)
                    ],
                    axis=0,
                )
            else:
                # 12F >= 24 columns: one HIGHEST-precision MXU dot per
                # (layer, block) — the frames-eval crossover, measured in
                # _eval_frames_kernel at 3F = 24
                acc = acc + jax.lax.dot_general(
                    u_l, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                                    # (12F, TV)
        return acc

    acc = jnp.zeros((cols, pts.shape[1]), jnp.float32)
    if n_blocks == 1:
        acc = block_contrib(0, acc)
    else:
        # fori_loop so Mosaic reuses one (block, TV) buffer set
        acc = jax.lax.fori_loop(
            0, n_blocks, lambda b, a: block_contrib(b * block, a), acc
        )

    rows = []
    for f in range(n_frames):
        a_rows = acc[12 * f : 12 * f + 3]              # (3, TV)
        t_rows = acc[12 * f + 3 : 12 * f + 12]         # (9, TV)
        for a in range(3):
            for b in range(3):
                rows.append(
                    a_rows[a : a + 1] * pts[b : b + 1, :]
                    - t_rows[3 * a + b : 3 * a + b + 1]
                )
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _pack_columns(w_rbf: jnp.ndarray, ctrl: jnp.ndarray) -> jnp.ndarray:
    """(F, L, N, 3) weights + (N, 3) controls -> (L, N, 12F) moment columns.

    Frame f owns columns 12f..12f+12: [w_a (3), (w_a c_b) at 3a+b (9)].
    """
    f, l, n, _ = w_rbf.shape
    outer = w_rbf[..., :, None] * ctrl[None, None, :, None, :]  # (F,L,N,3,3)
    u = jnp.concatenate([w_rbf, outer.reshape(f, l, n, 9)], axis=-1)
    return jnp.transpose(u, (1, 2, 0, 3)).reshape(l, n, 12 * f)


def jac_frames_per_dispatch(
    n_ctrl: int,
    n_layers: int,
    tile_v: int = _TILE_V,
    budget_bytes: int = 6 << 20,
) -> int:
    """Max frames one kernel invocation may carry within VMEM: the packed
    column stack (L, Npad, 12F) is replicated across the grid and the
    (12F, TV) accumulator + (9F, TV) output tile are all linear in F."""
    n_pad = n_ctrl + ((-n_ctrl) % (8 if n_ctrl <= _CTRL_BLOCK else _CTRL_BLOCK))
    per_frame = n_layers * n_pad * 48 + tile_v * 84
    return max(1, budget_bytes // per_frame)


def _jac_call(
    ctrl, u_pack, inv_eps2, points, kernel, tile_v, interpret
) -> jnp.ndarray:
    """One pallas dispatch: (L, Npad, 12F) columns -> (F, V, 3, 3)."""
    v = points.shape[0]
    n_layers = u_pack.shape[0]
    n_frames = u_pack.shape[2] // 12
    v_pad = (-v) % tile_v
    pts_t = jnp.pad(points.astype(jnp.float32), ((0, v_pad), (0, 0))).T
    vp = pts_t.shape[1]

    kern = functools.partial(
        _jac_kernel,
        kernel=RBFKernel(kernel),
        n_layers=n_layers,
        n_frames=n_frames,
    )
    flops_per_tile = 2 * ctrl.shape[0] * tile_v * (3 + 12 * n_frames) * n_layers
    out_t = pl.pallas_call(
        kern,
        grid=(vp // tile_v,),
        in_specs=[
            pl.BlockSpec((3, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),                # ctrl
            pl.BlockSpec(memory_space=pltpu.VMEM),                # u_pack
            pl.BlockSpec(memory_space=pltpu.VMEM),                # inv_eps2
        ],
        out_specs=pl.BlockSpec(
            (9 * n_frames, tile_v), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9 * n_frames, vp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * (vp // tile_v),
            bytes_accessed=vp * 4 * (3 + 9 * n_frames),
            transcendentals=ctrl.shape[0] * vp * n_layers,
        ),
        interpret=interpret,  # CPU-testable path
    )(pts_t, ctrl, u_pack, inv_eps2)
    # rows f*9 + 3a + b -> (F, Vp, 3, 3)
    jac = out_t.reshape(n_frames, 3, 3, vp)
    return jnp.transpose(jac, (0, 3, 1, 2))[:, :v]


def _jac_impl(
    ctrl, w_rbf, eps, w_poly, points, kernel, term, tile_v, interpret,
    frames_chunk,
):
    """Shared single/frames implementation.  w_rbf (F, L, N, 3),
    w_poly (F, m, 3) -> (F, V, 3, 3)."""
    n = ctrl.shape[0]
    n_frames = w_rbf.shape[0]
    n_pad = (-n) % (8 if n <= _CTRL_BLOCK else _CTRL_BLOCK)
    ctrl_p = jnp.pad(ctrl, ((0, n_pad), (0, 0)))
    # Padded rows: zero columns contribute nothing; inv_eps2 = 1 keeps
    # phi' finite (same convention as the eval kernels).
    inv_eps2 = 1.0 / jnp.maximum(eps * eps, 1e-30)
    inv_eps2 = jnp.pad(inv_eps2, ((0, 0), (0, n_pad)), constant_values=1.0)
    u_pack = jnp.pad(
        _pack_columns(w_rbf, ctrl), ((0, 0), (0, n_pad), (0, 0))
    )

    fpd = frames_chunk or jac_frames_per_dispatch(n, w_rbf.shape[1], tile_v)
    if n_frames <= fpd:
        jac = _jac_call(
            ctrl_p, u_pack, inv_eps2, points, kernel, tile_v, interpret
        )
    else:
        # static slices in the trace: still ONE jit program, at most two
        # kernel shapes (full chunks + remainder) — batched.py's pattern
        jac = jnp.concatenate(
            [
                _jac_call(
                    ctrl_p, u_pack[:, :, 12 * lo : 12 * min(lo + fpd, n_frames)],
                    inv_eps2, points, kernel, tile_v, interpret,
                )
                for lo in range(0, n_frames, fpd)
            ],
            axis=0,
        )

    if PolyTerm(term) == PolyTerm.LINEAR and w_poly.shape[1] >= 4:
        # poly_basis [1, x, y, z]: d(P c)_a / d x_b = w_poly[1 + b, a]
        tail = jnp.transpose(w_poly[:, 1:4], (0, 2, 1))  # (F, 3, 3)
        jac = jac + tail[:, None, :, :]
    return jac


@functools.partial(
    jax.jit, static_argnames=("kernel", "term", "tile_v", "interpret")
)
def jacobian_pallas(
    model: RBFModel,
    points: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    tile_v: int = _TILE_V,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused displacement Jacobian at `points`; (V, 3, 3).

    Drop-in for ops.jacobian.displacement_jacobian (f32 reduction-order
    noise apart); this is the TPU fast path Deformer.jacobian routes to.
    """
    return _jac_impl(
        model.ctrl, model.w_rbf[None], model.eps, model.w_poly[None],
        jnp.asarray(points, jnp.float32), kernel, term, tile_v, interpret,
        frames_chunk=None,
    )[0]


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "term", "tile_v", "interpret", "frames_chunk"),
)
def jacobian_pallas_frames(
    model: RBFModel,
    points: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    tile_v: int = _TILE_V,
    interpret: bool = False,
    frames_chunk: int | None = None,
) -> jnp.ndarray:
    """All-frames fused Jacobian: model carries a leading frame axis on
    w_rbf (F, L, N, 3) / w_poly (F, m, 3) (parallel.batched.fit_frames);
    returns (F, V, 3, 3).  Distances and phi' are computed ONCE per
    (control block x vertex tile) and contracted against every frame's
    moment columns in a single MXU dot; the frame axis chunks at
    jac_frames_per_dispatch (VMEM bound), overridable via frames_chunk.
    """
    return _jac_impl(
        model.ctrl, model.w_rbf, model.eps, model.w_poly,
        jnp.asarray(points, jnp.float32), kernel, term, tile_v, interpret,
        frames_chunk=frames_chunk,
    )
