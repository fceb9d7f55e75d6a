"""Animated-sequence batching: per-frame solve + eval over a frame axis.

BASELINE config 5: "Animated face sequence: 1M-vertex mesh, 1k control
points, per-frame batched eval sharded over ICI."  The reference re-cooks
the whole node per frame (src/SOP_FaceDeform.cpp:216 runs per cook); here
the rest rig and mesh are fixed across a shot, so:

  * fit_frames vmaps the RBF solve over F deformed-rig frames — one batched
    LU factorization of F (N+m, N+m) systems (the kernel matrix is shared
    structure; radii depend only on the rest rig, so eps is computed once);
  * apply_frames evaluates all frames against the same vertex buffer,
    vmapping the dense/Pallas eval over the model's leading frame axis, and
    composes with parallel.sharding for the vertex axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.ops import fit as fit_mod
from facedeform_tpu.ops.evaluate import evaluate_block
from facedeform_tpu.ops.falloff import falloff_weight
from facedeform_tpu.ops.fit import RBFModel
from facedeform_tpu.parallel.sharding import VERTEX_AXIS
from facedeform_tpu.utils.platform import on_tpu


# HBM budget for the vmapped per-frame fit's refinement temps.  The
# compensated residual materializes ~3.5 * F * rows^2 * 3 f32 temps under
# vmap (measured: 22.6 GB demanded at 4096 ctrl x 32 frames on a 15.75 GB
# v5e -> compile-time OOM); past this budget fit_frames routes to the
# shared-factorization path whose lax.map'd 3-column refinement blocks
# keep peak memory single-pose-sized at any F.  Below it the vmapped fit
# stays the faster choice (F parallel solves beat F sequential refinement
# blocks: 38 vs 67 ms at 1k ctrl x 8 frames, warm best-of-5 on v5e).
vmap_fit_hbm_budget = 6e9


def _vmap_fit_bytes(n_rows: int, f: int) -> float:
    """Estimated peak HBM of the vmapped fit's df-refinement temps."""
    return 3.5 * f * n_rows * n_rows * 3 * 4


def fit_frames(
    rest_ctrl: jnp.ndarray,
    deformed_frames: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    confidence: jnp.ndarray | None = None,
) -> tuple[RBFModel, jnp.ndarray]:
    """Public entry: normalizes the jit key BEFORE the cache lookup.
    cfg.solve_view() used to run inside the jitted body, so the cache
    still keyed on the full cfg and eval-only UI toggles re-traced the
    whole program (round-5 review; CLAUDE.md jit-key rule)."""
    return _fit_frames_jit(
        rest_ctrl, deformed_frames, cfg.solve_view(), params, confidence
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fit_frames_jit(
    rest_ctrl: jnp.ndarray,
    deformed_frames: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    confidence: jnp.ndarray | None = None,
) -> tuple[RBFModel, jnp.ndarray]:
    """Solve F frames at once: (N, 3), (F, N, 3) -> stacked RBFModel.

    Returns a model pytree with a leading F axis on w_rbf/w_poly (ctrl and
    eps are frame-invariant) and per-frame residual norms.  `confidence`
    ((N,) per-marker quality) applies the same weighted ridge to every
    frame's solve (ops/fit._family_radii).

    Routing: the vmapped per-frame fit wins wall-clock while its
    compensated-refinement temps fit HBM; past vmap_fit_hbm_budget the
    shared-factorization path (fit_mod.fit_frames_dense: the system
    depends only on the rest rig, frames are RHS columns — one assembly +
    one LU per layer, memory-bounded blocked refinement) takes over, so
    big-rig long shots FIT instead of OOMing (4096 ctrl x 32 frames:
    vmapped demands 22.6 GB and fails to compile; shared runs in 1.48 s).
    Krylov-size rigs always keep the vmapped fit (multi-RHS Krylov
    convergence is per-column business).
    """
    solve_cfg = cfg  # already a solve_view (the public wrapper normalizes)
    n, f = rest_ctrl.shape[0], deformed_frames.shape[0]
    if not fit_mod.uses_krylov(solve_cfg, n) and (
        _vmap_fit_bytes(n + solve_cfg.n_poly, f) > vmap_fit_hbm_budget
    ):
        model, resid, _ = fit_mod.fit_frames_dense(
            rest_ctrl, deformed_frames, solve_cfg, params,
            confidence=confidence,
        )
        return model, resid
    fitted = jax.vmap(
        lambda dc: fit_mod.fit(rest_ctrl, dc, solve_cfg, params,
                               confidence=confidence)
    )(deformed_frames)
    models, reports = fitted
    # ctrl/eps are identical across frames; keep one copy.
    model = RBFModel(
        ctrl=models.ctrl[0],
        w_rbf=models.w_rbf,      # (F, L, N, 3)
        w_poly=models.w_poly,    # (F, m, 3)
        eps=models.eps[0],       # (L, N)
        # growing kernels solve in df: the sub-f32 weight bits MUST ride
        # along or the precise frames eval can't meet the 5e-5 budget
        # (they were silently dropped here; round-5 review)
        w_rbf_lo=models.w_rbf_lo,
        w_poly_lo=models.w_poly_lo,
    )
    return model, reports.residual_norm


def _eval_frames_pallas_chunked(
    model: RBFModel,
    pts: jnp.ndarray,
    wloc: jnp.ndarray,
    frm,
    kernel,
    term,
    f_max: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One kernel pass for ALL frames: distances + phi computed once per
    tile, contracted against every frame's weights (frames share
    ctrl/eps).  Falloff/gate pre-folded into wloc: pass dist2=0, gate=wloc
    so the kernel computes pts + disp * wloc directly.

    The frame axis is chunked at frames_per_dispatch so the VMEM-resident
    (F, L, N, 3) weight stack stays in budget on long shots; the chunks
    are static slices inside the caller's jit trace, so the whole sequence
    still compiles to one dispatch.
    """
    from facedeform_tpu.ops.pallas_eval import (
        evaluate_pallas_frames,
        frames_per_dispatch,
    )

    f_total = model.w_rbf.shape[0]
    if f_max is None:
        f_max = frames_per_dispatch(model.ctrl.shape[0], model.w_rbf.shape[1])
    outs = []
    for lo in range(0, f_total, f_max):
        sub = RBFModel(
            ctrl=model.ctrl,
            w_rbf=model.w_rbf[lo : lo + f_max],
            w_poly=model.w_poly[lo : lo + f_max],
            eps=model.eps,
        )
        out, _ = evaluate_pallas_frames(
            sub, pts, jnp.zeros(pts.shape[0], jnp.float32), wloc,
            jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
            kernel, term, strict_parity=False, frame=frm,
            interpret=interpret,
        )
        outs.append(out)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def _frame_model(batched: RBFModel, f: int | jnp.ndarray) -> RBFModel:
    return RBFModel(
        ctrl=batched.ctrl,
        w_rbf=batched.w_rbf[f],
        w_poly=batched.w_poly[f],
        eps=batched.eps,
    )


def apply_frames(
    batched_model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
    mesh: Mesh | None = None,
    frame=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Public entry: eval_view()-normalized jit key (round-5 review — the
    full-cfg key re-traced on solve-only toggles), and the tangent
    projection gated on cfg.tangent like every single-frame path (a frame
    passed with tangent off used to project anyway)."""
    cfg_e = cfg.eval_view()
    if not cfg_e.tangent:
        frame = None
    return _apply_frames_jit(
        batched_model, points, dist2, gate, cfg_e, params, mesh, frame
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _apply_frames_jit(
    batched_model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
    mesh: Mesh | None = None,
    frame=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate every frame: -> ((F, V, 3) positions, (V,) falloff).

    The falloff depends only on capture distances, not the frame, so it is
    computed once.  An optional tangent frame=(u, v, n) of (V, 3) attrs
    applies the reference's oblique projection to every frame's
    displacement (fused in the kernel on TPU).  With a mesh, vertices
    shard over 'v' and the frame loop runs inside each shard (weights are
    small and replicated, so F x N x 3 per chip is trivial); without one,
    a plain vmap over frames.
    """
    params = params.clamped()
    kernel = fit_mod.effective_kernel(cfg)
    w, _ = falloff_weight(
        dist2, params.radius, params.falloffrate, strict_parity=cfg.strict_parity
    )
    w = w * gate

    from facedeform_tpu.parallel.sharding import _mesh_on_tpu

    use_pallas = (
        _mesh_on_tpu(mesh) if mesh is not None else on_tpu()
    )

    from facedeform_tpu.ops.precise_eval import GROWING_KERNELS

    def eval_frames_local(model, pts, wloc, frm):
        if kernel in GROWING_KERNELS:
            # the frames kernel is f32-only; growing kernels break the
            # 5e-5 budget there (2.8e-3 measured at 4k controls) — run
            # the double-float eval per frame under a SEQUENTIAL map so
            # the df temps stay single-frame-sized.  Same routing rule
            # as Deformer.apply / sharding._local_apply; the batched
            # path used to skip it (round-5 review).
            from facedeform_tpu.ops.precise_eval import evaluate_precise

            has_lo = model.w_rbf_lo is not None

            def one(ws):
                m = RBFModel(
                    ctrl=model.ctrl, w_rbf=ws[0], w_poly=ws[1],
                    eps=model.eps,
                    w_rbf_lo=ws[2] if has_lo else None,
                    w_poly_lo=ws[3] if has_lo else None,
                )
                disp = evaluate_precise(m, pts, kernel, cfg.term)
                if frm is not None:
                    from facedeform_tpu.ops.tangent import (
                        project_to_tangents,
                    )

                    disp = project_to_tangents(*frm, disp)
                return pts + disp * wloc[:, None]

            operands = (
                (model.w_rbf, model.w_poly, model.w_rbf_lo,
                 model.w_poly_lo)
                if has_lo else (model.w_rbf, model.w_poly)
            )
            return jax.lax.map(one, operands)
        if use_pallas:
            return _eval_frames_pallas_chunked(
                model, pts, wloc, frm, kernel, cfg.term
            )

        def one(f_w_rbf, f_w_poly):
            m = RBFModel(ctrl=model.ctrl, w_rbf=f_w_rbf, w_poly=f_w_poly, eps=model.eps)
            disp = evaluate_block(m, pts, kernel, cfg.term)
            if frm is not None:
                from facedeform_tpu.ops.tangent import project_to_tangents

                disp = project_to_tangents(*frm, disp)
            return pts + disp * wloc[:, None]

        return jax.vmap(one)(model.w_rbf, model.w_poly)

    if frame is not None:
        frame = tuple(jnp.asarray(f, jnp.float32) for f in frame)
    if mesh is None:
        return (
            eval_frames_local(batched_model, points.astype(jnp.float32), w,
                              frame),
            w,
        )

    n_dev = mesh.shape[VERTEX_AXIS]
    v = points.shape[0]
    pad = (-v) % n_dev
    pts_p = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    w_p = jnp.pad(w, (0, pad))
    frame_p = (
        None if frame is None
        else tuple(jnp.pad(f, ((0, pad), (0, 0))) for f in frame)
    )
    mapped = jax.shard_map(
        eval_frames_local,
        mesh=mesh,
        in_specs=(
            P(), P(VERTEX_AXIS), P(VERTEX_AXIS),
            P() if frame is None else (P(VERTEX_AXIS),) * 3,
        ),
        out_specs=P(None, VERTEX_AXIS),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    out = mapped(batched_model, pts_p, w_p, frame_p)
    return out[:, :v], w


def deform_frames(
    rest_ctrl: jnp.ndarray,
    deformed_frames: jnp.ndarray,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    mesh: Mesh | None = None,
    frame=None,
    confidence: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Public entry: jit key normalized to the union of the solve + eval
    fields (morph/falloff/clamp/dbse toggles never enter this program);
    tangent gated on cfg.tangent (round-5 review)."""
    import dataclasses as _dc

    cfg_n = _dc.replace(
        cfg, morphspace=False, dofalloff=False, doclampweight=False,
        dbse_lstsq=True, dbse_robust=False, falloff_metric="euclidean",
    )
    if not cfg_n.tangent:
        frame = None
    return _deform_frames_jit(
        rest_ctrl, deformed_frames, points, dist2, gate, cfg_n, params,
        mesh, frame, confidence,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _deform_frames_jit(
    rest_ctrl: jnp.ndarray,
    deformed_frames: jnp.ndarray,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams = DeformParams(),
    mesh: Mesh | None = None,
    frame=None,
    confidence: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-sequence step in ONE dispatch: batched solve + all-frame eval.

    fit_frames + apply_frames as separate calls pay the remote-dispatch
    RTT twice and materialize the (F, L, N, 3) weight stack in HBM between
    programs; through the axon tunnel that dominates short sequences
    (measured at 1M x 1k x 8: 13.7 -> ~10 ms/frame).  This fuses both
    into a single jit so a shot pays one dispatch, XLA overlaps the frame
    solves with the first evals, and the weights never round-trip.

    Returns ((F, V, 3) positions, (V,) falloff) like apply_frames.
    """
    # nested jit calls inline into this trace: one compiled program
    model, _ = fit_frames(rest_ctrl, deformed_frames, cfg, params,
                          confidence=confidence)
    return apply_frames(model, points, dist2, gate, cfg, params, mesh, frame)


def _transport_frames_pallas_chunked(
    model: RBFModel,
    pts: jnp.ndarray,
    apply_rules,
    kernel,
    term,
    f_max: int | None = None,
    interpret: bool = False,
):
    """Frames-packed Jacobians with rules applied PER CHUNK: distances +
    phi' compute once per (block, tile) (ops/pallas_jacobian.py) but only
    the (F, V, 3/4) transported outputs ever live whole-shot in HBM — a
    200-frame 1M-vertex shot's (F, V, 3, 3) Jacobian stack alone would be
    7.2 GB.  Chunks are static slices inside the caller's jit trace, so
    the sequence still compiles to one dispatch.

    apply_rules: (V, 3, 3) Jacobian -> tuple of per-frame outputs.
    """
    from facedeform_tpu.ops.pallas_jacobian import (
        jac_frames_per_dispatch, jacobian_pallas_frames,
    )

    n_frames = model.w_rbf.shape[0]
    fpd = f_max or jac_frames_per_dispatch(
        model.ctrl.shape[0], model.w_rbf.shape[1]
    )
    chunks = []
    for lo in range(0, n_frames, fpd):
        sub = RBFModel(
            ctrl=model.ctrl, w_rbf=model.w_rbf[lo : lo + fpd],
            w_poly=model.w_poly[lo : lo + fpd], eps=model.eps,
        )
        jacs = jacobian_pallas_frames(
            sub, pts, kernel, term, interpret=interpret
        )
        chunks.append(jax.lax.map(apply_rules, jacs))
    if len(chunks) == 1:
        return chunks[0]
    return tuple(
        jnp.concatenate([c[i] for c in chunks])
        for i in range(len(chunks[0]))
    )


def transport_frames(
    batched_model: RBFModel,
    points: jnp.ndarray,
    values,
    weight: jnp.ndarray,
    cfg: DeformConfig,
    kinds,
    mesh: Mesh | None = None,
    frame=None,
    want_stretch: bool = False,
):
    """Per-frame attribute transport for a whole shot in ONE dispatch.

    For each frame f the displacement Jacobian of _frame_model(f) is
    built at the REST positions and the per-kind rules applied (vector /
    normal / quaternion, ops/jacobian.py), plus optional principal
    stretches — the batched twin of Deformer.transform_attrs, so
    `deform-seq --batch --update-normals` no longer falls back to
    per-frame node cooks.  Frames run under lax.map (the Jacobian's
    (L, chunk, N) scratch stays single-frame); with a device mesh the
    vertex axis shards and frames loop inside each shard.

    Args:
      values: tuple of (V, 3)/(V, 4) rest attrs, one per kind in `kinds`.
      weight: (V,) frame-invariant multiplier (composed falloff x group
        gate from the frame-0 cook).
    Returns: tuple of (F, V, k) arrays (+ (F, V, 3) stretches last when
      want_stretch).
    """
    # eval_view BEFORE the jit boundary: cfg is a static jit key, so
    # solve-only toggles must not recompile the whole-shot program
    # (CLAUDE.md jit-hygiene rule; same pattern as sharded_transport)
    return _transport_frames_jit(
        batched_model, points, tuple(values), weight, cfg.eval_view(),
        tuple(kinds), mesh, frame, bool(want_stretch),
    )


@functools.partial(jax.jit, static_argnames=(
    "kinds", "cfg", "mesh", "want_stretch"
))
def _transport_frames_jit(
    batched_model: RBFModel,
    points: jnp.ndarray,
    values,
    weight: jnp.ndarray,
    cfg: DeformConfig,
    kinds,
    mesh: Mesh | None,
    frame,
    want_stretch: bool,
):
    from facedeform_tpu.ops.jacobian import (
        _applied_gradient, displacement_jacobian, principal_stretches,
        transform_normals, transform_quaternions, transform_vectors,
    )

    rules = {
        "vector": transform_vectors,
        "normal": transform_normals,
        "quaternion": transform_quaternions,
    }
    kernel = fit_mod.effective_kernel(cfg)
    values = tuple(jnp.asarray(v, jnp.float32) for v in values)
    weight = jnp.asarray(weight, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    if frame is not None:
        frame = tuple(jnp.asarray(f, jnp.float32) for f in frame)

    from facedeform_tpu.parallel.sharding import _mesh_on_tpu

    use_pallas = (
        _mesh_on_tpu(mesh) if mesh is not None else on_tpu()
    )

    def local(model, pts, w, vs, fr):
        def apply_rules(jac):
            fgrad = _applied_gradient(jac, w, cfg, fr)
            outs = [rules[k](val, fgrad) for val, k in zip(vs, kinds)]
            if want_stretch:
                outs.append(principal_stretches(fgrad))
            return tuple(outs)

        if use_pallas:
            return _transport_frames_pallas_chunked(
                model, pts, apply_rules, kernel, cfg.term
            )

        def one_frame(mw):
            f_w_rbf, f_w_poly = mw
            m = RBFModel(ctrl=model.ctrl, w_rbf=f_w_rbf,
                         w_poly=f_w_poly, eps=model.eps)
            return apply_rules(
                displacement_jacobian(m, pts, kernel, cfg.term)
            )

        return jax.lax.map(one_frame, (model.w_rbf, model.w_poly))

    if mesh is None:
        return local(batched_model, points, weight, values, frame)

    n_dev = mesh.shape[VERTEX_AXIS]
    v = points.shape[0]
    pad = (-v) % n_dev
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    w_p = jnp.pad(weight, (0, pad))
    vals_p = tuple(jnp.pad(val, ((0, pad), (0, 0))) for val in values)
    frame_p = (
        None if frame is None
        else tuple(jnp.pad(f, ((0, pad), (0, 0))) for f in frame)
    )
    n_out = len(values) + (1 if want_stretch else 0)
    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(VERTEX_AXIS), P(VERTEX_AXIS),
            (P(VERTEX_AXIS),) * len(values),
            P() if frame_p is None else (P(VERTEX_AXIS),) * 3,
        ),
        out_specs=(P(None, VERTEX_AXIS),) * n_out,
        check_vma=False,
    )
    outs = mapped(batched_model, pts_p, w_p, vals_p, frame_p)
    return tuple(o[:, :v] for o in outs)
