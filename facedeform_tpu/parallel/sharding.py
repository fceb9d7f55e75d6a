"""Multi-chip evaluation: vertices sharded over an ICI mesh, model replicated.

The reference's only parallelism artifact is the disabled thread pool that
replicates the serialized ALGLIB model per thread and splits vertex pages
(src/SOP_FaceDeform.hpp:116-188).  This module promotes exactly that design
to chips (SURVEY.md section 2, parallelism note): a 1-D device mesh with

    points / dist2 / gate   sharded  on the vertex axis ('v')
    control points, weights replicated

so steady-state evaluation needs ZERO collectives — each chip runs the same
fused Pallas kernel on its vertex shard against its local copy of the tiny
(N x 3) control data.  The only collective anywhere is an optional psum for
global diagnostics.  Multi-host runs ride the standard JAX runtime over DCN
with the same program.

The `fit` solve is replicated (N x N with N ~ 1e3 is far cheaper than one
collective round-trip); see SURVEY.md section 5 for the design note on when
control-point sharding (ring-passing Phi blocks) would become worthwhile.
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
from facedeform_tpu.ops.tangent import project_to_tangents

VERTEX_AXIS = "v"


def _mesh_on_tpu(mesh: Mesh) -> bool:
    """True when the mesh devices are TPU chips (the pallas fast path
    compiles only there; the CPU dry-run mesh takes the dense path)."""
    import numpy as np

    return np.asarray(mesh.devices).flat[0].platform == "tpu"


def make_mesh(devices=None) -> Mesh:
    """1-D device mesh over the vertex axis (all local devices by default)."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (VERTEX_AXIS,))


def _local_apply(
    model: RBFModel,
    pts: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    frame,
    cfg: DeformConfig,
    params: DeformParams,
    use_pallas: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-shard eval: identical semantics to deformer.apply_fn.

    Uses the fused Pallas kernel when the mesh lives on TPU devices, dense
    XLA otherwise — shard_map bodies trace once per shard shape, so the
    branch is static.
    """
    use_tangent = cfg.tangent and frame is not None
    kernel = fit_mod.effective_kernel(cfg)
    from facedeform_tpu.ops.precise_eval import GROWING_KERNELS

    if kernel in GROWING_KERNELS:
        # Growing kernels need the double-float path for the 5e-5 budget
        # (see Deformer.apply) — each shard evaluates its vertices in df,
        # via the fused Mosaic kernel on TPU meshes.
        if use_pallas:
            from facedeform_tpu.ops.pallas_precise import evaluate_pallas_precise

            return evaluate_pallas_precise(
                model, pts, dist2, gate,
                jnp.asarray(params.radius, jnp.float32),
                jnp.asarray(params.falloffrate, jnp.float32),
                kernel, cfg.term,
                strict_parity=cfg.strict_parity,
                frame=frame if use_tangent else None,
            )
        from facedeform_tpu.ops.precise_eval import evaluate_precise

        disp = evaluate_precise(model, pts, kernel, cfg.term)
        if use_tangent:
            disp = project_to_tangents(*frame, disp)
        w, _ = falloff_weight(
            dist2, params.radius, params.falloffrate,
            strict_parity=cfg.strict_parity,
        )
        w = w * gate
        return pts + disp * w[:, None], w
    if use_pallas:
        from facedeform_tpu.ops.pallas_eval import evaluate_pallas

        # Tangent projection fuses into the kernel (the reference's
        # threaded path projected per thread too, SOP_FaceDeform.hpp:152-168).
        return evaluate_pallas(
            model, pts, dist2, gate,
            jnp.asarray(params.radius, jnp.float32),
            jnp.asarray(params.falloffrate, jnp.float32),
            fit_mod.effective_kernel(cfg), cfg.term,
            strict_parity=cfg.strict_parity,
            frame=frame if use_tangent else None,
        )
    disp = evaluate_block(model, pts, fit_mod.effective_kernel(cfg), cfg.term)
    if use_tangent:
        disp = project_to_tangents(*frame, disp)
    w, active = falloff_weight(
        dist2, params.radius, params.falloffrate, strict_parity=cfg.strict_parity
    )
    w = w * gate
    return pts + disp * w[:, None], w


def sharded_apply(
    model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
    mesh: Mesh,
    frame=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Public entry: eval_view() BEFORE the jit cache lookup — the view
    used to be applied inside the jitted body, where it cannot stop a
    solve-only toggle from re-tracing the whole sharded program (round-5
    review; CLAUDE.md jit-key rule)."""
    return _sharded_apply_jit(
        model, points, dist2, gate, cfg.eval_view(), params, mesh, frame
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=()
)
def _sharded_apply_jit(
    model: RBFModel,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
    mesh: Mesh,
    frame=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vertex-sharded deformation: (V, 3) -> (V, 3), V padded to the mesh size.

    in_specs: model fully replicated (P()), vertex arrays P('v') — the
    optional tangent frame (u, v, n) shards on the vertex axis like the
    positions (each chip projects its own vertices, exactly as each thread
    of the reference's disabled pool did, SOP_FaceDeform.hpp:152-168).
    out_specs: P('v').  No collective appears in the compiled program.
    """
    n_dev = mesh.shape[VERTEX_AXIS]
    v = points.shape[0]
    pad = (-v) % n_dev
    points = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    dist2 = jnp.pad(dist2.astype(jnp.float32), (0, pad))
    gate = jnp.pad(gate.astype(jnp.float32), (0, pad))
    if frame is not None:
        frame = tuple(
            jnp.pad(jnp.asarray(f, jnp.float32), ((0, pad), (0, 0)))
            for f in frame
        )

    # cfg is already an eval_view (the public wrapper normalizes)
    params = params.clamped()
    body = functools.partial(
        _local_apply, cfg=cfg, params=params,
        use_pallas=_mesh_on_tpu(mesh),
    )
    frame_specs = () if frame is None else ((P(VERTEX_AXIS),) * 3,)
    mapped = jax.shard_map(
        lambda m, p, d, g, *fr: body(m, p, d, g, frame=fr[0] if fr else None),
        mesh=mesh,
        in_specs=(P(), P(VERTEX_AXIS), P(VERTEX_AXIS), P(VERTEX_AXIS))
        + frame_specs,
        out_specs=(P(VERTEX_AXIS), P(VERTEX_AXIS)),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    args = (model, points, dist2, gate) + (() if frame is None else (frame,))
    new_pts, w = mapped(*args)
    return new_pts[:v], w[:v]


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def deform_step(
    rest_ctrl: jnp.ndarray,
    deformed_ctrl: jnp.ndarray,
    points: jnp.ndarray,
    dist2: jnp.ndarray,
    gate: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
    mesh: Mesh,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The full per-frame step: replicated solve + sharded eval + one psum.

    This is the multi-chip "training step" analogue: everything the node does
    per animation frame once capture is cached.  Returns (new_points,
    falloff, global max displacement) — the last via an explicit collective
    over the vertex axis as the health metric (SURVEY.md section 5: global
    error norms are the only psum in the design).
    """
    model, report = fit_mod.fit(rest_ctrl, deformed_ctrl, cfg, params)
    new_pts, w = sharded_apply(model, points, dist2, gate, cfg, params, mesh)

    def max_disp(p_new, p_old):
        local = jnp.max(jnp.abs(p_new - p_old))
        return jax.lax.pmax(local, VERTEX_AXIS)

    v = points.shape[0]
    n_dev = mesh.shape[VERTEX_AXIS]
    pad = (-v) % n_dev
    p_old = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    p_new = jnp.pad(new_pts, ((0, pad), (0, 0)))
    gmax = jax.shard_map(
        max_disp,
        mesh=mesh,
        in_specs=(P(VERTEX_AXIS), P(VERTEX_AXIS)),
        out_specs=P(),
        check_vma=False,
    )(p_new, p_old)
    return new_pts, w, gmax


@functools.partial(jax.jit, static_argnames=(
    "kinds", "cfg", "mesh", "want_stretch"
))
def _sharded_transport_jit(
    model, points, values, weight, frame, kinds, cfg, mesh, want_stretch
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
    n_dev = mesh.shape[VERTEX_AXIS]
    v = points.shape[0]
    pad = (-v) % n_dev
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    w = jnp.pad(weight.astype(jnp.float32), (0, pad))
    vals = tuple(
        jnp.pad(jnp.asarray(val, jnp.float32), ((0, pad), (0, 0)))
        for val in values
    )
    if frame is not None:
        frame = tuple(
            jnp.pad(jnp.asarray(f, jnp.float32), ((0, pad), (0, 0)))
            for f in frame
        )
    kernel = fit_mod.effective_kernel(cfg)

    use_pallas = _mesh_on_tpu(mesh)

    def body(m, p, wt, vs, fr):
        if use_pallas:
            from facedeform_tpu.ops.pallas_jacobian import jacobian_pallas

            jac = jacobian_pallas(m, p, kernel, cfg.term)
        else:
            jac = displacement_jacobian(m, p, kernel, cfg.term)
        f = _applied_gradient(jac, wt, cfg, fr)
        outs = [rules[k](val, f) for val, k in zip(vs, kinds)]
        if want_stretch:
            outs.append(principal_stretches(f))
        return tuple(outs)

    nv = len(vals)
    frame_specs = () if frame is None else ((P(VERTEX_AXIS),) * 3,)
    n_out = nv + (1 if want_stretch else 0)
    mapped = jax.shard_map(
        lambda m, p, wt, *rest: body(
            m, p, wt, rest[:nv],
            rest[nv] if frame is not None else None,
        ),
        mesh=mesh,
        in_specs=(P(), P(VERTEX_AXIS), P(VERTEX_AXIS))
        + (P(VERTEX_AXIS),) * nv + frame_specs,
        out_specs=(P(VERTEX_AXIS),) * n_out,
        check_vma=False,
    )
    args = (model, pts, w) + vals + (() if frame is None else (frame,))
    outs = mapped(*args)
    return tuple(o[:v] for o in outs)


def sharded_transport(
    model: RBFModel,
    points,
    attrs: dict,
    weight,
    cfg: DeformConfig,
    mesh: Mesh,
    frame=None,
    kinds: dict | None = None,
    want_stretch: bool = False,
):
    """Vertex-sharded attribute transport (+ optional principal stretches).

    The multichip twin of ops.jacobian.transport_attrs: each chip builds
    the displacement Jacobian for its own vertex shard against the
    replicated model and applies the per-kind rules — zero collectives,
    the same design as sharded_apply (the reference's thread-pool contract,
    SOP_FaceDeform.hpp:116-188: promotion must not change results).
    Global families only; PU transport stays single-device
    (ops.pu.jacobian_pu's plan gathers don't shard).

    Returns ({name: transported}, stretches (V, 3) or None).
    """
    from facedeform_tpu.ops.jacobian import ATTR_KINDS, infer_attr_kind

    names = tuple(attrs.keys())
    resolved = []
    for name in names:
        kind = (kinds or {}).get(name) or infer_attr_kind(name, attrs[name])
        if kind not in ATTR_KINDS:
            raise ValueError(
                f"attribute {name!r}: no transport rule for kind {kind!r}"
            )
        resolved.append(kind)
    outs = _sharded_transport_jit(
        model, jnp.asarray(points, jnp.float32),
        tuple(attrs[n] for n in names),
        jnp.asarray(weight, jnp.float32),
        None if frame is None else tuple(frame),
        tuple(resolved), cfg.eval_view(), mesh, bool(want_stretch),
    )
    moved = dict(zip(names, outs[:len(names)]))
    sig = outs[len(names)] if want_stretch else None
    return moved, sig
