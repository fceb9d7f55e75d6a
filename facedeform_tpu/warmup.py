"""Cold-compile bootstrap: precompile the common program set.

The remote-compile TPU runtime pays 10-240 s per jit program on first
sight (CLAUDE.md), amortized only through JAX's persistent client-side
compilation cache (~/.cache/facedeform_tpu/jax, enabled by the package).
A first interactive session therefore eats the full cold cost exactly
when the user is watching.  `facedeform-tpu warm` (or warm_programs())
runs a synthetic fit + eval at the session's REAL shapes once — jit
programs are shape-specialized, so warming only helps at matching
(verts, controls, frames) — filling the persistent cache so every later
process at those shapes starts at warm speed.

What gets compiled mirrors a first cook end to end through the public
entry points (identical jit keys): the dense fit (LU + df refinement),
the dense AND culled Pallas eval kernels (node.cook's autotune measures
both), and optionally the animated-sequence programs (batched solve +
frames kernel).  Measured on v5e (1M verts x 997 controls x 4 frames):
a cold `warm` took 468 s (fit compile alone 435 s under service load);
the second process at the same shapes totalled 6.7 s (fit 2.9 s, evals
0.3-1.3 s, frames 2.2 s) — a ~70x first-session improvement.  This
needs jax_persistent_cache_min_compile_time_secs=0 (the package sets
it): with the default 1 s floor, the fit's small-but-remote-compiled
helper programs skipped the cache and re-paid 27-129 s per launch.

No reference counterpart (ALGLIB JIT-compiles nothing); this is the
operational cost of the remote-compile runtime made a one-time step.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.utils.platform import on_tpu


def _synth_points(verts: int) -> jnp.ndarray:
    """(V, 3) device-resident synthetic vertices — content is irrelevant
    to compilation, so build on device instead of uploading ~12 MB/1M
    through the tunnel."""
    i = jnp.arange(verts, dtype=jnp.float32)
    return jnp.stack([
        jnp.sin(0.01 * i), jnp.cos(0.017 * i), jnp.sin(0.003 * i + 1.0),
    ], axis=-1)


def _sync(x) -> float:
    # jax.block_until_ready does not fence the axon tunnel (CLAUDE.md);
    # a scalar pull does.
    return float(jnp.sum(x))


def warm_programs(
    verts: int = 1_000_000,
    controls: int = 1000,
    frames: int = 0,
    cfg: Optional[DeformConfig] = None,
    params: Optional[DeformParams] = None,
    progress: Optional[Callable[[str], None]] = None,
) -> dict:
    """Compile-and-run the common program set at the given shapes.

    Returns {stage: seconds}.  Run once per (verts, controls, frames,
    model-config) combination; later processes at the same shapes hit
    the persistent compile cache.
    """
    say = progress or (lambda s: None)
    cfg = cfg or DeformConfig()
    params = params or DeformParams()
    rng = np.random.default_rng(0)
    rest = fibonacci_points(controls)
    deformed = (
        rest + 0.05 * rng.standard_normal(rest.shape)
    ).astype(np.float32)
    pts = _synth_points(verts)
    dist2 = jnp.zeros(verts, jnp.float32)
    timings: dict = {}

    t0 = time.time()
    d = Deformer.fit(rest, deformed, cfg, params)
    _sync(d.model.w_rbf)
    timings["fit"] = time.time() - t0
    say(f"fit @ {controls} controls: {timings['fit']:.1f}s")

    # The Mosaic kernels exist on TPU only (compiled mode); elsewhere the
    # dense XLA path is what a session would actually run.
    backends = ("pallas", "pallas_culled") if on_tpu() else ("dense",)
    for backend in backends:
        t0 = time.time()
        out, w = d.apply(pts, dist2=dist2, backend=backend)
        _sync(out)
        timings[f"eval_{backend}"] = time.time() - t0
        say(
            f"eval {backend} @ {verts} verts: "
            f"{timings[f'eval_{backend}']:.1f}s"
        )

    if frames > 0:
        from facedeform_tpu.parallel import batched

        rigs = jnp.asarray(np.stack([
            rest + 0.04 * rng.standard_normal(rest.shape).astype(np.float32)
            for _ in range(frames)
        ]))
        gate = jnp.ones(verts, jnp.float32)
        t0 = time.time()
        seq, _ = batched.deform_frames(
            jnp.asarray(rest), rigs, pts, dist2, gate, cfg, params,
            None, None,
        )
        _sync(seq)
        timings["frames"] = time.time() - t0
        say(f"sequence @ {frames} frames: {timings['frames']:.1f}s")

    timings["total"] = sum(timings.values())
    return timings


def warm_pu(
    controls: int = 30_000,
    queries: int = 500_000,
    frames: int = 0,
    kernel=None,
    term=None,
    lam: float = 1e-5,
    patch_size: int = 192,
    overlap: float = 1.3,
    progress: Optional[Callable[[str], None]] = None,
) -> dict:
    """Precompile the partition-of-unity route — the worst cold-compile
    cost in the codebase (a fresh patch width measured 307 s at 200k
    controls; CLAUDE.md).

    Covers fit_pu (df assembly + batched LU + refinement), the Mosaic
    tile eval at `queries` points, and with frames > 0 the shared-
    factorization sequence fit + the frames tile kernel.

    Shape-key note: PU fit/eval programs specialize on the BUCKETED
    patch width (build_patches rounds it up to a multiple of 64 exactly
    so nearby-width rigs share programs) and on the chunked patch/item
    counts — warm at your rig's control count and density and later rigs
    whose widths land in the same bucket start warm.  The returned dict
    includes `patch_width` so you can check what bucket got warmed.
    """
    from facedeform_tpu.config import PolyTerm, RBFKernel
    from facedeform_tpu.ops import pu
    from facedeform_tpu.ops.pallas_pu import plan_eval_tiles

    say = progress or (lambda s: None)
    kernel = RBFKernel.THIN_PLATE if kernel is None else kernel
    term = PolyTerm.LINEAR if term is None else term
    rng = np.random.default_rng(0)
    rest = fibonacci_points(controls)
    disp = (0.02 * rng.standard_normal(rest.shape)).astype(np.float32)
    timings: dict = {}

    patches = pu.build_patches(rest, patch_size, overlap)
    width = int(patches.idx.shape[1])
    say(f"pu patches: {patches.idx.shape[0]} x width {width}")

    t0 = time.time()
    model, _ = pu.fit_pu(
        rest, rest + disp, kernel=kernel, term=term, lam=lam,
        patches=patches,
    )
    _sync(model.w_hi)
    timings["pu_fit"] = time.time() - t0
    say(f"pu fit @ {controls} controls: {timings['pu_fit']:.1f}s")

    d = pu.PUDeformer(model, patches, kernel, term)
    q = _synth_points(queries)
    t0 = time.time()
    tplan = plan_eval_tiles(patches, np.asarray(q))
    out = d.displacement(q, plan=tplan)
    _sync(out)
    timings["pu_eval"] = time.time() - t0
    say(f"pu eval @ {queries} queries: {timings['pu_eval']:.1f}s")

    if frames > 0:
        rigs = np.stack([
            rest + (0.02 * rng.standard_normal(rest.shape)).astype(np.float32)
            for _ in range(frames)
        ])
        t0 = time.time()
        models, _ = pu.fit_pu_frames(
            rest, rigs, kernel=kernel, term=term, lam=lam, patches=patches
        )
        _sync(models[0].w_hi)
        timings["pu_seq_fit"] = time.time() - t0
        say(f"pu sequence fit @ {frames} frames: {timings['pu_seq_fit']:.1f}s")

        seq = pu.PUSeqDeformer(models, patches, kernel, term)
        t0 = time.time()
        outs = seq.displacement_frames(np.asarray(q))
        _sync(outs)
        timings["pu_seq_eval"] = time.time() - t0
        say(f"pu sequence eval: {timings['pu_seq_eval']:.1f}s")

    timings["patch_width"] = width
    timings["total"] = sum(
        v for k, v in timings.items() if k != "patch_width"
    )
    return timings


def warm_transport(
    verts: int = 1_000_000,
    controls: int = 1000,
    frames: int = 0,
    morph: bool = True,
    cfg: Optional[DeformConfig] = None,
    params: Optional[DeformParams] = None,
    progress: Optional[Callable[[str], None]] = None,
) -> dict:
    """Precompile the attribute-transport programs: the analytic-Jacobian
    normal transport (ops/pallas_jacobian via Deformer.deformed_normals),
    the frames-packed whole-shot transport, and (morph=True) the 1-ring
    field gradient + composed-F path node.cook uses after a morph/PSD
    pass.

    Every transport program jit-specializes on the VERTEX COUNT as well
    as (for the gradient) the neighbor-table WIDTH, so this warms at
    EXACTLY `verts` points — a uv-sphere's res^2+2 count can never match
    a production mesh's V, which made an earlier version of this warm
    useless for its stated purpose (round-5 review finding).  Topology is
    a synthetic quad grid over the index space (the gradient programs
    only care about shapes); the width buckets to {8, 16} under the
    transport degree cap and BOTH widths are compiled, so any production
    mesh at this V (quad degree 4, tri ~6, capped pole rings 16) finds
    its program precompiled.
    """
    import jax.numpy as jnp

    say = progress or (lambda s: None)
    cfg = cfg or DeformConfig()
    params = params or DeformParams()
    rng = np.random.default_rng(0)
    rest = fibonacci_points(controls)
    deformed = (
        rest + 0.05 * rng.standard_normal(rest.shape)
    ).astype(np.float32)
    timings: dict = {}

    # all synthetic operands stay on device (_synth_points' point: no
    # ~36 MB/1M-vert round trips through the tunnel for warm content)
    pts = _synth_points(verts)
    nrm = pts / jnp.maximum(
        jnp.linalg.norm(pts, axis=1, keepdims=True), 1e-6
    )
    w = jnp.ones(verts, jnp.float32)

    d = Deformer.fit(rest, deformed, cfg, params)
    t0 = time.time()
    out = d.deformed_normals(pts, nrm, w)
    _sync(out)
    timings["transport_normals"] = time.time() - t0
    say(f"normal transport @ {verts} verts: "
        f"{timings['transport_normals']:.1f}s")

    if morph:
        from facedeform_tpu.geometry.topology import padded_neighbors
        from facedeform_tpu.ops.jacobian import (
            TRANSPORT_MAX_DEGREE, mesh_field_gradient,
        )

        # synthetic quad-grid edges over the index space: degree <= 4 ->
        # the width-8 bucket at exactly `verts` rows; widening the same
        # table with inert self-pad columns compiles the width-16 bucket
        # (capped high-degree rings) without needing a high-degree mesh
        cols = max(int(np.sqrt(verts)), 2)
        idx = np.arange(verts, dtype=np.int64)
        right = idx[(idx % cols != cols - 1) & (idx + 1 < verts)]
        down = idx[idx + cols < verts]
        edges = np.concatenate([
            np.stack([right, right + 1], 1), np.stack([down, down + cols], 1),
        ])
        nbr8_np = padded_neighbors(verts, edges, max_degree=8)[0]
        nbr8 = jnp.asarray(nbr8_np)
        self_pad = np.tile(
            np.arange(verts, dtype=np.int32)[:, None],
            (1, TRANSPORT_MAX_DEGREE - nbr8_np.shape[1]),
        )
        nbr = jnp.asarray(np.concatenate([nbr8_np, self_pad], axis=1))
        d_field = 0.02 * jnp.sin(3.0 * pts[:, (1, 2, 0)])
        eye3 = jnp.eye(3, dtype=jnp.float32)
        t0 = time.time()
        if nbr8.shape[1] != nbr.shape[1]:
            _sync(mesh_field_gradient(pts, d_field, nbr8))
        g_blend = mesh_field_gradient(pts, d_field, nbr)

        def f_map(f):
            return eye3[None] + g_blend + jnp.float32(0.25) * (f - eye3[None])

        moved = d.transform_attrs(
            pts, {"N": nrm}, w, kinds={"N": "normal"}, f_map=f_map
        )
        _sync(moved["N"])
        timings["transport_morph_composed"] = time.time() - t0
        say("morph-composed transport: "
            f"{timings['transport_morph_composed']:.1f}s")

    if frames > 0:
        from facedeform_tpu.ops.fit import RBFModel
        from facedeform_tpu.parallel import batched

        mf = RBFModel(
            ctrl=d.model.ctrl,
            w_rbf=jnp.stack(
                [d.model.w_rbf * (1.0 + 0.1 * f) for f in range(frames)]
            ),
            w_poly=jnp.stack(
                [d.model.w_poly * (1.0 + 0.1 * f) for f in range(frames)]
            ),
            eps=d.model.eps,
        )
        t0 = time.time()
        outs = batched.transport_frames(
            mf, pts, (nrm,), w, d.cfg, ("normal",)
        )[0]
        _sync(outs)
        timings["transport_frames"] = time.time() - t0
        say(f"frames transport @ {frames} frames: "
            f"{timings['transport_frames']:.1f}s")

    timings["total"] = sum(timings.values())
    return timings


def warm_skinning(
    verts: int = 100_000,
    bones: int = 24,
    poses: int = 8,
    progress: Optional[Callable[[str], None]] = None,
) -> dict:
    """Precompile the skinning decomposition (one big jit program —
    measured 98 s cold / 8.3 s warm at 100k x 24 x 8) plus lbs_apply."""
    say = progress or (lambda s: None)
    rng = np.random.default_rng(0)
    from facedeform_tpu.ops import skinning

    pts = rng.standard_normal((verts, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    frames = []
    for t in np.linspace(0.3, 1.0, poses):
        ang = t * 0.8 * (pts[:, 1] + 1.0)
        ca, sa = np.cos(ang), np.sin(ang)
        frames.append(np.stack(
            [ca * pts[:, 0] - sa * pts[:, 2], pts[:, 1],
             sa * pts[:, 0] + ca * pts[:, 2]], -1,
        ))
    frames = np.stack(frames).astype(np.float32)
    timings: dict = {}
    t0 = time.time()
    m, _ = skinning.fit_skinning(
        pts, frames, n_bones=bones, max_influences=min(4, bones), seed=0
    )
    timings["skin_fit"] = time.time() - t0
    say(f"skinning fit @ {verts} x {bones} x {poses}: "
        f"{timings['skin_fit']:.1f}s")
    t0 = time.time()
    q = skinning.lbs_apply(
        m.weights, m.rest, m.rotations[0], m.translations[0]
    )
    _sync(q)
    timings["skin_apply"] = time.time() - t0
    say(f"lbs apply: {timings['skin_apply']:.1f}s")
    timings["total"] = sum(timings.values())
    return timings


def warm_dbse(
    verts: int = 100_000,
    shapes: int = 8,
    progress: Optional[Callable[[str], None]] = None,
) -> dict:
    """Precompile the morphspace (DBSE) programs: blendshape model build
    (QR), the least-squares weight fit, and the clamped morph pass."""
    import jax.numpy as jnp

    say = progress or (lambda s: None)
    rng = np.random.default_rng(0)
    from facedeform_tpu.ops import dbse

    rest = rng.standard_normal((verts, 3)).astype(np.float32)
    blends = [
        rest + 0.1 * rng.standard_normal((verts, 3)).astype(np.float32)
        for _ in range(shapes)
    ]
    timings: dict = {}
    t0 = time.time()
    model = dbse.build_model(rest, blends)
    _sync(model.deltas)
    timings["dbse_build"] = time.time() - t0
    say(f"dbse build @ {verts} x {shapes}: {timings['dbse_build']:.1f}s")
    posed = rest + 0.05 * rng.standard_normal((verts, 3)).astype(np.float32)
    rest_dev = jnp.asarray(rest)
    t0 = time.time()
    w, _rep = dbse.weights_lstsq(model, jnp.asarray(posed), rest_dev)
    _sync(w)
    timings["dbse_weights"] = time.time() - t0
    say(f"dbse weights: {timings['dbse_weights']:.1f}s")
    t0 = time.time()
    out = dbse.reconstruct(model, w, None, False)
    _sync(out)
    timings["dbse_reconstruct"] = time.time() - t0
    say(f"dbse reconstruct: {timings['dbse_reconstruct']:.1f}s")
    timings["total"] = sum(timings.values())
    return timings
