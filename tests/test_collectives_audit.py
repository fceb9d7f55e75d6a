"""Compiled-HLO collective audit for the sharded paths.

The scaling design (SURVEY.md section 5, PARITY.md aux table) promises:
steady-state vertex-sharded eval runs with ZERO collectives (model
replicated, every chip owns its vertex slab — the reference's thread pool
promoted to chips); collectives appear only where the math demands a
global reduction (sharded-fit Gram/matvec psums, DBSE weight solves, the
robust-DBSE residual median, diagnostics).  These tests enforce that
contract on the actual optimized HLO, so a future edit that accidentally
introduces a per-frame all-gather (e.g. an unsharded intermediate) fails
CI instead of silently eating ICI bandwidth.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops import fit as fit_mod
from facedeform_tpu.parallel import sharding

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)\b"
)


def _collective_counts(compiled_text: str) -> dict:
    counts: dict = {}
    for m in COLLECTIVE_RE.finditer(compiled_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def _rig(rng, n=16):
    rest = fibonacci_points(n)
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    return jnp.asarray(rest), jnp.asarray(deformed)


def test_sharded_eval_has_zero_collectives(rng):
    """sharded_apply's contract: replicated model, vertex slabs, no
    cross-chip traffic at all in the compiled module."""
    mesh = sharding.make_mesh()
    rest, deformed = _rig(rng)
    cfg, params = DeformConfig(), DeformParams()
    model, _ = fit_mod.fit(rest, deformed, cfg, params)
    v = 64
    pts = jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32))
    d2 = jnp.zeros(v, jnp.float32)
    gate = jnp.ones(v, jnp.float32)
    txt = (
        sharding._sharded_apply_jit
        .lower(model, pts, d2, gate, cfg.eval_view(), params, mesh)
        .compile()
        .as_text()
    )
    counts = _collective_counts(txt)
    assert counts == {}, f"steady-state eval emits collectives: {counts}"


def test_deform_step_collectives_are_the_diagnostic_only(rng):
    """deform_step adds exactly the documented pmax health metric — the
    only collective class in the whole per-frame step is all-reduce (the
    replicated fit compiles collective-free because its inputs are
    replicated)."""
    mesh = sharding.make_mesh()
    rest, deformed = _rig(rng)
    cfg, params = DeformConfig(), DeformParams()
    v = 64
    pts = jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32))
    d2 = jnp.zeros(v, jnp.float32)
    gate = jnp.ones(v, jnp.float32)
    txt = (
        sharding.deform_step
        .lower(rest, deformed, pts, d2, gate, cfg, params, mesh)
        .compile()
        .as_text()
    )
    counts = _collective_counts(txt)
    assert set(counts) <= {"all-reduce"}, counts


def test_sharded_fit_gathers_only_the_matvec_output(rng):
    """Control-row-sharded Krylov fit: the ONLY collective is the
    explicit O(N k) all-gather of each matvec's output — never a
    partitioner-invented reshard (collective-permute / all-to-all) of
    Krylov intermediates.  (The original out_specs=P('v') formulation
    compiled to 460 collective-permutes + 80 all-to-alls on this exact
    program.)"""
    from facedeform_tpu.parallel.krylov_sharded import fit_sharded

    mesh = sharding.make_mesh()
    rest, deformed = _rig(rng, n=24)
    cfg = DeformConfig(solver="krylov")
    txt = (
        fit_sharded.lower(rest, deformed, cfg, DeformParams(), mesh)
        .compile()
        .as_text()
    )
    counts = _collective_counts(txt)
    assert counts.get("all-gather", 0) >= 1, counts
    assert set(counts) <= {"all-gather"}, counts


def test_whole_shot_and_transport_and_pu_are_collective_free(rng):
    """The other steady-state sharded programs — batched frames eval,
    attribute transport, and the PU tile eval — carry the same replicated-
    model/vertex-slab layout as sharded_apply and must also compile with
    zero collectives."""
    from facedeform_tpu.config import PolyTerm, RBFKernel
    from facedeform_tpu.ops import pu as pu_ops
    from facedeform_tpu.ops.pallas_pu import plan_eval_tiles
    from facedeform_tpu.parallel import batched, pu_sharded

    mesh = sharding.make_mesh()
    rest, deformed = _rig(rng)
    cfg, params = DeformConfig(), DeformParams()
    v = 64
    pts = jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32))
    d2 = jnp.zeros(v, jnp.float32)
    gate = jnp.ones(v, jnp.float32)

    frames = jnp.stack([deformed, rest + 0.01])
    import dataclasses as _dc

    cfg_n = _dc.replace(
        cfg, morphspace=False, dofalloff=False, doclampweight=False,
        dbse_lstsq=True, dbse_robust=False, falloff_metric="euclidean",
    )
    txt = (
        batched._deform_frames_jit
        .lower(rest, frames, pts, d2, gate, cfg_n, params, mesh, None)
        .compile().as_text()
    )
    assert _collective_counts(txt) == {}, "deform_frames"

    model, _ = fit_mod.fit(rest, deformed, cfg, params)
    attrs = {"N": pts / jnp.linalg.norm(pts, axis=1, keepdims=True)}
    f = jax.jit(lambda m, p, a, w: sharding.sharded_transport(
        m, p, a, w, cfg, mesh, want_stretch=True))
    txt = f.lower(model, pts, attrs, jnp.ones(v)).compile().as_text()
    assert _collective_counts(txt) == {}, "sharded_transport"

    pu_rest = np.asarray(fibonacci_points(48))
    patches = pu_ops.build_patches(pu_rest, patch_size=24)
    m_pu, _ = pu_ops.fit_pu(
        pu_rest, pu_rest * 1.05, RBFKernel.THIN_PLATE, PolyTerm.LINEAR,
        patches=patches, lam=0.0,
    )
    q = rng.standard_normal((v, 3)).astype(np.float32)
    splan = pu_sharded.shard_tile_plan(
        plan_eval_tiles(patches, q), mesh.shape[sharding.VERTEX_AXIS]
    )
    g = jax.jit(lambda m, qq, ip, ivt, fp, perm, inv:
                pu_sharded.sharded_pu_displacement(
                    m, qq, ip, ivt, fp, perm, inv,
                    RBFKernel.THIN_PLATE, PolyTerm.LINEAR,
                    splan.num_points, splan.tile_v, splan.vp, mesh))
    txt = g.lower(
        m_pu, jnp.asarray(q), jnp.asarray(splan.item_patch),
        jnp.asarray(splan.item_vt), jnp.asarray(splan.forced_patch),
        jnp.asarray(splan.perm), jnp.asarray(splan.inv_perm),
    ).compile().as_text()
    # PU: kernel work collective-free; the only communication is the
    # explicit result all_gather (XLA may split it into a few pieces) so
    # the global inverse tile-order permutation runs replicated (a
    # sharded permute compiled to 21 collective-permutes + 2 all-reduces
    # before the gather was made explicit).
    counts = _collective_counts(txt)
    assert set(counts) == {"all-gather"}, counts


def test_blendshape_bake_collective_budget(rng):
    """Sharded PCA bake: stage 1 is exactly the Gram psum (+ the mean-max
    pmax riding it); stage 2's basis matmul is row-local — its only
    collectives are the report's error psum/pmax.  all-reduce only, no
    resharding of the (F, 3V) slab."""
    from facedeform_tpu.parallel import blendshapes_sharded as bss

    mesh = sharding.make_mesh()
    f_n, v, k = 5, 64, 3
    deltas = jnp.asarray(rng.standard_normal((f_n, v, 3)).astype(np.float32))

    txt1 = (
        bss.stage1_gram
        .lower(deltas, mesh, True).compile().as_text()
    )
    counts1 = _collective_counts(txt1)
    assert set(counts1) <= {"all-reduce"}, counts1
    assert counts1.get("all-reduce", 0) >= 1, counts1

    u_sc = jnp.asarray(rng.standard_normal((f_n, k)).astype(np.float32))
    w_all = jnp.asarray(
        rng.standard_normal((f_n, k + 1)).astype(np.float32)
    )
    txt2 = (
        bss.stage2_basis
        .lower(deltas, u_sc, w_all, mesh, True, True)
        .compile().as_text()
    )
    counts2 = _collective_counts(txt2)
    assert set(counts2) <= {"all-reduce"}, counts2


def test_dbse_sharded_collective_budget(rng):
    """Plain sharded DBSE: Gram/RHS psums only.  Robust DBSE adds the
    all-gathered residual norms for the global MAD median — exactly
    n_iter all-gathers, nothing else new."""
    from facedeform_tpu.parallel.dbse_sharded import (
        weights_lstsq_sharded,
        weights_robust_sharded,
    )

    mesh = sharding.make_mesh()
    v, s = 40, 3
    deltas = jnp.asarray(rng.standard_normal((s, v, 3)).astype(np.float32))
    cur = jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32))
    restp = jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32))

    txt_l = (
        weights_lstsq_sharded.lower(deltas, cur, restp, mesh)
        .compile().as_text()
    )
    counts_l = _collective_counts(txt_l)
    assert counts_l.get("all-reduce", 0) >= 1, counts_l
    assert counts_l.get("all-gather", 0) == 0, counts_l

    n_iter = 4
    txt_r = (
        weights_robust_sharded
        .lower(deltas, cur, restp, mesh, n_iter=n_iter)
        .compile().as_text()
    )
    counts_r = _collective_counts(txt_r)
    assert counts_r.get("all-gather", 0) == n_iter, counts_r
    assert set(counts_r) <= {"all-reduce", "all-gather"}, counts_r
