"""Sharded PU eval over the 8-virtual-CPU-device mesh == single-device."""

import numpy as np

from facedeform_tpu.config import RBFKernel
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops.pallas_pu import plan_eval_tiles
from facedeform_tpu.ops.pu import PUDeformer
from facedeform_tpu.parallel import sharding
from facedeform_tpu.parallel.pu_sharded import (
    pu_displacement_sharded, shard_tile_plan,
)


def _fit(n=900):
    rest = fibonacci_points(n)
    disp = (
        0.1
        * np.exp(-3 * np.sum((rest - [0, 1, 0]) ** 2, -1, keepdims=True))
        .astype(np.float32)
        * np.float32([0, 1, 0])
    )
    return PUDeformer.fit(rest, rest + disp, kernel=RBFKernel.THIN_PLATE,
                          patch_size=64, lam=1e-5), rest, disp


def test_shard_tile_plan_invariants():
    d, rest, _ = _fit()
    q = (fibonacci_points(8 * 256 * 3 + 100) * 1.01).astype(np.float32)
    tplan = plan_eval_tiles(d.patches, q)
    splan = shard_tile_plan(tplan, 8)
    assert splan.vp % (8 * splan.tile_v) == 0
    n_vt_local = splan.vp // splan.tile_v // 8
    # every device's live items stay in its local range, sorted
    for dev in range(8):
        vts = splan.item_vt[dev]
        assert (vts >= 0).all() and (vts < n_vt_local).all()
        assert (np.diff(vts) >= 0).all()
        # every local tile appears at least once (accumulator init)
        assert set(range(n_vt_local)) <= set(vts.tolist())
    # all live (patch, global-vt) items preserved
    live = []
    per_dev = splan.vp // splan.tile_v // 8
    for dev in range(8):
        for ip, vt in zip(splan.item_patch[dev], splan.item_vt[dev]):
            if ip >= 0:
                live.append((int(ip), int(vt) + dev * per_dev))
    assert sorted(live) == sorted(
        zip(tplan.item_patch.tolist(), tplan.item_vt.tolist())
    )


def test_fit_pu_sharded_matches_single(rng):
    """fit_pu(mesh=...) distributes the patch solves over the 8-device
    mesh in one dispatch; the model and its displacements must match the
    host-loop fit (patches are independent — sharding cannot change
    results).  Exercises the non-divisible case: K patches not a multiple
    of n_devices * chunk (padding correctness)."""
    rest = fibonacci_points(1100)
    disp = (
        0.08 * np.exp(-2 * np.sum((rest - [1, 0, 0]) ** 2, -1, keepdims=True))
    ).astype(np.float32) * np.float32([1, 0, 0])
    kw = dict(kernel=RBFKernel.THIN_PLATE, patch_size=48, lam=1e-5)
    d_single = PUDeformer.fit(rest, rest + disp, **kw)
    d_sharded = PUDeformer.fit(rest, rest + disp, mesh=sharding.make_mesh(),
                               **kw)
    assert d_single.model.w_hi.shape == d_sharded.model.w_hi.shape
    np.testing.assert_allclose(
        np.asarray(d_sharded.model.w_hi), np.asarray(d_single.model.w_hi),
        rtol=0, atol=1e-5,
    )
    q = (fibonacci_points(700) * 1.02).astype(np.float32)
    out_s = np.asarray(d_single.displacement(q))
    out_m = np.asarray(d_sharded.displacement(q))
    np.testing.assert_allclose(out_m, out_s, rtol=0, atol=1e-6)
    # aggregate report must exclude padded duplicate patches: backward
    # error finite and within the PU budget on both paths
    for d in (d_single, d_sharded):
        be = float(np.asarray(d.report.backward_error()))
        assert np.isfinite(be) and be < 1e-4


def test_node_cook_pu_sharded_matches_single(rng):
    """node.cook(mesh_devices=...) with solver='pu' must route through the
    sharded PU eval (round-2 gap: it warned and fell back) and match the
    single-device cook bit-for-tolerance on positions AND falloff."""
    from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode, Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(40, 40)
    rest = fibonacci_points(300)
    rig0 = Mesh(points=rest.copy())
    rig1 = Mesh(points=(rest * 1.03).astype(np.float32))
    cfg = DeformConfig(solver="pu", dofalloff=True)
    params = DeformParams(radius=2.0)
    dev_mesh = sharding.make_mesh()
    res_single = FaceDeformNode().cook([mesh, rig0, rig1], cfg, params)
    node_sh = FaceDeformNode()
    res_sharded = node_sh.cook(
        [mesh, rig0, rig1], cfg, params, mesh_devices=dev_mesh
    )
    assert not any("ignoring mesh_devices" in w for w in res_sharded.warnings)
    np.testing.assert_allclose(
        res_sharded.mesh.points, res_single.mesh.points, atol=1e-5
    )
    np.testing.assert_allclose(
        res_sharded.mesh.point_attrs["fd_falloff"],
        res_single.mesh.point_attrs["fd_falloff"], atol=1e-6,
    )
    # group restriction composes identically through the sharded route
    mask = np.zeros(mesh.num_points, bool)
    mask[::3] = True
    res_m = node_sh.cook([mesh, rig0, rig1], cfg, params,
                         group_mask=mask, mesh_devices=dev_mesh)
    assert (res_m.mesh.points[~mask] == mesh.points[~mask]).all()
    moved = np.abs(res_m.mesh.points[mask] - mesh.points[mask]).max()
    assert moved > 1e-4


def test_sharded_pu_matches_single_device(rng):
    d, rest, disp = _fit()
    mesh = sharding.make_mesh()
    n_dev = mesh.shape[sharding.VERTEX_AXIS]
    q = np.concatenate([
        (fibonacci_points(n_dev * 256 * 2) * 1.01).astype(np.float32),
        np.float32([[5, 5, 5], [0, 0, -8]]),     # forced-fallback points
    ])
    got = np.asarray(pu_displacement_sharded(d, q, mesh))
    ref = np.asarray(d.displacement(q, precise=False, backend="pallas"))
    np.testing.assert_allclose(got, ref, atol=2e-6)
    # and at the controls: exact interpolation preserved through sharding
    qc = rest[: n_dev * 256]
    got_c = np.asarray(pu_displacement_sharded(d, qc, mesh))
    assert np.abs(got_c - disp[: n_dev * 256]).max() < 5e-5


def test_pu_frames_sharded_matches_single(rng):
    """Whole-shot sharded eval (pu_displacement_frames_sharded: 3F weight
    columns per kernel item, vertex tiles split over the 8-device mesh)
    must equal the single-device frames pass — and compose through
    PUSeqDeformer.displacement_frames(mesh=...)/apply_seq(mesh=...)."""
    from facedeform_tpu.ops import pu
    from facedeform_tpu.parallel.pu_sharded import (
        pu_displacement_frames_sharded,
    )

    rest = fibonacci_points(700)
    disp = (
        0.1 * np.exp(-3 * np.sum((rest - [0, 1, 0]) ** 2, -1, keepdims=True))
    ).astype(np.float32) * np.float32([0, 1, 0])
    frames = np.stack([rest + disp * s for s in (1.0, -0.5, 0.25)])
    seq = pu.PUSeqDeformer.fit(rest, frames, kernel=RBFKernel.THIN_PLATE,
                               lam=1e-5, patch_size=64)
    q = np.concatenate([
        (fibonacci_points(900) * 1.01).astype(np.float32),
        np.float32([[6, 6, 6], [0, 0, -9]]),      # forced-fallback items
    ])
    mesh = sharding.make_mesh()
    got = np.asarray(pu_displacement_frames_sharded(seq, q, mesh))
    want = np.asarray(seq.displacement_frames(q))
    assert got.shape == (3, q.shape[0], 3)
    # The two forced-fallback points extrapolate far outside the rig
    # (|value| ~ 0.25 here), where XLA:CPU's program-dependent FMA
    # contraction (CLAUDE.md) leaves reassociation noise between the
    # sharded and single-device programs — ~1.3e-5 absolute (~5e-5
    # relative) with the bucketed patch width's extra masked columns
    # widening the contraction; in-rig points agree to ~2e-7.
    np.testing.assert_allclose(got, want, atol=5e-5)
    in_rig = slice(0, 900)
    np.testing.assert_allclose(got[:, in_rig], want[:, in_rig], atol=1e-6)

    # the facade routes mesh= through to the sharded path
    via_seq = np.asarray(seq.displacement_frames(q, mesh=mesh))
    np.testing.assert_allclose(via_seq, got, atol=0)
    a, wa = seq.apply_seq(q, mesh=mesh)
    b, wb = seq.apply_seq(q)
    # same far-point reassociation-noise class as above (abs positions
    # here, so the relative deviation is ~2e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    np.testing.assert_allclose(np.asarray(wa), np.asarray(wb), atol=0)
