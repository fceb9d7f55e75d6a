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
