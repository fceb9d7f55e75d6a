"""Partition-of-unity RBF: patch invariants, exactness, parity, fallback."""

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer, RBFModelType
from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops import pu


def _smooth_rig(n, rng=None):
    rest = fibonacci_points(n)
    disp = (
        0.1
        * np.exp(-3 * np.sum((rest - [0, 1, 0]) ** 2, -1, keepdims=True))
        .astype(np.float32)
        * np.float32([0, 1, 0])
    )
    return rest, disp


def test_kd_cells_compact_and_complete(rng):
    pts = rng.standard_normal((1000, 3)).astype(np.float32)
    cells = pu._kd_cells(pts, 64)
    all_idx = np.sort(np.concatenate(cells))
    np.testing.assert_array_equal(all_idx, np.arange(1000))
    assert max(len(c) for c in cells) <= 64
    # compactness: every cell's bounding radius well under the cloud's
    cloud_r = np.linalg.norm(pts - pts.mean(0), axis=1).max()
    for c in cells:
        center = pts[c].mean(0)
        assert np.linalg.norm(pts[c] - center, axis=1).max() < 0.75 * cloud_r


def test_build_patches_invariants():
    rest, _ = _smooth_rig(2000)
    patches = pu.build_patches(rest, patch_size=64, overlap=1.6)
    k_, p_ = patches.idx.shape
    assert p_ < 2000  # patches are genuinely local (no global swallow)
    # exactness invariant: patch control set == ALL controls within R_k
    from scipy.spatial import cKDTree

    tree = cKDTree(rest)
    for k in range(0, k_, 7):
        ball = set(tree.query_ball_point(patches.centers[k], patches.radii[k]))
        stored = set(patches.idx[k][: patches.counts[k]].tolist())
        assert stored == ball
    # coverage: every control strictly inside at least one support
    d = np.linalg.norm(
        rest[None, :, :] - patches.centers[:, None, :], axis=-1
    )  # (K, N)
    assert (d < patches.radii[:, None] - 1e-7).any(axis=0).all()


def test_build_patches_width_bucket(rng):
    """Padded patch width is bucketed (default multiple of 64) so rigs
    with nearby natural widths share one compiled fit/eval program; the
    extra masked columns must not change the solution."""
    rest, disp = _smooth_rig(900)
    bucketed = pu.build_patches(rest, patch_size=64, overlap=1.6)
    assert bucketed.idx.shape[1] % 64 == 0
    exact = pu.build_patches(rest, patch_size=64, overlap=1.6, width_bucket=1)
    assert exact.idx.shape[1] == int(exact.counts.max())
    assert bucketed.idx.shape[1] >= exact.idx.shape[1]
    np.testing.assert_array_equal(bucketed.counts, exact.counts)
    # live columns identical; the extra tail is all -1 padding
    p_live = exact.idx.shape[1]
    np.testing.assert_array_equal(bucketed.idx[:, :p_live], exact.idx)
    assert (bucketed.idx[:, p_live:] == -1).all()
    # solution parity: pads are masked to identity rows in the patch
    # systems, so the fitted field matches to solver-noise level
    q = (fibonacci_points(300) * 1.01).astype(np.float32)
    got = {}
    for name, patches in (("bucketed", bucketed), ("exact", exact)):
        model, _ = pu.fit_pu(
            rest, rest + disp, RBFKernel.THIN_PLATE, PolyTerm.LINEAR,
            patches=patches, lam=1e-5,
        )
        got[name] = np.asarray(pu.PUDeformer(
            model, patches, RBFKernel.THIN_PLATE, PolyTerm.LINEAR
        ).displacement(q))
    np.testing.assert_allclose(got["bucketed"], got["exact"], atol=2e-6)
    # single-patch small rigs bucket too (small rigs of different sizes
    # then share the one-patch program shape)
    small = pu.build_patches(rest[:50], patch_size=192)
    assert small.idx.shape == (1, 64)
    assert (small.idx[0, 50:] == -1).all()


def test_pu_exact_interpolation_and_global_parity(rng):
    """Interpolation error at controls within the repo's 5e-5 budget, and
    agreement with the global dense-df fit on a smooth field."""
    rest, disp = _smooth_rig(2000)
    # lam smooths: the residual at controls is ~lam*|w| (same as the
    # global fit) — use a tiny lam so the assert tests the method, not
    # the regularizer.
    d = pu.PUDeformer.fit(
        rest, rest + disp, kernel=RBFKernel.THIN_PLATE,
        eps="auto", lam=1e-5, patch_size=64,
    )
    assert float(d.report.backward_error()) < 1e-9
    got = np.asarray(d.displacement(rest))
    assert np.abs(got - disp).max() < 5e-5
    q = (fibonacci_points(1000) * 1.01).astype(np.float32)
    pu_q = np.asarray(d.displacement(q))
    g = Deformer.fit(
        rest, rest + disp,
        DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.THIN_PLATE,
                     solver="direct"),
        DeformParams(radius=1.0, lam=0.01),  # min clamp is 0.01
    )
    g_q = np.asarray(g.displacement(q))
    # different methods AND different lam (global clamps at 0.01):
    # agreement on a smooth field is approximate
    assert np.abs(pu_q - g_q).max() < 2e-2 * max(np.abs(g_q).max(), 1e-6) + 5e-5


def test_pu_far_points_fallback_finite():
    rest, disp = _smooth_rig(600)
    d = pu.PUDeformer.fit(rest, rest + disp, patch_size=64)
    far = np.float32([[6, 6, 6], [0, 0, -9], [100, 0, 0]])
    out = np.asarray(d.displacement(far))
    assert np.isfinite(out).all()


def test_pu_small_rig_single_patch():
    rest, disp = _smooth_rig(50)
    d = pu.PUDeformer.fit(rest, rest + disp, patch_size=192, lam=1e-6)
    assert d.patches.idx.shape[0] == 1
    got = np.asarray(d.displacement(rest))
    assert np.abs(got - disp).max() < 5e-5


@pytest.mark.parametrize("kernel", [RBFKernel.GAUSSIAN, RBFKernel.MULTIQUADRIC])
def test_pu_other_kernels(kernel):
    rest, disp = _smooth_rig(800)
    d = pu.PUDeformer.fit(
        rest, rest + disp, kernel=kernel, eps="auto", lam=1e-5, patch_size=64
    )
    got = np.asarray(d.displacement(rest))
    assert np.abs(got - disp).max() < 5e-5


def test_pu_plan_cache_not_fooled_by_prefix(rng):
    """Two query sets sharing length and leading points must not share an
    eval plan (the old prefix-keyed cache returned zeros for the moved
    tail points)."""
    rest, disp = _smooth_rig(600)
    d = pu.PUDeformer.fit(rest, rest + disp, patch_size=64, lam=1e-5)
    q1 = (fibonacci_points(200) * 1.01).astype(np.float32)
    q2 = q1.copy()
    q2[100:] += np.float32([5, 5, 5])          # same prefix, moved tail
    out1 = np.asarray(d.displacement(q1))
    out2 = np.asarray(d.displacement(q2))
    fresh = pu.PUDeformer.fit(rest, rest + disp, patch_size=64, lam=1e-5)
    ref2 = np.asarray(fresh.displacement(q2))
    np.testing.assert_allclose(out2, ref2, atol=1e-6)
    assert np.abs(out1[:100] - out2[:100]).max() < 1e-6  # prefix agrees


def test_pu_single_patch_many_far_points():
    """K == 1 with several uncovered points exercised the (n, k) reshape
    bug in the nearest-patch fallback query."""
    rest, disp = _smooth_rig(40)
    d = pu.PUDeformer.fit(rest, rest + disp, patch_size=192, lam=1e-6)
    assert d.patches.idx.shape[0] == 1
    far = np.float32([[4, 4, 4], [0, 0, -7], [9, 0, 0], [0, 9, 0]])
    out = np.asarray(d.displacement(far))
    assert np.isfinite(out).all()


def test_pu_no_seam_at_coverage_boundary():
    """Displacement must be continuous across the support boundary: the
    blend-weight underflow shell used to collapse to ~0 between two
    correctly-deformed regions."""
    rest, disp = _smooth_rig(60)
    d = pu.PUDeformer.fit(rest, rest + disp, patch_size=192, lam=1e-6)
    c = np.asarray(d.model.centers[0])
    R = float(d.model.radii[0])
    ray = np.float32([0, 1, 0])
    qs = np.stack([
        c + ray * R * (1.0 - 1e-3),
        c + ray * R * (1.0 - 1e-7),   # underflow shell
        c + ray * R * (1.0 + 1e-3),
    ]).astype(np.float32)
    out = np.asarray(d.displacement(qs))
    # all three nearly equal (same local interpolant, continuous blend)
    assert np.abs(out[1] - out[0]).max() < 1e-4
    assert np.abs(out[2] - out[1]).max() < 1e-4


def test_pu_f32_matches_df_with_auto_eps():
    """eps='auto' keeps local bases well-conditioned enough that the fast
    f32 tile eval matches the df tiles (the adaptive `precise` default)."""
    rest, disp = _smooth_rig(1200)
    d = pu.PUDeformer.fit(rest, rest + disp, kernel=RBFKernel.THIN_PLATE,
                          patch_size=64, lam=1e-5)
    assert d.auto_eps
    q = (fibonacci_points(500) * 1.01).astype(np.float32)
    fast = np.asarray(d.displacement(q, precise=False))
    slow = np.asarray(d.displacement(q, precise=True))
    np.testing.assert_allclose(fast, slow, atol=5e-6)


def test_pu_pallas_matches_xla(rng):
    """The fused Mosaic tile kernel (interpret mode on CPU) reproduces the
    XLA f32 composition."""
    rest, disp = _smooth_rig(900)
    d = pu.PUDeformer.fit(rest, rest + disp, kernel=RBFKernel.THIN_PLATE,
                          patch_size=64, lam=1e-5)
    q = np.concatenate([
        (fibonacci_points(400) * 1.01).astype(np.float32),
        np.float32([[5, 5, 5], [0, 0, -8]]),      # forced-fallback items too
    ])
    ref = np.asarray(d.displacement(q, precise=False, backend="xla"))
    got = np.asarray(d.displacement(q, backend="pallas"))
    # the XLA branch computes d2 by the expansion identity, the kernel by
    # exact diffs — equal to f32 roundoff on centered coords
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pu_plan_type_selects_path(rng):
    """Plan TYPE drives dispatch: PUTilePlan -> Mosaic kernel (f32 only,
    errors on precise), PUEvalPlan -> XLA; device arrays upload once."""
    import pytest as _pytest

    from facedeform_tpu.ops.pallas_pu import plan_eval_tiles

    rest, disp = _smooth_rig(600)
    d = pu.PUDeformer.fit(rest, rest + disp, patch_size=64, lam=1e-5)
    q = (fibonacci_points(300) * 1.01).astype(np.float32)
    tplan = plan_eval_tiles(d.patches, q)
    eplan = pu.plan_eval(d.patches, q)
    out_t = np.asarray(d.displacement(q, plan=tplan))
    out_x = np.asarray(d.displacement(q, plan=eplan, precise=False))
    np.testing.assert_allclose(out_t, out_x, atol=1e-5)
    assert tplan.device_arrays() is tplan.device_arrays()  # uploaded once
    with _pytest.raises(ValueError, match="precise"):
        d.displacement(q, plan=tplan, precise=True)
    with _pytest.raises(ValueError, match="xla"):
        d.displacement(q, plan=tplan, backend="xla")
    with _pytest.raises(ValueError, match="stale plan|points"):
        from facedeform_tpu.ops.pallas_pu import evaluate_pu_tiles

        d.displacement(q[:100], plan=tplan)


def test_node_cook_with_pu_solver(rng):
    """cfg.solver='pu' routes the node's solve/eval through the PU adapter
    with full node semantics (capture falloff, groups, caching)."""
    from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode, Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(30, 30)
    rig = Mesh(points=fibonacci_points(80))
    drig = Mesh(points=rig.points * 1.06)
    cfg = DeformConfig(solver="pu")
    node = FaceDeformNode()
    res = node.cook([mesh, rig, drig], cfg, DeformParams())
    ref = FaceDeformNode().cook([mesh, rig, drig], DeformConfig(solver="direct"),
                                DeformParams())
    # PU and the global QNN model are different interpolants of the same
    # data; on a smooth scaling field they agree closely
    err = np.abs(res.mesh.points - ref.mesh.points).max()
    scale = np.abs(ref.mesh.points - mesh.points).max()
    assert err < 0.15 * scale + 1e-4, (err, scale)
    assert "fd_falloff" in res.mesh.point_attrs
    # cook cache: same inputs -> no re-fit
    d_before = node._deformer
    node.cook([mesh, rig, drig], cfg, DeformParams())
    assert node._deformer is d_before
    # group gating pins excluded points exactly
    mesh.set_group("top", mesh.points[:, 1] > 0)
    res_g = node.cook([mesh, rig, drig], cfg, DeformParams(), group="top")
    pinned = ~mesh.group_mask("top")
    np.testing.assert_array_equal(res_g.mesh.points[pinned], mesh.points[pinned])


def test_cli_pu_solver(tmp_path):
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(10, 10)
    rig_pts = fibonacci_points(20)
    mesh_p = str(tmp_path / "m.geo"); save_geo(mesh_p, mesh)
    rig_p = str(tmp_path / "r.geo"); save_geo(rig_p, Mesh(points=rig_pts))
    drig_p = str(tmp_path / "d.geo"); save_geo(drig_p, Mesh(points=rig_pts * 1.07))
    out_p = str(tmp_path / "o.geo")
    ck = str(tmp_path / "d.npz")
    rc = main(["deform", mesh_p, rig_p, drig_p, "-o", out_p,
               "--solver", "pu", "--save-deformer", ck])
    assert rc == 0
    out = load_geo(out_p)
    assert np.abs(out.points - mesh.points).max() > 1e-3
    # PU checkpoint round-trips and reproduces the displacement field
    from facedeform_tpu.utils import checkpoint

    pud = checkpoint.load_pu(ck)
    q = mesh.points[:200]
    got = np.asarray(pud.displacement(q))
    assert np.isfinite(got).all() and np.abs(got).max() > 1e-4

    # resume the PU solve through the node: identical output, no refit
    out2_p = str(tmp_path / "o2.geo")
    rc = main(["deform", mesh_p, rig_p, drig_p, "-o", out2_p,
               "--load-deformer", ck])
    assert rc == 0
    np.testing.assert_array_equal(load_geo(out2_p).points, out.points)


def test_deformer_fit_rejects_pu_solver():
    import pytest as _pytest

    from facedeform_tpu import DeformConfig, DeformParams, Deformer

    rest = fibonacci_points(30)
    with _pytest.raises(ValueError, match="solver='pu'"):
        Deformer.fit(rest, rest * 1.02, DeformConfig(solver="pu"),
                     DeformParams())


def test_node_pu_qnn_interpolates_exactly(rng):
    """QNN semantics are exact interpolation: the PU route must not smooth
    with the default lam=0.1 (mirrors ops/fit.py's lam0=0 for QNN)."""
    from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode, Mesh

    rig_pts = fibonacci_points(300)
    disp = (
        0.1 * np.exp(-3 * np.sum((rig_pts - [0, 1, 0]) ** 2, -1, keepdims=True))
        .astype(np.float32) * np.float32([0, 1, 0])
    )
    # evaluate AT the rig points: exact interpolation must reproduce disp
    mesh = Mesh(points=rig_pts)
    node = FaceDeformNode()
    res = node.cook([mesh, Mesh(points=rig_pts),
                     Mesh(points=rig_pts + disp)],
                    DeformConfig(solver="pu"), DeformParams())
    err = np.abs(res.mesh.points - (rig_pts + disp)).max()
    assert err < 5e-5, err


def test_fit_pu_frames_matches_per_frame(rng):
    """fit_pu_frames shares one patch factorization across F frames (the
    RHS is the only frame-dependent input): each frame's model must match
    an independent fit_pu of that frame, and the shared-plan sequence
    eval must match per-frame displacement."""
    rest = fibonacci_points(400)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((400, 3)).astype(np.float32)
        for _ in range(3)
    ])
    patches = pu.build_patches(rest, patch_size=64)
    models, report = pu.fit_pu_frames(
        rest, frames, RBFKernel.THIN_PLATE, PolyTerm.LINEAR,
        patches=patches, lam=0.0,
    )
    assert len(models) == 3
    assert float(report.backward_error()) < 1e-5
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    for f in range(3):
        want_model, _ = pu.fit_pu(
            rest, frames[f], RBFKernel.THIN_PLATE, PolyTerm.LINEAR,
            patches=patches, lam=0.0,
        )
        d_seq = pu.PUDeformer(
            models[f], patches, RBFKernel.THIN_PLATE, PolyTerm.LINEAR
        ).displacement(pts)
        d_ref = pu.PUDeformer(
            want_model, patches, RBFKernel.THIN_PLATE, PolyTerm.LINEAR
        ).displacement(pts)
        np.testing.assert_allclose(
            np.asarray(d_seq), np.asarray(d_ref), atol=1e-6
        )


def test_pu_seq_deformer_apply(rng):
    """PUSeqDeformer: one fit, one shared plan, (F, V, 3) out; exact
    interpolation at the controls per frame (lam=0)."""
    rest = fibonacci_points(300)
    frames = np.stack([
        rest + 0.04 * rng.standard_normal((300, 3)).astype(np.float32)
        for _ in range(2)
    ])
    seq = pu.PUSeqDeformer.fit(rest, frames, lam=0.0)
    out, falloff = seq.apply_seq(rest)
    assert np.asarray(out).shape == (2, 300, 3)
    for f in range(2):
        np.testing.assert_allclose(
            np.asarray(out[f]), frames[f], atol=5e-5
        )
    # the plan lands in the shared LRU (one entry) and repeat calls on
    # the same buffer hit it — the host KD build is paid once per shot
    assert len(seq.puds[0]._plan_cache) == 1
    cached = next(iter(seq.puds[0]._plan_cache.values()))
    out2, _ = seq.apply_seq(rest)
    assert next(iter(seq.puds[0]._plan_cache.values())) is cached
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)
    # and the cache is shared across every frame's pud (wired in __init__)
    assert seq.puds[1]._plan_cache is seq.puds[0]._plan_cache


def test_pu_frames_kernel_matches_per_frame_tiles(rng):
    """evaluate_pu_tiles_frames (one Mosaic pass, 3F weight columns) must
    reproduce F independent evaluate_pu_tiles runs on the same plan —
    phi/partition weights are shared across columns, so agreement is
    f32-exact, and chunking the frame axis must not change results."""
    import jax.numpy as jnp

    from facedeform_tpu.ops import pallas_pu

    rest, disp = _smooth_rig(600)
    frames = np.stack([
        rest + disp * s for s in (1.0, -0.5, 0.25)
    ])
    patches = pu.build_patches(rest, patch_size=64)
    models, _ = pu.fit_pu_frames(
        rest, frames, RBFKernel.THIN_PLATE, pu.PolyTerm.LINEAR,
        patches=patches, lam=1e-5,
    )
    q = np.concatenate([
        (fibonacci_points(300) * 1.01).astype(np.float32),
        np.float32([[5, 5, 5], [0, 0, -8]]),      # forced-fallback items
    ])
    tplan = pallas_pu.plan_eval_tiles(patches, q)
    got = np.asarray(pallas_pu.evaluate_pu_tiles_frames(
        tuple(models), jnp.asarray(q), *tplan.device_arrays(),
        RBFKernel.THIN_PLATE, pu.PolyTerm.LINEAR,
        tplan.num_points, tplan.tile_v, interpret=True,
    ))
    assert got.shape == (3, q.shape[0], 3)
    for f in range(3):
        want = np.asarray(pallas_pu.evaluate_pu_tiles(
            models[f], jnp.asarray(q), *tplan.device_arrays(),
            RBFKernel.THIN_PLATE, pu.PolyTerm.LINEAR,
            tplan.num_points, tplan.tile_v, interpret=True,
        ))
        np.testing.assert_allclose(got[f], want, atol=1e-6,
                                   err_msg=f"frame {f}")

    # frame-axis chunking is a static slice of the same math
    old = pallas_pu.frames_per_dispatch
    try:
        pallas_pu.frames_per_dispatch = 2
        chunked = np.asarray(pallas_pu.evaluate_pu_tiles_frames(
            tuple(models), jnp.asarray(q), *tplan.device_arrays(),
            RBFKernel.THIN_PLATE, pu.PolyTerm.LINEAR,
            tplan.num_points, tplan.tile_v, interpret=True,
        ))
    finally:
        pallas_pu.frames_per_dispatch = old
    np.testing.assert_allclose(chunked, got, atol=0)


def test_cli_deform_seq_batch_pu_save_sequence(tmp_path):
    """--batch --solver pu + --save-deformer writes a pu_seq checkpoint
    covering every frame (fit_pu_frames over all F rigs)."""
    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.utils import checkpoint

    mesh_p = str(tmp_path / "m.geo")
    rig_p = str(tmp_path / "r.geo")
    save_geo(mesh_p, uv_sphere(8, 8))
    rig = fibonacci_points(24)
    save_geo(rig_p, Mesh(points=rig))
    posed = []
    for f, s in enumerate((1.04, 1.08, 0.96)):
        p = str(tmp_path / f"p{f}.geo")
        save_geo(p, Mesh(points=rig * s))
        posed.append(p)
    ckpt = str(tmp_path / "shot_pu.npz")
    rc = main(["deform-seq", mesh_p, rig_p] + posed + [
        "-o", str(tmp_path / "out"), "--batch", "--solver", "pu",
        "--save-deformer", ckpt])
    assert rc == 0
    assert checkpoint.kind(ckpt) == "pu_seq"
    seq = checkpoint.load_pu_seq(ckpt)
    assert seq.num_frames == 3
    q = (fibonacci_points(100) * 1.01).astype(np.float32)
    out = np.asarray(seq.displacement_frames(q))
    assert out.shape == (3, 100, 3) and np.isfinite(out).all()


def test_pu_node_backend_forcing(rng):
    """PUNodeDeformer.apply(backend=) must honor 'xla'/'pallas' (it was
    silently ignored; round-5 review): both forced paths agree with auto
    at the auto-eps f32 accuracy level."""
    from facedeform_tpu import DeformConfig, DeformParams
    from facedeform_tpu.config import PolyTerm
    from facedeform_tpu.ops.pu import PUNodeDeformer

    rest = fibonacci_points(300)
    deformed = rest + 0.05 * rng.standard_normal((300, 3)).astype(np.float32)
    cfg = DeformConfig(solver="pu", term=PolyTerm.LINEAR)
    d = PUNodeDeformer.fit(rest, deformed, cfg, DeformParams(lam=0.01))
    q = fibonacci_points(500) * 0.9
    outs = {}
    for b in ("auto", "xla", "pallas"):
        pts, w = d.apply(q, backend=b, plan_key=("t", b))
        outs[b] = np.asarray(pts)
    # plumbing check: each forced backend runs its intended path; the
    # paths differ in summation order (interpret-mode Mosaic vs XLA
    # composition), so the bar is agreement at f32 field accuracy
    np.testing.assert_allclose(outs["xla"], outs["auto"], atol=5e-5)
    np.testing.assert_allclose(outs["pallas"], outs["auto"], atol=2e-3)
    # forcing pallas on a forced-global-eps (df) fit raises clearly
    d2 = PUNodeDeformer.fit(rest, deformed, cfg,
                            DeformParams(lam=0.01, radius=1.0))
    import pytest as _pytest

    from facedeform_tpu.ops import pu as pu_mod

    pud_df = pu_mod.PUDeformer.fit(rest, deformed, eps=2.0, lam=0.01)
    with _pytest.raises(ValueError, match="pallas"):
        pud_df.make_plan(np.asarray(q, np.float32), backend="pallas")
