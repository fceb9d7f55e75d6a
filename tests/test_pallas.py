"""Pallas fused-eval kernel tests (interpret mode on the CPU test platform).

On real TPU hardware the same kernel is exercised by bench.py and the
verify flow; here interpret=True checks the kernel's *semantics* equal the
dense XLA path bit-for-bit-ish (SURVEY.md section 4 unit strategy).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer, RBFKernel, RBFModelType
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.ops.fit import effective_kernel
from facedeform_tpu.ops.pallas_eval import evaluate_pallas


def _fit(rng, n=40, cfg=None):
    cfg = cfg or DeformConfig()
    rest = fibonacci_points(n)
    deformed = rest + 0.1 * rng.standard_normal((n, 3)).astype(np.float32)
    return Deformer.fit(rest, deformed, cfg, DeformParams(radius=1.2, lam=0.01))


def _run(d, pts, dist2=None, gate=None, radius=1.2, rate=1.0, strict=False):
    v = pts.shape[0]
    dist2 = jnp.zeros(v) if dist2 is None else jnp.asarray(dist2, jnp.float32)
    gate = jnp.ones(v) if gate is None else jnp.asarray(gate, jnp.float32)
    return evaluate_pallas(
        d.model, jnp.asarray(pts), dist2, gate,
        jnp.float32(radius), jnp.float32(rate),
        effective_kernel(d.cfg), d.cfg.term,
        strict_parity=strict, tile_v=128, interpret=True,
    )


@pytest.mark.parametrize(
    "model_type,kernel",
    [
        (RBFModelType.QNN, RBFKernel.GAUSSIAN),
        (RBFModelType.MULTILAYER, RBFKernel.GAUSSIAN),
        (RBFModelType.KERNEL, RBFKernel.THIN_PLATE),
        (RBFModelType.KERNEL, RBFKernel.MULTIQUADRIC),
        (RBFModelType.KERNEL, RBFKernel.INVERSE_MULTIQUADRIC),
        (RBFModelType.KERNEL, RBFKernel.WENDLAND_C2),
    ],
)
def test_pallas_matches_dense(rng, model_type, kernel):
    cfg = DeformConfig(model=model_type, kernel=kernel, layers=2)
    d = _fit(rng, cfg=cfg)
    pts = rng.standard_normal((333, 3)).astype(np.float32)  # non-tile-multiple V
    dist2 = np.abs(rng.standard_normal(333)).astype(np.float32)
    ref_pts, ref_w = d.apply(pts, dist2=dist2, backend="dense")
    got_pts, got_w = _run(d, pts, dist2=dist2)
    # f32 summation error in either path is bounded by ~eps * sum|w| * |phi|
    # (globally-supported kernels like multiquadric can legitimately carry
    # |w| ~ 500 on ill-conditioned configs; both paths wobble together).
    w_mass = float(np.abs(np.asarray(d.model.w_rbf)).sum())
    atol = 2e-5 + 3e-7 * w_mass
    np.testing.assert_allclose(np.asarray(got_pts), np.asarray(ref_pts), atol=atol)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), atol=1e-6)


def test_pallas_gate_freezes(rng):
    d = _fit(rng)
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    gate = np.zeros(200, np.float32)
    gate[:50] = 1.0
    got_pts, got_w = _run(d, pts, gate=gate)
    got_pts = np.asarray(got_pts)
    np.testing.assert_array_equal(got_pts[50:], pts[50:])
    assert np.abs(got_pts[:50] - pts[:50]).max() > 1e-4
    assert (np.asarray(got_w)[50:] == 0).all()


def test_pallas_radius_skip(rng):
    d = _fit(rng)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    dist2 = np.linspace(0, 4.0, 100).astype(np.float32)
    got_pts, got_w = _run(d, pts, dist2=dist2, radius=1.0)
    frozen = dist2 > 1.0
    np.testing.assert_array_equal(np.asarray(got_pts)[frozen], pts[frozen])
    assert (np.asarray(got_w)[frozen] == 0).all()


def test_pallas_strict_parity_amplification(rng):
    """d2 = -1 sentinel passes the skip test and amplifies (quirk 2)."""
    d = _fit(rng)
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    dist2 = np.full(64, -1.0, np.float32)
    _, w_strict = _run(d, pts, dist2=dist2, radius=1.0, rate=2.0, strict=True)
    _, w_fixed = _run(d, pts, dist2=dist2, radius=1.0, rate=2.0, strict=False)
    assert np.allclose(np.asarray(w_strict), 4.0)   # (1 - (-1))^2
    assert np.allclose(np.asarray(w_fixed), 1.0)    # clamped to d2 = 0


def test_deformer_auto_backend_on_cpu_uses_dense(rng):
    """On the CPU test platform, auto must not hit the pallas path."""
    d = _fit(rng)
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    a, _ = d.apply(pts)  # would raise if pallas compiled for cpu
    b, _ = d.apply(pts, backend="dense")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_frames_matches_per_frame_kernel(rng):
    """evaluate_pallas_frames (one pass, phi shared across frames) must
    equal evaluate_pallas run per frame: the frames kernel only reorders
    the contraction loop."""
    import jax

    from facedeform_tpu.ops.fit import RBFModel
    from facedeform_tpu.ops.pallas_eval import evaluate_pallas_frames
    from facedeform_tpu.parallel import batched

    rest = fibonacci_points(40)
    frames = jnp.asarray(np.stack([
        rest + 0.05 * rng.standard_normal((40, 3)).astype(np.float32)
        for _ in range(3)
    ]))
    for cfg in (DeformConfig(),
                DeformConfig(model=RBFModelType.KERNEL,
                             kernel=RBFKernel.THIN_PLATE)):
        model, _ = batched.fit_frames(
            jnp.asarray(rest), frames, cfg, DeformParams()
        )
        pts = rng.standard_normal((300, 3)).astype(np.float32)
        dist2 = np.abs(rng.standard_normal(300)).astype(np.float32)
        gate = np.ones(300, np.float32)
        kern = effective_kernel(cfg)
        tangent = tuple(
            rng.standard_normal((300, 3)).astype(np.float32) for _ in range(3)
        )
        for frm in (None, tangent):
            out_f, w_f = evaluate_pallas_frames(
                model, jnp.asarray(pts), jnp.asarray(dist2), jnp.asarray(gate),
                jnp.float32(1.2), jnp.float32(1.0), kern, cfg.term,
                tile_v=128, interpret=True, frame=frm,
            )
            assert out_f.shape == (3, 300, 3)
            for f in range(3):
                m1 = RBFModel(ctrl=model.ctrl, w_rbf=model.w_rbf[f],
                              w_poly=model.w_poly[f], eps=model.eps)
                want, w1 = evaluate_pallas(
                    m1, jnp.asarray(pts), jnp.asarray(dist2),
                    jnp.asarray(gate),
                    jnp.float32(1.2), jnp.float32(1.0), kern, cfg.term,
                    tile_v=128, interpret=True, frame=frm,
                )
                np.testing.assert_allclose(
                    np.asarray(out_f[f]), np.asarray(want), atol=1e-6
                )
            np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w1))


def test_frames_per_dispatch_bounds():
    """VMEM budget for the frames kernel: the (F, L, N, 3) weight stack is
    kept VMEM-resident, so F must be capped per dispatch."""
    from facedeform_tpu.ops.pallas_eval import frames_per_dispatch

    # QNN defaults: ~96 KB/frame -> well under the 200-frame shot that
    # would otherwise claim ~19 MB of the 16 MB VMEM
    f = frames_per_dispatch(1000, 4)
    assert 1 <= f < 200
    # huge rigs still get at least one frame through
    assert frames_per_dispatch(50_000, 4) >= 1
    # tiny rigs allow many frames per pass
    assert frames_per_dispatch(30, 1) > 100


def test_apply_frames_chunked_matches_single_dispatch(rng):
    """Chunking the frame axis (VMEM cap on long shots) must be
    invisible: f_max=2 over 5 frames == one unchunked pass."""
    from facedeform_tpu.parallel import batched
    from facedeform_tpu.parallel.batched import _eval_frames_pallas_chunked

    rest = fibonacci_points(30)
    frames = jnp.asarray(np.stack([
        rest + 0.05 * rng.standard_normal((30, 3)).astype(np.float32)
        for _ in range(5)
    ]))
    cfg = DeformConfig()
    model, _ = batched.fit_frames(
        jnp.asarray(rest), frames, cfg, DeformParams()
    )
    pts = jnp.asarray(rng.standard_normal((200, 3)).astype(np.float32))
    wloc = jnp.asarray(
        np.abs(rng.standard_normal(200)).astype(np.float32)
    )
    kern = effective_kernel(cfg)
    want = _eval_frames_pallas_chunked(
        model, pts, wloc, None, kern, cfg.term, f_max=5, interpret=True
    )
    got = _eval_frames_pallas_chunked(
        model, pts, wloc, None, kern, cfg.term, f_max=2, interpret=True
    )
    assert got.shape == (5, 200, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-6
    )
