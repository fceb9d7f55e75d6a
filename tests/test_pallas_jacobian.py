"""Fused Pallas Jacobian kernel (ops/pallas_jacobian.py) vs the XLA
assembly (ops/jacobian.py displacement_jacobian) — the kernel must match
to f32 reduction-order noise for every kernel in the zoo, multilayer
stacks, all polynomial tails, frames packing, control-block slabs, and
non-tile-multiple vertex counts.  Reference context: the stale rest-pose
attributes the reference leaves behind (src/SOP_FaceDeform.cpp:438)."""

import numpy as np
import pytest

import jax.numpy as jnp

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.fit import RBFModel
from facedeform_tpu.ops.jacobian import displacement_jacobian
from facedeform_tpu.ops.pallas_jacobian import (
    jac_frames_per_dispatch, jacobian_pallas, jacobian_pallas_frames,
)

# f32 both sides; only the reduction order differs (sublane/MXU vs einsum)
_RTOL = 5e-6


def _model(rng, n, layers=1, seed_scale=0.1):
    ctrl = rng.standard_normal((n, 3)).astype(np.float32)
    w = (rng.standard_normal((layers, n, 3)) * seed_scale).astype(np.float32)
    eps = (0.5 + rng.random((layers, n))).astype(np.float32)
    wp = (rng.standard_normal((4, 3)) * 0.05).astype(np.float32)
    return RBFModel(
        ctrl=jnp.asarray(ctrl), w_rbf=jnp.asarray(w),
        w_poly=jnp.asarray(wp), eps=jnp.asarray(eps),
    )


def _check(got, want):
    scale = max(1.0, float(np.abs(want).max()))
    assert np.abs(np.asarray(got) - np.asarray(want)).max() / scale < _RTOL


@pytest.mark.parametrize("kernel", list(RBFKernel))
def test_jacobian_pallas_kernel_zoo(rng, kernel):
    m = _model(rng, 37, layers=2)
    pts = rng.standard_normal((131, 3)).astype(np.float32)
    want = displacement_jacobian(m, jnp.asarray(pts), kernel, PolyTerm.LINEAR)
    got = jacobian_pallas(
        m, jnp.asarray(pts), kernel, PolyTerm.LINEAR,
        tile_v=128, interpret=True,
    )
    _check(got, want)


@pytest.mark.parametrize("term", list(PolyTerm))
def test_jacobian_pallas_terms(rng, term):
    """Tail handling: LINEAR adds the constant w_poly[1:4].T, CONSTANT and
    ZERO add nothing (jacobian_block's m >= 4 guard)."""
    m = _model(rng, 24)
    if term != PolyTerm.LINEAR:
        rows = {PolyTerm.CONSTANT: 1, PolyTerm.ZERO: 0}[term]
        m = RBFModel(ctrl=m.ctrl, w_rbf=m.w_rbf,
                     w_poly=m.w_poly[:rows], eps=m.eps)
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    want = displacement_jacobian(m, jnp.asarray(pts), RBFKernel.GAUSSIAN, term)
    got = jacobian_pallas(
        m, jnp.asarray(pts), RBFKernel.GAUSSIAN, term,
        tile_v=64, interpret=True,
    )
    _check(got, want)


def test_jacobian_pallas_vertex_on_control(rng):
    """r = 0 pairs (a vertex on a rig marker) must stay finite for the
    sqrt-built kernels — phi' takes the closed-form limit in-kernel."""
    m = _model(rng, 16)
    pts = np.concatenate(
        [np.asarray(m.ctrl[:4]), rng.standard_normal((12, 3)).astype(np.float32)]
    )
    for kernel in (RBFKernel.LINEAR, RBFKernel.CUBIC, RBFKernel.WENDLAND_C2,
                   RBFKernel.THIN_PLATE):
        got = jacobian_pallas(
            m, jnp.asarray(pts), kernel, PolyTerm.LINEAR,
            tile_v=16, interpret=True,
        )
        assert np.isfinite(np.asarray(got)).all()
        _check(got, displacement_jacobian(
            m, jnp.asarray(pts), kernel, PolyTerm.LINEAR))


def test_jacobian_pallas_blocked_controls(rng):
    """N > _CTRL_BLOCK exercises the fori_loop slab path."""
    from facedeform_tpu.ops.pallas_eval import _CTRL_BLOCK

    n = _CTRL_BLOCK + 9
    m = _model(rng, n, seed_scale=0.01)
    pts = rng.standard_normal((40, 3)).astype(np.float32)
    want = displacement_jacobian(
        m, jnp.asarray(pts), RBFKernel.GAUSSIAN, PolyTerm.LINEAR)
    got = jacobian_pallas(
        m, jnp.asarray(pts), RBFKernel.GAUSSIAN, PolyTerm.LINEAR,
        tile_v=8, interpret=True,
    )
    _check(got, want)


def test_jacobian_pallas_frames_matches_per_frame(rng):
    """Frames packing (one MXU dot) == per-frame XLA loop, including the
    per-frame polynomial tails and the frames_chunk static slicing."""
    n, layers, f = 37, 2, 5
    ctrl = rng.standard_normal((n, 3)).astype(np.float32)
    wf = (rng.standard_normal((f, layers, n, 3)) * 0.1).astype(np.float32)
    eps = (0.5 + rng.random((layers, n))).astype(np.float32)
    wpf = (rng.standard_normal((f, 4, 3)) * 0.05).astype(np.float32)
    mf = RBFModel(ctrl=jnp.asarray(ctrl), w_rbf=jnp.asarray(wf),
                  w_poly=jnp.asarray(wpf), eps=jnp.asarray(eps))
    pts = rng.standard_normal((131, 3)).astype(np.float32)
    got = jacobian_pallas_frames(
        mf, jnp.asarray(pts), RBFKernel.THIN_PLATE, PolyTerm.LINEAR,
        tile_v=128, interpret=True, frames_chunk=2,   # forces 3 dispatches
    )
    want = np.stack([
        np.asarray(displacement_jacobian(
            RBFModel(ctrl=jnp.asarray(ctrl), w_rbf=jnp.asarray(wf[i]),
                     w_poly=jnp.asarray(wpf[i]), eps=jnp.asarray(eps)),
            jnp.asarray(pts), RBFKernel.THIN_PLATE, PolyTerm.LINEAR))
        for i in range(f)
    ])
    _check(got, want)


def test_jac_frames_per_dispatch_bounds():
    """VMEM bound: positive, monotone-decreasing in N and L, and small
    enough that a dispatch's F-linear buffers fit the 6 MB budget."""
    assert jac_frames_per_dispatch(1000, 1) >= 1
    assert jac_frames_per_dispatch(1000, 4) <= jac_frames_per_dispatch(1000, 1)
    assert jac_frames_per_dispatch(50000, 1) <= jac_frames_per_dispatch(1000, 1)
    fpd = jac_frames_per_dispatch(1000, 1)
    n_pad = 1000 + ((-1000) % 8)
    assert fpd * (n_pad * 48 + 1024 * 84) <= (6 << 20)


@pytest.mark.parametrize(
    "kernel",
    [RBFKernel.GAUSSIAN, RBFKernel.THIN_PLATE, RBFKernel.MULTIQUADRIC,
     RBFKernel.WENDLAND_C2],
)
def test_jacobian_against_f64_fd_oracle(rng, kernel):
    """ABSOLUTE accuracy: both the XLA and the fused Pallas Jacobians
    against the f64 central-difference oracle (tests/oracle.py) — a
    derivative-free referee that shares no phi'(s) derivation with the
    code under test.  Guards a wrong analytic formula, which the
    pallas-vs-XLA and autodiff-consistency tests cannot see."""
    from tests import oracle

    m = _model(rng, 29, layers=2)
    if kernel == RBFKernel.WENDLAND_C2:
        # the compact kernel needs pairs INSIDE its support to exercise
        # phi' at all: keep queries near the rig and widen the support
        # radii (Wendland has no r=0 kink — phi'(0) = 0 — so near-origin
        # queries are FD-safe, unlike the growing kernels below)
        pts = (rng.standard_normal((57, 3)) * 0.8).astype(np.float32)
        m = m._replace(eps=m.eps * 4.0)
        r = np.linalg.norm(
            pts[:, None, :] - np.asarray(m.ctrl)[None, :, :], axis=-1,
        )
        t = r[None, :, :] / np.asarray(m.eps)[:, None, :]
        assert (t < 1.0).mean() > 0.3, "support coverage regressed"
    else:
        # keep query points off the r=0 FD kink of the non-smooth kernels
        pts = (rng.standard_normal((57, 3)) * 2.0 + 4.0).astype(np.float32)
    want = oracle.jacobian_fd(
        np.asarray(m.ctrl, np.float64), np.asarray(m.w_rbf, np.float64),
        np.asarray(m.w_poly, np.float64), np.asarray(m.eps, np.float64),
        pts, kernel, PolyTerm.LINEAR,
    )
    scale = max(1.0, float(np.abs(want).max()))
    for got in (
        displacement_jacobian(m, jnp.asarray(pts), kernel, PolyTerm.LINEAR),
        jacobian_pallas(m, jnp.asarray(pts), kernel, PolyTerm.LINEAR,
                        tile_v=64, interpret=True),
    ):
        assert np.abs(np.asarray(got) - want).max() / scale < 5e-5


def test_transport_frames_chunked_rules_match_unchunked(rng):
    """The per-chunk rule application (which keeps the (F, V, 3, 3)
    Jacobian stack out of HBM on long shots) must be shape-invisible:
    f_max=2 over 5 frames == one unchunked pass, per output."""
    from facedeform_tpu.ops.jacobian import (
        _applied_gradient, transform_normals,
    )
    from facedeform_tpu.parallel.batched import (
        _transport_frames_pallas_chunked,
    )

    n, f = 24, 5
    ctrl = rng.standard_normal((n, 3)).astype(np.float32)
    wf = (rng.standard_normal((f, 1, n, 3)) * 0.1).astype(np.float32)
    eps = (0.5 + rng.random((1, n))).astype(np.float32)
    wpf = (rng.standard_normal((f, 4, 3)) * 0.05).astype(np.float32)
    mf = RBFModel(ctrl=jnp.asarray(ctrl), w_rbf=jnp.asarray(wf),
                  w_poly=jnp.asarray(wpf), eps=jnp.asarray(eps))
    pts = rng.standard_normal((40, 3)).astype(np.float32)
    nrm = rng.standard_normal((40, 3)).astype(np.float32)
    w = rng.random(40).astype(np.float32)

    def apply_rules(jac):
        return (transform_normals(
            jnp.asarray(nrm), _applied_gradient(jac, jnp.asarray(w))),)

    kw = dict(kernel=RBFKernel.GAUSSIAN, term=PolyTerm.LINEAR,
              interpret=True)
    want = _transport_frames_pallas_chunked(
        mf, jnp.asarray(pts), apply_rules, f_max=5, **kw)
    got = _transport_frames_pallas_chunked(
        mf, jnp.asarray(pts), apply_rules, f_max=2, **kw)
    assert got[0].shape == (f, 40, 3)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-6)


def test_deformer_jacobian_routes_by_backend(rng):
    """Deformer.jacobian must agree with the XLA path on this (CPU)
    backend — and the pallas route is the same function the TPU backend
    takes, parity-tested above."""
    from facedeform_tpu import DeformConfig, DeformParams, Deformer
    from facedeform_tpu.config import RBFModelType
    from facedeform_tpu.geometry.primitives import fibonacci_points

    rest = fibonacci_points(40)
    posed = (rest * 1.1).astype(np.float32)
    d = Deformer.fit(rest, posed, DeformConfig(model=RBFModelType.QNN),
                     DeformParams(lam=0.01))
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    from facedeform_tpu.ops import fit as fit_mod

    kernel = fit_mod.effective_kernel(d.cfg)
    _check(
        d.jacobian(pts),
        displacement_jacobian(d.model, jnp.asarray(pts), kernel, d.cfg.term),
    )
