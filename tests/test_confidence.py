"""Per-marker confidence weighting (weighted ridge, beyond the reference).

lam_i = lam / c_i (ops/fit._family_radii): a c=1 marker keeps the user
ridge, a low-c marker is smoothed over instead of interpolated.  The
reference interpolates every marker with equal trust
(src/SOP_FaceDeform.cpp:268-287) — tracker glitches deform the face.
"""

from __future__ import annotations

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer
from facedeform_tpu.config import RBFKernel, RBFModelType


@pytest.fixture
def outlier_rig(rng):
    rest = rng.normal(size=(50, 3)).astype(np.float32)
    true_disp = 0.1 * np.sin(rest * 3).astype(np.float32)
    clean = rest + true_disp
    bad = clean.copy()
    bad[7] += np.float32([0.5, -0.4, 0.3])  # tracker glitch
    conf = np.ones(50, np.float32)
    conf[7] = 0.001
    return rest, clean, bad, conf


KCFG = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)
KP = DeformParams(radius=1.0, lam=0.01)


def test_low_confidence_marker_is_smoothed_over(rng, outlier_rig):
    rest, clean, bad, conf = outlier_rig
    d_plain = Deformer.fit(rest, bad, KCFG, KP)
    d_conf = Deformer.fit(rest, bad, KCFG, KP, confidence=conf)
    d_clean = Deformer.fit(rest, clean, KCFG, KP)
    q = rng.normal(size=(300, 3)).astype(np.float32)
    f_plain = np.asarray(d_plain.apply(q)[0]) - q
    f_conf = np.asarray(d_conf.apply(q)[0]) - q
    f_clean = np.asarray(d_clean.apply(q)[0]) - q
    # the weighted fit recovers most of the damage the outlier did
    assert (np.abs(f_conf - f_clean).max()
            < 0.3 * np.abs(f_plain - f_clean).max())


def test_unit_confidence_is_exactly_unweighted(outlier_rig):
    rest, _, bad, _ = outlier_rig
    d_plain = Deformer.fit(rest, bad, KCFG, KP)
    d_ones = Deformer.fit(rest, bad, KCFG, KP,
                          confidence=np.ones(50, np.float32))
    np.testing.assert_array_equal(
        np.asarray(d_ones.model.w_rbf), np.asarray(d_plain.model.w_rbf)
    )


def test_qnn_confidence_raises(outlier_rig):
    rest, _, bad, conf = outlier_rig
    with pytest.raises(ValueError, match="ridge family"):
        Deformer.fit(rest, bad, DeformConfig(), DeformParams(),
                     confidence=conf)


def test_confidence_shape_mismatch(outlier_rig):
    from facedeform_tpu.utils import errors

    rest, _, bad, _ = outlier_rig
    with pytest.raises(errors.ShapeMismatchError):
        Deformer.fit(rest, bad, KCFG, KP,
                     confidence=np.ones(7, np.float32))


@pytest.mark.parametrize("kernel", [RBFKernel.GAUSSIAN, RBFKernel.THIN_PLATE])
def test_krylov_path_matches_dense(rng, kernel):
    """The Krylov matvec + both block-Jacobi preconditioners must apply
    the same per-marker diag(lam) the dense assembly does."""
    rest = rng.normal(size=(300, 3)).astype(np.float32)
    dfm = rest + 0.1 * np.sin(rest * 3).astype(np.float32)
    dfm[7] += np.float32([0.5, -0.4, 0.3])
    conf = np.ones(300, np.float32)
    conf[7] = 0.001
    conf[100:120] = 0.2
    p = DeformParams(radius=1.0, lam=0.01)
    cfg_d = DeformConfig(model=RBFModelType.KERNEL, kernel=kernel,
                         solver="direct")
    cfg_k = DeformConfig(model=RBFModelType.KERNEL, kernel=kernel,
                         solver="krylov")
    dd = Deformer.fit(rest, dfm, cfg_d, p, confidence=conf)
    dk = Deformer.fit(rest, dfm, cfg_k, p, confidence=conf, check=False)
    q = rng.normal(size=(200, 3)).astype(np.float32)
    fd = np.asarray(dd.apply(q)[0]) - q
    fk = np.asarray(dk.apply(q)[0]) - q
    assert np.abs(fd - fk).max() < 2e-3


def test_frames_fit_threads_confidence(rng, outlier_rig):
    """Both fit_frames routes (vmapped and shared-factorization) apply the
    weighted ridge; frame slices match the single-pose weighted fit."""
    import jax.numpy as jnp

    from facedeform_tpu.ops import fit as fit_mod
    from facedeform_tpu.parallel import batched

    rest, clean, bad, conf = outlier_rig
    frames = np.stack([bad, clean])
    single = Deformer.fit(rest, bad, KCFG, KP, confidence=conf)
    mv, _ = batched.fit_frames(
        jnp.asarray(rest), jnp.asarray(frames), KCFG, KP,
        confidence=jnp.asarray(conf),
    )
    np.testing.assert_allclose(
        np.asarray(mv.w_rbf[0]), np.asarray(single.model.w_rbf), atol=1e-6
    )
    ms, _, _ = fit_mod.fit_frames_dense(
        jnp.asarray(rest), jnp.asarray(frames), KCFG, KP,
        confidence=jnp.asarray(conf),
    )
    np.testing.assert_allclose(
        np.asarray(ms.w_rbf[0]), np.asarray(single.model.w_rbf), atol=1e-5
    )


def test_node_consumes_confidence_attr(rng, outlier_rig):
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    rest, clean, bad, conf = outlier_rig
    face = uv_sphere(24, 24)
    rest_rig = Mesh(points=rest)
    rest_rig.set_attr("confidence", conf)
    node = FaceDeformNode()
    res = node.cook([face, rest_rig, Mesh(points=bad)], KCFG,
                    DeformParams(radius=2.0, lam=0.01, maxedges=50))
    want = Deformer.fit(rest, bad, KCFG,
                        DeformParams(radius=2.0, lam=0.01, maxedges=50),
                        confidence=conf)
    got_disp = np.asarray(res.mesh.points) - face.points
    ref_disp = np.asarray(want.apply(face.points)[0]) - face.points
    # falloff gates the cook output; compare where fully inside
    gate = np.asarray(res.mesh.attr("fd_falloff"))
    inside = gate > 0.999
    assert inside.any()
    np.testing.assert_allclose(
        got_disp[inside], ref_disp[inside], atol=1e-5
    )
    # editing the attr must bump the attr id and re-solve
    k1 = node._fit_key
    conf2 = conf.copy()
    conf2[3] = 0.01
    rest_rig.set_attr("confidence", conf2)
    node.cook([face, rest_rig, Mesh(points=bad)], KCFG,
              DeformParams(radius=2.0, lam=0.01, maxedges=50))
    assert node._fit_key != k1


def test_node_warns_qnn(rng, outlier_rig):
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode

    rest, _, bad, conf = outlier_rig
    face = uv_sphere(16, 16)
    rest_rig = Mesh(points=rest)
    rest_rig.set_attr("confidence", conf)
    res = FaceDeformNode().cook(
        [face, rest_rig, Mesh(points=bad)], DeformConfig(), DeformParams()
    )
    assert any("confidence" in w and "ridge family" in w
               for w in res.warnings)


def test_pu_confidence_smooths_outlier(rng):
    """The PU route applies the weighted ridge inside every patch the
    glitched marker appears in."""
    from facedeform_tpu.config import PolyTerm
    from facedeform_tpu.ops.pu import PUDeformer

    rest = rng.normal(size=(400, 3)).astype(np.float32)
    clean = rest + 0.1 * np.sin(rest * 3).astype(np.float32)
    bad = clean.copy()
    bad[11] += np.float32([0.5, -0.4, 0.3])
    conf = np.ones(400, np.float32)
    conf[11] = 0.001
    kw = dict(kernel=RBFKernel.THIN_PLATE, term=PolyTerm.LINEAR,
              lam=0.01, patch_size=96)
    d_plain = PUDeformer.fit(rest, bad, **kw)
    d_conf = PUDeformer.fit(rest, bad, confidence=conf, **kw)
    d_clean = PUDeformer.fit(rest, clean, **kw)
    q = rng.normal(size=(300, 3)).astype(np.float32)
    f_plain = np.asarray(d_plain.displacement(q))
    f_conf = np.asarray(d_conf.displacement(q))
    f_clean = np.asarray(d_clean.displacement(q))
    assert (np.abs(f_conf - f_clean).max()
            < 0.3 * np.abs(f_plain - f_clean).max())
    # unit confidence == unweighted (same lam in every patch)
    d_ones = PUDeformer.fit(rest, bad, confidence=np.ones(400, np.float32),
                            **kw)
    np.testing.assert_allclose(
        np.asarray(d_ones.model.w_hi), np.asarray(d_plain.model.w_hi),
        atol=1e-7,
    )


def test_node_pu_confidence(rng, outlier_rig):
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.ops.pu import PUDeformer, node_fit_kwargs

    rest, _, bad, conf = outlier_rig
    face = uv_sphere(16, 16)
    rest_rig = Mesh(points=rest)
    rest_rig.set_attr("confidence", conf)
    cfg = DeformConfig(model=RBFModelType.KERNEL, solver="pu")
    p = DeformParams(radius=2.0, lam=0.01, maxedges=50)
    res = FaceDeformNode().cook([face, rest_rig, Mesh(points=bad)], cfg, p)
    assert not any("confidence" in w for w in res.warnings)
    want = PUDeformer.fit(rest, bad, **node_fit_kwargs(cfg, p),
                          confidence=conf)
    gate = np.asarray(res.mesh.attr("fd_falloff"))
    inside = gate > 0.999
    got = (np.asarray(res.mesh.points) - face.points)[inside]
    ref = np.asarray(want.displacement(face.points))[inside]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_serve_fit_confidence(rng, outlier_rig):
    from facedeform_tpu import serve as serve_mod

    rest, _, bad, conf = outlier_rig
    srv = serve_mod.DeformServer()
    r = srv.handle({
        "cmd": "fit", "rest_ctrl": rest, "deformed_ctrl": bad,
        "confidence": conf,
        "cfg": {"model": int(RBFModelType.KERNEL)},
        "params": {"radius": 1.0, "lam": 0.01},
    }, raw=True)
    assert r["ok"]
    q = rng.normal(size=(50, 3)).astype(np.float32)
    out = srv.handle({"cmd": "apply", "deformer": r["deformer"],
                      "points": q}, raw=True)
    want = Deformer.fit(rest, bad, KCFG, KP, confidence=conf)
    np.testing.assert_allclose(
        out["points"], np.asarray(want.apply(q)[0]), atol=1e-5
    )
    # PU + confidence serves too (weighted ridge per patch)
    r_pu = srv.handle({
        "cmd": "fit", "rest_ctrl": rest, "deformed_ctrl": bad,
        "confidence": conf,
        "cfg": {"solver": "pu", "model": int(RBFModelType.KERNEL)},
        "params": {"radius": 1.0, "lam": 0.01},
    }, raw=True)
    assert r_pu["ok"]
