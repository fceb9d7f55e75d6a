"""DBSE tests: least-squares weight recovery, parity path, morph pass (component F)."""

import numpy as np
import jax.numpy as jnp

from facedeform_tpu.ops import dbse


def _synthetic(rng, v=200, s=5):
    rest = rng.standard_normal((v, 3)).astype(np.float32)
    shapes = [rest + 0.1 * rng.standard_normal((v, 3)).astype(np.float32) for _ in range(s)]
    return rest, shapes


def test_lstsq_recovers_known_weights(rng):
    """Compose a pose from known weights -> lstsq must recover them
    (SURVEY.md section 4: 'DBSE recovers known weights on synthetic blends')."""
    rest, shapes = _synthetic(rng)
    model = dbse.build_model(rest, shapes)
    w_true = np.float32([0.3, -0.2, 0.7, 0.05, -0.5])
    pose = rest + np.einsum("s,svc->vc", w_true, np.asarray(model.deltas))
    w, report = dbse.weights_lstsq(model, jnp.asarray(pose), jnp.asarray(rest))
    np.testing.assert_allclose(np.asarray(w), w_true, atol=1e-4)
    # reconstruction must reproduce the pose (no magic x3 in lstsq mode)
    disp = dbse.reconstruct(model, w, None, parity_scale=False)
    np.testing.assert_allclose(np.asarray(rest + disp), pose, atol=1e-4)


def test_lstsq_out_of_subspace_projection(rng):
    """A pose outside the blend subspace projects to the nearest point in it."""
    rest, shapes = _synthetic(rng, v=100, s=3)
    model = dbse.build_model(rest, shapes)
    pose = rest + 0.2 * rng.standard_normal((100, 3)).astype(np.float32)
    w, _ = dbse.weights_lstsq(model, jnp.asarray(pose), jnp.asarray(rest))
    # residual must be orthogonal to every basis column (normal equations)
    d = (pose - rest).reshape(-1)
    b = np.asarray(model.deltas).reshape(3, -1).T  # wrong reshape guard below
    b = np.asarray(model.deltas).transpose(1, 2, 0).reshape(-1, 3)
    resid = d - b @ np.asarray(w)
    ortho = b.T @ resid
    assert np.abs(ortho).max() < 1e-2 * np.abs(d).max()


def test_householder_packed_matches_qr(rng):
    """Unpacking the Eigen-convention packed factor reproduces B = Q R."""
    b = rng.standard_normal((40, 6))
    packed = dbse.householder_packed(b)
    m, s = b.shape
    r = np.triu(packed)[:s, :]
    # rebuild Q by applying the stored Householder reflectors to identity
    q = np.eye(m)
    for j in reversed(range(min(m - 1, s))):
        v = np.zeros(m)
        v[j] = 1.0
        v[j + 1 :] = packed[j + 1 :, j]
        beta = packed[j, j]
        # recompute tau from the stored quantities: tau = (beta - c0)/beta
        # c0 is lost, but H v relation lets us use ||v||: tau = 2/(v.v)
        vv = v @ v
        if vv > 1.0:  # essential part nonzero
            tau = 2.0 / vv
            q = q - tau * np.outer(v, v @ q)
    np.testing.assert_allclose(q[:, :s] @ r, b, atol=1e-10)


def test_parity_weights_match_reference_recipe(rng):
    """Device parity path == numpy f64 column-sum of d-scaled packed QR
    (dbse.cpp:53-55)."""
    rest, shapes = _synthetic(rng, v=50, s=4)
    model = dbse.build_model(rest, shapes, parity=True)
    pose = rest + 0.1 * rng.standard_normal((50, 3)).astype(np.float32)
    w = np.asarray(dbse.weights_parity(model, jnp.asarray(pose), jnp.asarray(rest)))
    d = (pose - rest).astype(np.float64).reshape(-1)
    packed = np.asarray(model.packed_qr, np.float64)
    want = (d[:, None] * packed).sum(axis=0)
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-5)


def test_reconstruct_clamp_and_scale(rng):
    rest, shapes = _synthetic(rng, v=30, s=2)
    model = dbse.build_model(rest, shapes)
    w = jnp.asarray([0.5, -1.0])
    # parity scale: w*3 then clamp to [0, 1] -> [1.0, 0.0]
    disp = dbse.reconstruct(model, w, (jnp.asarray(0.0), jnp.asarray(1.0)),
                            parity_scale=True)
    want = np.einsum("s,svc->vc", [1.0, 0.0], np.asarray(model.deltas))
    np.testing.assert_allclose(np.asarray(disp), want, atol=1e-5)


def test_batched_poses(rng):
    rest, shapes = _synthetic(rng, v=80, s=4)
    model = dbse.build_model(rest, shapes)
    w_true = rng.standard_normal((6, 4)).astype(np.float32) * 0.4
    poses = rest + np.einsum("fs,svc->fvc", w_true, np.asarray(model.deltas))
    w, _ = dbse.weights_lstsq_batched(model, jnp.asarray(poses), jnp.asarray(rest))
    np.testing.assert_allclose(np.asarray(w), w_true, atol=1e-3)


def test_morph_pass_residual_term():
    """P = rest + disp + (P - rest) * falloffradius, gated on dofalloff
    (src/SOP_FaceDeform.cpp:467-470)."""
    rest = jnp.zeros((5, 3))
    pos = jnp.ones((5, 3))
    disp = jnp.full((5, 3), 0.1)
    on = dbse.morph_pass(pos, rest, disp, jnp.asarray(True), jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(on), 0.1 + 0.5, atol=1e-6)
    off = dbse.morph_pass(pos, rest, disp, jnp.asarray(False), jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(off), 0.1, atol=1e-6)
    zero_r = dbse.morph_pass(pos, rest, disp, jnp.asarray(True), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(zero_r), 0.1, atol=1e-6)


def test_frames_batched_matches_per_frame(rng):
    """The animated-shot morph primitives (weights_lstsq_batched /
    weights_parity_batched / batched reconstruct / broadcast morph_pass)
    must reproduce the per-frame ops exactly — the cli --batch morph pass
    rides them."""
    from facedeform_tpu.utils import errors

    rest, shapes = _synthetic(rng, v=60, s=3)
    model = dbse.build_model(rest, shapes, parity=True)
    poses = rest + 0.1 * rng.standard_normal((4, 60, 3)).astype(np.float32)
    rest_j = jnp.asarray(rest)
    poses_j = jnp.asarray(poses)

    wf, rep = dbse.weights_lstsq_batched(model, poses_j, rest_j)
    ok = errors.frames_solve_ok(rep)
    assert ok.shape == (4,) and ok.all()
    wp = dbse.weights_parity_batched(model, poses_j, rest_j)
    clamp = (jnp.asarray(-0.5), jnp.asarray(0.5))
    disp_f = dbse.reconstruct(model, wf, clamp, parity_scale=False)
    disp_p = dbse.reconstruct(model, wp, None, parity_scale=True)
    morph_f = dbse.morph_pass(poses_j, rest_j, disp_f,
                              jnp.asarray(True), jnp.asarray(0.25))
    for f in range(4):
        w1, _ = dbse.weights_lstsq(model, poses_j[f], rest_j)
        np.testing.assert_allclose(np.asarray(wf[f]), np.asarray(w1),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(wp[f]),
            np.asarray(dbse.weights_parity(model, poses_j[f], rest_j)),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(disp_f[f]),
            np.asarray(dbse.reconstruct(model, w1, clamp, False)),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(disp_p[f]),
            np.asarray(dbse.reconstruct(model, wp[f], None, True)),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(morph_f[f]),
            np.asarray(dbse.morph_pass(poses_j[f], rest_j, disp_f[f],
                                       jnp.asarray(True),
                                       jnp.asarray(0.25))),
            atol=1e-6,
        )


def test_frames_solve_ok_flags_only_bad_frames(rng):
    """frames_solve_ok masks EXACTLY the frames whose weight solve failed
    (a corrupt pose must not sink the whole shot) — the per-frame analogue
    of errors.check_solve (terminationtype, src/SOP_FaceDeform.cpp:363-368,
    applied per cook)."""
    from facedeform_tpu.utils import errors

    rest, shapes = _synthetic(rng, v=40, s=2)
    model = dbse.build_model(rest, shapes)
    poses = rest + 0.1 * rng.standard_normal((4, 40, 3)).astype(np.float32)
    poses[2, 7, 1] = np.nan  # one corrupt vertex on one frame
    _, rep = dbse.weights_lstsq_batched(
        model, jnp.asarray(poses), jnp.asarray(rest)
    )
    ok = errors.frames_solve_ok(rep)
    np.testing.assert_array_equal(ok, [True, True, False, True])
