"""Deformation server tests: full protocol over a real TCP socket."""

import json
import socket
import threading

import numpy as np
import pytest

from facedeform_tpu import serve as serve_mod
from facedeform_tpu.geometry.primitives import fibonacci_points


@pytest.fixture(scope="module")
def server():
    ready = threading.Event()
    holder = {}

    def run():
        srv = serve_mod._ThreadedTCP(("127.0.0.1", 0), serve_mod._Handler)
        srv.deform_server = serve_mod.DeformServer()
        holder["srv"] = srv
        ready.set()
        srv.serve_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    ready.wait(10)
    yield holder["srv"].server_address
    holder["srv"].shutdown()


def _rpc(addr, req):
    with socket.create_connection(addr, timeout=30) as s:
        f = s.makefile("rwb")
        f.write((json.dumps(req) + "\n").encode())
        f.flush()
        return json.loads(f.readline())


def test_serve_fit_apply_roundtrip(server, rng):
    rest = fibonacci_points(20)
    deformed = rest + 0.1 * rng.standard_normal((20, 3)).astype(np.float32)
    r = _rpc(server, {
        "cmd": "fit",
        "rest_ctrl": serve_mod.encode_array(rest),
        "deformed_ctrl": serve_mod.encode_array(deformed),
        "cfg": {}, "params": {},
    })
    assert r["ok"], r
    did = r["deformer"]
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    r2 = _rpc(server, {
        "cmd": "apply", "deformer": did,
        "points": serve_mod.encode_array(pts),
    })
    assert r2["ok"], r2
    out = serve_mod.decode_array(r2["points"])
    assert out.shape == (100, 3)
    assert np.abs(out - pts).max() > 1e-4

    # compare against an in-process deformer
    from facedeform_tpu import DeformConfig, DeformParams, Deformer
    d = Deformer.fit(rest, deformed, DeformConfig(), DeformParams())
    want, _ = d.apply(pts)
    np.testing.assert_allclose(out, np.asarray(want), atol=1e-6)


def test_serve_save_load(server, rng, tmp_path):
    rest = fibonacci_points(15)
    deformed = rest * 1.05
    r = _rpc(server, {
        "cmd": "fit",
        "rest_ctrl": serve_mod.encode_array(rest),
        "deformed_ctrl": serve_mod.encode_array(deformed),
    })
    p = str(tmp_path / "srv_ckpt.npz")
    assert _rpc(server, {"cmd": "save", "deformer": r["deformer"], "path": p})["ok"]
    r2 = _rpc(server, {"cmd": "load", "path": p})
    assert r2["ok"] and r2["deformer"] != r["deformer"]


def test_serve_load_skin_checkpoint_clean_error(server, tmp_path):
    """Skinning checkpoints are engine exports, not servable deformers —
    the wire error must say that, not leak a Python-API hint."""
    import jax.numpy as jnp

    from facedeform_tpu.ops import skinning
    from facedeform_tpu.utils import checkpoint

    model = skinning.SkinningModel(
        weights=jnp.ones((4, 1), jnp.float32),
        rotations=jnp.eye(3, dtype=jnp.float32)[None, None],
        translations=jnp.zeros((1, 1, 3), jnp.float32),
        rest=jnp.zeros((4, 3), jnp.float32),
    )
    p = str(tmp_path / "skin.npz")
    checkpoint.save_skinning(p, model)
    r = _rpc(server, {"cmd": "load", "path": p})
    assert not r["ok"]
    assert "engine export" in r["error"]
    assert "load_skinning()" not in r["error"].replace(
        "utils.checkpoint.load_skinning", ""
    )


def test_serve_errors(server):
    r = _rpc(server, {"cmd": "nope"})
    assert not r["ok"] and "unknown cmd" in r["error"]
    r = _rpc(server, {"cmd": "apply", "deformer": "missing",
                      "points": [[0, 0, 0]]})
    assert not r["ok"]
    # shape-mismatch surfaces as a clean protocol error, not a crash
    r = _rpc(server, {
        "cmd": "fit",
        "rest_ctrl": [[0, 0, 0]],
        "deformed_ctrl": [[0, 0, 0], [1, 1, 1]],
    })
    assert not r["ok"] and "match" in r["error"]


def test_serve_info(server):
    r = _rpc(server, {"cmd": "info"})
    assert r["ok"] and r["backend"] == "cpu"


def test_serve_malformed_requests_keep_connection(server):
    """Protocol boundary: arbitrary bad input yields JSON errors, not EOF."""
    r = _rpc(server, {"cmd": "fit", "cfg": {"bogus_field": 1},
                      "rest_ctrl": [[0, 0, 0]], "deformed_ctrl": [[0, 0, 0]]})
    assert not r["ok"] and "bogus_field" in r["error"]
    r = _rpc(server, {"cmd": "load", "path": "/nonexistent/x.npz"})
    assert not r["ok"]
    r = _rpc(server, {"cmd": "apply", "deformer": "d1",
                      "points": {"shape": [1, 3], "dtype": "notatype", "b64": ""}})
    assert not r["ok"]


# -------------------------------------------------- binary framing (round 2)
def test_binary_framing_roundtrip(server, rng):
    """Binary-framed fit + apply matches the JSON protocol bit for bit."""
    rest = fibonacci_points(25)
    deformed = rest + 0.1 * rng.standard_normal((25, 3)).astype(np.float32)
    pts = rng.standard_normal((3000, 3)).astype(np.float32)

    c = serve_mod.Client(*server)
    did = c.fit(rest, deformed)
    new_pts, falloff = c.apply(did, pts)
    assert new_pts.shape == (3000, 3) and falloff.shape == (3000,)
    info = c.info()
    assert did in info["deformers"]
    c.close()

    # JSON protocol reference on the same solved rig (new fit id)
    r = _rpc(server, {
        "cmd": "fit",
        "rest_ctrl": serve_mod.encode_array(rest),
        "deformed_ctrl": serve_mod.encode_array(deformed),
        "cfg": {}, "params": {},
    })
    r2 = _rpc(server, {
        "cmd": "apply", "deformer": r["deformer"],
        "points": serve_mod.encode_array(pts),
    })
    ref = serve_mod.decode_array(r2["points"])
    np.testing.assert_array_equal(new_pts, ref)


def test_binary_framing_error_path(server):
    c = serve_mod.Client(*server)
    with pytest.raises(RuntimeError, match="unknown cmd"):
        c.request({"cmd": "nope"})
    c.close()


def test_binary_framing_with_dist2_and_gate(server, rng):
    rest = fibonacci_points(20)
    c = serve_mod.Client(*server)
    did = c.fit(rest, rest * 1.1)
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    gate = (rng.standard_normal(500) > 0).astype(np.float32)
    dist2 = np.abs(rng.standard_normal(500)).astype(np.float32)
    new_pts, falloff = c.apply(did, pts, dist2=dist2, gate=gate)
    # gated-off points must be pinned
    np.testing.assert_array_equal(new_pts[gate == 0], pts[gate == 0])
    assert (falloff[gate == 0] == 0).all()
    c.close()


def test_serve_pu_fit_apply_save_load(tmp_path):
    """solver='pu' rides the serve protocol: fit, apply, save, load."""
    import numpy as np

    from facedeform_tpu.geometry.primitives import fibonacci_points
    from facedeform_tpu.serve import DeformServer

    srv = DeformServer()
    rig = fibonacci_points(300)
    disp = (0.1 * np.exp(-3 * np.sum((rig - [0, 1, 0]) ** 2, -1, keepdims=True))
            .astype(np.float32) * np.float32([0, 1, 0]))
    from facedeform_tpu.serve import encode_array

    r = srv.handle({"cmd": "fit", "cfg": {"solver": "pu"}, "params": {},
                    "rest_ctrl": encode_array(rig),
                    "deformed_ctrl": encode_array(rig + disp)})
    assert r["ok"], r
    did = r["deformer"]
    # apply AT the rig: exact interpolation through the wire
    r2 = srv.handle({"cmd": "apply", "deformer": did,
                     "points": encode_array(rig)}, raw=True)
    assert r2["ok"], r2
    got = np.asarray(r2["points"])
    assert np.abs(got - (rig + disp)).max() < 5e-4
    # save -> load round trip (PU codec auto-detected)
    path = str(tmp_path / "pu_served.npz")
    assert srv.handle({"cmd": "save", "deformer": did, "path": path})["ok"]
    r3 = srv.handle({"cmd": "load", "path": path})
    assert r3["ok"], r3
    r4 = srv.handle({"cmd": "apply", "deformer": r3["deformer"],
                     "points": encode_array(rig)}, raw=True)
    np.testing.assert_allclose(np.asarray(r4["points"]), got, atol=1e-6)


def test_binary_framing_rejects_hostile_metadata(server):
    """Untrusted length prefixes / shape descriptors must not trigger huge
    allocations: the server drops the connection instead of reading on."""
    import struct

    # header length past the cap
    with socket.create_connection(server, timeout=30) as s:
        s.sendall(serve_mod.MAGIC + struct.pack("<I", serve_mod.MAX_HEADER_BYTES + 1))
        assert s.recv(1) == b""  # server closed without reading 16MB+

    # array descriptor with a negative dimension
    hdr = json.dumps({"cmd": "info", "arrays": [
        {"name": "x", "shape": [-1, 3], "dtype": "float32"}]}).encode()
    with socket.create_connection(server, timeout=30) as s:
        s.sendall(serve_mod.MAGIC + struct.pack("<I", len(hdr)) + hdr)
        assert s.recv(1) == b""

    # array descriptor demanding more payload than the frame cap
    hdr = json.dumps({"cmd": "info", "arrays": [
        {"name": "x", "shape": [1 << 40, 3], "dtype": "float32"}]}).encode()
    with socket.create_connection(server, timeout=30) as s:
        s.sendall(serve_mod.MAGIC + struct.pack("<I", len(hdr)) + hdr)
        assert s.recv(1) == b""

    # bogus dtype string closes cleanly too (TypeError inside np.dtype)
    hdr = json.dumps({"cmd": "info", "arrays": [
        {"name": "x", "shape": [1, 3], "dtype": "notatype"}]}).encode()
    with socket.create_connection(server, timeout=30) as s:
        s.sendall(serve_mod.MAGIC + struct.pack("<I", len(hdr)) + hdr)
        assert s.recv(1) == b""

    # the server survives all of the above: a well-formed request still works
    c = serve_mod.Client(*server)
    assert c.info()["ok"]
    c.close()


def test_serve_sequence_fit_apply(server, rng):
    """fit_seq + apply_seq: one batched solve, all frames in one reply;
    per-frame parity with the single-pose fit route."""
    import jax.numpy as jnp

    rest = fibonacci_points(25)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((25, 3)).astype(np.float32)
        for _ in range(3)
    ])
    pts = rng.standard_normal((500, 3)).astype(np.float32)

    c = serve_mod.Client(*server)
    sid = c.fit_seq(rest, frames)
    out, falloff = c.apply_seq(sid, pts)
    assert out.shape == (3, 500, 3) and falloff.shape == (500,)

    for f in range(3):
        did = c.fit(rest, frames[f])
        want, _ = c.apply(did, pts)
        np.testing.assert_allclose(out[f], want, atol=2e-5)

    # apply rejects a sequence model with a pointed error
    with pytest.raises(RuntimeError, match="apply_seq"):
        c.request({"cmd": "apply", "deformer": sid},
                  {"points": pts})
    # shape contract enforced
    with pytest.raises(RuntimeError, match="deformed_frames"):
        c.fit_seq(rest, frames[:, :10])
    c.close()


def test_serve_sequence_save_load(server, rng, tmp_path):
    """Sequence fits checkpoint across sessions: save_seq/save_pu_seq via
    the protocol, load restores a deformer whose apply_seq matches the
    original shot (dense bit-for-bit; PU through the shared-plan path)."""
    c = serve_mod.Client(*server)
    rest = fibonacci_points(30)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((30, 3)).astype(np.float32)
        for _ in range(3)
    ])
    pts = rng.standard_normal((200, 3)).astype(np.float32)

    # dense sequence
    sid = c.fit_seq(rest, frames)
    path = str(tmp_path / "seq.npz")
    c.save(sid, path)
    rid = c.load(path)
    a, fa = c.apply_seq(sid, pts)
    b, fb = c.apply_seq(rid, pts)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(fa, fb)

    # PU sequence (cfg knobs ride the load request, like single-pose PU)
    sid_pu = c.fit_seq(rest, frames, cfg={"solver": "pu"})
    path_pu = str(tmp_path / "pu_seq.npz")
    c.save(sid_pu, path_pu)
    rid_pu = c.load(path_pu, cfg={"solver": "pu"})
    a, _ = c.apply_seq(sid_pu, pts)
    b, _ = c.apply_seq(rid_pu, pts)
    np.testing.assert_allclose(a, b, atol=1e-6)
    c.close()


def test_serve_sequence_pu_route(server, rng):
    """fit_seq with solver='pu' shares one patch factorization across all
    frames (ops/pu.fit_pu_frames); per-frame parity with the single-pose
    PU fit route."""
    rest = fibonacci_points(40)
    frames = np.stack([
        rest + 0.04 * rng.standard_normal((40, 3)).astype(np.float32)
        for _ in range(3)
    ])
    pts = rng.standard_normal((300, 3)).astype(np.float32)

    c = serve_mod.Client(*server)
    sid = c.fit_seq(rest, frames, cfg={"solver": "pu"})
    out, falloff = c.apply_seq(sid, pts)
    assert out.shape == (3, 300, 3) and falloff.shape == (300,)

    for f in range(3):
        did = c.fit(rest, frames[f], cfg={"solver": "pu"})
        want, _ = c.apply(did, pts)
        np.testing.assert_allclose(out[f], want, atol=2e-5)

    # sequence guards apply to the PU route too
    with pytest.raises(RuntimeError, match="apply_seq"):
        c.request({"cmd": "apply", "deformer": sid}, {"points": pts})
    c.close()


def test_serve_transport(server, rng):
    """The transport op: N/v/orient through the served deformer's
    deformation gradient (+ stretches), binary framing via Client."""
    from facedeform_tpu import DeformConfig, DeformParams, Deformer

    ang = 0.5
    c, s = np.cos(ang), np.sin(ang)
    r_mat = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    rest = fibonacci_points(30)
    client = serve_mod.Client(*server)
    try:
        did = client.fit(rest, (rest @ r_mat.T).astype(np.float32),
                         cfg={"term": 0})
        pts = fibonacci_points(64)
        v = rng.standard_normal((64, 3)).astype(np.float32)
        w = np.ones(64, np.float32)
        moved, sig = client.transport(
            did, pts, w, {"N": pts, "v": v}, want_stretch=True
        )
        assert set(moved) == {"N", "v"}
        assert np.abs(moved["v"] - v @ r_mat.T).max() < 5e-3
        assert np.abs(moved["N"] - pts @ r_mat.T).max() < 5e-3
        assert np.abs(sig - 1.0).max() < 5e-3          # rigid: no stretch

        # parity vs in-process
        d = Deformer.fit(rest, rest @ r_mat.T,
                         DeformConfig(term=0), DeformParams())
        want = d.transform_attrs(pts, {"v": v}, w)
        np.testing.assert_allclose(moved["v"], np.asarray(want["v"]),
                                   atol=1e-6)

        # untransportable shape -> clean error, connection survives
        try:
            client.transport(did, pts, w, {"bad": np.zeros((64, 2))})
            raise AssertionError("expected error")
        except RuntimeError as e:
            assert "not transportable" in str(e)
        moved2 = client.transport(did, pts, w, {"v": v})
        assert np.abs(moved2["v"] - v @ r_mat.T).max() < 5e-3
    finally:
        client.close()


def test_serve_transport_json_protocol(server, rng):
    """Same op over the JSON line protocol (base64 arrays)."""
    rest = fibonacci_points(20)
    r = _rpc(server, {
        "cmd": "fit",
        "rest_ctrl": serve_mod.encode_array(rest),
        "deformed_ctrl": serve_mod.encode_array(
            (1.2 * rest).astype(np.float32)),
        "cfg": {"term": 0}, "params": {"lam": 0.01},
    })
    assert r["ok"], r
    pts = fibonacci_points(32)
    r2 = _rpc(server, {
        "cmd": "transport", "deformer": r["deformer"],
        "points": serve_mod.encode_array(pts),
        "weight": serve_mod.encode_array(np.ones(32, np.float32)),
        "attr:N": serve_mod.encode_array(pts),
        "want_stretch": True,
    })
    assert r2["ok"], r2
    n2 = serve_mod.decode_array(r2["attr:N"])
    sig = serve_mod.decode_array(r2["stretch"])
    assert np.abs(n2 - pts).max() < 2e-2        # uniform scale: unchanged
    assert np.abs(sig - 1.2).max() < 2e-2


def test_serve_dbse_fit_morph(server, rng):
    """Component F over the wire: fit_dbse holds the blend basis resident,
    morph projects single poses and whole shots, matching the in-process
    ops; eval knobs (clamp, falloffradius residual) override per request."""
    import jax.numpy as jnp

    from facedeform_tpu.config import DeformConfig, DeformParams
    from facedeform_tpu.ops import dbse as dbse_ops

    c = serve_mod.Client(*server)
    try:
        rest = rng.standard_normal((60, 3)).astype(np.float32)
        shapes = np.stack([
            rest + 0.1 * rng.standard_normal((60, 3)).astype(np.float32)
            for _ in range(3)
        ])
        did = c.fit_dbse(rest, shapes)

        # single pose
        pose = rest + 0.05 * rng.standard_normal((60, 3)).astype(np.float32)
        morphed, w, ok = c.morph(did, pose)
        assert morphed.shape == (60, 3) and w.shape == (3,)
        # single pose unbatches EVERY per-pose output, ok included
        assert ok.shape == () and ok.all()
        model = dbse_ops.build_model(rest, list(shapes))
        w_want, _ = dbse_ops.weights_lstsq(
            model, jnp.asarray(pose), jnp.asarray(rest)
        )
        np.testing.assert_allclose(w, np.asarray(w_want), atol=1e-5)
        want = dbse_ops.morph_apply(
            model, jnp.asarray(pose), jnp.asarray(rest), w_want,
            DeformConfig(), DeformParams(),
        )
        np.testing.assert_allclose(morphed, np.asarray(want), atol=1e-5)

        # a shot, with one corrupt frame: only that frame passes through
        poses = rest + 0.05 * rng.standard_normal((4, 60, 3)).astype(
            np.float32)
        poses[2, 5, 0] = np.nan
        morphed_f, w_f, ok_f = c.morph(did, poses)
        assert morphed_f.shape == (4, 60, 3) and w_f.shape == (4, 3)
        np.testing.assert_array_equal(ok_f, [True, True, False, True])
        np.testing.assert_allclose(morphed_f[2], poses[2], atol=0,
                                   err_msg="failed frame must pass through")

        # per-request knob override: clamped weights change the output
        m_clamped, w_clamped, _ = c.morph(
            did, pose, cfg={"doclampweight": True},
            params={"weight_lo": 0.0, "weight_hi": 0.01},
        )
        np.testing.assert_allclose(w_clamped, w, atol=1e-6)  # raw weights
        assert np.abs(m_clamped - morphed).max() > 1e-5     # clamped recon

        # parity-path basis must be requested at fit time
        with pytest.raises(RuntimeError, match="dbse_lstsq"):
            c.morph(did, pose, cfg={"dbse_lstsq": False})
        did_p = c.fit_dbse(rest, shapes, cfg={"dbse_lstsq": False})
        _, w_p, ok_p = c.morph(did_p, pose)
        w_p_want = dbse_ops.weights_parity(
            dbse_ops.build_model(rest, list(shapes), parity=True),
            jnp.asarray(pose), jnp.asarray(rest),
        )
        np.testing.assert_allclose(w_p, np.asarray(w_p_want), atol=1e-5)

        # dbse ids are rejected by apply and save
        r = _rpc(server, {"cmd": "apply", "deformer": did,
                          "points": serve_mod.encode_array(pose)})
        assert not r["ok"] and "morph" in r["error"]
        r = _rpc(server, {"cmd": "save", "deformer": did, "path": "/tmp/x"})
        assert not r["ok"]
    finally:
        c.close()


def test_serve_fit_rig_inverse(server, rng):
    """fit_rig over the wire: a target generated by a known rig pose round
    trips (register=True fits the recovered pose for immediate apply)."""
    from facedeform_tpu import DeformConfig, DeformParams, Deformer
    from facedeform_tpu.geometry.primitives import uv_sphere

    mesh = uv_sphere(25, 25)
    rest_ctrl = fibonacci_points(18)
    true_pose = rest_ctrl + 0.06 * rng.standard_normal((18, 3)).astype(
        np.float32)
    d = Deformer.fit(rest_ctrl, true_pose, DeformConfig(), DeformParams())
    target, _ = d.apply(mesh.points)
    target = np.asarray(target)

    c = serve_mod.Client(host=server[0], port=server[1])
    try:
        rec, rms, did = c.fit_rig(
            rest_ctrl, mesh.points, target, ridge=1e-8, register=True,
        )
        assert rec.shape == rest_ctrl.shape
        assert rms < 1e-4
        assert did is not None
        # the registered deformer reproduces the target immediately
        got, _ = c.apply(did, mesh.points)
        assert np.abs(got - target).max() < 5e-4
    finally:
        c.close()

    # shape-mismatch guard surfaces as a protocol error, not a hang
    r = _rpc(server, {
        "cmd": "fit_rig",
        "rest_ctrl": serve_mod.encode_array(rest_ctrl),
        "rest_points": serve_mod.encode_array(mesh.points),
        "target_points": serve_mod.encode_array(mesh.points[:-1]),
    })
    assert not r["ok"] and "must match" in r["error"]


def test_serve_fit_rig_dense_limit_guard(server, rng):
    """Oversize rigs must get the protocol error, not a VMEM OOM."""
    big = rng.standard_normal((9000, 3)).astype(np.float32)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    r = _rpc(server, {
        "cmd": "fit_rig",
        "rest_ctrl": serve_mod.encode_array(big),
        "rest_points": serve_mod.encode_array(pts),
        "target_points": serve_mod.encode_array(pts),
    })
    assert not r["ok"] and "dense limit" in r["error"]


def test_serve_refit_drag(server, rng):
    """fit -> refit (new pose only over the wire) must equal a fresh fit
    of that pose; non-plan deformers refuse with a clear error."""
    from facedeform_tpu import DeformConfig, DeformParams, Deformer

    rest = fibonacci_points(24)
    pose_a = rest + 0.1 * rng.standard_normal((24, 3)).astype(np.float32)
    pose_b = rest + 0.1 * rng.standard_normal((24, 3)).astype(np.float32)
    r = _rpc(server, {
        "cmd": "fit",
        "rest_ctrl": serve_mod.encode_array(rest),
        "deformed_ctrl": serve_mod.encode_array(pose_a),
        "cfg": {}, "params": {},
    })
    assert r["ok"] and r["plan"], r
    did = r["deformer"]

    r2 = _rpc(server, {
        "cmd": "refit", "deformer": did,
        "deformed_ctrl": serve_mod.encode_array(pose_b),
    })
    assert r2["ok"], r2
    pts = rng.standard_normal((80, 3)).astype(np.float32)
    r3 = _rpc(server, {
        "cmd": "apply", "deformer": did,
        "points": serve_mod.encode_array(pts),
    })
    got = serve_mod.decode_array(r3["points"])
    want, _ = Deformer.fit(rest, pose_b).apply(pts)
    np.testing.assert_array_equal(got, np.asarray(want))

    # Unknown id / plan-less deformer: loud refusal, not a silent stale fit.
    r4 = _rpc(server, {
        "cmd": "refit", "deformer": "nope",
        "deformed_ctrl": serve_mod.encode_array(pose_b),
    })
    assert not r4["ok"] and "plan" in r4["error"]


def test_serve_refit_via_client_binary(server, rng):
    """Client.refit over the binary framing."""
    rest = fibonacci_points(16)
    pose_a = rest + 0.05 * rng.standard_normal((16, 3)).astype(np.float32)
    pose_b = rest + 0.05 * rng.standard_normal((16, 3)).astype(np.float32)
    c = serve_mod.Client(*server)
    try:
        did = c.fit(rest, pose_a)
        assert c.refit(did, pose_b) == did
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        out, _ = c.apply(did, pts)
        from facedeform_tpu import Deformer

        want, _ = Deformer.fit(rest, pose_b).apply(pts)
        np.testing.assert_array_equal(out, np.asarray(want))
    finally:
        c.close()


def test_serve_psd_fit_delta_save_load(server, rng, tmp_path):
    """Pose-space deformation over the wire: fit_psd holds the
    sculpt-correction model resident, psd_delta blends corrections for
    query poses (optionally applied to shipped points), and save/load
    round-trips through the psd checkpoint codec."""
    from facedeform_tpu.ops import psd as psd_ops

    rest = fibonacci_points(12)
    posed = np.stack([rest * (1.0 + 0.1 * (i + 1)) for i in range(3)])
    corr = rng.standard_normal((3, 40, 3)).astype(np.float32)
    c = serve_mod.Client(*server)
    try:
        did = c.fit_psd(rest, posed, corr)
        # at an example pose the blended field IS that sculpt's correction
        delta, w = c.psd_delta(did, rest, posed[1])
        np.testing.assert_allclose(w, [0, 1, 0], atol=2e-5)
        np.testing.assert_allclose(delta, corr[1], atol=1e-4)
        # batched poses + points: one round trip applies the whole shot,
        # matching the in-process facade
        pts = rng.standard_normal((40, 3)).astype(np.float32)
        out, wf = c.psd_delta(did, rest, posed, points=pts)
        ref = psd_ops.PSDDeformer.fit(rest, posed, corr)
        want = pts[None] + np.asarray(ref.delta_frames(rest, posed))
        assert out.shape == (3, 40, 3) and wf.shape == (3, 3)
        np.testing.assert_allclose(out, want, atol=1e-5)
        # save -> load -> same field from the restored model
        p = str(tmp_path / "srv_psd.npz")
        c.save(did, p)
        did2 = c.load(p)
        delta2, _ = c.psd_delta(did2, rest, posed[1])
        np.testing.assert_array_equal(delta2, delta)
        # apply refuses a psd deformer with a pointer to psd_delta
        with pytest.raises(RuntimeError, match="psd_delta"):
            c.apply(did, pts)
        # psd_delta refuses a non-psd deformer
        dense = c.fit(rest, posed[0])
        with pytest.raises(RuntimeError, match="fit_psd"):
            c.psd_delta(dense, rest, posed[1])
        # marker-count mismatch is a loud shape error
        with pytest.raises(RuntimeError, match="markers"):
            c.psd_delta(did, rest[:8], posed[:, :8])
        # align=True: rigid-equivariant over the wire — the example pose
        # rigidly moved still triggers its sculpt, rotated with the head
        did_al = c.fit_psd(rest, posed, corr, align=True)
        ang = 0.6
        r_mat = np.array([
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ], np.float32)
        q = posed[1] @ r_mat.T + np.float32([2.0, -1.0, 0.5])
        delta_al, w_al = c.psd_delta(did_al, rest, q)
        np.testing.assert_allclose(w_al, [0, 1, 0], atol=2e-4)
        np.testing.assert_allclose(delta_al, corr[1] @ r_mat.T, atol=2e-4)
        # align survives the checkpoint round trip
        p_al = str(tmp_path / "srv_psd_al.npz")
        c.save(did_al, p_al)
        did_al2 = c.load(p_al)
        delta_al2, _ = c.psd_delta(did_al2, rest, q)
        np.testing.assert_array_equal(delta_al2, delta_al)
    finally:
        c.close()


def test_serve_fit_skin(server, tmp_path):
    """Skinning-as-a-service: LBS decomposition over the wire matches a
    local fit_skinning; server-side .npz and skinned .glb writes work."""
    from facedeform_tpu.geometry import gltf_io
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.ops import skinning
    from facedeform_tpu.utils import checkpoint

    mesh = uv_sphere(8, 8)
    rest = mesh.points
    frames = np.stack([
        rest + np.float32([0, 0.2, 0]) * (i + 1) for i in range(2)
    ])
    ck = str(tmp_path / "skin.npz")
    glb = str(tmp_path / "skin.glb")
    c = serve_mod.Client(*server)
    try:
        w, r, t, rel = c.fit_skin(
            rest, frames, bones=2, max_influences=2, seed=1,
            faces=mesh.triangles(), path=ck, gltf=glb,
        )
    finally:
        c.close()
    assert w.shape == (rest.shape[0], 2)
    assert r.shape == (2, 2, 3, 3) and t.shape == (2, 2, 3)
    assert rel < 1e-3  # pure translation sweep: LBS-exact

    # served transforms reproduce the poses through the engine-side eval
    got = np.asarray(skinning.lbs_apply(w, rest, r[1], t[1]))
    np.testing.assert_allclose(got, frames[1], atol=1e-3)

    # server-side artifacts: checkpoint kind + a parseable skinned .glb
    assert checkpoint.kind(ck) == "skin"
    model, rep = checkpoint.load_skinning(ck)
    np.testing.assert_allclose(np.asarray(model.weights), w, atol=0)
    g, _ = gltf_io.load_glb(glb)
    assert "skins" in g and len(g["skins"][0]["joints"]) == 2

    # shape guard: frames must be (F,) + rest_points
    r_err = _rpc(server, {
        "cmd": "fit_skin",
        "rest_points": serve_mod.encode_array(rest),
        "frames": serve_mod.encode_array(rest),
    })
    assert not r_err["ok"] and "frames" in r_err["error"]

    # smooth_lambda without faces mirrors the CLI: warn in the response
    # and proceed unsmoothed (advisor r4 — it used to surface
    # fit_skinning's ValueError as a generic protocol error)
    r_ns = _rpc(server, {
        "cmd": "fit_skin",
        "rest_points": serve_mod.encode_array(rest),
        "frames": serve_mod.encode_array(frames),
        "bones": 2, "max_influences": 2, "seed": 1,
        "smooth_lambda": 0.1,
    })
    assert r_ns["ok"]
    assert any("smoothing skipped" in w for w in r_ns["warnings"])


def test_serve_fit_shapes(server, tmp_path):
    """Blendshape-bake-as-a-service: PCA bake over the wire matches a
    local fit_blendshapes; server-side .npz and morph .glb writes work."""
    from facedeform_tpu.geometry import gltf_io
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.ops import blendshapes
    from facedeform_tpu.utils import checkpoint

    mesh = uv_sphere(8, 8)
    rest = mesh.points
    rng = np.random.default_rng(5)
    basis = rng.standard_normal((2,) + rest.shape).astype(np.float32)
    curves = rng.standard_normal((5, 2)).astype(np.float32)
    frames = rest[None] + np.einsum("fk,kvi->fvi", curves, basis)

    ck = str(tmp_path / "shapes.npz")
    glb = str(tmp_path / "shapes.glb")
    c = serve_mod.Client(*server)
    try:
        targets, w, rmse, energy = c.fit_shapes(
            rest, frames, rank=2, faces=mesh.triangles(),
            path=ck, gltf=glb,
        )
    finally:
        c.close()
    # mean + 2 PCA targets reconstruct the rank-2 shot exactly
    assert targets.shape[0] == 3 and w.shape == (5, 3)
    scale = np.abs(frames - rest[None]).max()
    assert rmse <= 1e-4 * scale
    assert energy >= 1.0 - 1e-5

    # wire result matches the local bake bit-for-bit inputs
    local, _ = blendshapes.fit_blendshapes(rest, frames, rank=2)
    np.testing.assert_allclose(
        targets, np.asarray(local.targets), atol=1e-6
    )
    recon = rest[None] + np.einsum("fk,kvi->fvi", w, targets)
    np.testing.assert_allclose(recon, frames, atol=1e-4 * scale)

    # server-side artifacts: checkpoint kind + a parseable morph .glb
    assert checkpoint.kind(ck) == "shapes"
    model, rep = checkpoint.load_blendshapes(ck)
    np.testing.assert_allclose(np.asarray(model.targets), targets, atol=0)
    assert rep is not None and rep.energy >= 1.0 - 1e-5
    g, _ = gltf_io.load_glb(glb)
    prim = g["meshes"][0]["primitives"][0]
    assert len(prim["targets"]) == 3
    assert g["meshes"][0]["extras"]["targetNames"][0] == "mean"

    # shape guard: frames must be (F,) + rest_points
    r_err = _rpc(server, {
        "cmd": "fit_shapes",
        "rest_points": serve_mod.encode_array(rest),
        "frames": serve_mod.encode_array(rest),
    })
    assert not r_err["ok"] and "frames" in r_err["error"]


def test_serve_load_shapes_checkpoint_clean_error(server, tmp_path):
    """Loading a blendshape bake as a deformer fails with wire-appropriate
    guidance (no Python-API-only hint leaked)."""
    from facedeform_tpu.geometry.primitives import uv_sphere
    from facedeform_tpu.ops import blendshapes
    from facedeform_tpu.utils import checkpoint

    mesh = uv_sphere(5, 5)
    frames = np.repeat(mesh.points[None], 3, axis=0) * np.float32(1.1)
    model, rep = blendshapes.fit_blendshapes(mesh.points, frames, rank=1)
    ck = str(tmp_path / "bake.npz")
    checkpoint.save_blendshapes(ck, model, rep)
    r = _rpc(server, {"cmd": "load", "path": ck})
    assert not r["ok"]
    assert "engine export" in r["error"]
    assert "load_blendshapes()" not in r["error"].replace(
        "load_blendshapes +", "")


def test_serve_reduced_regression(server, rng):
    """reduce_k on fit and fit_seq: the served reduced-basis regression
    matches the in-process decimate fits (same centers, same math), and
    the conflicts are pointed errors."""
    from facedeform_tpu import DeformConfig, DeformParams
    from facedeform_tpu.ops import decimate

    n, f, k = 120, 3, 24
    rest = fibonacci_points(n)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
        for _ in range(f)
    ])
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    c = serve_mod.Client(*server)

    # single pose: served result == in-process fit_reduced model applied
    resp, _ = c.request(
        {"cmd": "fit", "cfg": {}, "params": {}, "reduce_k": k},
        {"rest_ctrl": rest, "deformed_ctrl": frames[0]},
    )
    assert resp["centers"] == k and "fit_rms" in resp
    got, _ = c.apply(resp["deformer"], pts)
    from facedeform_tpu.deformer import Deformer

    m1, rep1, _ = decimate.fit_reduced(rest, frames[0], k)
    want, _ = Deformer(
        model=m1, cfg=DeformConfig(), params=DeformParams(), report=rep1
    ).apply(pts)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)

    # shot: one shared factorization server-side; per-frame parity with
    # the served single-pose route over the same centers
    sid = c.fit_seq(rest, frames, reduce_k=k)
    out, _ = c.apply_seq(sid, pts)
    assert out.shape == (f, 300, 3)
    np.testing.assert_allclose(out[0], got, atol=2e-5)

    # conflicts surface as pointed errors, not crashes
    with pytest.raises(RuntimeError, match="reduce_k"):
        c.fit(rest, frames[0], cfg={"solver": "pu"}, reduce_k=k)
    with pytest.raises(RuntimeError, match="reduce_k"):
        c.fit_seq(rest, frames, cfg={"solver": "pu"}, reduce_k=k)
    with pytest.raises(RuntimeError, match="single-layer"):
        c.fit_seq(rest, frames, cfg={"model": 1}, reduce_k=k)  # MULTILAYER
    c.close()


# -------------------------------------------------- round-5 review fixes
def test_serve_short_json_line_no_deadlock(server):
    """A JSON first line shorter than the 4-byte magic (b'{}\\n') must get
    an immediate error reply, and a pipelined short line must not corrupt
    the next request — the sniff used to block for exactly 4 bytes."""
    with socket.create_connection(server, timeout=10) as s:
        f = s.makefile("rwb")
        f.write(b"{}\n" + (json.dumps({"cmd": "info"}) + "\n").encode())
        f.flush()
        r1 = json.loads(f.readline())
        assert not r1["ok"]          # {} has no cmd
        r2 = json.loads(f.readline())
        assert r2["ok"] and r2["backend"] == "cpu"


def test_serve_free_cmd(server, rng):
    """cmd free evicts a resident deformer (long-lived servers must not
    accumulate device state forever)."""
    rest = fibonacci_points(16)
    deformed = rest + 0.05 * rng.standard_normal((16, 3)).astype(np.float32)
    r = _rpc(server, {
        "cmd": "fit",
        "rest_ctrl": rest.tolist(), "deformed_ctrl": deformed.tolist(),
    })
    did = r["deformer"]
    assert _rpc(server, {"cmd": "free", "deformer": did})["ok"]
    info = _rpc(server, {"cmd": "info"})
    assert did not in info["deformers"]
    r = _rpc(server, {"cmd": "apply", "deformer": did,
                      "points": [[0.0, 0.0, 0.0]]})
    assert not r["ok"]
    assert not _rpc(server, {"cmd": "free", "deformer": did})["ok"]


def test_encode_array_scalar_keeps_rank():
    """encode_array on a 0-d array must record shape [] — the
    ascontiguousarray 0-d -> (1,) promotion trap (CLAUDE.md), previously
    fixed only on the binary write_frame path."""
    enc = serve_mod.encode_array(np.float32(3.5))
    assert enc["shape"] == []
    back = serve_mod.decode_array(enc)
    assert back.shape == () and float(back) == 3.5


def test_serve_fit_seq_degenerate_rig_is_error(server):
    """fit_seq on a degenerate rig (all-identical markers) must return an
    error response, not store a NaN model with ok=true (the dense route
    skipped the health check every sibling fit path has)."""
    rest = np.zeros((12, 3), np.float32).tolist()
    frames = np.broadcast_to(
        np.float32([1.0, 0.0, 0.0]), (2, 12, 3)
    ).tolist()
    r = _rpc(server, {
        "cmd": "fit_seq", "rest_ctrl": rest, "deformed_frames": frames,
    })
    assert not r["ok"] and "solve" in r["error"].lower()
