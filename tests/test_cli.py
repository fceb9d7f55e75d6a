"""CLI tests: the deform subcommand end-to-end through OBJ files."""

import numpy as np

from facedeform_tpu.cli import main
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.obj_io import load_obj, save_obj
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere


def _write_inputs(tmp_path, rng):
    mesh = uv_sphere(30, 30)
    rig = Mesh(points=fibonacci_points(25))
    bump = 0.2 * np.exp(-2 * np.sum((rig.points - [0, 1, 0]) ** 2, -1, keepdims=True))
    drig = Mesh(points=rig.points + bump * np.float32([0, 1, 0]))
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), rig)
    save_obj(str(tmp_path / "drig.obj"), drig)
    return mesh


def test_cli_deform_roundtrip(tmp_path, rng, capsys):
    mesh = _write_inputs(tmp_path, rng)
    rc = main([
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "-o", str(tmp_path / "out.obj"),
        "--save-deformer", str(tmp_path / "d.npz"), "--timing",
    ])
    assert rc == 0
    out = load_obj(str(tmp_path / "out.obj"))
    assert out.num_points == mesh.num_points
    moved = np.linalg.norm(out.points - mesh.points, axis=1)
    assert moved.max() > 0.1
    assert "fd_falloff" in out.point_attrs  # sidecar attrs survived
    assert (tmp_path / "d.npz").exists()


def test_cli_deform_morphspace_and_flags(tmp_path, rng):
    mesh = _write_inputs(tmp_path, rng)
    blend = Mesh(points=mesh.points + 0.05 * rng.standard_normal(
        (mesh.num_points, 3)).astype(np.float32))
    save_obj(str(tmp_path / "blend.obj"), blend)
    rc = main([
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "-o", str(tmp_path / "out2.obj"),
        "--blend", str(tmp_path / "blend.obj"),
        "--model", "multilayer", "--layers", "2", "--radius", "1.5",
        "--morphspace", "--clamp-weights", "--weight-range", "-1", "1",
        "--tangent", "--falloff",
    ])
    assert rc == 0
    out = load_obj(str(tmp_path / "out2.obj"))
    assert "weights" in out.detail_attrs


def test_cli_blend_glb_expands_morph_targets(tmp_path, rng, capsys):
    """One --blend .glb carrying K morph targets expands into K
    blendshapes and cooks identically to K separate --blend OBJs."""
    from facedeform_tpu.geometry.gltf_io import save_glb_morph

    mesh = _write_inputs(tmp_path, rng)
    shapes = np.stack([
        mesh.points + 0.05 * rng.standard_normal(
            (mesh.num_points, 3)).astype(np.float32)
        for _ in range(2)
    ])
    save_glb_morph(str(tmp_path / "blends.glb"), mesh, shapes,
                   animate=False)
    for k in range(2):
        save_obj(str(tmp_path / f"b{k}.obj"), Mesh(points=shapes[k]))

    common = [
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "--morphspace",
    ]
    rc = main(common + ["-o", str(tmp_path / "via_glb.obj"),
                        "--blend", str(tmp_path / "blends.glb")])
    assert rc == 0
    assert "expanded 2 morph targets" in capsys.readouterr().err
    rc = main(common + ["-o", str(tmp_path / "via_obj.obj"),
                        "--blend", str(tmp_path / "b0.obj"),
                        "--blend", str(tmp_path / "b1.obj")])
    assert rc == 0
    a = load_obj(str(tmp_path / "via_glb.obj"))
    b = load_obj(str(tmp_path / "via_obj.obj"))
    np.testing.assert_allclose(a.points, b.points, atol=1e-6)
    np.testing.assert_allclose(
        a.detail_attrs["weights"], b.detail_attrs["weights"], atol=1e-6
    )


def test_cli_deform_seq_batch_matches_per_frame(tmp_path):
    """--batch (one dispatch for frames 1+) must write the same frames as
    the per-frame node loop, and must fall back cleanly when the config
    needs full per-frame semantics (tangent)."""
    import numpy as np

    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(12, 12)
    rig_pts = fibonacci_points(20)
    mesh_p = str(tmp_path / "mesh.geo")
    rig_p = str(tmp_path / "rig.geo")
    save_geo(mesh_p, mesh)
    save_geo(rig_p, Mesh(points=rig_pts))
    rig_frames = []
    for f in range(4):
        p = str(tmp_path / f"posed{f}.geo")
        save_geo(p, Mesh(points=rig_pts * (1.0 + 0.03 * (f + 1))))
        rig_frames.append(p)

    base_args = ["deform-seq", mesh_p, rig_p, *rig_frames,
                 "--out-pattern", "f_%02d.geo", "--radius", "2.0"]
    assert main(base_args + ["-o", str(tmp_path / "ref")]) == 0
    assert main(base_args + ["-o", str(tmp_path / "bat"), "--batch"]) == 0
    for f in range(4):
        ref = load_geo(str(tmp_path / "ref" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "bat" / f"f_{f:02d}.geo"))
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5,
                                   err_msg=f"frame {f}")
        np.testing.assert_allclose(
            got.point_attrs["fd_falloff"], ref.point_attrs["fd_falloff"],
            atol=1e-6,
        )

    # tangent rides the batch path too (fused per-frame projection):
    # must match the per-frame node loop
    assert main(base_args + ["-o", str(tmp_path / "tanref"),
                             "--tangent"]) == 0
    assert main(base_args + ["-o", str(tmp_path / "tan"), "--batch",
                             "--tangent"]) == 0
    for f in range(4):
        ref = load_geo(str(tmp_path / "tanref" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "tan" / f"f_{f:02d}.geo"))
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5,
                                   err_msg=f"tangent frame {f}")

    # morphspace blends ride the batch path too: ONE vmapped DBSE weight
    # solve + reconstruction for frames 1+ must match per-frame node cooks
    # (positions AND the per-frame weights detail attr), including the
    # weight clamp and the dofalloff-gated falloffradius residual term
    blend_p = str(tmp_path / "blend.geo")
    blend2_p = str(tmp_path / "blend2.geo")
    save_geo(blend_p, Mesh(points=(mesh.points * 1.01).astype(np.float32),
                           faces=mesh.faces))
    save_geo(blend2_p, Mesh(
        points=(mesh.points + np.float32([0, 0.02, 0])).astype(np.float32),
        faces=mesh.faces))
    morph_args = base_args + [
        "--morphspace", "--blend", blend_p, "--blend", blend2_p,
        "--clamp-weights", "--weight-range", "-0.5", "0.5",
        "--falloff", "--falloff-radius", "0.3",
    ]
    assert main(morph_args + ["-o", str(tmp_path / "mref")]) == 0
    assert main(morph_args + ["-o", str(tmp_path / "mbat"),
                              "--batch"]) == 0
    # --save-deformer makes the batch fit cover frame 0 too (fit_all) and
    # then trims it from the written frames — the weights/ok masks must
    # stay aligned with the written frames through that trim
    assert main(morph_args + ["-o", str(tmp_path / "msav"), "--batch",
                              "--save-deformer",
                              str(tmp_path / "mshot.npz")]) == 0
    for f in range(4):
        ref = load_geo(str(tmp_path / "mref" / f"f_{f:02d}.geo"))
        for variant in ("mbat", "msav"):
            got = load_geo(str(tmp_path / variant / f"f_{f:02d}.geo"))
            np.testing.assert_allclose(
                got.points, ref.points, atol=2e-5,
                err_msg=f"morph frame {f} ({variant})")
            np.testing.assert_allclose(
                got.detail_attrs["weights"], ref.detail_attrs["weights"],
                atol=2e-5, err_msg=f"morph weights frame {f} ({variant})",
            )


def test_cli_deform_seq_batch_pu_matches_per_frame(tmp_path):
    """solver=pu rides --batch through ops.pu.fit_pu_frames (one patch
    factorization for all frames, shared eval plan): output must match
    the per-frame node loop's independent PU fits."""
    import numpy as np

    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(12, 12)
    rig_pts = fibonacci_points(20)
    mesh_p = str(tmp_path / "mesh.geo")
    rig_p = str(tmp_path / "rig.geo")
    save_geo(mesh_p, mesh)
    save_geo(rig_p, Mesh(points=rig_pts))
    rig_frames = []
    for f in range(3):
        p = str(tmp_path / f"posed{f}.geo")
        save_geo(p, Mesh(points=rig_pts * (1.0 + 0.03 * (f + 1))))
        rig_frames.append(p)

    base_args = ["deform-seq", mesh_p, rig_p, *rig_frames,
                 "--out-pattern", "f_%02d.geo", "--radius", "2.0",
                 "--solver", "pu"]
    assert main(base_args + ["-o", str(tmp_path / "ref")]) == 0
    assert main(base_args + ["-o", str(tmp_path / "bat"), "--batch"]) == 0
    for f in range(3):
        ref = load_geo(str(tmp_path / "ref" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "bat" / f"f_{f:02d}.geo"))
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5,
                                   err_msg=f"pu frame {f}")
        np.testing.assert_allclose(
            got.point_attrs["fd_falloff"], ref.point_attrs["fd_falloff"],
            atol=1e-6,
        )

    # tangent composes on the PU batch path too
    assert main(base_args + ["-o", str(tmp_path / "tanref"),
                             "--tangent"]) == 0
    assert main(base_args + ["-o", str(tmp_path / "tan"), "--batch",
                             "--tangent"]) == 0
    for f in range(3):
        ref = load_geo(str(tmp_path / "tanref" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "tan" / f"f_{f:02d}.geo"))
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5,
                                   err_msg=f"pu tangent frame {f}")

    # morphspace composes on the PU batch path too (batched DBSE weight
    # solve off the shared-factorization eval's positions)
    blend_p = str(tmp_path / "blend.geo")
    save_geo(blend_p, Mesh(points=(mesh.points * 1.02).astype(np.float32),
                           faces=mesh.faces))
    morph_args = base_args + ["--morphspace", "--blend", blend_p]
    assert main(morph_args + ["-o", str(tmp_path / "pmref")]) == 0
    assert main(morph_args + ["-o", str(tmp_path / "pmbat"),
                              "--batch"]) == 0
    for f in range(3):
        ref = load_geo(str(tmp_path / "pmref" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "pmbat" / f"f_{f:02d}.geo"))
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5,
                                   err_msg=f"pu morph frame {f}")
        np.testing.assert_allclose(
            got.detail_attrs["weights"], ref.detail_attrs["weights"],
            atol=2e-5, err_msg=f"pu morph weights frame {f}",
        )


def test_cli_load_deformer_resume(tmp_path):
    """deform --load-deformer: fit once, resume across process boundaries
    — output matches the fitting run; sequence checkpoints are refused
    with a pointed error."""
    import numpy as np

    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.obj_io import load_obj
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh_p = str(tmp_path / "m.geo")
    rig_p = str(tmp_path / "r.geo")
    drig_p = str(tmp_path / "d.geo")
    save_geo(mesh_p, uv_sphere(10, 10))
    rig = fibonacci_points(25)
    save_geo(rig_p, Mesh(points=rig))
    save_geo(drig_p, Mesh(points=(rig * 1.06).astype(np.float32)))
    out1 = str(tmp_path / "o1.obj")
    out2 = str(tmp_path / "o2.obj")
    ck = str(tmp_path / "d.npz")
    rc = main(["deform", mesh_p, rig_p, drig_p, "-o", out1,
               "--kernel", "multiquadric", "--model", "kernel",
               "--save-deformer", ck])
    assert rc == 0
    # resume WITHOUT the solve flags: the checkpoint's kernel must win
    rc = main(["deform", mesh_p, rig_p, drig_p, "-o", out2,
               "--load-deformer", ck])
    assert rc == 0
    np.testing.assert_array_equal(
        load_obj(out2).points, load_obj(out1).points
    )

    # a sequence checkpoint is refused
    from facedeform_tpu import DeformConfig, DeformParams
    from facedeform_tpu.parallel import batched
    from facedeform_tpu.utils import checkpoint
    import jax.numpy as jnp

    frames = np.stack([rig * s for s in (1.0, 1.1)]).astype(np.float32)
    model, resid = batched.fit_frames(
        jnp.asarray(rig), jnp.asarray(frames), DeformConfig(), DeformParams()
    )
    seq_ck = str(tmp_path / "seq.npz")
    checkpoint.save_seq(seq_ck, model, DeformConfig(), DeformParams(), resid)
    rc = main(["deform", mesh_p, rig_p, drig_p, "-o", out2,
               "--load-deformer", seq_ck])
    assert rc == 1


def test_cli_deform_seq_out_velocity(tmp_path):
    """--out-velocity writes Trail-SOP-style backward-difference v attrs:
    identical between the batch and per-frame paths, consistent with the
    written positions, and forward-difference on frame 0."""
    import numpy as np

    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(10, 10)
    rig_pts = fibonacci_points(20)
    save_geo(str(tmp_path / "mesh.geo"), mesh)
    save_geo(str(tmp_path / "rig.geo"), Mesh(points=rig_pts))
    rig_frames = []
    for f in range(3):
        p = str(tmp_path / f"posed{f}.geo")
        save_geo(p, Mesh(points=rig_pts * (1.0 + 0.04 * (f + 1))))
        rig_frames.append(p)

    fps = 24.0
    base = ["deform-seq", str(tmp_path / "mesh.geo"),
            str(tmp_path / "rig.geo"), *rig_frames,
            "--out-pattern", "f_%02d.geo", "--radius", "2.0",
            "--out-velocity", str(fps)]
    assert main(base + ["-o", str(tmp_path / "pf")]) == 0
    assert main(base + ["-o", str(tmp_path / "bt"), "--batch"]) == 0

    pf = [load_geo(str(tmp_path / "pf" / f"f_{f:02d}.geo")) for f in range(3)]
    bt = [load_geo(str(tmp_path / "bt" / f"f_{f:02d}.geo")) for f in range(3)]
    for f in range(3):
        assert "v" in pf[f].point_attrs, f"frame {f} missing v"
        np.testing.assert_allclose(
            bt[f].point_attrs["v"], pf[f].point_attrs["v"], atol=2e-3,
            err_msg=f"batch vs per-frame v, frame {f}",
        )
    # backward difference of the written positions (frame 0: forward)
    np.testing.assert_allclose(
        pf[2].point_attrs["v"], (pf[2].points - pf[1].points) * fps,
        atol=1e-4)
    np.testing.assert_allclose(
        pf[0].point_attrs["v"], (pf[1].points - pf[0].points) * fps,
        atol=1e-4)

    # single-frame sequence: zero velocity, attr still present
    assert main(["deform-seq", str(tmp_path / "mesh.geo"),
                 str(tmp_path / "rig.geo"), rig_frames[0],
                 "--out-pattern", "f_%02d.geo", "--radius", "2.0",
                 "--out-velocity", str(fps),
                 "-o", str(tmp_path / "one")]) == 0
    one = load_geo(str(tmp_path / "one" / "f_00.geo"))
    np.testing.assert_allclose(one.point_attrs["v"], 0.0)


def test_cli_deform_seq_batch_transport_matches_per_frame(tmp_path):
    """--batch with --update-normals/--transform-attrs/--output-stretch
    rides batched.transport_frames (one dispatch) and must write the
    same attrs as the per-frame node loop."""
    import numpy as np

    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    rng = np.random.default_rng(11)
    mesh = uv_sphere(10, 10)
    mesh.set_attr("N", (mesh.points / np.linalg.norm(
        mesh.points, axis=1, keepdims=True)).astype(np.float32))
    mesh.set_attr("vel", rng.standard_normal(
        (mesh.num_points, 3)).astype(np.float32))
    rig_pts = fibonacci_points(20)
    save_geo(str(tmp_path / "mesh.geo"), mesh)
    save_geo(str(tmp_path / "rig.geo"), Mesh(points=rig_pts))
    rig_frames = []
    for f in range(3):
        p = str(tmp_path / f"posed{f}.geo")
        save_geo(p, Mesh(points=rig_pts * (1.0 + 0.05 * (f + 1))))
        rig_frames.append(p)

    base = ["deform-seq", str(tmp_path / "mesh.geo"),
            str(tmp_path / "rig.geo"), *rig_frames,
            "--out-pattern", "f_%02d.geo", "--radius", "2.0",
            "--update-normals", "--transform-attrs", "vel",
            "--output-stretch"]
    assert main(base + ["-o", str(tmp_path / "pf")]) == 0
    assert main(base + ["-o", str(tmp_path / "bt"), "--batch"]) == 0
    for f in range(3):
        ref = load_geo(str(tmp_path / "pf" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "bt" / f"f_{f:02d}.geo"))
        for name in ("N", "vel", "fd_stretch", "fd_compress"):
            np.testing.assert_allclose(
                got.point_attrs[name], ref.point_attrs[name], atol=2e-4,
                err_msg=f"frame {f} attr {name}",
            )
        np.testing.assert_allclose(got.points, ref.points, atol=2e-5)
    # the transport is real: later frames stretch more
    s1 = load_geo(str(tmp_path / "bt" / "f_01.geo")).point_attrs["fd_stretch"]
    s2 = load_geo(str(tmp_path / "bt" / "f_02.geo")).point_attrs["fd_stretch"]
    assert s2.mean() > s1.mean() > 1.0

    # --batch + --save-deformer + transport compose (fit_all covers
    # frame 0; transported attrs still align per frame)
    assert main(base + ["-o", str(tmp_path / "ck"), "--batch",
                        "--save-deformer", str(tmp_path / "shot.npz")]) == 0
    for f in range(3):
        ref = load_geo(str(tmp_path / "pf" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "ck" / f"f_{f:02d}.geo"))
        np.testing.assert_allclose(
            got.point_attrs["N"], ref.point_attrs["N"], atol=2e-4,
            err_msg=f"ckpt frame {f}",
        )

    # solver=pu: batch transport rides per-frame Jacobians off the shared
    # patch factorization (no refits) and must match per-frame cooks
    pu = base + ["--solver", "pu", "--lambda", "0.01"]
    assert main(pu + ["-o", str(tmp_path / "pupf")]) == 0
    assert main(pu + ["-o", str(tmp_path / "pubt"), "--batch"]) == 0
    for f in range(3):
        ref = load_geo(str(tmp_path / "pupf" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "pubt" / f"f_{f:02d}.geo"))
        for name in ("N", "vel", "fd_stretch"):
            np.testing.assert_allclose(
                got.point_attrs[name], ref.point_attrs[name], atol=5e-4,
                err_msg=f"pu frame {f} attr {name}",
            )


def test_cli_deform_seq_orient_sign_continuity(tmp_path):
    """A rig rotating through >180 deg across the shot must write orient
    quats without hemisphere pops (consecutive frames' quats never flip
    sign) on BOTH the per-frame and batch paths — each frame's polar
    quaternion is canonicalized independently, so the CLI chains signs."""
    import numpy as np

    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere

    mesh = uv_sphere(8, 8)
    q0 = np.tile(np.float32([0, 0, 0, 1]), (mesh.num_points, 1))
    mesh.set_attr("orient", q0)
    rig = fibonacci_points(30)
    save_geo(str(tmp_path / "mesh.geo"), mesh)
    save_geo(str(tmp_path / "rig.geo"), Mesh(points=rig))
    frames = []
    n_frames = 6
    for f in range(n_frames):
        ang = 0.55 * (f + 1)               # up to ~3.3 rad > pi
        c, s = np.cos(ang), np.sin(ang)
        r = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        p = str(tmp_path / f"posed{f}.geo")
        save_geo(p, Mesh(points=(rig @ r.T).astype(np.float32)))
        frames.append(p)

    base = ["deform-seq", str(tmp_path / "mesh.geo"),
            str(tmp_path / "rig.geo"), *frames,
            "--out-pattern", "f_%02d.geo", "--radius", "2.0",
            "--term", "linear", "--transform-attrs", "orient"]
    for outdir, extra in (("pf", []), ("bt", ["--batch"])):
        assert main(base + ["-o", str(tmp_path / outdir)] + extra) == 0
        prev = None
        for f in range(n_frames):
            q = load_geo(
                str(tmp_path / outdir / f"f_{f:02d}.geo")
            ).point_attrs["orient"]
            if prev is not None:
                dots = np.sum(q * prev, axis=1)
                assert (dots > 0).all(), (
                    f"{outdir}: hemisphere pop at frame {f} "
                    f"(min dot {dots.min():.3f})"
                )
            prev = q


def test_cli_deform_seq_recompute_normals(tmp_path):
    """--recompute-normals writes per-frame geometric N on both seq
    paths, overriding the analytic transport."""
    import numpy as np

    from facedeform_tpu.cli import main
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.mesh import Mesh
    from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
    from facedeform_tpu.geometry.topology import vertex_normals

    mesh = uv_sphere(10, 10)
    mesh.set_attr("N", np.zeros((mesh.num_points, 3), np.float32))
    rig_pts = fibonacci_points(20)
    save_geo(str(tmp_path / "mesh.geo"), mesh)
    save_geo(str(tmp_path / "rig.geo"), Mesh(points=rig_pts))
    frames = []
    for f in range(3):
        p = str(tmp_path / f"posed{f}.geo")
        save_geo(p, Mesh(points=rig_pts * (1.0 + 0.05 * (f + 1))))
        frames.append(p)
    base = ["deform-seq", str(tmp_path / "mesh.geo"),
            str(tmp_path / "rig.geo"), *frames,
            "--out-pattern", "f_%02d.geo", "--radius", "2.0",
            "--recompute-normals"]
    assert main(base + ["-o", str(tmp_path / "pf")]) == 0
    assert main(base + ["-o", str(tmp_path / "bt"), "--batch"]) == 0
    for f in range(3):
        ref = load_geo(str(tmp_path / "pf" / f"f_{f:02d}.geo"))
        got = load_geo(str(tmp_path / "bt" / f"f_{f:02d}.geo"))
        np.testing.assert_allclose(
            got.point_attrs["N"], ref.point_attrs["N"], atol=2e-4,
            err_msg=f"frame {f}")
        # matches the geometric normals of the written surface
        np.testing.assert_allclose(
            got.point_attrs["N"], vertex_normals(got), atol=1e-4)
        assert np.abs(got.point_attrs["N"]).max() > 0.5  # not the zeros


def test_cli_invert_roundtrip(tmp_path, rng, capsys):
    """invert recovers a rig whose forward cook reproduces the target:
    forward deform -> invert -> --refit round trip stays tight."""
    mesh = _write_inputs(tmp_path, rng)
    rc = main([
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "-o", str(tmp_path / "target.obj"),
    ])
    assert rc == 0
    rc = main([
        "invert", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "target.obj"), "-o", str(tmp_path / "rec_rig.obj"),
        "--ridge", "1e-8", "--refit", str(tmp_path / "refit.obj"),
        "--timing",
    ])
    assert rc == 0
    rec = load_obj(str(tmp_path / "rec_rig.obj"))
    true_rig = load_obj(str(tmp_path / "drig.obj"))
    assert rec.num_points == true_rig.num_points
    refit = load_obj(str(tmp_path / "refit.obj"))
    target = load_obj(str(tmp_path / "target.obj"))
    assert np.abs(refit.points - target.points).max() < 5e-4
    err = capsys.readouterr().err
    assert "inverse fit (closed-form)" in err
    assert "round trip" in err


def test_cli_invert_group_and_guards(tmp_path, rng, capsys):
    """--group restricts the constraint set; oversize rigs and point-count
    mismatches error out before any heavy work."""
    mesh = _write_inputs(tmp_path, rng)
    rc = main([
        "deform", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "drig.obj"), "-o", str(tmp_path / "target.obj"),
        "--group", "0-399",
    ])
    assert rc == 0
    rc = main([
        "invert", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "target.obj"), "-o", str(tmp_path / "rec_rig.obj"),
        "--group", "0-399", "--ridge", "1e-8",
        "--refit", str(tmp_path / "refit.obj"),
    ])
    assert rc == 0
    refit = load_obj(str(tmp_path / "refit.obj"))
    target = load_obj(str(tmp_path / "target.obj"))
    # round trip within the group; outside it neither pass moved points
    assert np.abs(refit.points - target.points).max() < 5e-4

    # guard: target topology mismatch
    save_obj(str(tmp_path / "bad.obj"), Mesh(points=mesh.points[:-1]))
    rc = main([
        "invert", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "bad.obj"), "-o", str(tmp_path / "x.obj"),
    ])
    assert rc == 1
    assert "must keep the topology" in capsys.readouterr().err

    # guard: rig past the dense limit refuses cleanly (checked before
    # capture/fit — keep it cheap with a fake huge rig)
    big = Mesh(points=rng.standard_normal((9000, 3)).astype(np.float32))
    save_obj(str(tmp_path / "bigrig.obj"), big)
    rc = main([
        "invert", str(tmp_path / "mesh.obj"), str(tmp_path / "bigrig.obj"),
        str(tmp_path / "target.obj"), "-o", str(tmp_path / "x.obj"),
    ])
    assert rc == 1
    assert "dense limit" in capsys.readouterr().err


def test_cli_deform_seq_gltf_export(tmp_path):
    """deform-seq --gltf writes a morph-target .glb whose keyframes
    reconstruct the written per-frame geometry exactly, on both the
    per-frame and the --batch paths."""
    from facedeform_tpu.geometry import gltf_io
    from facedeform_tpu.geometry.geo_io import load_geo, save_geo
    from facedeform_tpu.geometry.primitives import fibonacci_points

    mesh = uv_sphere(10, 10)
    rig_pts = fibonacci_points(18)
    mesh_p = str(tmp_path / "mesh.geo")
    rig_p = str(tmp_path / "rig.geo")
    save_geo(mesh_p, mesh)
    save_geo(rig_p, Mesh(points=rig_pts))
    rig_frames = []
    for f in range(3):
        p = str(tmp_path / f"posed{f}.geo")
        save_geo(p, Mesh(points=rig_pts * (1.0 + 0.05 * (f + 1))))
        rig_frames.append(p)

    base = ["deform-seq", mesh_p, rig_p, *rig_frames,
            "--out-pattern", "f_%02d.geo", "--radius", "2.0"]
    for tag, extra in (("pf", []), ("bat", ["--batch"])):
        glb_p = str(tmp_path / f"{tag}.glb")
        outdir = tmp_path / tag
        assert main(base + ["-o", str(outdir), "--gltf", glb_p,
                            "--gltf-fps", "12", *extra]) == 0
        gltf, blob = gltf_io.load_glb(glb_p)
        prim = gltf["meshes"][0]["primitives"][0]
        rest = gltf_io.read_accessor(
            gltf, blob, prim["attributes"]["POSITION"]
        )
        np.testing.assert_allclose(rest, mesh.points, atol=0)
        assert len(prim["targets"]) == 3
        for f in range(3):
            want = load_geo(str(outdir / f"f_{f:02d}.geo")).points
            delta = gltf_io.read_accessor(
                gltf, blob, prim["targets"][f]["POSITION"]
            )
            np.testing.assert_allclose(
                rest + delta, want, atol=1e-6,
                err_msg=f"{tag} frame {f}",
            )


def test_cli_warm_precompiles(capsys):
    """`warm` runs the fit + both eval kernels (+ frames) at the given
    shapes and prints one JSON timing line."""
    import json as _json

    rc = main([
        "warm", "--verts", "256", "--controls", "12", "--frames", "2",
    ])
    assert rc == 0
    out = capsys.readouterr()
    timings = _json.loads(out.out.strip().splitlines()[-1])
    # on the CPU test platform the eval warms the dense XLA path
    for k in ("fit", "eval_dense", "frames", "total"):
        assert k in timings and timings[k] >= 0.0
    assert "warming programs" in out.err


def test_cli_warm_pu_route(capsys):
    """`warm --solver pu` precompiles the PU fit + tile eval (+ the
    sequence programs with --frames) and reports the warmed patch-width
    bucket (round-4 verdict: the 307 s PU cold compile was unwarmable)."""
    import json as _json

    rc = main([
        "warm", "--solver", "pu", "--controls", "300", "--queries", "800",
        "--frames", "2",
    ])
    assert rc == 0
    out = capsys.readouterr()
    timings = _json.loads(out.out.strip().splitlines()[-1])
    for k in ("pu_fit", "pu_eval", "pu_seq_fit", "pu_seq_eval",
              "patch_width", "total"):
        assert k in timings, k
    assert timings["patch_width"] % 64 == 0  # bucketed width


def test_cli_warm_aux_programs(capsys):
    """--transport / --skin / --dbse warm the transport, skinning and
    morphspace program sets on top of the dense core."""
    import json as _json

    rc = main([
        "warm", "--verts", "300", "--controls", "12", "--transport",
        "--skin", "--bones", "3", "--poses", "2", "--dbse", "--shapes", "2",
    ])
    assert rc == 0
    out = capsys.readouterr()
    timings = _json.loads(out.out.strip().splitlines()[-1])
    for k in ("fit", "transport_normals", "transport_morph_composed",
              "skin_fit", "skin_apply", "dbse_build", "dbse_weights",
              "dbse_reconstruct", "total"):
        assert k in timings, k
