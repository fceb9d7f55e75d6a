"""bake-skin CLI + skinning checkpoint codec: deformer -> LBS export."""

import numpy as np
import pytest

from facedeform_tpu.cli import main
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.obj_io import load_obj, save_obj
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.ops import skinning
from facedeform_tpu.utils import checkpoint


def _write_sweep(tmp_path, n_poses=3):
    """Rest mesh + rig + a sweep of posed rigs scaling one bump."""
    mesh = uv_sphere(20, 20)
    rig = Mesh(points=fibonacci_points(25))
    bump = 0.3 * np.exp(
        -2 * np.sum((rig.points - [0, 1, 0]) ** 2, -1, keepdims=True)
    )
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), rig)
    paths = []
    for i in range(n_poses):
        s = (i + 1) / n_poses
        posed = Mesh(points=rig.points + s * bump * np.float32([0, 1, 0]))
        p = str(tmp_path / f"rig_{i}.obj")
        save_obj(p, posed)
        paths.append(p)
    return mesh, paths


def test_cli_bake_skin_end_to_end(tmp_path, capsys):
    mesh, rig_paths = _write_sweep(tmp_path)
    out = str(tmp_path / "skin.npz")
    rc = main([
        "bake-skin", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        *rig_paths, "-o", out, "--bones", "8", "--max-influences", "4",
        "--write-frames", str(tmp_path / "qc"), "--timing",
    ])
    assert rc == 0
    model, report = checkpoint.load_skinning(out)
    assert model.n_bones == 8
    assert model.n_frames == len(rig_paths)
    assert model.weights.shape == (mesh.num_points, 8)
    assert report is not None and report.relative_rmse < 0.01
    w = np.asarray(model.weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    assert ((w > 1e-6).sum(-1) <= 4).all()
    # QC frames written and consistent with the checkpointed model
    qc0 = load_obj(str(tmp_path / "qc" / "frame_0000.obj"))
    want = np.asarray(skinning.lbs_apply(
        model.weights, model.rest, model.rotations[0], model.translations[0]
    ))
    np.testing.assert_allclose(qc0.points, want, atol=2e-4)


def test_cli_bake_skin_gltf_export(tmp_path, capsys):
    from facedeform_tpu.geometry import gltf_io

    mesh, rig_paths = _write_sweep(tmp_path, n_poses=2)
    out = str(tmp_path / "skin.npz")
    glb = str(tmp_path / "skin.glb")
    rc = main([
        "bake-skin", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        *rig_paths, "-o", out, "--bones", "6", "--gltf", glb,
        "--gltf-fps", "12",
    ])
    assert rc == 0
    gltf, blob = gltf_io.load_glb(glb)
    assert len(gltf["skins"][0]["joints"]) == 6
    assert len(gltf["animations"][0]["channels"]) == 12  # rot+trans per bone
    prim = gltf["meshes"][0]["primitives"][0]
    pos = gltf_io.read_accessor(gltf, blob, prim["attributes"]["POSITION"])
    np.testing.assert_allclose(pos, mesh.points, atol=0)
    times = gltf_io.read_accessor(
        gltf, blob, gltf["animations"][0]["samplers"][0]["input"]
    )
    np.testing.assert_allclose(times, [0.0, 1.0 / 12.0], atol=1e-7)


def test_cli_bake_skin_smooth_weights_and_tree(tmp_path, capsys):
    """--smooth-weights reports boundary roughness (and persists it in
    the checkpoint); the default .glb carries the joint tree while
    --flat-bones restores the flat layout."""
    from facedeform_tpu.geometry import gltf_io

    mesh, rig_paths = _write_sweep(tmp_path)
    out = str(tmp_path / "skin.npz")
    glb = str(tmp_path / "skin.glb")
    rc = main([
        "bake-skin", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        *rig_paths, "-o", out, "--bones", "6", "--max-influences", "4",
        "--smooth-weights", "0.1", "--gltf", glb,
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "boundary roughness" in err
    assert "joint tree" in err
    _, report = checkpoint.load_skinning(out)
    assert report is not None and report.weight_roughness is not None
    gltf, _ = gltf_io.load_glb(glb)
    assert len(gltf["nodes"][1]["children"]) == 1      # single tree root

    rc = main([
        "bake-skin", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        *rig_paths, "-o", out, "--bones", "6", "--max-influences", "4",
        "--gltf", glb, "--flat-bones",
    ])
    assert rc == 0
    gltf, _ = gltf_io.load_glb(glb)
    assert len(gltf["nodes"][1]["children"]) == 6      # flat joint list


def test_cli_bake_skin_from_meshes(tmp_path):
    """--from-meshes bypasses the deformer: decompose given posed meshes."""
    mesh = uv_sphere(16, 16)
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), Mesh(points=fibonacci_points(5)))
    # two rigid poses of the whole mesh
    c, s = np.cos(0.4), np.sin(0.4)
    r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    paths = []
    for i, p in enumerate([mesh.points @ r.T, mesh.points + [0.1, 0, 0.2]]):
        path = str(tmp_path / f"pose_{i}.obj")
        save_obj(path, Mesh(points=p.astype(np.float32)))
        paths.append(path)
    out = str(tmp_path / "skin.npz")
    rc = main([
        "bake-skin", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        *paths, "-o", out, "--from-meshes", "--bones", "1",
        "--max-influences", "1",
    ])
    assert rc == 0
    model, report = checkpoint.load_skinning(out)
    assert report.rmse < 1e-4  # rigid motion: one bone is exact


def test_cli_bake_skin_from_meshes_count_mismatch(tmp_path, capsys):
    mesh = uv_sphere(10, 10)
    save_obj(str(tmp_path / "mesh.obj"), mesh)
    save_obj(str(tmp_path / "rig.obj"), Mesh(points=fibonacci_points(5)))
    save_obj(str(tmp_path / "bad.obj"), Mesh(points=fibonacci_points(7)))
    rc = main([
        "bake-skin", str(tmp_path / "mesh.obj"), str(tmp_path / "rig.obj"),
        str(tmp_path / "bad.obj"), "-o", str(tmp_path / "skin.npz"),
        "--from-meshes",
    ])
    assert rc == 1
    assert "point counts differ" in capsys.readouterr().err


def test_skinning_checkpoint_roundtrip_and_kind(tmp_path, rng):
    import jax.numpy as jnp

    v, b, f = 30, 4, 2
    w = rng.random((v, b)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    model = skinning.SkinningModel(
        weights=jnp.asarray(w),
        rotations=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (f, b, 1, 1))),
        translations=jnp.asarray(rng.normal(size=(f, b, 3)).astype(np.float32)),
        rest=jnp.asarray(rng.normal(size=(v, 3)).astype(np.float32)),
    )
    report = skinning.SkinningReport(rmse=0.01, max_err=0.05, bbox_diag=2.0)
    path = str(tmp_path / "skin.npz")
    checkpoint.save_skinning(path, model, report)
    assert checkpoint.kind(path) == "skin"
    got, rep = checkpoint.load_skinning(path)
    np.testing.assert_array_equal(np.asarray(got.weights), w)
    np.testing.assert_array_equal(
        np.asarray(got.translations), np.asarray(model.translations)
    )
    assert rep.rmse == pytest.approx(0.01)
    assert rep.bbox_diag == pytest.approx(2.0)
    # wrong-codec guards
    with pytest.raises(ValueError, match="skinning checkpoint"):
        checkpoint.load(path)
    checkpoint.save(str(tmp_path / "dense.npz"), _tiny_deformer())
    with pytest.raises(ValueError, match="not a skinning checkpoint"):
        checkpoint.load_skinning(str(tmp_path / "dense.npz"))
    with pytest.raises(ValueError, match="expects a SkinningModel"):
        checkpoint.save_skinning(str(tmp_path / "x.npz"), object())


def _tiny_deformer():
    from facedeform_tpu.deformer import Deformer

    rig = fibonacci_points(10)
    return Deformer.fit(rig, rig + np.float32([0, 0.1, 0]))
