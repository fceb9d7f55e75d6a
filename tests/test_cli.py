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
