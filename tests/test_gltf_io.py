"""glTF .glb export (geometry/gltf_io.py): structure, LBS parity, quats."""

import json
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from facedeform_tpu.geometry import gltf_io
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.ops import skinning


def _rotation(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(angle) * k
            + (1 - np.cos(angle)) * (k @ k))


def _quat_to_mat_np(q):
    """glTF (x, y, z, w) quaternion -> rotation matrix, f64 reference."""
    x, y, z, w = [np.asarray(v, np.float64) for v in np.moveaxis(q, -1, 0)]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], -2)


def test_rot_to_quat_roundtrip(rng):
    angles = np.concatenate([
        rng.uniform(-np.pi, np.pi, 40),
        [np.pi - 1e-5, -np.pi + 1e-5, np.pi, 1e-8],  # near-180 + tiny
    ])
    rots = np.stack([
        _rotation(rng.normal(size=3), a) for a in angles
    ])
    q = gltf_io._rot_to_quat(rots)
    back = _quat_to_mat_np(q)
    assert np.abs(back - rots).max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)


def test_save_glb_static_roundtrip(tmp_path):
    mesh = uv_sphere(8, 8)
    path = str(tmp_path / "static.glb")
    gltf_io.save_glb(path, mesh)
    gltf, blob = gltf_io.load_glb(path)
    assert gltf["asset"]["version"] == "2.0"
    prim = gltf["meshes"][0]["primitives"][0]
    pos = gltf_io.read_accessor(gltf, blob, prim["attributes"]["POSITION"])
    np.testing.assert_allclose(pos, mesh.points, atol=0)
    idx = gltf_io.read_accessor(gltf, blob, prim["indices"])
    np.testing.assert_array_equal(
        idx.reshape(-1, 3), mesh.triangles().astype(idx.dtype)
    )
    acc = gltf["accessors"][prim["attributes"]["POSITION"]]
    np.testing.assert_allclose(acc["min"], mesh.points.min(0), atol=1e-6)
    np.testing.assert_allclose(acc["max"], mesh.points.max(0), atol=1e-6)
    # chunk alignment: total length recorded in the header matches the file
    raw = open(path, "rb").read()
    assert struct.unpack("<I", raw[8:12])[0] == len(raw)
    assert len(raw) % 4 == 0


def test_save_glb_point_cloud_mode(tmp_path):
    cloud = Mesh(points=fibonacci_points(10))
    path = str(tmp_path / "cloud.glb")
    gltf_io.save_glb(path, cloud)
    gltf, _ = gltf_io.load_glb(path)
    prim = gltf["meshes"][0]["primitives"][0]
    assert prim["mode"] == 0 and "indices" not in prim


def test_save_glb_skinned_lbs_parity(tmp_path):
    """Decode JOINTS/WEIGHTS + animation TRS back out of the .glb and
    CPU-evaluate glTF skinning: must equal skinning.lbs_apply."""
    pts = fibonacci_points(200) * np.float32([2.0, 1.0, 1.0])
    left = pts[:, 0] < 0
    frames = []
    for ang in (0.3, -0.5):
        r = _rotation([0, 0, 1], ang).astype(np.float32)
        moved = pts.copy()
        moved[left] = pts[left] @ r.T + np.float32([0.1, 0.0, 0.2]) * ang
        frames.append(moved)
    frames = np.stack(frames)
    model, report = skinning.fit_skinning(
        pts, frames, n_bones=2, max_influences=2, seed=3
    )
    assert report.rmse < 1e-3

    mesh = Mesh(points=pts)
    path = str(tmp_path / "skin.glb")
    gltf_io.save_glb_skinned(path, mesh, model, fps=10.0, hierarchy=False)
    gltf, blob = gltf_io.load_glb(path)

    prim = gltf["meshes"][0]["primitives"][0]
    joints = gltf_io.read_accessor(gltf, blob, prim["attributes"]["JOINTS_0"])
    weights = gltf_io.read_accessor(
        gltf, blob, prim["attributes"]["WEIGHTS_0"]
    )
    np.testing.assert_allclose(weights.sum(-1), 1.0, atol=1e-4)

    skin = gltf["skins"][0]
    ibm = gltf_io.read_accessor(gltf, blob, skin["inverseBindMatrices"])
    np.testing.assert_array_equal(
        ibm, np.tile(np.eye(4, dtype=np.float32).reshape(1, 16), (2, 1))
    )

    anim = gltf["animations"][0]
    n_joints = len(skin["joints"])
    for f in range(model.n_frames):
        # joint globals at keyframe f from the animation channels
        r_j = np.zeros((n_joints, 3, 3), np.float64)
        t_j = np.zeros((n_joints, 3), np.float64)
        for ch in anim["channels"]:
            sampler = anim["samplers"][ch["sampler"]]
            out = gltf_io.read_accessor(gltf, blob, sampler["output"])
            j = skin["joints"].index(ch["target"]["node"])
            if ch["target"]["path"] == "rotation":
                r_j[j] = _quat_to_mat_np(out[f])
            else:
                t_j[j] = out[f]
        # glTF skinning with identity IBM and identity armature parent
        posed = np.einsum("vbij,vj->vbi", r_j[joints], pts.astype(np.float64))
        posed = posed + t_j[joints]
        got = np.einsum("vb,vbi->vi", weights.astype(np.float64), posed)
        want = np.asarray(skinning.lbs_apply(
            model.weights, model.rest,
            model.rotations[f], model.translations[f],
        ))
        assert np.abs(got - want).max() < 1e-4

    times = gltf_io.read_accessor(
        gltf, blob, anim["samplers"][0]["input"]
    )
    np.testing.assert_allclose(times, [0.0, 0.1], atol=1e-7)


def test_save_glb_skinned_hierarchy_roundtrip(tmp_path):
    """Default (hierarchy) export: load the .glb back, verify the joint
    TREE (one root under the armature, every joint reachable), then
    evaluate glTF skinning THE SPEC WAY — world(joint) through the node
    hierarchy from the animation's parent-local TRS, times the inverse
    bind matrices — and require parity with skinning.lbs_apply."""
    pts = fibonacci_points(300) * np.float32([2.0, 1.0, 1.0])
    bands = (pts[:, 0] > -0.7).astype(int) + (pts[:, 0] > 0.7).astype(int)
    frames = []
    for ang in (0.3, -0.4):
        moved = pts.copy()
        for band, s in ((1, 0.5), (2, 1.0)):
            sel = bands == band
            r = _rotation([0, 0, 1], s * ang).astype(np.float32)
            moved[sel] = pts[sel] @ r.T + np.float32([0, 0.1, 0]) * s * ang
        frames.append(moved)
    frames = np.stack(frames)
    model, report = skinning.fit_skinning(
        pts, frames, n_bones=3, max_influences=2, seed=5
    )
    assert report.rmse < 2e-2

    path = str(tmp_path / "tree.glb")
    gltf_io.save_glb_skinned(path, Mesh(points=pts), model, fps=10.0)
    gltf, blob = gltf_io.load_glb(path)

    skin = gltf["skins"][0]
    joints = skin["joints"]
    b = len(joints)
    assert b == 3
    # tree structure: armature has ONE child (the root joint); every
    # joint is reachable from it through children lists
    armature = gltf["nodes"][1]
    assert len(armature["children"]) == 1
    seen = set()
    stack = list(armature["children"])
    parent_of = {}
    while stack:
        n = stack.pop()
        seen.add(n)
        for c in gltf["nodes"][n].get("children", []):
            parent_of[c] = n
            stack.append(c)
    assert seen == set(joints)

    ibm = gltf_io.read_accessor(gltf, blob, skin["inverseBindMatrices"])
    ibm = ibm.reshape(b, 4, 4).transpose(0, 2, 1)     # column-major -> row
    # IBMs are pure -centroid translations, not identity
    assert np.abs(ibm[:, :3, 3]).max() > 1e-3

    prim = gltf["meshes"][0]["primitives"][0]
    jj = gltf_io.read_accessor(gltf, blob, prim["attributes"]["JOINTS_0"])
    ww = gltf_io.read_accessor(gltf, blob, prim["attributes"]["WEIGHTS_0"])

    anim = gltf["animations"][0]
    for f in range(model.n_frames):
        # parent-LOCAL TRS per joint from the animation channels
        loc = {}
        for ch in anim["channels"]:
            sampler = anim["samplers"][ch["sampler"]]
            out = gltf_io.read_accessor(gltf, blob, sampler["output"])
            node = ch["target"]["node"]
            m = loc.setdefault(node, np.eye(4))
            if ch["target"]["path"] == "rotation":
                m[:3, :3] = _quat_to_mat_np(out[f])
            else:
                m[:3, 3] = out[f]
        # world transforms by walking the tree (armature is identity)
        world = {}

        def world_of(n):
            if n not in world:
                m = loc[n]
                p = parent_of.get(n)
                world[n] = m if p is None else world_of(p) @ m
            return world[n]

        skin_mats = np.stack(
            [world_of(n) @ ibm[j] for j, n in enumerate(joints)]
        )                                               # (B, 4, 4)
        hpts = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], -1)
        posed = np.einsum("vbij,vj->vbi", skin_mats[jj], hpts)[..., :3]
        got = np.einsum("vb,vbi->vi", ww.astype(np.float64), posed)
        want = np.asarray(skinning.lbs_apply(
            model.weights, model.rest,
            model.rotations[f], model.translations[f],
        ))
        assert np.abs(got - want).max() < 1e-3, f

    # explicit root is honored; bad root raises
    gltf_io.save_glb_skinned(
        str(tmp_path / "r0.glb"), Mesh(points=pts), model, root=0
    )
    g2, _ = gltf_io.load_glb(str(tmp_path / "r0.glb"))
    assert g2["nodes"][1]["children"] == [2]
    with pytest.raises(ValueError, match="root"):
        gltf_io.save_glb_skinned(
            str(tmp_path / "bad.glb"), Mesh(points=pts), model, root=99
        )


def test_save_glb_morph_roundtrip(tmp_path):
    """Morph-target shot export: per-frame deltas decode back exactly,
    localized frames go sparse, global frames dense, and the weights
    animation is the one-hot identity."""
    mesh = uv_sphere(8, 8)
    rest = mesh.points
    v = mesh.num_points
    f0 = rest.copy()
    f0[:5] += np.float32([0.0, 0.3, 0.0])        # localized -> sparse
    f1 = rest * np.float32(1.1)                  # global -> dense
    f2 = rest.copy()                             # zero delta -> sparse(1)
    frames = np.stack([f0, f1, f2])

    path = str(tmp_path / "shot.glb")
    gltf_io.save_glb_morph(path, mesh, frames, fps=12.0)
    gltf, blob = gltf_io.load_glb(path)

    m = gltf["meshes"][0]
    prim = m["primitives"][0]
    targets = prim["targets"]
    assert len(targets) == 3
    for f in range(3):
        delta = gltf_io.read_accessor(gltf, blob, targets[f]["POSITION"])
        np.testing.assert_allclose(delta, frames[f] - rest, atol=0,
                                   err_msg=f"target {f}")
    # sparse-vs-dense routing: the localized and zero targets omit the
    # dense bufferView; the global target is a plain dense accessor
    acc0 = gltf["accessors"][targets[0]["POSITION"]]
    acc1 = gltf["accessors"][targets[1]["POSITION"]]
    acc2 = gltf["accessors"][targets[2]["POSITION"]]
    assert "sparse" in acc0 and "bufferView" not in acc0
    assert acc0["sparse"]["count"] == 5
    assert "sparse" not in acc1 and "bufferView" in acc1
    assert acc2["sparse"]["count"] == 1  # spec: sparse count >= 1
    # spec: min/max cover the full dense array (zeros included)
    assert acc0["min"][1] == 0.0 and acc0["max"][1] > 0.29

    # default weights show frame 0 in a static viewer
    np.testing.assert_allclose(m["weights"], [1.0, 0.0, 0.0])
    assert m["extras"]["targetNames"] == [
        "frame_0000", "frame_0001", "frame_0002",
    ]

    anim = gltf["animations"][0]
    sampler = anim["samplers"][anim["channels"][0]["sampler"]]
    assert sampler["interpolation"] == "LINEAR"
    assert anim["channels"][0]["target"]["path"] == "weights"
    times = gltf_io.read_accessor(gltf, blob, sampler["input"])
    np.testing.assert_allclose(times, np.arange(3) / 12.0, atol=1e-7)
    w = gltf_io.read_accessor(gltf, blob, sampler["output"])
    np.testing.assert_allclose(w.reshape(3, 3), np.eye(3), atol=0)

    # base POSITION still the rest mesh; container well-formed
    pos = gltf_io.read_accessor(gltf, blob, prim["attributes"]["POSITION"])
    np.testing.assert_allclose(pos, rest, atol=0)
    raw = open(path, "rb").read()
    assert struct.unpack("<I", raw[8:12])[0] == len(raw)

    with pytest.raises(ValueError, match="frame_points"):
        gltf_io.save_glb_morph(path, mesh, frames[0])
    with pytest.raises(ValueError, match="points"):
        gltf_io.save_glb_morph(path, uv_sphere(4, 4), frames)


def test_save_glb_skinned_normals_and_validation(tmp_path, rng):
    mesh = uv_sphere(6, 6)
    n = rng.normal(size=mesh.points.shape).astype(np.float32) * 3.0
    mesh.set_attr("N", n)
    frames = (mesh.points + np.float32([0, 0.2, 0]))[None]
    model, _ = skinning.fit_skinning(
        mesh.points, frames, n_bones=1, max_influences=1, outer_iters=2
    )
    path = str(tmp_path / "n.glb")
    gltf_io.save_glb_skinned(path, mesh, model, animate=False)
    gltf, blob = gltf_io.load_glb(path)
    prim = gltf["meshes"][0]["primitives"][0]
    nn = gltf_io.read_accessor(gltf, blob, prim["attributes"]["NORMAL"])
    np.testing.assert_allclose(
        np.linalg.norm(nn, axis=-1), 1.0, atol=1e-5
    )  # spec requires unit normals
    assert "animations" not in gltf
    # vertex-count mismatch is a clear error
    with pytest.raises(ValueError, match="fitted on"):
        gltf_io.save_glb_skinned(
            str(tmp_path / "bad.glb"), uv_sphere(4, 4), model
        )


def test_glb_as_mesh_input_roundtrip(tmp_path):
    """.glb is a first-class geometry format: save_mesh/load_mesh
    dispatch to gltf_io, and a deform cook consumes the loaded mesh."""
    from facedeform_tpu.geometry import load_mesh, save_mesh

    mesh = uv_sphere(8, 8)
    n = mesh.points / np.linalg.norm(mesh.points, axis=1, keepdims=True)
    mesh.set_attr("N", n.astype(np.float32))
    path = str(tmp_path / "asset.glb")
    save_mesh(path, mesh)
    back = load_mesh(path)
    np.testing.assert_allclose(back.points, mesh.points, atol=0)
    # quads fan to triangles through the glTF writer; topology is
    # preserved as the same triangle set
    np.testing.assert_array_equal(back.faces, mesh.triangles())
    np.testing.assert_allclose(back.attr("N"), n, atol=1e-6)

    # point clouds round-trip as POINTS primitives (a control rig)
    rig = Mesh(points=fibonacci_points(12))
    rig_p = str(tmp_path / "rig.glb")
    save_mesh(rig_p, rig)
    rig2 = load_mesh(rig_p)
    np.testing.assert_allclose(rig2.points, rig.points, atol=0)
    assert rig2.faces is None

    with pytest.raises(ValueError, match="meshes"):
        gltf_io.load_glb_mesh(path, mesh_index=3)


def test_glb_uv_color_roundtrip(tmp_path, rng):
    """uv -> TEXCOORD_0 (V flipped per glTF's top-left origin) and
    Cd -> COLOR_0 survive a save/load round trip exactly; Houdini-style
    (V, 3) uv drops its w component."""
    mesh = uv_sphere(6, 6)
    v = mesh.num_points
    uv3 = np.concatenate(
        [rng.random((v, 2), dtype=np.float32), np.zeros((v, 1), np.float32)],
        axis=1,
    )
    cd = rng.random((v, 3), dtype=np.float32)
    mesh.set_attr("uv", uv3)
    mesh.set_attr("Cd", cd)
    path = str(tmp_path / "uvcd.glb")
    gltf_io.save_glb(path, mesh)

    gltf, blob = gltf_io.load_glb(path)
    attrs = gltf["meshes"][0]["primitives"][0]["attributes"]
    assert "TEXCOORD_0" in attrs and "COLOR_0" in attrs
    st = gltf_io.read_accessor(gltf, blob, attrs["TEXCOORD_0"])
    # written with the V axis flipped for engine texture sampling
    np.testing.assert_allclose(st[:, 1], 1.0 - uv3[:, 1], atol=1e-7)

    back = gltf_io.load_glb_mesh(path)
    np.testing.assert_allclose(back.attr("uv"), uv3[:, :2], atol=1e-7)
    np.testing.assert_allclose(back.attr("Cd"), cd, atol=1e-7)


def test_glb_color_normalized_ubyte(tmp_path, rng):
    """External assets with normalized ubyte COLOR_0 load as [0,1] Cd."""
    mesh = uv_sphere(5, 5)
    path = str(tmp_path / "c8.glb")
    gltf_io.save_glb(path, mesh)
    gltf, blob = gltf_io.load_glb(path)
    # splice a normalized ubyte COLOR_0 accessor into the written asset
    v = mesh.num_points
    c8 = (rng.random((v, 3)) * 255).astype(np.uint8)
    pad = (-c8.nbytes) % 4
    buf = blob + c8.tobytes() + b"\0" * pad
    gltf["bufferViews"].append({
        "buffer": 0, "byteOffset": len(blob), "byteLength": c8.nbytes,
    })
    gltf["accessors"].append({
        "bufferView": len(gltf["bufferViews"]) - 1, "componentType": 5121,
        "count": v, "type": "VEC3", "normalized": True,
    })
    prim = gltf["meshes"][0]["primitives"][0]
    prim["attributes"]["COLOR_0"] = len(gltf["accessors"]) - 1
    gltf["buffers"][0]["byteLength"] = len(buf)
    gltf_io._write_glb(path, gltf, buf)

    back = gltf_io.load_glb_mesh(path)
    np.testing.assert_allclose(
        back.attr("Cd"), c8.astype(np.float32) / 255.0, atol=1e-7
    )


def test_glb_uv_normalized_ushort(tmp_path, rng):
    """Quantized engine assets with normalized ushort TEXCOORD_0 load as
    [0,1] uv (the COLOR_0 rescale rule applies to UVs too)."""
    mesh = uv_sphere(5, 5)
    path = str(tmp_path / "uv16.glb")
    gltf_io.save_glb(path, mesh)
    gltf, blob = gltf_io.load_glb(path)
    v = mesh.num_points
    st16 = (rng.random((v, 2)) * 65535).astype(np.uint16)
    pad = (-st16.nbytes) % 4
    buf = blob + st16.tobytes() + b"\0" * pad
    gltf["bufferViews"].append({
        "buffer": 0, "byteOffset": len(blob), "byteLength": st16.nbytes,
    })
    gltf["accessors"].append({
        "bufferView": len(gltf["bufferViews"]) - 1, "componentType": 5123,
        "count": v, "type": "VEC2", "normalized": True,
    })
    prim = gltf["meshes"][0]["primitives"][0]
    prim["attributes"]["TEXCOORD_0"] = len(gltf["accessors"]) - 1
    gltf["buffers"][0]["byteLength"] = len(buf)
    gltf_io._write_glb(path, gltf, buf)

    back = gltf_io.load_glb_mesh(path)
    want = st16.astype(np.float32) / 65535.0
    want[:, 1] = 1.0 - want[:, 1]
    np.testing.assert_allclose(back.attr("uv"), want, atol=1e-7)


# ---------------------------------------------------------------- import side
# Round-4 verdict weak #5: the package wrote morph-target and skinned
# .glb but dropped both on load — the engine round trip closed in one
# direction only.  These tests close it: save -> load -> same model.


def test_load_glb_blendshapes_roundtrip(tmp_path):
    """save_glb_morph -> load_glb_blendshapes returns the frames as
    blendshape Meshes plus the one-hot weight animation."""
    mesh = uv_sphere(10, 10)
    rest = mesh.points
    rng = np.random.default_rng(11)
    frames = np.stack([
        rest + 0.05 * rng.standard_normal(rest.shape).astype(np.float32)
        for _ in range(3)
    ])
    path = str(tmp_path / "shot.glb")
    gltf_io.save_glb_morph(path, mesh, frames, fps=12.0)

    rest_m, shapes, names, anim_w = gltf_io.load_glb_blendshapes(path)
    np.testing.assert_allclose(rest_m.points, rest, atol=1e-6)
    assert len(shapes) == 3 and names == [f"frame_{f:04d}" for f in range(3)]
    for f, s in enumerate(shapes):
        np.testing.assert_allclose(s.points, frames[f], atol=1e-6)
        assert s.num_points == mesh.num_points
        np.testing.assert_array_equal(s.faces, rest_m.faces)
    np.testing.assert_allclose(anim_w, np.eye(3), atol=1e-7)

    # a plain static .glb reports zero targets, not an error
    p2 = str(tmp_path / "static.glb")
    gltf_io.save_glb(p2, mesh)
    _, shapes2, names2, w2 = gltf_io.load_glb_blendshapes(p2)
    assert shapes2 == [] and names2 == [] and w2 is None


def test_glb_blendshapes_feed_morphspace_cook(tmp_path):
    """The loaded targets drive node.cook(morphspace=True) identically to
    the original blend Meshes — the reference's blendshape input role
    (src/dbse.cpp:9-35) served straight from an engine asset."""
    from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode

    mesh = uv_sphere(8, 8)
    rest = mesh.points
    rng = np.random.default_rng(3)
    blends = [
        Mesh(points=(rest + 0.08 * rng.standard_normal(rest.shape)
                     .astype(np.float32)), faces=mesh.faces)
        for _ in range(2)
    ]
    path = str(tmp_path / "blends.glb")
    gltf_io.save_glb_morph(
        path, mesh, np.stack([b.points for b in blends]), animate=False
    )
    _, loaded, _, _ = gltf_io.load_glb_blendshapes(path)

    rig = fibonacci_points(25)
    rig1 = Mesh(points=(rig * 1.06).astype(np.float32))
    cfg = DeformConfig(morphspace=True)
    params = DeformParams(radius=2.0)

    res_a = FaceDeformNode().cook(
        [mesh, Mesh(points=rig.copy()), rig1] + blends, cfg, params
    )
    res_b = FaceDeformNode().cook(
        [mesh, Mesh(points=rig.copy()), rig1] + loaded, cfg, params
    )
    np.testing.assert_allclose(
        res_b.weights, res_a.weights, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_b.mesh.points), np.asarray(res_a.mesh.points),
        atol=1e-5,
    )


@pytest.mark.parametrize("hierarchy", [False, True])
def test_load_glb_skin_roundtrip(tmp_path, hierarchy):
    """save_glb_skinned -> load_glb_skin: the reconstructed SkinningModel
    poses every keyframe like the original (flat AND MST-hierarchy
    layouts; the hierarchy path exercises IBM + parent-local TRS
    composition)."""
    rng = np.random.default_rng(7)
    v, b, f_n = 150, 3, 2
    pts = fibonacci_points(v)
    w = np.abs(rng.standard_normal((v, b))).astype(np.float32)
    keep = np.argsort(-w, axis=1)[:, :2]
    mask = np.zeros_like(w)
    np.put_along_axis(mask, keep, 1.0, axis=1)
    w = w * mask
    w /= w.sum(-1, keepdims=True)
    rot = np.stack([
        np.stack([_rotation([0, 1, 0], 0.2 * f + 0.1 * j)
                  for j in range(b)])
        for f in range(f_n)
    ]).astype(np.float32)
    tra = 0.2 * rng.standard_normal((f_n, b, 3)).astype(np.float32)
    model = skinning.SkinningModel(
        weights=w, rotations=rot, translations=tra, rest=pts
    )

    path = str(tmp_path / f"skin_{hierarchy}.glb")
    gltf_io.save_glb_skinned(
        path, Mesh(points=pts), model, fps=10.0, hierarchy=hierarchy
    )
    loaded, times = gltf_io.load_glb_skin(path)

    assert loaded.weights.shape == (v, b)
    np.testing.assert_allclose(times, [0.0, 0.1], atol=1e-7)
    np.testing.assert_allclose(loaded.rest, pts, atol=1e-6)
    np.testing.assert_allclose(loaded.weights, w, atol=2e-4)
    for f in range(f_n):
        want = np.asarray(skinning.lbs_apply(
            model.weights, model.rest, rot[f], tra[f]
        ))
        got = np.asarray(skinning.lbs_apply(
            loaded.weights, loaded.rest,
            loaded.rotations[f], loaded.translations[f],
        ))
        assert np.abs(got - want).max() < 2e-4, (hierarchy, f)


def test_load_glb_skin_static_pose(tmp_path):
    """Without an animation the loader returns the nodes' static TRS as
    one frame (frame 0 of the bake)."""
    rng = np.random.default_rng(9)
    v, b = 80, 2
    pts = fibonacci_points(v)
    w = np.abs(rng.standard_normal((v, b))).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    rot = np.stack([
        np.stack([_rotation([1, 0, 0], 0.3 * (j + 1)) for j in range(b)])
    ]).astype(np.float32)
    tra = 0.1 * rng.standard_normal((1, b, 3)).astype(np.float32)
    model = skinning.SkinningModel(
        weights=w, rotations=rot, translations=tra, rest=pts
    )
    path = str(tmp_path / "static_skin.glb")
    gltf_io.save_glb_skinned(
        path, Mesh(points=pts), model, animate=False, hierarchy=True
    )
    loaded, times = gltf_io.load_glb_skin(path)
    assert loaded.n_frames == 1 and times.shape == (1,)
    want = np.asarray(skinning.lbs_apply(w, pts, rot[0], tra[0]))
    got = np.asarray(skinning.lbs_apply(
        loaded.weights, loaded.rest,
        loaded.rotations[0], loaded.translations[0],
    ))
    assert np.abs(got - want).max() < 2e-4


def _append_accessor(gltf, blob, arr, acc_type):
    """Append `arr` (f32) to the GLB blob as a new accessor; returns
    (new_blob, accessor_index).  Minimal test-side buffer surgery."""
    data = np.ascontiguousarray(arr, np.float32).tobytes()
    pad = (-len(blob)) % 4
    blob = blob + b"\x00" * pad
    gltf.setdefault("bufferViews", []).append({
        "buffer": 0, "byteOffset": len(blob), "byteLength": len(data),
    })
    comp_count = int(np.prod(arr.shape[1:])) if np.ndim(arr) > 1 else 1
    gltf.setdefault("accessors", []).append({
        "bufferView": len(gltf["bufferViews"]) - 1,
        "componentType": 5126,
        "count": int(np.shape(arr)[0]),
        "type": acc_type,
        "min": np.asarray(arr, np.float64).reshape(-1, comp_count)
            .min(0).tolist(),
        "max": np.asarray(arr, np.float64).reshape(-1, comp_count)
            .max(0).tolist(),
    })
    blob = blob + data
    gltf["buffers"][0]["byteLength"] = len(blob)
    return blob, len(gltf["accessors"]) - 1


def test_load_glb_skin_animated_nonjoint_root(tmp_path):
    """An animated NON-joint ancestor (a DCC 'Armature' root carrying
    root motion, itself outside skin.joints) must flow into every
    joint's world transform — the loader used to freeze it at its
    static TRS (round-5 review finding)."""
    rng = np.random.default_rng(11)
    v, b, f_n = 100, 2, 2
    pts = fibonacci_points(v)
    w = np.abs(rng.standard_normal((v, b))).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    rot = np.stack([
        np.stack([_rotation([0, 1, 0], 0.15 * f + 0.1 * j)
                  for j in range(b)])
        for f in range(f_n)
    ]).astype(np.float32)
    tra = 0.1 * rng.standard_normal((f_n, b, 3)).astype(np.float32)
    model = skinning.SkinningModel(
        weights=w, rotations=rot, translations=tra, rest=pts
    )
    path = str(tmp_path / "rootmotion.glb")
    gltf_io.save_glb_skinned(
        path, Mesh(points=pts), model, fps=10.0, hierarchy=False
    )

    gltf, blob = gltf_io.load_glb(path)
    joints = gltf["skins"][0]["joints"]
    # new non-joint root parenting every (previously parentless) joint
    root_idx = len(gltf["nodes"])
    gltf["nodes"].append({"name": "Armature", "children": list(joints)})
    scene_nodes = gltf["scenes"][0]["nodes"]
    gltf["scenes"][0]["nodes"] = [
        n for n in scene_nodes if n not in set(joints)
    ] + [root_idx]
    # animated root translation, same keyframe times as the joints
    root_t = np.asarray([[0.0, 0.0, 0.0], [0.3, -0.2, 0.5]], np.float32)
    anim = gltf["animations"][0]
    in_acc = anim["samplers"][0]["input"]
    blob, out_acc = _append_accessor(gltf, blob, root_t, "VEC3")
    anim["samplers"].append({
        "input": in_acc, "output": out_acc, "interpolation": "STEP",
    })
    anim["channels"].append({
        "sampler": len(anim["samplers"]) - 1,
        "target": {"node": root_idx, "path": "translation"},
    })
    gltf_io._write_glb(path, gltf, blob)

    loaded, times = gltf_io.load_glb_skin(path)
    assert loaded.n_frames == f_n
    for f in range(f_n):
        # a pure-translation root composes linearly: rotations unchanged,
        # every joint translation shifted by the root track
        np.testing.assert_allclose(
            loaded.rotations[f], rot[f], atol=2e-4
        )
        np.testing.assert_allclose(
            loaded.translations[f], tra[f] + root_t[f][None, :], atol=2e-4
        )


def test_load_glb_blendshapes_cubicspline_weights(tmp_path):
    """A CUBICSPLINE morph-weights sampler stores (in-tangent, value,
    out-tangent) triples per keyframe — the loader must return the value
    rows only (round-5 review finding)."""
    mesh = Mesh(points=fibonacci_points(60))
    targets = np.stack([
        0.1 * np.sin(3.0 * mesh.points),
        0.05 * np.cos(2.0 * mesh.points[:, ::-1]),
    ]).astype(np.float32)
    weights = np.asarray([[0.2, 0.8], [0.7, 0.1], [1.0, 0.0]], np.float32)
    path = str(tmp_path / "cubic.glb")
    gltf_io.save_glb_targets(path, mesh, targets, weights)

    gltf, blob = gltf_io.load_glb(path)
    anim = gltf["animations"][0]
    sampler = anim["samplers"][0]
    f_n, k_n = weights.shape
    triples = np.zeros((f_n, 3, k_n), np.float32)
    triples[:, 0] = 99.0      # in-tangents: junk that must be dropped
    triples[:, 1] = weights
    triples[:, 2] = -99.0     # out-tangents
    blob, out_acc = _append_accessor(
        gltf, blob, triples.reshape(-1, k_n), "SCALAR"
    )
    # glTF stores weights output as flat SCALAR count = 3*F*K
    gltf["accessors"][out_acc]["count"] = 3 * f_n * k_n
    gltf["accessors"][out_acc]["type"] = "SCALAR"
    del gltf["accessors"][out_acc]["min"], gltf["accessors"][out_acc]["max"]
    sampler["output"] = out_acc
    sampler["interpolation"] = "CUBICSPLINE"
    gltf_io._write_glb(path, gltf, blob)

    _, shapes, _, anim_w = gltf_io.load_glb_blendshapes(path)
    assert len(shapes) == 2
    np.testing.assert_allclose(anim_w, weights, atol=1e-6)


def test_load_glb_skin_ancestor_only_clip_skipped(tmp_path):
    """A clip animating ONLY a non-joint ancestor (turntable/root-motion
    track) must not shadow a later clip carrying the real joint channels
    (round-5 review finding on the ancestor-widening fix)."""
    rng = np.random.default_rng(13)
    v, b, f_n = 90, 2, 2
    pts = fibonacci_points(v)
    w = np.abs(rng.standard_normal((v, b))).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    rot = np.stack([
        np.stack([_rotation([0, 0, 1], 0.2 * f + 0.05 * j)
                  for j in range(b)])
        for f in range(f_n)
    ]).astype(np.float32)
    tra = 0.1 * rng.standard_normal((f_n, b, 3)).astype(np.float32)
    model = skinning.SkinningModel(
        weights=w, rotations=rot, translations=tra, rest=pts
    )
    path = str(tmp_path / "multiclip.glb")
    gltf_io.save_glb_skinned(
        path, Mesh(points=pts), model, fps=10.0, hierarchy=False
    )

    gltf, blob = gltf_io.load_glb(path)
    joints = gltf["skins"][0]["joints"]
    root_idx = len(gltf["nodes"])
    gltf["nodes"].append({"name": "Armature", "children": list(joints)})
    gltf["scenes"][0]["nodes"] = [
        n for n in gltf["scenes"][0]["nodes"] if n not in set(joints)
    ] + [root_idx]
    # clip 0: ancestor-only (must be skipped); the real joint clip stays
    # at index 1
    t_in = np.asarray([0.0, 0.1], np.float32)
    blob, in_acc = _append_accessor(gltf, blob, t_in[:, None], "SCALAR")
    root_t = np.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]], np.float32)
    blob, out_acc = _append_accessor(gltf, blob, root_t, "VEC3")
    gltf["animations"] = [{
        "name": "turntable",
        "samplers": [{"input": in_acc, "output": out_acc,
                      "interpolation": "STEP"}],
        "channels": [{"sampler": 0,
                      "target": {"node": root_idx,
                                 "path": "translation"}}],
    }] + gltf["animations"]
    gltf_io._write_glb(path, gltf, blob)

    loaded, times = gltf_io.load_glb_skin(path)
    assert loaded.n_frames == f_n
    for f in range(f_n):
        # the 5.0-shift turntable clip must NOT appear; clip 1's joint
        # animation must load intact (static root contributes nothing)
        np.testing.assert_allclose(loaded.rotations[f], rot[f], atol=2e-4)
        np.testing.assert_allclose(loaded.translations[f], tra[f], atol=2e-4)


def test_load_glb_skin_ancestor_only_clip_is_fallback(tmp_path):
    """When NO clip animates a true joint, an ancestor-only clip IS the
    animation (static pose + baked object motion) and must apply — the
    shadowing guard is a preference, not a drop (round-5 review)."""
    rng = np.random.default_rng(17)
    v, b = 70, 2
    pts = fibonacci_points(v)
    w = np.abs(rng.standard_normal((v, b))).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    rot = np.stack([
        np.stack([_rotation([1, 0, 0], 0.2 * (j + 1)) for j in range(b)])
    ]).astype(np.float32)
    tra = 0.05 * rng.standard_normal((1, b, 3)).astype(np.float32)
    model = skinning.SkinningModel(
        weights=w, rotations=rot, translations=tra, rest=pts
    )
    path = str(tmp_path / "rootonly.glb")
    gltf_io.save_glb_skinned(
        path, Mesh(points=pts), model, animate=False, hierarchy=False
    )

    gltf, blob = gltf_io.load_glb(path)
    joints = gltf["skins"][0]["joints"]
    root_idx = len(gltf["nodes"])
    gltf["nodes"].append({"name": "Armature", "children": list(joints)})
    gltf["scenes"][0]["nodes"] = [
        n for n in gltf["scenes"][0]["nodes"] if n not in set(joints)
    ] + [root_idx]
    t_in = np.asarray([0.0, 0.1], np.float32)
    blob, in_acc = _append_accessor(gltf, blob, t_in[:, None], "SCALAR")
    root_t = np.asarray([[0.0, 0.0, 0.0], [0.4, -0.1, 0.2]], np.float32)
    blob, out_acc = _append_accessor(gltf, blob, root_t, "VEC3")
    gltf["animations"] = [{
        "name": "rootmotion",
        "samplers": [{"input": in_acc, "output": out_acc,
                      "interpolation": "STEP"}],
        "channels": [{"sampler": 0,
                      "target": {"node": root_idx,
                                 "path": "translation"}}],
    }]
    gltf_io._write_glb(path, gltf, blob)

    loaded, times = gltf_io.load_glb_skin(path)
    assert loaded.n_frames == 2
    for f in range(2):
        np.testing.assert_allclose(loaded.rotations[f], rot[0], atol=2e-4)
        np.testing.assert_allclose(
            loaded.translations[f], tra[0] + root_t[f][None, :], atol=2e-4
        )
