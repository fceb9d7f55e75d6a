"""In-Houdini Python SOP adapter tests against the mock hou module.

The adapter (facedeform_tpu/houdini.py) imports `hou` lazily, so these
tests inject tests/mock_hou.py as sys.modules["hou"] and drive cook_sop
exactly as Houdini's Python SOP evaluator would — then check parity
against a direct FaceDeformNode cook on the same inputs.
"""

import sys

import numpy as np
import pytest

from tests import mock_hou

sys.modules.setdefault("hou", mock_hou)

from facedeform_tpu import houdini as hadapt  # noqa: E402
from facedeform_tpu.config import DeformConfig, DeformParams  # noqa: E402
from facedeform_tpu.geometry.mesh import Mesh  # noqa: E402
from facedeform_tpu.geometry.primitives import (  # noqa: E402
    fibonacci_points,
    uv_sphere,
)
from facedeform_tpu.node import FaceDeformNode  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_state():
    hadapt.clear_state()
    yield
    hadapt.clear_state()


_SCENE_COUNTER = [0]


def _scene(rng, parms=None, n_ctrl=30, blends=0, tangent_frame=False):
    """Build (python_sop_node, meshes) for a sphere + rig scene.

    Node paths are unique per call: the adapter's conversion cache is keyed
    on (path, cookCount), which is unique in a real Houdini session but
    would collide across test scenes sharing a path.
    """
    _SCENE_COUNTER[0] += 1
    tag = _SCENE_COUNTER[0]
    mesh = uv_sphere(24, 24)
    if tangent_frame:
        n = mesh.points / np.linalg.norm(mesh.points, axis=1, keepdims=True)
        u = np.cross(n, [0.0, 0.0, 1.0]).astype(np.float32)
        u /= np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-6)
        mesh.set_attr("N", n.astype(np.float32))
        mesh.set_attr("tangentu", u)
        mesh.set_attr("tangentv", np.cross(n, u).astype(np.float32))
    rig0 = Mesh(points=fibonacci_points(n_ctrl))
    rig1 = Mesh(points=(
        rig0.points
        + 0.08 * rng.standard_normal((n_ctrl, 3)).astype(np.float32)
    ))
    meshes = [mesh, rig0, rig1]
    for b in range(blends):
        pts = mesh.points + 0.05 * rng.standard_normal(
            mesh.points.shape
        ).astype(np.float32)
        meshes.append(Mesh(points=pts, faces=mesh.faces))
    inputs = tuple(
        mock_hou.SopNode(f"/obj/geo{tag}/in{i}", mock_hou.geometry_from_mesh(m))
        for i, m in enumerate(meshes)
    )
    node = mock_hou.SopNode(f"/obj/geo{tag}/facedeform", parms=parms,
                            inputs=inputs)
    return node, meshes


def _out_points(node):
    geo = node.geometry()
    return np.asarray(
        geo.pointFloatAttribValues("P"), np.float32
    ).reshape(-1, 3)


def test_cook_sop_matches_direct_cook(rng):
    node, meshes = _scene(rng)
    result = hadapt.cook_sop(node)
    got = _out_points(node)

    want = FaceDeformNode().cook(
        [m.copy() for m in meshes], DeformConfig(), DeformParams()
    )
    np.testing.assert_allclose(got, want.mesh.points, atol=1e-6)
    assert result.mesh.num_points == got.shape[0]
    # fd_falloff written onto the hou geometry
    fall = np.asarray(
        node.geometry().pointFloatAttribValues("fd_falloff"), np.float32
    )
    np.testing.assert_allclose(
        fall, want.mesh.point_attrs["fd_falloff"], atol=1e-6
    )


def test_cook_sop_parms_map_to_config(rng):
    parms = {
        "model": 2, "kernel": 2, "term": 1, "radius": 1.7,
        "lambda": 0.3, "tangent": 1, "falloffrate": 1.5,
        "weightrange": (0.1, 0.8), "solver": 1,
    }
    node, meshes = _scene(rng, tangent_frame=True)
    node._parms.update(parms)
    cfg, params, group = hadapt.config_from_node(node)
    assert cfg.model == 2 and cfg.kernel == 2 and cfg.term == 1
    assert cfg.tangent and cfg.solver == "direct"
    assert float(params.radius) == pytest.approx(1.7)
    assert float(params.lam) == pytest.approx(0.3)
    assert float(params.weight_lo) == pytest.approx(0.1)
    assert float(params.weight_hi) == pytest.approx(0.8)
    assert group == ""

    hadapt.cook_sop(node)
    want = FaceDeformNode().cook(
        [m.copy() for m in meshes],
        DeformConfig(model=2, kernel=2, term=1, tangent=True, solver="direct"),
        DeformParams(radius=1.7, lam=0.3, falloffrate=1.5,
                     weight_lo=0.1, weight_hi=0.8),
    )
    np.testing.assert_allclose(_out_points(node), want.mesh.points, atol=1e-6)


def test_cook_sop_group_pattern(rng):
    node, meshes = _scene(rng)
    node._parms["group"] = "0-199"
    hadapt.cook_sop(node)
    want = FaceDeformNode().cook(
        [m.copy() for m in meshes], DeformConfig(), DeformParams(),
        group="0-199",
    )
    got = _out_points(node)
    np.testing.assert_allclose(got, want.mesh.points, atol=1e-6)
    # out-of-group points pinned to the rest pose
    np.testing.assert_array_equal(got[200:], meshes[0].points[200:])


def test_cook_sop_morphspace_weights_detail(rng):
    node, meshes = _scene(rng, blends=2)
    node._parms["morphspace"] = 1
    hadapt.cook_sop(node)
    w, dt = node.geometry()._global_attrs["weights"]
    assert dt is mock_hou.attribData.Float
    want = FaceDeformNode().cook(
        [m.copy() for m in meshes],
        DeformConfig(morphspace=True), DeformParams(),
    )
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(want.weights).ravel(), atol=1e-5
    )
    # rest attr written too (src/SOP_FaceDeform.cpp:179-185)
    rest = np.asarray(
        node.geometry().pointFloatAttribValues("rest"), np.float32
    ).reshape(-1, 3)
    np.testing.assert_array_equal(rest, meshes[0].points)


def test_cook_sop_caches_across_cooks(rng):
    """Second cook with unchanged inputs reuses the converted Mesh objects
    (same data ids), so the FaceDeformNode solve cache stays warm — the
    InputGeoID contract (src/SOP_FaceDeform.hpp:47-64)."""
    node, _ = _scene(rng)
    hadapt.cook_sop(node)
    state = hadapt._NODE_STATE[node.path()]
    mesh0 = state["geo_cache"][0][1]
    deformer = state["node"]._deformer
    fit_key = state["node"]._fit_key
    assert deformer is not None

    hadapt.cook_sop(node)
    assert state["geo_cache"][0][1] is mesh0
    assert state["node"]._deformer is deformer
    assert state["node"]._fit_key == fit_key

    # bumping an input's cook count forces reconversion (fresh data ids)
    node.inputs()[2]._cook_count += 1
    hadapt.cook_sop(node)
    assert state["geo_cache"][0][1] is mesh0      # input 0 untouched
    assert state["geo_cache"][2][1] is not None


def test_cook_sop_errors_and_warnings(rng):
    # fewer than 3 inputs
    node = mock_hou.SopNode("/obj/geo/fd_short", inputs=())
    with pytest.raises(mock_hou.NodeError, match="must be connected"):
        hadapt.cook_sop(node)

    # a None among the first three slots must NOT be compacted away —
    # hou.Node.inputs() reports unconnected intermediate slots as None and
    # shifting them would silently swap the mesh/rest/deform roles
    node, _ = _scene(rng)
    node._inputs = (node.inputs()[0], None, node.inputs()[2])
    with pytest.raises(mock_hou.NodeError, match="must be connected"):
        hadapt.cook_sop(node)

    # rig count mismatch surfaces the reference error text
    node, meshes = _scene(rng)
    bad = Mesh(points=meshes[1].points[:-2])
    node._inputs = (
        node.inputs()[0],
        node.inputs()[1],
        mock_hou.SopNode("/obj/geo/in2b", mock_hou.geometry_from_mesh(bad)),
    )
    with pytest.raises(mock_hou.NodeError, match="should match"):
        hadapt.cook_sop(node)

    # string attributes: geometry still cooks, one NodeWarning raised after
    node, meshes = _scene(rng)
    node.inputs()[0].geometry()._add_point_attr(
        "name", np.array(["a"] * meshes[0].num_points)
    )
    with pytest.raises(mock_hou.NodeWarning, match="name"):
        hadapt.cook_sop(node)
    want = FaceDeformNode().cook(
        [m.copy() for m in meshes], DeformConfig(), DeformParams()
    )
    np.testing.assert_allclose(_out_points(node), want.mesh.points, atol=1e-6)


def test_mesh_geometry_round_trip(rng):
    """hou.Geometry -> Mesh conversion preserves attrs, topology, groups."""
    mesh = uv_sphere(8, 8)
    mesh.set_attr("N", rng.standard_normal((mesh.num_points, 3)).astype(np.float32))
    mesh.set_attr("class", np.arange(mesh.num_points, dtype=np.int32) % 3)
    mesh.set_group("lip", np.arange(10, dtype=np.int64))
    geo = mock_hou.geometry_from_mesh(mesh)
    warnings = []
    back = hadapt.mesh_from_geometry(geo, warnings)
    assert not warnings
    np.testing.assert_array_equal(back.points, mesh.points)
    np.testing.assert_array_equal(back.point_attrs["N"], mesh.point_attrs["N"])
    np.testing.assert_array_equal(
        back.point_attrs["class"], mesh.point_attrs["class"]
    )
    np.testing.assert_array_equal(
        back.group_mask("lip"), mesh.group_mask("lip")
    )
    # topology preserved (same triangle set after fanning)
    np.testing.assert_array_equal(back.triangles(), mesh.triangles())


def test_parm_specs_cover_reference_surface():
    """Every reference parameter name (SOP_FaceDeform.cpp:99-137) appears in
    PARM_SPECS, and the template builder emits one template per spec."""
    names = {s[0] for s in hadapt.PARM_SPECS}
    reference = {
        "group", "model", "term", "qcoef", "zcoef", "radius", "maxedges",
        "layers", "lambda", "tangent", "morphspace", "doclampweight",
        "weightrange", "dofalloff", "falloffradius", "falloffrate",
    }
    assert reference <= names
    templates = hadapt.build_parm_templates()
    assert [t.name() for t in templates] == [s[0] for s in hadapt.PARM_SPECS]

    d = mock_hou._Definition()
    hadapt.apply_parm_templates(d)
    assert {t.name() for t in d.parmTemplateGroup().entries()} == names
    # idempotent: re-applying adds nothing
    hadapt.apply_parm_templates(d)
    assert len(d.parmTemplateGroup().entries()) == len(names)


def test_cook_sop_psd_checkpoint(rng, tmp_path):
    """The psd_file parm applies a fitted pose-space model on top of the
    cook (identity-cached across cooks); a bad path is a NodeError."""
    from facedeform_tpu.ops import psd as psd_ops
    from facedeform_tpu.utils import checkpoint

    node, meshes = _scene(rng)
    mesh, rig0, rig1 = meshes
    # a model fitted FOR this scene: one example at rig1's pose
    feats = np.stack([psd_ops.features_from_rig(rig0.points, rig1.points)])
    corr = 0.05 * rng.standard_normal(
        (1, mesh.num_points, 3)
    ).astype(np.float32)
    model, report = psd_ops.fit_psd(feats, corr)
    p = str(tmp_path / "sop_psd.npz")
    checkpoint.save_psd(p, psd_ops.PSDDeformer(model, report=report))

    node._parms["psd_file"] = p
    hadapt.cook_sop(node)
    want = FaceDeformNode().cook(
        [m.copy() for m in meshes], DeformConfig(), DeformParams(),
        psd=checkpoint.load_psd(p),
    )
    np.testing.assert_allclose(_out_points(node), want.mesh.points,
                               atol=1e-6)
    # the checkpoint object is identity-cached across cooks
    first = hadapt._NODE_STATE[node.path()]["psd_cache"][1]
    hadapt.cook_sop(node)
    assert hadapt._NODE_STATE[node.path()]["psd_cache"][1] is first

    node._parms["psd_file"] = str(tmp_path / "missing.npz")
    with pytest.raises(mock_hou.NodeError, match="PSD checkpoint"):
        hadapt.cook_sop(node)


def test_cook_sop_reduce_rig(rng):
    """`reducerig`/`reducemode` parms: subset decimation keeps the node
    caches warm across cooks (stable subset-mesh data ids); regress hands
    the cook an external reduced-basis deformer that matches the direct
    decimate.fit_reduced route; conflicts raise pointed node errors."""
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.ops import decimate

    # -- subset mode: output matches a direct cook on the sliced rigs
    node, meshes = _scene(rng, n_ctrl=40)
    node._parms["reducerig"] = 12
    res = hadapt.cook_sop(node)
    idx, _ = decimate.select_markers(meshes[1].points, 12)
    want = FaceDeformNode().cook(
        [meshes[0], meshes[1].subset(idx), meshes[2].subset(idx)],
        DeformConfig(), DeformParams(),
    )
    np.testing.assert_allclose(res.mesh.points, want.mesh.points, atol=1e-6)

    # repeated cook reuses the cached subset meshes AND the node solve
    state = hadapt._NODE_STATE[node.path()]
    deformer = state["node"]._deformer
    sub_key = state["reduce_subset"][0]
    hadapt.cook_sop(node)
    assert state["node"]._deformer is deformer
    assert state["reduce_subset"][0] == sub_key

    # -- regress mode: external deformer == direct fit_reduced.  The fit
    # info line surfaces as the adapter's one NodeWarning AFTER the
    # geometry is written (cook_sop contract), so read it off the node.
    node2, meshes2 = _scene(rng, n_ctrl=40)
    node2._parms.update({"reducerig": 12, "reducemode": 1})
    with pytest.raises(mock_hou.NodeWarning, match="regress"):
        hadapt.cook_sop(node2)
    got2 = np.asarray(
        node2.geometry().pointFloatAttribValues("P"), np.float32
    ).reshape(-1, 3)
    m_ref, rep_ref, _ = decimate.fit_reduced(
        meshes2[1].points, meshes2[2].points, 12
    )
    want2 = FaceDeformNode().cook(
        meshes2, DeformConfig(), DeformParams(),
        deformer=Deformer(model=m_ref, cfg=DeformConfig(),
                          params=DeformParams(), report=rep_ref),
    )
    np.testing.assert_allclose(got2, want2.mesh.points, atol=1e-6)
    # the regress fit is cached on the posed-rig ids: a cache-hit cook is
    # silent (no refit warning) and reuses the deformer object; a rig
    # drag (cook-count bump) refits
    d_cached = hadapt._NODE_STATE[node2.path()]["reduce_fit"][1]
    hadapt.cook_sop(node2)
    assert hadapt._NODE_STATE[node2.path()]["reduce_fit"][1] is d_cached
    node2.inputs()[2]._cook_count += 1
    with pytest.raises(mock_hou.NodeWarning, match="regress"):
        hadapt.cook_sop(node2)
    assert (
        hadapt._NODE_STATE[node2.path()]["reduce_fit"][1] is not d_cached
    )

    # -- K >= N warns and keeps the full rig
    node3, _ = _scene(rng, n_ctrl=20)
    node3._parms["reducerig"] = 50
    with pytest.raises(mock_hou.NodeWarning, match="keeping all markers"):
        hadapt.cook_sop(node3)

    # -- regress + PU solver is a pointed error
    node4, _ = _scene(rng, n_ctrl=40)
    node4._parms.update({"reducerig": 12, "reducemode": 1, "solver": 3})
    with pytest.raises(mock_hou.NodeError, match="partition-of-unity"):
        hadapt.cook_sop(node4)
