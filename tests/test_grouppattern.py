"""Houdini group-pattern grammar (geometry/grouppattern.py).

Mirrors the `cookInputGroups` surface the reference binds at
src/SOP_FaceDeform.cpp:119-120,156-173: names, globs, point numbers,
ranges with step / keep-of, `!` complement, `^` subtraction.
"""

import numpy as np
import pytest

from facedeform_tpu import Mesh
from facedeform_tpu.geometry.primitives import fibonacci_points


@pytest.fixture
def mesh():
    m = Mesh(points=fibonacci_points(20))
    m.set_group("head", np.arange(5))
    m.set_group("hand_l", np.arange(5, 10))
    m.set_group("hand_r", np.arange(10, 15))
    return m


def _idx(mask):
    return np.nonzero(mask)[0].tolist()


def test_plain_name_matches_group_mask(mesh):
    np.testing.assert_array_equal(
        mesh.select_points("head"), mesh.group_mask("head")
    )


def test_unknown_name_keyerror_lists_groups(mesh):
    with pytest.raises(KeyError, match="hand_l"):
        mesh.select_points("feet")


def test_union_of_names(mesh):
    assert _idx(mesh.select_points("head hand_r")) == list(range(5)) + list(
        range(10, 15)
    )


def test_glob_matches_group_names(mesh):
    assert _idx(mesh.select_points("hand_*")) == list(range(5, 15))
    assert _idx(mesh.select_points("hand_?")) == list(range(5, 15))


def test_star_selects_all_points(mesh):
    # `*` is every point (even ungrouped ones: 15-19 belong to no group)
    assert mesh.select_points("*").all()


def test_point_number_and_range(mesh):
    assert _idx(mesh.select_points("7")) == [7]
    assert _idx(mesh.select_points("3-6")) == [3, 4, 5, 6]
    # reversed endpoints normalize, out-of-range clamps
    assert _idx(mesh.select_points("6-3")) == [3, 4, 5, 6]
    assert _idx(mesh.select_points("18-99")) == [18, 19]


def test_range_step_and_keep_of(mesh):
    assert _idx(mesh.select_points("0-9:2")) == [0, 2, 4, 6, 8]
    # first 2 of every 5
    assert _idx(mesh.select_points("0-9:2,5")) == [0, 1, 5, 6]


def test_caret_subtracts_from_accumulated(mesh):
    assert _idx(mesh.select_points("* ^hand_l")) == [
        i for i in range(20) if not 5 <= i < 10
    ]
    # subtraction is left-to-right: re-adding after ^ restores
    assert _idx(mesh.select_points("* ^hand_l 7")) == sorted(
        (set(range(20)) - set(range(5, 10))) | {7}
    )


def test_bang_complement(mesh):
    assert _idx(mesh.select_points("!head")) == list(range(5, 20))


def test_empty_pattern_raises(mesh):
    with pytest.raises(ValueError):
        mesh.select_points("   ")


@pytest.fixture
def amesh(mesh):
    mesh.set_attr("class", np.repeat(np.arange(4), 5).astype(np.int32))
    mesh.set_attr("id", np.arange(20, dtype=np.int64))
    mesh.set_attr(
        "name", np.array([f"pt_{i % 3}" for i in range(20)])
    )
    return mesh


def test_attr_equality_numeric(amesh):
    assert _idx(amesh.select_points("@class=1")) == list(range(5, 10))
    assert _idx(amesh.select_points("@class==1")) == list(range(5, 10))
    # comma list = any-of
    assert _idx(amesh.select_points("@class=0,3")) == list(range(5)) + list(
        range(15, 20)
    )


def test_attr_inequality_and_ordered(amesh):
    assert _idx(amesh.select_points("@class!=0")) == list(range(5, 20))
    assert _idx(amesh.select_points("@id<4")) == [0, 1, 2, 3]
    assert _idx(amesh.select_points("@id<=4")) == [0, 1, 2, 3, 4]
    assert _idx(amesh.select_points("@id>17")) == [18, 19]
    assert _idx(amesh.select_points("@id>=17")) == [17, 18, 19]


def test_attr_string_match_and_glob(amesh):
    assert _idx(amesh.select_points("@name=pt_0")) == list(range(0, 20, 3))
    # glob on string values and comma any-of
    assert _idx(amesh.select_points("@name=pt_*")) == list(range(20))
    assert _idx(amesh.select_points("@name=pt_0,pt_1")) == sorted(
        set(range(0, 20, 3)) | set(range(1, 20, 3))
    )


def test_attr_vector_component(amesh):
    # @P resolves through mesh.points (geo_io strips P from point_attrs
    # on load, so there is no P attr to find) — no set_attr needed
    got = _idx(amesh.select_points("@P.y>0"))
    assert got == _idx(np.asarray(amesh.points)[:, 1] > 0)
    # numeric component index spelling
    assert _idx(amesh.select_points("@P.1>0")) == got


def test_attr_int_equality_is_exact(amesh):
    # large integer ids: rtol-based closeness would match a RANGE
    amesh.set_attr("bigid", (np.arange(20, dtype=np.int64) + 1_000_000))
    assert _idx(amesh.select_points("@bigid=1000005")) == [5]
    assert _idx(amesh.select_points("@bigid!=1000005")) == [
        i for i in range(20) if i != 5
    ]


def test_attr_float_equality_ulp_scaled(amesh):
    """f32 columns: the equality tolerance scales with the value's
    magnitude (advisor r4) — a vertex stored at exactly 123.456 f32 must
    match @attr=123.456 even though one ULP there (~7.6e-6) exceeds the
    old fixed 1e-6 window, while distinct tiny values must NOT conflate."""
    vals = np.zeros(20, np.float32)
    vals[7] = np.float32(123.456)
    vals[3] = np.float32(2e-6)       # distinct near-zero pair
    vals[4] = np.float32(4e-6)
    amesh.set_attr("fv", vals)
    assert _idx(amesh.select_points("@fv=123.456")) == [7]
    assert _idx(amesh.select_points("@fv=0.000004")) == [4]  # not [3, 4]


def test_attr_composes_with_grammar(amesh):
    # the Houdini idiom: everything in a class except a named group
    assert _idx(amesh.select_points("@class=0,1 ^hand_l")) == list(range(5))
    assert _idx(amesh.select_points("!@class=0")) == list(range(5, 20))


def test_attr_errors(amesh):
    with pytest.raises(KeyError, match="class"):
        amesh.select_points("@missing=1")
    with pytest.raises(ValueError, match="missing value"):
        amesh.select_points("@class=")
    with pytest.raises(ValueError, match="string attribute"):
        amesh.select_points("@name<3")
    with pytest.raises(ValueError, match="component"):
        amesh.select_points("@P>0")
    with pytest.raises(ValueError, match="out of range"):
        amesh.select_points("@P.w>0")


def test_node_cook_accepts_pattern(rng):
    from facedeform_tpu import DeformConfig, DeformParams, FaceDeformNode

    mesh = Mesh(points=fibonacci_points(200))
    rest = fibonacci_points(30)
    rig0 = Mesh(points=rest.copy())
    rig1 = Mesh(points=(rest * 1.1).astype(np.float32))
    res = FaceDeformNode().cook(
        [mesh, rig0, rig1], DeformConfig(), DeformParams(radius=2.0),
        group="0-99",
    )
    pts = np.asarray(res.mesh.points)
    assert (pts[100:] == mesh.points[100:]).all()
    assert np.abs(pts[:100] - mesh.points[:100]).max() > 1e-4
