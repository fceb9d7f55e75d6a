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
