"""Minimal mock of the `hou` module covering exactly the API surface
facedeform_tpu.houdini declares it uses (see that module's docstring).

The adapter imports `hou` lazily inside functions, so tests inject this
module as sys.modules["hou"] and everything resolves here.  The mock is
deliberately strict: it implements only the documented surface, so any
adapter drift onto undeclared hou APIs fails loudly in CI instead of
failing inside a real Houdini session.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


class NodeError(Exception):
    pass


class NodeWarning(Exception):
    pass


class _Sentinel:
    def __init__(self, label: str) -> None:
        self._label = label

    def __repr__(self) -> str:
        return self._label


class attribData:
    Float = _Sentinel("attribData.Float")
    Int = _Sentinel("attribData.Int")
    String = _Sentinel("attribData.String")


class attribType:
    Point = _Sentinel("attribType.Point")
    Global = _Sentinel("attribType.Global")


class _Point:
    def __init__(self, number: int) -> None:
        self._number = number

    def number(self) -> int:
        return self._number


class _Vertex:
    def __init__(self, point: _Point) -> None:
        self._point = point

    def point(self) -> _Point:
        return self._point


class _Prim:
    def __init__(self, point_numbers: List[int]) -> None:
        self._vertices = [_Vertex(_Point(n)) for n in point_numbers]

    def vertices(self) -> List[_Vertex]:
        return self._vertices


class _Attrib:
    def __init__(self, name: str, size: int, data_type) -> None:
        self._name, self._size, self._dt = name, size, data_type

    def name(self) -> str:
        return self._name

    def size(self) -> int:
        return self._size

    def dataType(self):
        return self._dt


class _PointGroup:
    def __init__(self, name: str, numbers: List[int]) -> None:
        self._name = name
        self._numbers = list(numbers)

    def name(self) -> str:
        return self._name

    def points(self) -> List[_Point]:
        return [_Point(n) for n in self._numbers]


class Geometry:
    """Point/prim container speaking the vectorized attrib API."""

    def __init__(self) -> None:
        self._num_points = 0
        # name -> (flat list, size, data_type)
        self._point_attrs: Dict[str, Tuple[list, int, object]] = {}
        self._global_attrs: Dict[str, Tuple[object, object]] = {}
        self._prims: List[_Prim] = []
        self._groups: List[_PointGroup] = []

    # ------------------------------------------------------------- reading
    def points(self) -> List[_Point]:
        return [_Point(i) for i in range(self._num_points)]

    def prims(self) -> List[_Prim]:
        return list(self._prims)

    def pointAttribs(self) -> List[_Attrib]:
        return [
            _Attrib(name, size, dt)
            for name, (_, size, dt) in self._point_attrs.items()
        ]

    def findPointAttrib(self, name: str) -> Optional[_Attrib]:
        entry = self._point_attrs.get(name)
        if entry is None:
            return None
        return _Attrib(name, entry[1], entry[2])

    def findGlobalAttrib(self, name: str) -> Optional[_Attrib]:
        entry = self._global_attrs.get(name)
        if entry is None:
            return None
        return _Attrib(name, 1, entry[1])

    def pointFloatAttribValues(self, name: str) -> tuple:
        vals, _, dt = self._point_attrs[name]
        if dt is not attribData.Float:
            raise TypeError(f"attribute {name!r} is {dt}, not Float")
        return tuple(vals)

    def pointIntAttribValues(self, name: str) -> tuple:
        vals, _, dt = self._point_attrs[name]
        if dt is not attribData.Int:
            raise TypeError(f"attribute {name!r} is {dt}, not Int")
        return tuple(vals)

    def pointGroups(self) -> List[_PointGroup]:
        return list(self._groups)

    # ------------------------------------------------------------- writing
    def addAttrib(self, scope, name: str, default) -> _Attrib:
        assert scope is attribType.Point, "mock supports point addAttrib only"
        size = 1 if np.isscalar(default) else len(default)
        flat = list(np.zeros(self._num_points * size, np.float32))
        self._point_attrs[name] = (flat, size, attribData.Float)
        return _Attrib(name, size, attribData.Float)

    def addArrayAttrib(self, scope, name: str, data_type) -> _Attrib:
        assert scope is attribType.Global
        self._global_attrs[name] = ([], data_type)
        return _Attrib(name, 1, data_type)

    def setPointFloatAttribValues(self, name: str, values) -> None:
        entry = self._point_attrs.get(name)
        if entry is None:
            raise ValueError(f"no point attribute {name!r}")
        _, size, dt = entry
        if len(values) != self._num_points * size:
            raise ValueError(
                f"attribute {name!r}: {len(values)} values for "
                f"{self._num_points} points of size {size}"
            )
        self._point_attrs[name] = (list(values), size, dt)

    def setGlobalAttribValue(self, name: str, value) -> None:
        if name not in self._global_attrs:
            raise ValueError(f"no global attribute {name!r}")
        self._global_attrs[name] = (value, self._global_attrs[name][1])

    def merge(self, other: "Geometry") -> None:
        assert self._num_points == 0, "mock merge supports empty target only"
        self._num_points = other._num_points
        self._point_attrs = {
            k: (list(v), s, d) for k, (v, s, d) in other._point_attrs.items()
        }
        self._global_attrs = dict(other._global_attrs)
        self._prims = list(other._prims)
        self._groups = list(other._groups)

    # ------------------------------------------------- test-side construction
    def _set_points(self, pts: np.ndarray) -> None:
        pts = np.asarray(pts, np.float32)
        self._num_points = pts.shape[0]
        self._point_attrs["P"] = (list(pts.ravel()), 3, attribData.Float)

    def _add_point_attr(self, name: str, values: np.ndarray) -> None:
        values = np.asarray(values)
        size = 1 if values.ndim == 1 else values.shape[1]
        if np.issubdtype(values.dtype, np.integer):
            self._point_attrs[name] = (
                list(values.ravel()), size, attribData.Int
            )
        elif np.issubdtype(values.dtype, np.floating):
            self._point_attrs[name] = (
                list(np.float32(values).ravel()), size, attribData.Float
            )
        else:  # strings: present so the adapter's skip-warning path runs
            self._point_attrs[name] = (
                list(values.ravel()), size, attribData.String
            )

    def _add_prim(self, point_numbers: List[int]) -> None:
        self._prims.append(_Prim(point_numbers))

    def _add_group(self, name: str, numbers: List[int]) -> None:
        self._groups.append(_PointGroup(name, numbers))


def geometry_from_mesh(mesh) -> Geometry:
    """Build a mock Geometry from a facedeform_tpu Mesh (test helper)."""
    g = Geometry()
    g._set_points(mesh.points)
    for name, vals in mesh.point_attrs.items():
        g._add_point_attr(name, vals)
    if mesh.faces is not None:
        for row in mesh.faces:
            g._add_prim([int(i) for i in row if i >= 0])
    for name, mask in mesh.point_groups.items():
        g._add_group(name, list(np.flatnonzero(mask)))
    return g


class _Parm:
    def __init__(self, value) -> None:
        self._value = value

    def eval(self):
        return self._value


class SopNode:
    """Mock SOP node: wraps a Geometry, carries parms / inputs / cookCount."""

    def __init__(self, path: str, geometry: Optional[Geometry] = None,
                 parms: Optional[dict] = None, inputs: tuple = ()) -> None:
        self._path = path
        self._geometry = geometry if geometry is not None else Geometry()
        self._parms = dict(parms or {})
        self._inputs = tuple(inputs)
        self._cook_count = 1

    def path(self) -> str:
        return self._path

    def cookCount(self) -> int:
        return self._cook_count

    def geometry(self) -> Geometry:
        return self._geometry

    def inputs(self) -> tuple:
        return self._inputs

    def parm(self, name: str) -> Optional[_Parm]:
        v = self._parms.get(name)
        if v is None or isinstance(v, tuple):
            return None
        return _Parm(v)

    def parmTuple(self, name: str) -> Optional[_Parm]:
        v = self._parms.get(name)
        if not isinstance(v, tuple):
            return None
        return _Parm(v)


# ------------------------------------------------------ parm template mocks
class _ParmTemplate:
    def __init__(self, name: str, label: str, **kw) -> None:
        self._name, self._label, self._kw = name, label, kw

    def name(self) -> str:
        return self._name


class StringParmTemplate(_ParmTemplate):
    def __init__(self, name, label, n, default_value=()):
        super().__init__(name, label, n=n, default_value=default_value)


class MenuParmTemplate(_ParmTemplate):
    def __init__(self, name, label, items, menu_labels=(), default_value=0):
        super().__init__(name, label, items=items, menu_labels=menu_labels,
                         default_value=default_value)


class FloatParmTemplate(_ParmTemplate):
    def __init__(self, name, label, n, default_value=(), min=None, max=None):
        super().__init__(name, label, n=n, default_value=default_value,
                         min=min, max=max)


class IntParmTemplate(FloatParmTemplate):
    pass


class ToggleParmTemplate(_ParmTemplate):
    def __init__(self, name, label, default_value=False):
        super().__init__(name, label, default_value=default_value)


class _ParmTemplateGroup:
    def __init__(self, entries=()) -> None:
        self._entries = list(entries)

    def entries(self):
        return list(self._entries)

    def append(self, t) -> None:
        self._entries.append(t)


class _Definition:
    def __init__(self) -> None:
        self._ptg = _ParmTemplateGroup()

    def parmTemplateGroup(self):
        return self._ptg

    def setParmTemplateGroup(self, ptg) -> None:
        self._ptg = ptg
