"""Wavefront OBJ load/save for the Mesh container (L1 substrate I/O).

The reference reads geometry through Houdini's node inputs; standalone use
needs a disk format.  OBJ covers positions + polygonal faces; named point
attributes ride sidecar .npz files (OBJ has no attribute concept beyond
normals/uvs, which are mapped to `N`/`uv` when per-vertex).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from facedeform_tpu.geometry.mesh import Mesh


def load_obj(path: str, load_attrs: bool = True) -> Mesh:
    """Load an OBJ file; v/vn/f records (faces triangulated as stored when
    uniform arity, else fanned to triangles).  A sidecar `<path>.attrs.npz`
    restores point/detail attributes saved by save_obj."""
    verts = []
    normals = []
    faces = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vn "):
                normals.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                faces.append(idx)
    points = np.asarray(verts, np.float32)
    face_arr: Optional[np.ndarray] = None
    if faces:
        arity = {len(fc) for fc in faces}
        if len(arity) == 1:
            face_arr = np.asarray(faces, np.int32)
        else:  # mixed arity: fan-triangulate
            tris = []
            for fc in faces:
                for i in range(1, len(fc) - 1):
                    tris.append([fc[0], fc[i], fc[i + 1]])
            face_arr = np.asarray(tris, np.int32)
    mesh = Mesh(points=points, faces=face_arr)
    if normals and len(normals) == len(verts):
        mesh.set_attr("N", np.asarray(normals, np.float32))
    sidecar = path + ".attrs.npz"
    if load_attrs and os.path.exists(sidecar):
        data = np.load(sidecar)
        for key in data.files:
            kind, name = key.split(":", 1)
            if kind == "point":
                mesh.set_attr(name, data[key])
            else:
                mesh.detail_attrs[name] = data[key]
    return mesh


def save_obj(path: str, mesh: Mesh, save_attrs: bool = True) -> None:
    """Write positions/faces (+ `N` as vn); other attributes go to the
    `<path>.attrs.npz` sidecar."""
    with open(path, "w") as f:
        f.write("# facedeform-tpu\n")
        for p in mesh.points:
            f.write(f"v {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        n = mesh.attr("N")
        if n is not None:
            for v in n:
                f.write(f"vn {v[0]:.9g} {v[1]:.9g} {v[2]:.9g}\n")
        if mesh.faces is not None:
            for face in mesh.faces:
                f.write("f " + " ".join(str(int(i) + 1) for i in face) + "\n")
    if save_attrs:
        payload = {}
        for name, arr in mesh.point_attrs.items():
            if name == "N":
                continue
            payload[f"point:{name}"] = arr
        for name, arr in mesh.detail_attrs.items():
            payload[f"detail:{name}"] = np.asarray(arr)
        if payload:
            np.savez(path + ".attrs.npz", **payload)
