"""Procedural test geometry: spheres and grids for tests and benchmarks.

The reference ships no fixtures (SURVEY.md section 4); BASELINE config 1
calls for a 10k-vertex sphere, config 5 for a 1M-vertex mesh.
"""

from __future__ import annotations

import numpy as np

from facedeform_tpu.geometry.mesh import Mesh


def uv_sphere(n_u: int = 100, n_v: int = 100, radius: float = 1.0) -> Mesh:
    """Quad-faced UV sphere with n_u * n_v interior vertices + 2 poles."""
    theta = np.linspace(0.0, np.pi, n_v + 2)[1:-1]          # exclude poles
    phi = np.linspace(0.0, 2.0 * np.pi, n_u, endpoint=False)
    t, p = np.meshgrid(theta, phi, indexing="ij")            # (n_v, n_u)
    pts = np.stack(
        [np.sin(t) * np.cos(p), np.cos(t), np.sin(t) * np.sin(p)], axis=-1
    ).reshape(-1, 3) * radius
    north = np.array([[0.0, radius, 0.0]])
    south = np.array([[0.0, -radius, 0.0]])
    points = np.concatenate([pts, north, south], axis=0).astype(np.float32)
    ni, si = len(pts), len(pts) + 1

    def vid(i, j):
        return i * n_u + (j % n_u)

    quads = []
    for i in range(n_v - 1):
        for j in range(n_u):
            quads.append([vid(i, j), vid(i, j + 1), vid(i + 1, j + 1), vid(i + 1, j)])
    tris = []
    for j in range(n_u):
        tris.append([ni, vid(0, j + 1), vid(0, j)])
        tris.append([si, vid(n_v - 1, j), vid(n_v - 1, j + 1)])
    faces = np.array(
        quads + [[t[0], t[1], t[2], t[2]] for t in tris], dtype=np.int32
    )
    return Mesh(points=points, faces=faces)


def grid(nx: int = 100, ny: int = 100, size: float = 2.0) -> Mesh:
    """Planar quad grid in the XZ plane centered at origin."""
    xs = np.linspace(-size / 2, size / 2, nx)
    zs = np.linspace(-size / 2, size / 2, ny)
    x, z = np.meshgrid(xs, zs, indexing="ij")
    pts = np.stack([x, np.zeros_like(x), z], axis=-1).reshape(-1, 3)
    quads = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            quads.append([a, a + 1, a + ny + 1, a + ny])
    return Mesh(points=pts.astype(np.float32), faces=np.array(quads, np.int32))


def fibonacci_points(n: int, radius: float = 1.0, seed: int = 0) -> np.ndarray:
    """N near-uniform points on a sphere (control-rig stand-in); (N, 3) f32."""
    i = np.arange(n, dtype=np.float64) + 0.5
    ga = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    th = ga * i
    pts = np.stack([r * np.cos(th), y, r * np.sin(th)], axis=-1) * radius
    return pts.astype(np.float32)
