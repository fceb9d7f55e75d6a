"""Native C++ fastgeo library: build, load, and equivalence vs numpy paths."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from facedeform_tpu import native
from facedeform_tpu.geometry.primitives import uv_sphere
from facedeform_tpu.geometry.topology import adjacency_csr, unique_edges

needs_native = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


@needs_native
def test_bfs_matches_python(rng):
    mesh = uv_sphere(30, 30)
    indptr, indices = adjacency_csr(mesh.num_points, unique_edges(mesh.faces))
    seeds = rng.integers(0, mesh.num_points, size=5).astype(np.int64)
    got = native.bfs_rings(indptr, indices, seeds, 3)
    # reference python BFS
    visited = np.zeros(mesh.num_points, bool)
    visited[seeds] = True
    frontier = set(seeds.tolist())
    for _ in range(3):
        nxt = set()
        for v in frontier:
            for u in indices[indptr[v]:indptr[v + 1]]:
                if not visited[u]:
                    visited[u] = True
                    nxt.add(int(u))
        frontier = nxt
    np.testing.assert_array_equal(got, visited)


@needs_native
def test_nearest_matches_ckdtree(rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    queries = rng.standard_normal((100, 3)).astype(np.float32)
    got = native.nearest(pts, queries)
    _, want = cKDTree(pts).query(queries)
    # ties can break differently; compare distances instead of indices
    d_got = np.linalg.norm(pts[got] - queries, axis=1)
    d_want = np.linalg.norm(pts[want] - queries, axis=1)
    np.testing.assert_allclose(d_got, d_want, atol=1e-6)


@needs_native
def test_adjacency_matches_numpy():
    mesh = uv_sphere(20, 20)
    got = native.build_adjacency(mesh.faces, mesh.num_points)
    want_indptr, want_indices = adjacency_csr(mesh.num_points, unique_edges(mesh.faces))
    got_indptr, got_indices = got
    np.testing.assert_array_equal(got_indptr, want_indptr)
    # per-row neighbor sets must match (order within a row is unspecified)
    for v in range(mesh.num_points):
        a = np.sort(got_indices[got_indptr[v]:got_indptr[v + 1]])
        b = np.sort(want_indices[want_indptr[v]:want_indptr[v + 1]])
        np.testing.assert_array_equal(a, b)


@needs_native
def test_bfs_degenerate_fanned_quads():
    """Fanned triangle padding (a, b, b) must not create self-edges."""
    faces = np.int32([[0, 1, 2, 2], [1, 2, 3, 3]])
    adj = native.build_adjacency(faces, 4)
    indptr, indices = adj
    for v in range(4):
        row = indices[indptr[v]:indptr[v + 1]]
        assert v not in row
