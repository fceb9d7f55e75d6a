"""Multi-host helpers: fast single-process coverage over the 8-CPU mesh.

These tests run in-process (one process, 8 forced CPU devices) for
speed; the REAL process-boundary semantics — two OS processes under
jax.distributed, each materializing only its own slab, ragged V through
the pre-pad contract — are covered by test_multihost_2proc.py, which
spawns a genuine 2-process run with a localhost coordinator.
"""

import numpy as np
import jax
import jax.numpy as jnp

from facedeform_tpu import DeformConfig, DeformParams, Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
from facedeform_tpu.parallel import multihost, sharding


def test_initialize_single_process_is_noop():
    multihost.initialize()  # no coordinator -> returns without touching jax
    assert jax.process_count() == 1


def test_host_slice_single_process_covers_all():
    mesh = sharding.make_mesh()
    n_dev = mesh.shape[sharding.VERTEX_AXIS]
    sl = multihost.host_slice(8 * n_dev, mesh)
    assert (sl.start, sl.stop) == (0, 8 * n_dev)


def test_host_slice_rejects_ragged():
    mesh = sharding.make_mesh()
    n_dev = mesh.shape[sharding.VERTEX_AXIS]
    if n_dev > 1:
        try:
            multihost.host_slice(8 * n_dev + 1, mesh)
            assert False, "expected ValueError"
        except ValueError:
            pass


def test_global_array_flow_matches_local(rng):
    """host_slice + global_vertex_array + sharded_apply == local apply."""
    mesh = sharding.make_mesh()
    n_dev = mesh.shape[sharding.VERTEX_AXIS]
    v = 16 * n_dev
    rest = fibonacci_points(30)
    d = Deformer.fit(rest, rest * 1.05, DeformConfig(), DeformParams())

    points = rng.standard_normal((v, 3)).astype(np.float32)
    dist2 = np.abs(rng.standard_normal(v)).astype(np.float32)
    gate = np.ones(v, np.float32)

    sl = multihost.host_slice(v, mesh)
    g_pts = multihost.global_vertex_array(points[sl], mesh)
    g_d2 = multihost.global_vertex_array(dist2[sl], mesh)
    g_gate = multihost.global_vertex_array(gate[sl], mesh)
    assert g_pts.shape == (v, 3)
    g_model = multihost.replicated(d.model, mesh)

    new_pts, w = sharding.sharded_apply(
        g_model, g_pts, g_d2, g_gate, d.cfg, d.params, mesh
    )
    ref_pts, ref_w = d.apply(points, dist2=dist2, backend="dense")
    np.testing.assert_allclose(
        np.asarray(new_pts), np.asarray(ref_pts), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w), atol=1e-6)


def test_replicated_pytree_sharding():
    mesh = sharding.make_mesh()
    rest = fibonacci_points(20)
    d = Deformer.fit(rest, rest * 1.02, DeformConfig(), DeformParams())
    g_model = multihost.replicated(d.model, mesh)
    leaf = jax.tree.leaves(g_model)[0]
    assert leaf.sharding.is_fully_replicated


def test_initialize_pod_autodetect(monkeypatch):
    """Multi-worker pod markers trigger argless jax.distributed.initialize
    (auto-detection); single-host markers (this dev box exports a 1-entry
    TPU_WORKER_HOSTNAMES) stay a no-op."""
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **k: calls.append((a, k)),
    )
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "only-host")
    multihost.initialize()
    assert calls == []  # 1 worker -> single-host no-op
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    multihost.initialize()
    assert calls == [((), {})]  # argless auto-detect path
    calls.clear()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "")
    monkeypatch.setenv("MEGASCALE_COORDINATOR_ADDRESS", "c:8476")
    multihost.initialize()
    assert calls == [((), {})]
