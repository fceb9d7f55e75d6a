"""Multi-host (DCN) deployment: process init + host-local vertex shards.

A single v5e host tops out at 8 chips; production faces past ~8M vertices
(or many faces batched) want a multi-host slice.  The reference has no
distributed story at all (single Houdini process; SURVEY.md section 5),
so this module is the rebuild's promotion of the same replicated-model /
sharded-vertices design across hosts:

  * every process runs THE SAME program (standard JAX SPMD over DCN);
  * the RBF solve is replicated per host (the (N+m)^2 system is tiny next
    to one DCN round trip — same reasoning as the per-thread model copies
    of the reference's disabled pool, src/SOP_FaceDeform.hpp:132-133);
  * each host materializes only its OWN vertex slab (`host_slice`), wraps
    it into a global array (`global_vertex_array`), and the vertex-sharded
    eval (`sharding.sharded_apply`) runs with zero steady-state
    collectives — DCN carries nothing but the one diagnostic pmax.

Typical driver::

    from facedeform_tpu.parallel import multihost, sharding

    multihost.initialize()                  # env-driven (no-op single host)
    mesh = sharding.make_mesh()             # all devices, every process
    sl = multihost.host_slice(V, mesh)      # this host's vertex range
    pts = multihost.global_vertex_array(local_points[sl], mesh)  # (V, 3)
    d2 = multihost.global_vertex_array(local_dist2[sl], mesh)
    ...
    new_pts, w = sharding.sharded_apply(model, pts, d2, gate, cfg, p, mesh)

`sharded_apply` pads V to the device count internally; callers padding
hosts unevenly should pre-pad V to a multiple of the global device count
so `host_slice` tiles exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facedeform_tpu.parallel.sharding import VERTEX_AXIS


def _managed_pod_is_multihost() -> bool:
    """True on a managed MULTI-host TPU pod where argless
    jax.distributed.initialize() can auto-detect everything.

    Single-host TPU VMs also export TPU_WORKER_HOSTNAMES (with one entry),
    so the marker must show at least two workers — otherwise a plain
    dev box would wrongly attempt distributed init (observed: this repo's
    own TPU runtime sets a 1-entry TPU_WORKER_HOSTNAMES).
    """
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) >= 2


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env/pod auto-detection; safe no-op
    on a genuinely single-process host.

    Resolution order:
      1. explicit args, or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
         JAX_PROCESS_ID env config (non-cloud clusters) -> initialize
         with them;
      2. a managed multi-host TPU pod (Cloud TPU / megascale worker env
         markers present) -> argless jax.distributed.initialize(), which
         auto-detects coordinator and process ids from the platform —
         WITHOUT this branch each pod worker would silently run as an
         independent single-process job and compute duplicated per-host
         results;
      3. otherwise: single host, nothing to coordinate, return.

    Call before any other JAX API touches devices.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and (num_processes or 1) <= 1:
        if _managed_pod_is_multihost():
            jax.distributed.initialize()  # platform auto-detection
        return  # single host: nothing to coordinate
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_slice(v_total: int, mesh: Mesh) -> slice:
    """This process's contiguous vertex range under the 1-D vertex mesh.

    The mesh lays devices out in `jax.devices()` order, which enumerates
    process 0's local devices first, then process 1's, ... — so each
    host's shard set is one contiguous slab of the (padded) vertex axis.
    Requires v_total to divide evenly into per-device slabs (pre-pad to a
    multiple of the global device count otherwise).
    """
    n_dev = mesh.shape[VERTEX_AXIS]
    if v_total % n_dev:
        raise ValueError(
            f"v_total={v_total} must be a multiple of the {n_dev}-device "
            "mesh; pre-pad the vertex arrays"
        )
    per_dev = v_total // n_dev
    devs = np.asarray(mesh.devices).reshape(-1)
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    if not mine:
        return slice(0, 0)
    lo, hi = min(mine), max(mine) + 1
    if mine != list(range(lo, hi)):
        raise ValueError(
            "mesh devices of this process are not contiguous; build the "
            "mesh with sharding.make_mesh() (jax.devices() order)"
        )
    return slice(lo * per_dev, hi * per_dev)


def global_vertex_array(local_rows: np.ndarray, mesh: Mesh, v_total: int | None = None):
    """Wrap this host's vertex rows into a global vertex-sharded jax.Array.

    `local_rows` is exactly the `host_slice` slab (first axis).  Every
    process calls this with its own slab; the result is a (v_total, ...)
    global array sharded P('v') that sharded_apply consumes without any
    cross-host data movement.
    """
    local_rows = np.ascontiguousarray(local_rows)
    if v_total is None:
        n_local = len([
            d for d in np.asarray(mesh.devices).reshape(-1)
            if d.process_index == jax.process_index()
        ])
        # every host holds the same share: local slab x (devices/local).
        # The inference is only valid for equal-size slabs — hosts with
        # uneven slabs MUST pass v_total explicitly or the global shape
        # handed to make_array_from_process_local_data is wrong.
        if n_local == 0 or local_rows.shape[0] % n_local:
            raise ValueError(
                f"local slab of {local_rows.shape[0]} rows does not divide "
                f"across this host's {n_local} mesh devices; pass v_total "
                "explicitly (uneven host slabs cannot be inferred)"
            )
        v_total = local_rows.shape[0] * (mesh.shape[VERTEX_AXIS] // n_local)
    else:
        sl = host_slice(v_total, mesh)
        if local_rows.shape[0] != sl.stop - sl.start:
            raise ValueError(
                f"local slab has {local_rows.shape[0]} rows but "
                f"host_slice({v_total}) expects {sl.stop - sl.start}"
            )
    sharding = NamedSharding(mesh, P(VERTEX_AXIS))
    global_shape = (v_total,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_rows, global_shape
    )


def replicated(value, mesh: Mesh):
    """Place a host-identical value (model weights, control points) as a
    fully replicated global array — every process must pass equal bytes
    (the replicated-solve contract)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), np.asarray(x).shape
        ),
        value,
    )
