"""Control-point-sharded Krylov fit: rigs too large for one chip's sweep.

The eval path shards VERTICES and replicates the (tiny) control data
(parallel/sharding.py) — the design promoted from the reference's disabled
thread pool.  The FIT is the opposite regime: its cost is the N^2 kernel
sweep inside every Krylov matvec.  This module shards the matvec's ROW
COMPUTATION across the ICI mesh (SURVEY.md section 5 flagged this as the
designed-for extension: "if N grew too large to replicate... accumulate
partial Phi x"):

    ctrl rows sharded on the 1-D mesh ('v' axis, D devices)
    x (the Krylov vector, (N + m, k)) replicated — 100k x 3 f32 is 1.2 MB,
        far cheaper to replicate than to ring-pass
    each device computes its (N/D, N) row block of [Phi + lam I | P] x
    out_specs P('v'): the sharded result reassembles on use

Per-iteration compute drops from N^2 to N^2/D per chip; the only
steady-state communication is the implicit gather of the sharded matvec
output (N x k) back to replicated form for the Krylov recurrences —
O(N k) bytes over ICI per iteration, vanishing next to the N^2/D flops.

The Krylov recurrences themselves (norms, axpys, Givens) run replicated:
they are O(N k) and not worth distributing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from facedeform_tpu.config import DeformConfig, DeformParams, RBFModelType
from facedeform_tpu.ops import fit as fit_mod
from facedeform_tpu.ops.assemble import assemble_rhs, poly_basis
from facedeform_tpu.ops.kernels import apply_kernel, kernel_is_pd, pairwise_sqdist
from facedeform_tpu.ops.solve import SolveReport
from facedeform_tpu.parallel.sharding import VERTEX_AXIS


def make_sharded_saddle_matvec(
    ctrl: jnp.ndarray,
    kernel,
    term,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    mesh: Mesh,
    tail_reg: float = 1e-8,
    chunk: int = 1024,
):
    """Row-sharded matvec for the (N + m, N + m) saddle system.

    Same math as ops.krylov.make_saddle_matvec (column-wise eps for QNN),
    with the (N, N) kernel sweep split across the mesh's devices.
    """
    n = ctrl.shape[0]
    n_dev = mesh.shape[VERTEX_AXIS]
    p = poly_basis(ctrl, term)  # (N, m), replicated (tiny)
    m = p.shape[1]
    eps = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (n,))
    # Pad the row axis so it splits evenly; padded rows are discarded.
    pad = (-n) % (n_dev * chunk)
    ctrl_rows = jnp.pad(ctrl, ((0, pad), (0, 0)))

    def local_rows(c_rows, xw):
        """One device's row block: phi(local_rows, ALL ctrl) @ xw."""
        rows = c_rows.shape[0]
        n_chunks = rows // chunk

        def row_chunk(c):
            d2 = pairwise_sqdist(c, ctrl)          # (chunk, N)
            phi = apply_kernel(kernel, d2, eps)    # col-wise eps (QNN-safe)
            return jnp.dot(
                phi, xw,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        out = jax.lax.map(row_chunk, c_rows.reshape(n_chunks, chunk, 3))
        return out.reshape(rows, -1)

    def matvec(x: jnp.ndarray) -> jnp.ndarray:  # replicated (N + m, k)
        xw, xc = x[:n], x[n:]
        # The gather back to replicated form is EXPLICIT (one tiled
        # all_gather per matvec, O(N k) bytes — the communication the
        # module docstring budgets).  Returning the output sharded
        # (out_specs P('v')) and letting the replicated Krylov
        # recurrences consume it looks equivalent, but GSPMD then has to
        # invent the resharding itself: measured 460 collective-permutes
        # + 80 all-to-alls + 70 all-gathers in the compiled module versus
        # all-gathers only for this formulation
        # (tests/test_collectives_audit.py enforces it).
        y_full = jax.shard_map(
            lambda c: jax.lax.all_gather(
                local_rows(c, xw), VERTEX_AXIS, tiled=True
            ),
            mesh=mesh,
            in_specs=(P(VERTEX_AXIS),),
            out_specs=P(),
            check_vma=False,
        )(ctrl_rows)
        y_top = y_full[:n] + lam * xw
        if m:
            y_top = y_top + jnp.dot(
                p, xc, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            y_bot = jnp.dot(
                p.T, xw, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ) - tail_reg * xc
            return jnp.concatenate([y_top, y_bot], axis=0)
        return y_top

    return matvec


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def fit_sharded(
    rest_ctrl: jnp.ndarray,
    deformed_ctrl: jnp.ndarray,
    cfg: DeformConfig,
    params: DeformParams,
    mesh: Mesh,
) -> tuple[fit_mod.RBFModel, SolveReport]:
    """Krylov fit with the N^2 matvec sharded across the device mesh.

    Same routing as ops.fit's krylov branch — GMRES for QNN's
    non-symmetric per-point-radius system, block-Jacobi PMINRES for PD
    kernels, MINRES for CPD — but every system application runs
    row-sharded.  The block-Jacobi preconditioner is built and applied
    replicated (O(N * block) work, negligible next to N^2/D).

    Returns the same (RBFModel, SolveReport) contract as ops.fit.fit; the
    model is replicated, ready for the vertex-sharded eval path.
    """
    from facedeform_tpu.ops.krylov import (
        gmres, make_abs_block_jacobi, make_block_jacobi, pminres,
    )

    params = params.clamped()
    rest_ctrl = rest_ctrl.astype(jnp.float32)
    delta = deformed_ctrl.astype(jnp.float32) - rest_ctrl
    n = rest_ctrl.shape[0]
    kernel = fit_mod.effective_kernel(cfg)
    n_layers = cfg.n_layers

    if cfg.model == RBFModelType.QNN:
        eps0 = fit_mod._qnn_radii(rest_ctrl, params.qcoef, params.zcoef)
        lam0 = jnp.asarray(0.0, jnp.float32)
    else:
        eps0 = jnp.broadcast_to(params.radius, (n,)).astype(jnp.float32)
        lam0 = jnp.asarray(params.lam, jnp.float32)

    w_layers, eps_layers, reports = [], [], []
    w_poly = jnp.zeros((cfg.n_poly, 3), dtype=jnp.float32)
    target = delta

    for layer in range(n_layers):
        eps_l = eps0 * (0.5 ** layer)
        term = cfg.term if layer == 0 else type(cfg.term)(2)  # ZERO
        b = assemble_rhs(target, term)
        apply_sys = make_sharded_saddle_matvec(
            rest_ctrl, kernel, term, eps_l, lam0, mesh
        )
        if cfg.model == RBFModelType.QNN:
            msolve = make_block_jacobi(rest_ctrl, kernel, term, eps_l, lam0)
            x, report = gmres(apply_sys, b, msolve=msolve)
            for _ in range(max(cfg.n_refine - 1, 0)):
                x, report = gmres(apply_sys, b, msolve=msolve, x0=x)
        elif kernel_is_pd(kernel):
            msolve = make_block_jacobi(rest_ctrl, kernel, term, eps_l, lam0)
            x, report = pminres(apply_sys, b, msolve)
            for _ in range(max(cfg.n_refine - 1, 0)):
                x, report = pminres(apply_sys, b, msolve, x0=x)
        else:
            # CPD kernels: SPD |.|-block-Jacobi (see ops.krylov), built
            # and applied replicated like the PD preconditioner above.
            msolve = make_abs_block_jacobi(rest_ctrl, kernel, term, eps_l, lam0)
            x, report = pminres(apply_sys, b, msolve)
            for _ in range(max(cfg.n_refine - 1, 0)):
                x, report = pminres(apply_sys, b, msolve, x0=x)

        w_l = x[:n]
        w_layers.append(w_l)
        eps_layers.append(eps_l)
        reports.append(report)
        if layer == 0 and cfg.n_poly > 0:
            w_poly = x[n:]
        if layer + 1 < n_layers:
            ax = apply_sys(x)
            target = target - (ax[:n] - lam0 * w_l)

    model = fit_mod.RBFModel(
        ctrl=rest_ctrl,
        w_rbf=jnp.stack(w_layers),
        w_poly=w_poly,
        eps=jnp.stack(eps_layers),
    )
    return model, fit_mod._worst_report(reports)
