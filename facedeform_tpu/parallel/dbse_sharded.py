"""Vertex-sharded DBSE: blendshape Gram reductions over the ICI mesh.

For production-size meshes the blendshape delta basis (S, V, 3) is the
largest resident tensor (S=50 shapes x 1M vertices x 3 = 600 MB f32).
Sharding it over the vertex axis makes the least-squares weight fit a
textbook distributed normal-equations problem:

    G = sum_v B_v^T B_v     (S x S)   -> psum over the vertex axis
    c = sum_v B_v^T d_v     (S,)      -> psum over the vertex axis
    w = solve(G + ridge, c)           -> replicated tiny solve per chip

This is exactly the collective pattern SURVEY.md section 5 anticipates
("DBSE Gram matrix B^T B reductions" are one of the three legitimate psums
in the whole design).  The reconstruction disp = sum_s w_s B_s is
embarrassingly vertex-parallel and needs no communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from facedeform_tpu.ops.dbse import DBSEModel
from facedeform_tpu.ops.solve import cholesky_solve_refined
from facedeform_tpu.parallel.sharding import VERTEX_AXIS

_HP = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _pad_v(x: jnp.ndarray, n_dev: int, axis: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % n_dev
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("mesh",))
def weights_lstsq_sharded(
    deltas: jnp.ndarray,     # (S, V, 3) blendshape deltas
    current: jnp.ndarray,    # (V, 3)
    rest: jnp.ndarray,       # (V, 3)
    mesh: Mesh,
    ridge: float = 1e-6,
):
    """Least-squares blendshape weights with all O(V) work vertex-sharded.

    Equivalent to ops.dbse.weights_lstsq (zero-padding the vertex axis
    contributes zero to both G and c); returns ((S,) weights, SolveReport),
    both replicated.  The report is the same normwise Gram-solve health
    signal the single-device path feeds errors.check_solve — the Gram
    matrix is psum-reduced before the solve, so every device computes the
    identical report (the sharded path must not silently skip the
    terminationtype check of src/SOP_FaceDeform.cpp:363-368).
    """
    n_dev = mesh.shape[VERTEX_AXIS]
    s = deltas.shape[0]
    deltas_p = _pad_v(deltas.astype(jnp.float32), n_dev, axis=1)
    d_p = _pad_v((current - rest).astype(jnp.float32), n_dev, axis=0)

    def local(b_shard, d_shard):
        g = jnp.einsum("svc,tvc->st", b_shard, b_shard, **_HP)
        c = jnp.einsum("svc,vc->s", b_shard, d_shard, **_HP)
        g = jax.lax.psum(g, VERTEX_AXIS)
        c = jax.lax.psum(c, VERTEX_AXIS)
        reg = ridge * jnp.trace(g) / s + 1e-30
        w, report = cholesky_solve_refined(
            g + reg * jnp.eye(s, dtype=g.dtype), c[:, None]
        )
        return w[:, 0], report

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, VERTEX_AXIS, None), P(VERTEX_AXIS, None)),
        out_specs=P(),
        check_vma=False,
    )(deltas_p, d_p)


@functools.partial(jax.jit, static_argnames=("mesh", "n_iter"))
def weights_robust_sharded(
    deltas: jnp.ndarray,     # (S, V, 3) blendshape deltas
    current: jnp.ndarray,    # (V, 3)
    rest: jnp.ndarray,       # (V, 3)
    mesh: Mesh,
    ridge: float = 1e-6,
    n_iter: int = 4,
):
    """Huber-IRLS blendshape weights with all O(V) work vertex-sharded.

    Same iteration as ops.dbse.weights_robust: per-sweep residual norms are
    local to each shard; the MAD scale needs the GLOBAL median, so the (V,)
    residual-norm vector is all-gathered (4 MB at 1M vertices — the only
    non-psum collective, and tiny next to the (S, V, 3) basis).  The
    zero-padded tail rows sit at the end of the gathered vector, so slicing
    to the static V drops them before the median (zeros would bias the MAD
    low).  Gram/RHS reductions are the same psums as weights_lstsq_sharded;
    padded rows have b = d = 0 so their u never matters.
    """
    n_dev = mesh.shape[VERTEX_AXIS]
    s = deltas.shape[0]
    v = current.shape[0]
    deltas_p = _pad_v(deltas.astype(jnp.float32), n_dev, axis=1)
    d_p = _pad_v((current - rest).astype(jnp.float32), n_dev, axis=0)

    from facedeform_tpu.ops.dbse import huber_scale, huber_vertex_weights

    def local(b_shard, d_shard):
        eye = jnp.eye(s, dtype=jnp.float32)

        def solve(u):
            g = jnp.einsum("svc,v,tvc->st", b_shard, u, b_shard, **_HP)
            c = jnp.einsum("svc,v,vc->s", b_shard, u, d_shard, **_HP)
            g = jax.lax.psum(g, VERTEX_AXIS)
            c = jax.lax.psum(c, VERTEX_AXIS)
            reg = ridge * jnp.trace(g) / s + 1e-30
            return cholesky_solve_refined(g + reg * eye, c[:, None])

        u = jnp.ones(d_shard.shape[0], jnp.float32)
        w, report = solve(u)
        for _ in range(n_iter):
            r_loc = jnp.linalg.norm(
                jnp.einsum("s,svc->vc", w[:, 0], b_shard, **_HP) - d_shard,
                axis=1,
            )
            r_all = jax.lax.all_gather(r_loc, VERTEX_AXIS, tiled=True)[:v]
            u = huber_vertex_weights(r_loc, huber_scale(r_all))
            w, report = solve(u)
        return w[:, 0], report

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, VERTEX_AXIS, None), P(VERTEX_AXIS, None)),
        out_specs=P(),
        check_vma=False,
    )(deltas_p, d_p)


@functools.partial(jax.jit, static_argnames=("mesh",))
def reconstruct_sharded(
    deltas: jnp.ndarray,     # (S, V, 3)
    weights: jnp.ndarray,    # (S,)
    mesh: Mesh,
) -> jnp.ndarray:
    """disp = sum_s w_s * deltas[s] with the vertex axis sharded; (V, 3)."""
    n_dev = mesh.shape[VERTEX_AXIS]
    v = deltas.shape[1]
    deltas_p = _pad_v(deltas.astype(jnp.float32), n_dev, axis=1)

    def local(b_shard, w):
        return jnp.einsum("svc,s->vc", b_shard, w.astype(jnp.float32), **_HP)

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, VERTEX_AXIS, None), P()),
        out_specs=P(VERTEX_AXIS, None),
        check_vma=False,
    )(deltas_p, weights)
    return out[:v]


def morph_pass_sharded(
    model: DBSEModel,
    positions: jnp.ndarray,
    rest: jnp.ndarray,
    mesh: Mesh,
    clamp=None,
    parity_scale: bool = False,
    ridge: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full sharded morph projection: (new positions (V, 3), weights (S,)).

    Mirrors the single-device path: lstsq weights -> optional clamp/scale ->
    P = rest + sum_s B_s cw_s (the dofalloff residual term is applied by the
    caller, as in node.py).
    """
    w, _ = weights_lstsq_sharded(model.deltas, positions, rest, mesh, ridge)
    cw = w * 3.0 if parity_scale else w
    if clamp is not None:
        cw = jnp.clip(cw, clamp[0], clamp[1])
    disp = reconstruct_sharded(model.deltas, cw, mesh)
    return rest + disp, w
