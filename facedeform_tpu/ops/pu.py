"""Partition-of-unity (PU) RBF deformation: any-N rigs at dense precision.

The global RBF fit has two scaling walls, both documented in README:
XLA's dense LU runs out of VMEM near 16k controls, and past it the
matrix-free f32 Krylov solves of the growing kernels (TPS/MQ/...) stall
at the eps*kappa matvec noise floor (~1e-4 backward error).  The
classical fix — and the spirit of ALGLIB v2's hierarchical models the
reference leans on (src/SOP_FaceDeform.cpp:347) — is partition of unity
(Wendland 2002): cover the control cloud with K overlapping spatial
patches, solve each patch's SMALL dense system at full double-float
precision, and blend the local interpolants with compactly-supported
weights

    s(x) = sum_k W_k(x) s_k(x) / sum_k W_k(x),
    W_k(x) = wendland((|x - c_k| / R_k)),

which is TPU-shaped end to end: the fit is a BATCH of (P+m)^2 LU-IR
solves (vmapped over patches), and the eval is tiles of (tile_v x P)
fused distance->phi->contract blocks — O(V * P * coverage) work instead
of the global O(V * N).

Exact interpolation at every control point holds BY CONSTRUCTION at
lam=0 (the QNN/interpolation route): patch k's control set is every
control within its support radius R_k, so at a control x_i every patch
with W_k(x_i) > 0 interpolates it and the blend of values d_i is d_i.
With a ridge (fit_pu's default lam=0.01, or the user ridge on non-QNN
families) the per-patch solves smooth, and controls are approximated,
not interpolated.  Patch coverage of the controls is likewise
guaranteed (each control lies within its own slab's support).  Query
points outside every support (far from the rig) fall back to their
nearest patch's local interpolant — the PU analogue of RBF
extrapolation; fields are C^2-smooth inside the covered region (Wendland
C2 blend weights).

Host-side patch/plan construction is cached by callers like capture
(kd cells + cKDTree ball queries); everything per-frame is jitted.

Measured (v5e, 50k-control TPS, defaults patch_size=192 / overlap=1.3):
interp error at controls 7.5e-8 (the matrix-free Krylov route floors at
~1e-4 backward there), warm fit 1.32 s (512 batched (552)^2 df LU +
stationary df-IR solves, device-resident chunks of 128), 500k-point
host-buffer eval 0.36 s at coverage 2.8.  Round-2 host-chauffeured
GMRES-IR fit was 19.5 s on the same config: ~4x of it chunk pull/push
over the tunnel, the rest Krylov sweeps the spacing-scale conditioning
doesn't need (see lu_solve_refined_against_df).  Sweeps: overlap 1.6 ->
1.3 cut P 835 -> 548 and halved eval time at identical error; patch_size
96 raised K to 1024 and slowed the fit (XLA's batched LU is not
flops-bound in P).
"""

from __future__ import annotations

import dataclasses as _dataclasses
import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from facedeform_tpu.config import PolyTerm, RBFKernel
from facedeform_tpu.ops.kernels import apply_kernel
from facedeform_tpu.ops.solve import SolveReport
from facedeform_tpu.utils.platform import on_tpu

_HP = dict(
    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
)


# --------------------------------------------------------------- host build
def _median_nn(pts: np.ndarray) -> float:
    """Median nearest-neighbor distance (the local fill scale)."""
    from scipy.spatial import cKDTree

    if len(pts) < 2:
        return 1.0
    d, _ = cKDTree(pts).query(pts, k=2)
    return float(max(np.median(d[:, 1]), 1e-9))


def _kd_cells(pts: np.ndarray, cell_size: int) -> list:
    """Recursive widest-axis median splits into cells of <= cell_size.

    Guarantees spatially COMPACT cells (each is the intersection of
    half-spaces), unlike Z-order slabs whose curve discontinuities can
    hand one slab points from opposite ends of the cloud — observed on a
    sphere rig: one slab's bounding ball swallowed the entire rig and the
    padded patch width exploded to N.
    """
    out: list = []

    def split(idx: np.ndarray) -> None:
        if len(idx) <= cell_size:
            out.append(idx)
            return
        p = pts[idx]
        axis = int(np.argmax(p.max(axis=0) - p.min(axis=0)))
        half = len(idx) // 2
        part = np.argpartition(p[:, axis], half)
        split(idx[part[:half]])
        split(idx[part[half:]])

    split(np.arange(len(pts), dtype=np.int64))
    return out


class PUPatches(NamedTuple):
    """Static (host-built) patch geometry; all arrays numpy."""

    centers: np.ndarray   # (K, 3) f32
    radii: np.ndarray     # (K,)  f32 support radii
    idx: np.ndarray       # (K, P) int32 control indices, -1 padded
    counts: np.ndarray    # (K,)  int32 live controls per patch
    spacing: np.ndarray   # (K,)  f32 median nearest-neighbor distance


def build_patches(
    ctrl: np.ndarray, patch_size: int = 192, overlap: float = 1.3,
    width_bucket: int = 64,
) -> PUPatches:
    """kd-cells -> overlapping ball patches covering every control.

    Invariant (exactness): patch k's control set is EVERY control within
    R_k of its center — never truncated — so "in support => interpolated
    by that patch" holds.  P (the padded width) is therefore data-driven:
    denser overlap raises it.  overlap multiplies each slab's bounding
    radius into its support radius; >1 guarantees every control sits
    strictly inside its own slab's support.

    width_bucket rounds P up to a multiple (default 64) so that DIFFERENT
    rigs whose natural widths land in the same bucket reuse one compiled
    fit/eval program.  Remote first-compiles cost minutes per distinct
    shape (a 200k-control rig's fresh width paid 307 s); the extra masked
    columns cost ~P'/P in compute (<=1-2% at production widths, measured
    noise-level at P 570 -> 576).  Pass width_bucket=1 for exact widths.
    """
    from scipy.spatial import cKDTree

    bucket = max(int(width_bucket), 1)
    pad_to = lambda p: -(-p // bucket) * bucket

    ctrl = np.asarray(ctrl, np.float32)
    n = ctrl.shape[0]
    if n <= patch_size:
        centers = ctrl.mean(axis=0, keepdims=True)
        r = float(np.linalg.norm(ctrl - centers, axis=1).max()) * overlap
        idx = np.full((1, pad_to(n)), -1, np.int32)
        idx[0, :n] = np.arange(n, dtype=np.int32)
        return PUPatches(
            centers.astype(np.float32),
            np.asarray([max(r, 1e-6)], np.float32),
            idx,
            np.asarray([n], np.int32),
            np.asarray([_median_nn(ctrl)], np.float32),
        )
    slabs = _kd_cells(ctrl, patch_size)
    centers = np.stack([ctrl[s].mean(axis=0) for s in slabs])
    r_slab = np.asarray(
        [np.linalg.norm(ctrl[s] - c, axis=1).max() for s, c in zip(slabs, centers)]
    )
    radii = np.maximum(r_slab * overlap, 1e-6).astype(np.float32)
    tree = cKDTree(ctrl)
    sets = [
        np.asarray(tree.query_ball_point(c, r), np.int32)
        for c, r in zip(centers, radii)
    ]
    pmax = pad_to(max(len(s) for s in sets))
    idx = np.full((len(sets), pmax), -1, np.int32)
    for k, s in enumerate(sets):
        idx[k, : len(s)] = s
    counts = np.asarray([len(s) for s in sets], np.int32)
    spacing = np.asarray([_median_nn(ctrl[s]) for s in slabs], np.float32)
    return PUPatches(centers.astype(np.float32), radii, idx, counts, spacing)


class PUModel(NamedTuple):
    """Fitted PU model (pytree of arrays; kernel/term passed separately)."""

    centers: jnp.ndarray  # (K, 3)
    radii: jnp.ndarray    # (K,)
    ctrl: jnp.ndarray     # (K, P, 3) padded patch controls
    valid: jnp.ndarray    # (K, P) f32 mask
    w_hi: jnp.ndarray     # (K, P, 3) double-float local RBF weights
    w_lo: jnp.ndarray     # (K, P, 3)
    poly_hi: jnp.ndarray  # (K, m, 3) local polynomial tails (centered basis)
    poly_lo: jnp.ndarray  # (K, m, 3)
    eps: jnp.ndarray      # (K,) per-patch kernel radius (see fit_pu eps="auto")


def _n_poly(term: PolyTerm) -> int:
    return {PolyTerm.LINEAR: 4, PolyTerm.CONSTANT: 1, PolyTerm.ZERO: 0}[
        PolyTerm(term)
    ]


def _patch_poly_basis(local: jnp.ndarray, valid: jnp.ndarray, term: PolyTerm):
    """(P, m) basis on CENTERED coordinates; padded rows zeroed."""
    m = _n_poly(term)
    if m == 0:
        return jnp.zeros(local.shape[:-1] + (0,), jnp.float32)
    cols = [jnp.ones_like(local[..., 0])]
    if m == 4:
        cols += [local[..., 0], local[..., 1], local[..., 2]]
    p = jnp.stack(cols, axis=-1)
    return p * valid[..., None]


def _assemble_patch_df(
    ctrl_k: jnp.ndarray,   # (P, 3) padded (pad rows arbitrary)
    valid: jnp.ndarray,    # (P,) f32
    center: jnp.ndarray,   # (3,)
    kernel: RBFKernel,
    term: PolyTerm,
    eps: jnp.ndarray,
    lam: jnp.ndarray,
    tail_reg: float = 1e-8,
):
    """One patch's saddle system in double-float, padding masked to I.

    Identical math to assemble_system_df but (a) coordinates are centered
    on the patch (conditioning + consistent poly basis), (b) padded
    rows/cols become identity rows with zero rhs so their solution is 0.
    lam may be a scalar or a (P,) per-marker ridge (confidence weighting
    — `lam * eye` broadcasts either way into diag(lam)).
    """
    from facedeform_tpu.ops.dfloat import (
        _phi_df, _sqdist_df, _two_prod, df_mul, df_recip,
    )

    p_ = ctrl_k.shape[0]
    local = (ctrl_k - center) * valid[:, None]  # padded rows pinned at 0
    d2 = _sqdist_df(local, local)
    eps_v = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (p_,))
    eps2 = _two_prod(eps_v, eps_v)
    ieps2 = df_recip(eps2)
    s = df_mul(d2, (ieps2[0][None, :], ieps2[1][None, :]))
    phi_hi, phi_lo = _phi_df(kernel, s)
    mask2 = (valid[:, None] * valid[None, :]) > 0
    eye = jnp.eye(p_, dtype=jnp.float32)
    phi_hi = jnp.where(mask2, phi_hi + lam * eye, eye)
    phi_lo = jnp.where(mask2, phi_lo, 0.0)
    pb = _patch_poly_basis(local, valid, term)  # (P, m)
    m = pb.shape[-1]
    if m == 0:
        return phi_hi, phi_lo, local
    tail = -tail_reg * jnp.eye(m, dtype=jnp.float32)
    a_hi = jnp.concatenate(
        [
            jnp.concatenate([phi_hi, pb], axis=1),
            jnp.concatenate([pb.T, tail], axis=1),
        ],
        axis=0,
    )
    a_lo = jnp.zeros_like(a_hi).at[:p_, :p_].set(phi_lo)
    return a_hi, a_lo, local


def _fit_chunk_core(
    ctrl_chunk: jnp.ndarray,    # (C, P, 3)
    valid_chunk: jnp.ndarray,   # (C, P)
    centers_chunk: jnp.ndarray, # (C, 3)
    rhs_chunk: jnp.ndarray,     # (C, P, 3)
    eps_chunk: jnp.ndarray,     # (C,)
    kernel: RBFKernel,
    term: PolyTerm,
    lam: jnp.ndarray,
    gmres_ir: bool = True,
):
    """Batched df assembly + LU-IR solve for a chunk of patches.

    lam: scalar shared ridge, or (C, P) per-patch per-marker ridges
    (confidence weighting, gathered patch-wise by _fit_pu_rhs).
    """
    from facedeform_tpu.ops.solve import lu_solve_refined_against_df

    m = _n_poly(term)

    def one(ctrl_k, valid, center, rhs, eps, lam_k):
        out = _assemble_patch_df(
            ctrl_k, valid, center, kernel, term, eps, lam_k
        )
        a_hi, a_lo = out[0], out[1]
        # rhs may carry 3 columns (one pose) or 3F (an animated sequence,
        # fit_pu_frames): the patch system depends only on the rest rig,
        # so every frame shares this assembly + LU factorization.
        b = jnp.concatenate(
            [rhs * valid[:, None],
             jnp.zeros((m, rhs.shape[-1]), jnp.float32)], axis=0
        )
        (x_hi, x_lo), report = lu_solve_refined_against_df(
            a_hi, a_lo, b, gmres_ir=gmres_ir
        )
        return x_hi, x_lo, report

    lam_b = jnp.asarray(lam, jnp.float32)
    if lam_b.ndim < 2:
        lam_b = jnp.broadcast_to(lam_b, ctrl_chunk.shape[:2])
    return jax.vmap(one)(
        ctrl_chunk, valid_chunk, centers_chunk, rhs_chunk, eps_chunk, lam_b
    )


_fit_chunk = jax.jit(
    _fit_chunk_core, static_argnames=("kernel", "term", "gmres_ir")
)


@functools.cache
def _sharded_fitter(mesh, kernel: RBFKernel, term: PolyTerm, chunk: int,
                    gmres_ir: bool = True):
    """One-dispatch fit: patches sharded over the mesh's vertex axis;
    each device lax.map's its local patches in chunk-bounded batches.

    Patches are independent (embarrassingly parallel), so the program has
    ZERO collectives — the chip analogue of ALGLIB's internally-threaded
    any-N rbfbuildmodel (src/SOP_FaceDeform.cpp:363).  The chunk bound
    keeps the per-device batched-LU working set at
    chunk x (P+m)^2 x ~6 buffers regardless of patch count.
    """
    from jax.sharding import PartitionSpec as P

    from facedeform_tpu.parallel.sharding import VERTEX_AXIS

    def local(ctrl_l, valid_l, centers_l, rhs_l, eps_l, lam_l):
        s = ctrl_l.shape[0] // chunk
        part = lambda a: a.reshape((s, chunk) + a.shape[1:])
        x_hi, x_lo, rep = jax.lax.map(
            lambda t: _fit_chunk_core(*t[:5], kernel, term, t[5], gmres_ir),
            (part(ctrl_l), part(valid_l), part(centers_l),
             part(rhs_l), part(eps_l), part(lam_l)),
        )
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        return flat(x_hi), flat(x_lo), jax.tree.map(flat, rep)

    spec = P(VERTEX_AXIS)
    fn = jax.shard_map(
        local, mesh=mesh,
        # lam rides the patch axis too: (K, P) per-patch per-marker
        # ridges (confidence weighting) shard exactly like the controls
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec),
        # purely local per-shard compute (no collectives); the solver's
        # fori_loop carries trip the varying-manual-axes typecheck the
        # same way pallas_call does (CLAUDE.md) — disable it
        check_vma=False,
    )
    return jax.jit(fn)


def fit_pu(
    rest_ctrl,
    deformed_ctrl,
    kernel: RBFKernel = RBFKernel.THIN_PLATE,
    term: PolyTerm = PolyTerm.LINEAR,
    eps="auto",
    lam: float = 0.01,
    patch_size: int = 192,
    overlap: float = 1.3,
    # None = auto: the largest chunk whose chunk x (P+m)^2 x ~6-buffer
    # working set fits a ~2 GB budget, capped at 128 (measured on v5e at
    # 30k ctrl / P=570 with device-resident chunks: 32/64/128/256 ->
    # 5.9/5.4/5.0/5.1 s warm)
    chunk: Optional[int] = None,
    patches: Optional[PUPatches] = None,
    mesh=None,
    confidence=None,
) -> tuple[PUModel, SolveReport]:
    """Fit a PU-RBF displacement model at any N (dense df per patch).

    `confidence` ((N,) per-marker quality in (0, 1]) applies the weighted
    ridge lam_i = lam / c_i within every patch — glitched markers are
    smoothed over locally instead of interpolated (needs lam > 0 to have
    an effect, like the global families).

    eps="auto" (default) sets each patch's kernel radius to 2x its median
    nearest-neighbor spacing — the classical PU shape-parameter choice.
    A global eps >= the patch scale makes MQ/gaussian local bases nearly
    flat (columns collinear with the polynomial tail): measured cond
    4.7e10 at eps=0.5 on a 1.0-radius patch vs 2.2e6 at the spacing
    scale, which is the difference between a 5e-3 and a 5e-5 interpolant.
    Pass a float to force a shared radius anyway (TPS barely cares; the
    flat-limit caveat applies to the others).

    patches may be passed in (cached by callers on the rig's pos_id);
    chunk bounds the batched-LU working set (chunk x (P+m)^2 buffers).

    mesh (a jax.sharding.Mesh) distributes the independent patch solves
    across its devices in ONE dispatch (zero collectives); without it the
    chunks run as a host-driven loop on the default device.  Either way
    every buffer stays device-resident — the fit never pulls a chunk
    through the host (the round-2 chauffeur cost: ~4x the solution bytes
    over the tunnel).
    """
    rest_np = np.asarray(rest_ctrl, np.float32)
    delta = np.asarray(deformed_ctrl, np.float32) - rest_np
    if patches is None:
        patches = build_patches(rest_np, patch_size, overlap)
    safe_idx = np.maximum(patches.idx, 0)
    rhs_pad = delta[safe_idx]                         # (K, P, 3)
    model, agg, _ = _fit_pu_rhs(
        rest_np, patches, rhs_pad, kernel, term, eps, lam, chunk, mesh,
        confidence=confidence,
    )
    return model, agg


def fit_pu_frames(
    rest_ctrl,
    deformed_frames,
    kernel: RBFKernel = RBFKernel.THIN_PLATE,
    term: PolyTerm = PolyTerm.LINEAR,
    eps="auto",
    lam: float = 0.01,
    patch_size: int = 192,
    overlap: float = 1.3,
    chunk: Optional[int] = None,
    patches: Optional[PUPatches] = None,
    mesh=None,
    confidence=None,
) -> tuple[list[PUModel], SolveReport]:
    """Fit F posed frames of one rest rig: (N, 3), (F, N, 3) -> F models.

    The any-N analogue of parallel/batched.fit_frames: every patch system
    depends ONLY on the rest rig (the deformed positions are pure RHS),
    so all F frames share one df assembly + batched LU factorization and
    differ only in 3F right-hand-side columns.  Sharing covers the
    assembly + O(P^3) factorization; the df refinement sweeps still scale
    with the column count, so the measured win is an F-frame fit well
    under F independent fits (0.47x of 8 fits at F=8, 20k controls,
    patch_size=192 — benchmarks/run_all.py config 10), not ~1/F.

    Returns per-frame PUModels (static geometry shared by reference) and
    one aggregate SolveReport across all patches and frames.  The models
    evaluate with a SHARED plan — see PUSeqDeformer.
    """
    rest_np = np.asarray(rest_ctrl, np.float32)
    frames = np.asarray(deformed_frames, np.float32)
    if frames.ndim != 3 or frames.shape[1:] != rest_np.shape:
        raise ValueError(
            f"deformed_frames {frames.shape} must be (F,) + rest "
            f"{rest_np.shape}"
        )
    f_n = frames.shape[0]
    if patches is None:
        patches = build_patches(rest_np, patch_size, overlap)
    k_, p_ = patches.idx.shape
    safe_idx = np.maximum(patches.idx, 0)
    delta = frames - rest_np[None]                    # (F, N, 3)
    # (F, K, P, 3) -> (K, P, F*3): frame f occupies columns 3f..3f+2
    rhs_pad = np.ascontiguousarray(
        delta[:, safe_idx].transpose(1, 2, 0, 3).reshape(k_, p_, 3 * f_n)
    )
    model_all, agg, (x_hi, x_lo) = _fit_pu_rhs(
        rest_np, patches, rhs_pad, kernel, term, eps, lam, chunk, mesh,
        confidence=confidence,
    )
    m = _n_poly(term)
    # split the 3F solution columns back into per-frame (K, P+m, 3) views
    def col(a, f):
        return a.reshape(a.shape[0], a.shape[1], f_n, 3)[:, :, f]

    models = [
        PUModel(
            centers=model_all.centers, radii=model_all.radii,
            ctrl=model_all.ctrl, valid=model_all.valid,
            w_hi=col(x_hi, f)[:, :p_], w_lo=col(x_lo, f)[:, :p_],
            poly_hi=col(x_hi, f)[:, p_:] if m else jnp.zeros((k_, 0, 3)),
            poly_lo=col(x_lo, f)[:, p_:] if m else jnp.zeros((k_, 0, 3)),
            eps=model_all.eps,
        )
        for f in range(f_n)
    ]
    return models, agg


def _fit_pu_rhs(
    rest_np: np.ndarray,
    patches: PUPatches,
    rhs_pad: np.ndarray,   # (K, P, C) — C=3 single pose, 3F sequence
    kernel: RBFKernel,
    term: PolyTerm,
    eps,
    lam: float,
    chunk: Optional[int],
    mesh,
    confidence=None,
):
    """Shared fit machinery: chunked/sharded batched df LU-IR solves.

    `confidence` ((N,) per-marker quality in (0, 1]) applies the weighted
    ridge lam_i = lam / c_i inside every patch it appears in — the same
    contract as the global families (ops/fit._family_radii), gathered
    patch-wise.

    Returns (PUModel built from the first 3 solution columns, aggregate
    SolveReport over every patch and column, raw (x_hi, x_lo) of shape
    (K, P+m, C) for callers that carry extra frame columns).
    """
    k_, p_ = patches.idx.shape
    safe_idx = np.maximum(patches.idx, 0)
    ctrl_pad = rest_np[safe_idx]                      # (K, P, 3)
    valid = (patches.idx >= 0).astype(np.float32)
    if confidence is not None:
        if float(lam) == 0.0:
            # QNN-style exact interpolation: lam/c stays 0, so confidence
            # would be a silent no-op — fail loudly instead (the node
            # warns-and-ignores before it gets here; direct API and serve
            # callers get this error)
            raise ValueError(
                "confidence weighting needs lam > 0 (weighted ridge "
                "lam / c); exact interpolation (lam = 0, the QNN recipe) "
                "makes it a no-op"
            )
        from facedeform_tpu.ops.fit import confidence_clipped

        c = np.asarray(confidence_clipped(confidence, rest_np.shape[0]))
        lam_pat = (float(lam) / c)[safe_idx].astype(np.float32)  # (K, P)
    else:
        lam_pat = np.full((k_, p_), float(lam), np.float32)

    if isinstance(eps, str):
        if eps != "auto":
            raise ValueError(f"eps must be a float or 'auto', got {eps!r}")
        eps_arr = (2.0 * patches.spacing).astype(np.float32)
    else:
        eps_arr = np.full(k_, float(eps), np.float32)
    # auto-eps patches are well conditioned (~2e6 at the spacing scale):
    # stationary df-IR contracts and costs ~30x fewer triangular solves
    # than GMRES-IR per sweep (see lu_solve_refined_against_df); forced
    # global eps can reach cond ~5e10 and must keep the Krylov correction
    gmres_ir = not isinstance(eps, str)
    if chunk is None:
        # The solver's 3-column RHS blocking (lu_solve_refined_against_df)
        # makes peak memory independent of the RHS width, so the budget
        # only tracks the (chunk, P+m, P+m) squares — without that
        # blocking an 8-frame fit_pu_frames at P+m=751 demanded 17.6 GB
        # of HBM from the refinement's pairwise-tree temps alone.
        sys_bytes = (p_ + _n_poly(term)) ** 2 * 4 * 6
        chunk = max(8, min(128, (2 << 30) // sys_bytes))

    # Pad the WHOLE batch once (host-side; duplicate last patch) so every
    # chunk/device slab has the same jit shape, upload each buffer in one
    # h2d, and keep all chunk solutions device-resident.
    if mesh is not None:
        n_dev = int(np.asarray(mesh.devices).size)
        k_loc = -(-k_ // n_dev)                      # patches per device
        chunk_eff = min(chunk, k_loc)
        k_loc = -(-k_loc // chunk_eff) * chunk_eff   # chunk multiple
        k_pad = n_dev * k_loc
    else:
        chunk_eff = chunk
        k_pad = -(-k_ // chunk) * chunk
    reps = k_pad - k_
    pad1 = (
        (lambda a: np.concatenate([a, np.repeat(a[-1:], reps, 0)]))
        if reps else (lambda a: a)
    )
    ctrl_b, valid_b, cen_b, rhs_b, eps_b, lam_b = (
        pad1(ctrl_pad), pad1(valid), pad1(patches.centers),
        pad1(rhs_pad), pad1(eps_arr), pad1(lam_pat),
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from facedeform_tpu.parallel.sharding import VERTEX_AXIS

        sh = NamedSharding(mesh, P(VERTEX_AXIS))
        put = lambda a: jax.device_put(np.ascontiguousarray(a), sh)
        fitter = _sharded_fitter(mesh, kernel, term, chunk_eff, gmres_ir)
        x_hi, x_lo, rep_all = fitter(
            put(ctrl_b), put(valid_b), put(cen_b), put(rhs_b), put(eps_b),
            put(lam_b),
        )
    else:
        ctrl_d, valid_d, cen_d, rhs_d, eps_d, lam_d = map(
            jnp.asarray, (ctrl_b, valid_b, cen_b, rhs_b, eps_b, lam_b)
        )
        outs = []
        for start in range(0, k_pad, chunk_eff):
            sl = slice(start, start + chunk_eff)
            outs.append(_fit_chunk(
                ctrl_d[sl], valid_d[sl], cen_d[sl], rhs_d[sl], eps_d[sl],
                kernel, term, lam_d[sl], gmres_ir,
            ))
        x_hi = jnp.concatenate([o[0] for o in outs])
        x_lo = jnp.concatenate([o[1] for o in outs])
        rep_all = jax.tree.map(
            lambda *xs: jnp.concatenate(xs), *[o[2] for o in outs]
        )
    # Drop the padded duplicate patches (they must not overweight the
    # aggregate report) — a device-side slice, not a host pull.
    x_hi, x_lo = x_hi[:k_], x_lo[:k_]          # (K, P+m, C)
    rep_all = jax.tree.map(lambda a: a[:k_], rep_all)
    m = _n_poly(term)
    model = PUModel(
        centers=jnp.asarray(patches.centers),
        radii=jnp.asarray(patches.radii),
        ctrl=jnp.asarray(ctrl_pad),
        valid=jnp.asarray(valid),
        w_hi=x_hi[:, :p_, :3],
        w_lo=x_lo[:, :p_, :3],
        poly_hi=x_hi[:, p_:, :3] if m else jnp.zeros((k_, 0, 3)),
        poly_lo=x_lo[:, p_:, :3] if m else jnp.zeros((k_, 0, 3)),
        eps=jnp.asarray(eps_arr),
    )
    # Aggregate health across all patches, on device (reports carry a
    # leading patch dim per leaf).
    agg = SolveReport(
        residual_norm=jnp.linalg.norm(jnp.ravel(rep_all.residual_norm)),
        rhs_norm=jnp.linalg.norm(jnp.ravel(rep_all.rhs_norm)),
        # norm of per-patch denominators: keeps backward_error() a true
        # normwise aggregate over the batched solves
        scale_norm=jnp.linalg.norm(jnp.ravel(rep_all.scale_norm)),
        cond_est=None,
        # per-COLUMN worst over all patches, shape (C,): for a 3F-column
        # sequence fit this localizes a bad solve to its frame (serve
        # reports it per frame) instead of one global max
        col_backward=jnp.nanmax(rep_all.col_backward, axis=0),
    )
    return model, agg, (x_hi, x_lo)


# --------------------------------------------------------------- eval plan
class PUEvalPlan(NamedTuple):
    """Host-built (query-points x patches) tiling; cache on mesh.pos_id.

    tiles_patch[t] is the single patch tile t evaluates; tiles_vidx[t] the
    query-point rows it covers (-1 padding).  `forced` marks fallback
    items (point outside every support -> nearest patch, blend weight 1).
    """

    tiles_patch: np.ndarray  # (T,)  int32
    tiles_vidx: np.ndarray   # (T, tile_v) int32, -1 pad
    forced: np.ndarray       # (T, tile_v) f32 (1.0 = fallback item)
    num_points: int



def coverage_and_fallback(patches: PUPatches, points: np.ndarray):
    """Shared coverage/fallback policy for both eval-plan builders.

    Returns (per_patch_hits, covered, (uncovered_idx, picked_patch)).
    Coverage needs a margin: at r -> R the Wendland blend weight
    underflows ((1-r/R)^4 ~ 1e-29 inside the last 1e-7 of the support),
    and a point whose ONLY patch weight underflows would divide ~0/clamp
    and read as undeformed — a C0 seam right at the coverage boundary.
    Points in the thin (0.9999R, R] shell therefore ALSO get the
    nearest-patch fallback; the blend stays continuous because a
    single-patch ratio W s / W equals s at any W > 0.  Factored here so
    the per-patch (plan_eval) and vertex-tile (pallas_pu.plan_eval_tiles)
    builders cannot drift on this seam-avoidance policy.
    """
    from scipy.spatial import cKDTree

    points = np.asarray(points, np.float32)
    v = points.shape[0]
    k_ = patches.centers.shape[0]
    tree = cKDTree(points)
    margin = 0.9999
    per_patch: list = []
    covered = np.zeros(v, bool)
    for k in range(k_):
        hits = np.asarray(
            tree.query_ball_point(patches.centers[k], patches.radii[k]),
            np.int64,
        )
        per_patch.append(hits)
        if hits.size:
            d = np.linalg.norm(points[hits] - patches.centers[k], axis=1)
            covered[hits[d <= margin * patches.radii[k]]] = True
    if covered.all():
        return per_patch, covered, (np.zeros(0, np.int64), np.zeros(0, np.int64))
    un = np.nonzero(~covered)[0]
    ctree = cKDTree(patches.centers)
    # nearest center whose ball is closest RELATIVE to its radius
    kq = min(4, k_)
    dists, nearest = ctree.query(points[un], k=kq)
    dists = np.asarray(dists).reshape(len(un), kq)
    nearest = np.asarray(nearest).reshape(len(un), kq)
    rel = dists / patches.radii[nearest]
    pick = nearest[np.arange(len(un)), rel.argmin(axis=1)]
    return per_patch, covered, (un, pick.astype(np.int64))


def plan_eval(
    patches: PUPatches, points: np.ndarray, tile_v: int = 256
) -> PUEvalPlan:
    """Assign every query point its covering patches (+ nearest-patch
    fallback when uncovered), packed into fixed-size per-patch tiles."""
    points = np.asarray(points, np.float32)
    v = points.shape[0]
    k_ = patches.centers.shape[0]
    per_patch, covered, (un, pick) = coverage_and_fallback(patches, points)
    forced_lists: list[list[int]] = [[] for _ in range(k_)]
    for vi, k in zip(un, pick):
        forced_lists[int(k)].append(int(vi))

    tiles_patch, tiles_vidx, tiles_forced = [], [], []
    for k in range(k_):
        items = list(per_patch[k]) + forced_lists[k]
        flags = [0.0] * len(per_patch[k]) + [1.0] * len(forced_lists[k])
        for i in range(0, len(items), tile_v):
            chunk_i = items[i: i + tile_v]
            chunk_f = flags[i: i + tile_v]
            pad = tile_v - len(chunk_i)
            tiles_patch.append(k)
            tiles_vidx.append(chunk_i + [-1] * pad)
            tiles_forced.append(chunk_f + [0.0] * pad)
    if not tiles_patch:  # degenerate: no patches (empty rig) — no tiles
        tiles_patch, tiles_vidx, tiles_forced = [0], [[-1] * tile_v], [[0.0] * tile_v]
    return PUEvalPlan(
        tiles_patch=np.asarray(tiles_patch, np.int32),
        tiles_vidx=np.asarray(tiles_vidx, np.int32),
        forced=np.asarray(tiles_forced, np.float32),
        num_points=v,
    )


# The PU blend weight IS the Wendland C2 kernel — reuse the zoo's
# implementation (ops/kernels.apply_kernel) rather than re-deriving the
# polynomial here and letting two copies drift.


def _tile_frame(model: PUModel, kidx, vidx, pts, num_points: int):
    """One tile's centered geometry: (x, xl, local, valid).

    Shared by the value eval and the Jacobian so the two paths see the
    same masked patch frame by construction.
    """
    x = pts[jnp.clip(vidx, 0, num_points - 1)]             # (tv, 3)
    ctrl_k = model.ctrl[kidx]                              # (P, 3)
    valid = model.valid[kidx]                              # (P,)
    center = model.centers[kidx]
    local = (ctrl_k - center) * valid[:, None]
    return x, x - center, local, valid


def _tile_f32_disp(model: PUModel, kidx, xl, local, valid,
                   kernel: RBFKernel, term: PolyTerm):
    """Plain-f32 local interpolant on centered queries; returns (disp,
    phi, d2).  The ONE definition of the f32 value semantics — the
    Jacobian path consumes the same disp/phi so transported normals can
    never drift from the positions the value path produced."""
    d2 = (
        jnp.sum(xl * xl, axis=1)[:, None]
        - 2.0 * jnp.dot(xl, local.T, **_HP)
        + jnp.sum(local * local, axis=1)[None, :]
    )
    d2 = jnp.maximum(d2, 0.0)
    phi = apply_kernel(kernel, d2, model.eps[kidx]) * valid[None, :]
    disp = jnp.dot(phi, model.w_hi[kidx], **_HP) + jnp.dot(
        phi, model.w_lo[kidx], **_HP
    )
    if model.poly_hi.shape[1]:
        pb = _patch_poly_basis(xl, jnp.ones(xl.shape[0]), term)
        disp = disp + jnp.dot(
            pb, model.poly_hi[kidx] + model.poly_lo[kidx], **_HP
        )
    return disp, phi, d2



def _lru_hit(cache: dict, key):
    """Bounded-LRU lookup: a hit re-inserts at MRU position."""
    val = cache.pop(key, None)
    if val is not None:
        cache[key] = val
    return val


def _lru_put(cache: dict, key, val, cap: int = 8) -> None:
    """Bounded-LRU insert: evict the oldest entries past `cap`.

    ONE implementation for both plan caches (PUDeformer._cached_plan and
    PUNodeDeformer's keyed cache) so the eviction policy cannot drift
    between them (round-5 review finding)."""
    cache.pop(key, None)
    while len(cache) >= cap:
        cache.pop(next(iter(cache)))
    cache[key] = val


def _tile_blend_weight(model: PUModel, kidx, xl, vidx, force):
    """Wendland partition weight with the forced-fallback and padding
    gates applied; returns (bw, d2c, r_k)."""
    d2c = jnp.sum(xl * xl, axis=1)
    r_k = jnp.maximum(model.radii[kidx], 1e-30)
    bw = apply_kernel(RBFKernel.WENDLAND_C2, d2c, r_k)
    bw = jnp.where(force > 0, 1.0, bw)                     # fallback items
    bw = jnp.where(vidx >= 0, bw, 0.0)                     # padding
    return bw, d2c, r_k


@functools.partial(
    jax.jit, static_argnames=("kernel", "term", "num_points", "precise")
)
def evaluate_pu(
    model: PUModel,
    points: jnp.ndarray,
    tiles_patch: jnp.ndarray,
    tiles_vidx: jnp.ndarray,
    forced: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    num_points: int,
    precise: bool = True,
) -> jnp.ndarray:
    """PU displacement field: (V, 3) from the tiled eval plan.

    Per tile: (tile_v x P) distance -> phi -> df-weight contraction
    against ONE patch (dynamic index), Wendland blend weight, then a
    global segment-sum over query rows normalizes the partition.
    """
    pts = points.astype(jnp.float32)
    m = model.poly_hi.shape[1]

    from facedeform_tpu.ops.precise_eval import GROWING_KERNELS

    # precise is an explicit static arg (not read from ambient state inside
    # the traced body — the jit cache key must see it)
    use_df = precise and kernel in GROWING_KERNELS

    def one_tile(args):
        kidx, vidx, force = args
        x, xl, local, valid = _tile_frame(model, kidx, vidx, pts, num_points)
        w_hi, w_lo = model.w_hi[kidx], model.w_lo[kidx]
        if use_df:
            # Growing kernels: patch-local MQ/TPS bases are nearly flat
            # across the patch, so the weights cancel massively against
            # the polynomial tail — an f32 contraction loses
            # u * sum|phi w| ~ 1e-3 (measured on MQ).  Compute phi and
            # the contraction in double-float, like the global precise
            # eval path (ops/precise_eval.py).
            from facedeform_tpu.ops.dfloat import (
                _df_sum_axis0, _phi_df, _sqdist_df, _two_prod,
                df_add, df_mul, df_recip,
            )

            d2 = _sqdist_df(xl, local)                     # (tv, P) df
            eps_v = jnp.broadcast_to(model.eps[kidx], (local.shape[0],))
            e2 = _two_prod(eps_v, eps_v)
            ie2 = df_recip(e2)
            s = df_mul(d2, (ie2[0][None, :], ie2[1][None, :]))
            ph, pl = _phi_df(kernel, s)
            ph = ph * valid[None, :]
            pl = pl * valid[None, :]
            prod = df_mul(
                (ph[:, :, None], pl[:, :, None]),
                (w_hi[None], w_lo[None]),
            )                                              # (tv, P, 3) df
            hi, lo = _df_sum_axis0(
                jnp.moveaxis(prod[0], 1, 0), jnp.moveaxis(prod[1], 1, 0)
            )
            disp_df = (hi, lo)
            if m:
                pb = _patch_poly_basis(xl, jnp.ones(x.shape[0]), term)
                tail = (
                    jnp.dot(pb, model.poly_hi[kidx], **_HP),
                    jnp.dot(pb, model.poly_lo[kidx], **_HP),
                )
                disp_df = df_add(disp_df, tail)
            disp = disp_df[0] + disp_df[1]
        else:
            disp, _, _ = _tile_f32_disp(model, kidx, xl, local, valid,
                                        kernel, term)
        w, _, _ = _tile_blend_weight(model, kidx, xl, vidx, force)
        return disp * w[:, None], w

    # batch_size vmaps groups of tiles: a bare sequential scan over ~1e4
    # tiny (tile_v x P) blocks would serialize the chip.
    disp_t, w_t = jax.lax.map(
        one_tile, (tiles_patch, tiles_vidx, forced), batch_size=64
    )                                                       # (T, tv, 3/())
    seg = jnp.where(
        tiles_vidx.reshape(-1) >= 0, tiles_vidx.reshape(-1), num_points
    )
    acc_d = jax.ops.segment_sum(
        disp_t.reshape(-1, 3), seg, num_segments=num_points + 1
    )[:num_points]
    acc_w = jax.ops.segment_sum(
        w_t.reshape(-1), seg, num_segments=num_points + 1
    )[:num_points]
    # plan_eval's coverage margin guarantees every live point has either a
    # non-underflowed blend weight or a forced (w=1) fallback item, so
    # acc_w > ~5e-17 always; the where keeps the op total for empty rows.
    return jnp.where(
        (acc_w > 1e-30)[:, None], acc_d / jnp.maximum(acc_w, 1e-30)[:, None], 0.0
    )


@functools.partial(jax.jit, static_argnames=("kernel", "term", "num_points"))
def jacobian_pu(
    model: PUModel,
    points: jnp.ndarray,
    tiles_patch: jnp.ndarray,
    tiles_vidx: jnp.ndarray,
    forced: jnp.ndarray,
    kernel: RBFKernel,
    term: PolyTerm,
    num_points: int,
) -> jnp.ndarray:
    """Spatial Jacobian of the PU displacement field; (V, 3, 3) f32.

    s(x) = sum_k W_k s_k / sum_k W_k, so by the quotient rule

        J = [sum_k (W_k J_k + s_k (grad W_k)^T)] / SW
            - s(x) [sum_k grad W_k]^T / SW

    with J_k the local interpolant's analytic Jacobian (kernels.phi_prime_s
    — finite at r = 0) and grad W_k the Wendland blend gradient.  Forced
    fallback items carry constant weight 1, so their grad W_k = 0 and the
    far-field Jacobian is exactly the nearest patch's J_k (matching
    evaluate_pu's value fallback).  One fused segment_sum accumulates all
    four per-item quantities packed as 16 columns.

    f32 on purpose: this feeds normal transport (direction-only,
    re-normalized), not quantitative strain — the df machinery the value
    eval needs for growing kernels buys nothing after normalization.
    """
    pts = points.astype(jnp.float32)
    m = model.poly_hi.shape[1]

    def one_tile(args):
        kidx, vidx, force = args
        x, xl, local, valid = _tile_frame(model, kidx, vidx, pts, num_points)
        # disp via the SAME f32 value helper evaluate_pu runs — transported
        # normals cannot drift from the positions the value path produced
        disp, _, d2 = _tile_f32_disp(model, kidx, xl, local, valid,
                                     kernel, term)
        w = model.w_hi[kidx] + model.w_lo[kidx]             # (P, 3)
        eps_k = model.eps[kidx]
        inv_e2 = 1.0 / (eps_k * eps_k)
        from facedeform_tpu.ops.kernels import phi_prime_s

        g = (2.0 * inv_e2) * phi_prime_s(kernel, d2 * inv_e2) * valid[None, :]
        # J_k = (g @ w) xl^T - g @ (w outer local)  (two matmuls, no
        # (tv, P, 3) intermediate — same shape trick as ops/jacobian.py)
        sum_gw = jnp.dot(g, w, **_HP)                       # (tv, 3)
        w_outer = (w[:, :, None] * local[:, None, :]).reshape(-1, 9)
        t = jnp.dot(g, w_outer, **_HP).reshape(-1, 3, 3)
        jk = sum_gw[:, :, None] * xl[:, None, :] - t        # (tv, 3, 3)
        if m >= 4:
            # centered basis [1, xl]: d(P c)_a / d x_b = c[1 + b, a]
            jk = jk + (model.poly_hi[kidx] + model.poly_lo[kidx])[1:4].T[None]
        # Wendland blend weight (shared gating) + its gradient
        bw, d2c, r_k = _tile_blend_weight(model, kidx, xl, vidx, force)
        gw_scalar = (2.0 / (r_k * r_k)) * phi_prime_s(
            RBFKernel.WENDLAND_C2, d2c / (r_k * r_k)
        )
        live = (vidx >= 0).astype(jnp.float32)
        gw = jnp.where(force > 0, 0.0, gw_scalar)[:, None] * xl * live[:, None]
        num = bw[:, None, None] * jk + disp[:, :, None] * gw[:, None, :]
        packed = jnp.concatenate(
            [
                num.reshape(-1, 9),
                bw[:, None] * disp,
                gw,
                bw[:, None],
            ],
            axis=1,
        )                                                   # (tv, 16)
        return packed

    packed_t = jax.lax.map(
        one_tile, (tiles_patch, tiles_vidx, forced), batch_size=64
    )                                                       # (T, tv, 16)
    seg = jnp.where(
        tiles_vidx.reshape(-1) >= 0, tiles_vidx.reshape(-1), num_points
    )
    acc = jax.ops.segment_sum(
        packed_t.reshape(-1, 16), seg, num_segments=num_points + 1
    )[:num_points]
    ws = jnp.maximum(acc[:, 15:16], 1e-30)
    live = acc[:, 15] > 1e-30
    a = acc[:, :9].reshape(-1, 3, 3) / ws[:, :, None]
    sx = acc[:, 9:12] / ws                                  # s(x)
    gsum = acc[:, 12:15] / ws
    jac = a - sx[:, :, None] * gsum[:, None, :]
    return jnp.where(live[:, None, None], jac, 0.0)


class PUDeformer:
    """Solve-once / eval-many facade over fit_pu + evaluate_pu.

    Mirrors Deformer's surface for the any-N regime; eval plans are cached
    by a full content digest of the query buffer (bounded LRU-ish cache) —
    a prefix key would silently reuse a stale plan for a buffer that only
    differs past the prefix.
    """

    def __init__(self, model: PUModel, patches: PUPatches,
                 kernel: RBFKernel, term: PolyTerm, auto_eps: bool = True):
        self.model = model
        self.patches = patches
        self.kernel = kernel
        self.term = term
        self.auto_eps = auto_eps
        self._plan_cache: dict = {}

    @classmethod
    def fit(cls, rest_ctrl, deformed_ctrl, kernel=RBFKernel.THIN_PLATE,
            term=PolyTerm.LINEAR, eps="auto", lam=0.01,
            patch_size=192, overlap=1.3, mesh=None,
            confidence=None) -> "PUDeformer":
        patches = build_patches(np.asarray(rest_ctrl, np.float32),
                                patch_size, overlap)
        model, report = fit_pu(
            rest_ctrl, deformed_ctrl, kernel, term, eps, lam,
            patches=patches, mesh=mesh, confidence=confidence,
        )
        self = cls(model, patches, kernel, term,
                   auto_eps=isinstance(eps, str))
        self.report = report
        return self

    def displacement(self, points, plan=None,
                     precise: Optional[bool] = None, backend: str = "auto"):
        """PU displacement at `points`.

        precise=None (default) picks the fast f32 tile eval when the fit
        used eps="auto" — at the spacing-scale shape parameter the local
        bases are well-conditioned and f32 matches the df path (measured
        7.5e-8 vs 7.5e-8 at 20k TPS controls, 2-3x faster).  A forced
        global eps >= the patch scale makes growing-kernel bases nearly
        flat (huge cancelling weights), so those default to the df tiles.

        backend: "auto" runs the fused Mosaic tile kernel
        (ops/pallas_pu.py) for the f32 path on TPU and the XLA
        composition otherwise; "xla" / "pallas" force a path.

        plan: the plan TYPE selects the path — a pallas_pu.PUTilePlan
        drives the Mosaic kernel (f32 only), a PUEvalPlan the XLA
        composition.  Passing a plan skips the content-digest cache
        lookup, which needs HOST bytes — for device-resident points that
        lookup costs a d2h pull over the tunnel; per-frame callers should
        build the plan once and pass it explicitly.
        """
        from facedeform_tpu.ops.pallas_pu import PUTilePlan

        if precise is None:
            precise = not self.auto_eps

        # Explicit plan: its type IS the path selection.
        if isinstance(plan, PUTilePlan):
            if precise:
                raise ValueError(
                    "a PUTilePlan drives the f32 Mosaic kernel; the "
                    "double-float eval (precise=True, the default for "
                    "forced-global-eps fits) needs the XLA path — pass a "
                    "plan_eval() PUEvalPlan or precise=False"
                )
            if backend == "xla":
                raise ValueError("backend='xla' cannot run a PUTilePlan")
            return self._run_tiles(points, plan)
        if isinstance(plan, PUEvalPlan):
            return self._run_xla(points, plan, precise)

        # No plan: route first, then build/cache only the plan that path
        # needs (building both would waste seconds of host KD work and
        # cache slots).
        use_pallas = backend == "pallas" or (
            backend == "auto"
            and not precise
            and on_tpu()
        )
        points_np = np.asarray(points, np.float32)
        if use_pallas:
            from facedeform_tpu.ops.pallas_pu import plan_eval_tiles

            tplan = self._cached_plan(
                points_np, "tiles", lambda: plan_eval_tiles(self.patches, points_np)
            )
            return self._run_tiles(points_np, tplan)
        eplan = self._cached_plan(
            points_np, "xla", lambda: plan_eval(self.patches, points_np)
        )
        return self._run_xla(points_np, eplan, precise)

    def jacobian(self, points, plan=None) -> jnp.ndarray:
        """Spatial Jacobian of the PU displacement field, (V, 3, 3).

        Runs the XLA tile composition (jacobian_pu); accepts/caches a
        plan_eval() PUEvalPlan (tile plans drive the value kernel only).
        """
        points_np = np.asarray(points, np.float32)
        if plan is None:
            plan = self._cached_plan(
                points_np, "xla", lambda: plan_eval(self.patches, points_np)
            )
        elif not isinstance(plan, PUEvalPlan):
            raise ValueError("jacobian needs a plan_eval() PUEvalPlan")
        return jacobian_pu(
            self.model, jnp.asarray(points_np),
            jnp.asarray(plan.tiles_patch), jnp.asarray(plan.tiles_vidx),
            jnp.asarray(plan.forced), self.kernel, self.term,
            plan.num_points,
        )

    def make_plan(self, points_np: np.ndarray, backend: str = "auto"):
        """Build the eval plan displacement()'s route would use for these
        points (tile plan on TPU f32, XLA plan otherwise) — for callers
        that key plans themselves (e.g. the node's pos_id cache) instead
        of paying the content-digest hash per call.  `backend` mirrors
        displacement()'s forcing: "xla" always builds the XLA plan,
        "pallas" the Mosaic tile plan (f32 route only)."""
        precise = not self.auto_eps
        if backend == "pallas" and precise:
            raise ValueError(
                "backend='pallas' drives the f32 Mosaic kernel; a "
                "forced-global-eps fit evaluates through the df XLA "
                "tiles — use backend='xla' or refit with eps='auto'"
            )
        if backend == "pallas" or (
            backend == "auto" and not precise and on_tpu()
        ):
            from facedeform_tpu.ops.pallas_pu import plan_eval_tiles

            return plan_eval_tiles(self.patches, points_np)
        return plan_eval(self.patches, points_np)

    def _cached_plan(self, points_np: np.ndarray, tag: str, build):
        import hashlib

        key = (
            points_np.shape,
            hashlib.blake2b(points_np.tobytes(), digest_size=16).digest(),
            tag,
        )
        plan = _lru_hit(self._plan_cache, key)
        if plan is None:
            plan = build()
            _lru_put(self._plan_cache, key, plan)
        return plan

    def _run_tiles(self, points, tplan):
        from facedeform_tpu.ops.pallas_pu import evaluate_pu_tiles

        return evaluate_pu_tiles(
            self.model, jnp.asarray(points, jnp.float32),
            *tplan.device_arrays(), self.kernel, self.term,
            tplan.num_points, tplan.tile_v,
            interpret=not on_tpu(),
        )

    def _run_xla(self, points, plan, precise):
        return evaluate_pu(
            self.model, jnp.asarray(points, jnp.float32),
            jnp.asarray(plan.tiles_patch), jnp.asarray(plan.tiles_vidx),
            jnp.asarray(plan.forced), self.kernel, self.term,
            plan.num_points, precise=precise,
        )


class PUSeqDeformer:
    """Animated-sequence facade over fit_pu_frames: F posed frames of one
    rest rig, any N, at dense double-float precision.

    The per-frame models share every static field (patches, ctrl, eps)
    and — crucially — the EVAL PLAN: the plan depends only on (patches,
    query points), so a shot pays one host KD build and one h2d plan
    upload no matter how many frames it evaluates.  The PU analogue of
    parallel/batched (fit_frames + apply_frames) for rigs past the dense
    limit.
    """

    def __init__(self, models: list, patches: PUPatches,
                 kernel: RBFKernel, term: PolyTerm, auto_eps: bool = True):
        self.patches = patches
        self.kernel = kernel
        self.term = term
        self.auto_eps = auto_eps
        self.puds = [
            PUDeformer(m, patches, kernel, term, auto_eps) for m in models
        ]
        # aggregate SolveReport: set by fit()/load_pu_seq(); None for a
        # directly-constructed shot (checkpointing handles both)
        self.report = None
        # one plan cache across all frames (the whole point)
        shared: dict = {}
        for p in self.puds:
            p._plan_cache = shared

    @property
    def num_frames(self) -> int:
        return len(self.puds)

    @classmethod
    def fit(cls, rest_ctrl, deformed_frames, kernel=RBFKernel.THIN_PLATE,
            term=PolyTerm.LINEAR, eps="auto", lam=0.01,
            patch_size=192, overlap=1.3, mesh=None,
            confidence=None) -> "PUSeqDeformer":
        patches = build_patches(np.asarray(rest_ctrl, np.float32),
                                patch_size, overlap)
        models, report = fit_pu_frames(
            rest_ctrl, deformed_frames, kernel, term, eps, lam,
            patches=patches, mesh=mesh, confidence=confidence,
        )
        self = cls(models, patches, kernel, term,
                   auto_eps=isinstance(eps, str))
        self.report = report
        return self

    def displacement_frames(self, points, mesh=None) -> jnp.ndarray:
        """(F, V, 3) displacements; one shared plan.

        On the f32 tile path (eps='auto' fits) the whole shot runs
        through ONE Mosaic pass per <=32-frame chunk
        (pallas_pu.evaluate_pu_tiles_frames): phi and the partition
        weights are computed once per (tile, patch) item and contracted
        against all 3F weight columns, instead of F separate dispatches
        re-deriving them.  The precise/df route (forced global eps)
        stays per-frame on the XLA tiles.

        `mesh` (jax.sharding.Mesh) shards the vertex tiles across the
        device mesh (parallel/pu_sharded.pu_displacement_frames_sharded)
        — the promoted thread pool (src/SOP_FaceDeform.hpp:116-188)
        applied to whole shots; sharding must not change results.  The
        sharded route needs the f32 tile kernel, so a forced-global-eps
        fit (auto_eps=False, the precise/df tiles) warns and runs
        single-device.

        Plans are cached through the frames' shared LRU (the _plan_cache
        wired across puds in __init__): repeated apply_seq calls on the
        same buffer pay the host KD plan build once, like
        PUDeformer.displacement."""
        points_np = np.asarray(points, np.float32)
        pud0 = self.puds[0]
        if mesh is not None and not self.auto_eps:
            import warnings

            warnings.warn(
                "PUSeqDeformer fitted with a forced global eps evaluates "
                "through the per-frame df tiles; ignoring mesh= "
                "(single-device)", stacklevel=2,
            )
            mesh = None
        if mesh is not None:
            from facedeform_tpu.parallel.pu_sharded import (
                pu_displacement_frames_sharded, shard_tile_plan,
            )
            from facedeform_tpu.ops.pallas_pu import plan_eval_tiles
            from facedeform_tpu.parallel.sharding import VERTEX_AXIS

            n_dev = int(mesh.shape[VERTEX_AXIS])
            splan = pud0._cached_plan(
                points_np, f"tiles-sharded-{n_dev}",
                lambda: shard_tile_plan(
                    plan_eval_tiles(self.patches, points_np), n_dev
                ),
            )
            return pu_displacement_frames_sharded(
                self, points_np, mesh, splan=splan
            )
        from facedeform_tpu.ops.pallas_pu import (
            evaluate_pu_tiles_frames, plan_eval_tiles,
        )

        if self.auto_eps and on_tpu():
            tplan = pud0._cached_plan(
                points_np, "tiles",
                lambda: plan_eval_tiles(self.patches, points_np),
            )
            return evaluate_pu_tiles_frames(
                tuple(p.model for p in self.puds),
                jnp.asarray(points_np),
                *tplan.device_arrays(), self.kernel, self.term,
                tplan.num_points, tplan.tile_v,
            )
        eplan = pud0._cached_plan(
            points_np, "xla", lambda: plan_eval(self.patches, points_np)
        )
        return jnp.stack([
            p.displacement(points_np, plan=eplan) for p in self.puds
        ])

    def apply_seq(self, points, dist2=None, gate=None, cfg=None,
                  params=None, frame=None,
                  mesh=None) -> tuple[jnp.ndarray, jnp.ndarray]:
        """((F, V, 3) positions, (V,) falloff): the serve/batched
        composition — falloff from capture distances (frame-invariant),
        gate folded in, displacement added per frame.  `frame`
        (tangentu, tangentv, N) projects each frame's displacement into
        the tangent basis before the falloff multiply — gated on
        cfg.tangent AND a frame being given, the same composition as
        PUNodeDeformer.apply / the reference eval loop
        (src/SOP_FaceDeform.cpp:404-439; a frame passed with
        cfg.tangent=False is ignored, matching the single-frame path)."""
        from facedeform_tpu.config import DeformConfig, DeformParams
        from facedeform_tpu.ops.falloff import falloff_weight

        cfg = cfg or DeformConfig()
        params = (params or DeformParams()).clamped()
        pts = jnp.asarray(points, jnp.float32)
        v = pts.shape[0]
        d2 = (
            jnp.zeros(v, jnp.float32) if dist2 is None
            else jnp.asarray(dist2, jnp.float32)
        )
        g = (
            jnp.ones(v, jnp.float32) if gate is None
            else jnp.asarray(gate, jnp.float32)
        )
        w, _ = falloff_weight(
            d2, params.radius, params.falloffrate,
            strict_parity=cfg.strict_parity,
        )
        w = w * g
        disp = self.displacement_frames(points, mesh=mesh)
        if cfg.tangent and frame is not None:
            from facedeform_tpu.ops.tangent import project_to_tangents

            disp = jnp.stack([
                project_to_tangents(*frame, disp[f])
                for f in range(disp.shape[0])
            ])
        return pts[None] + disp * w[None, :, None], w


def node_fit_kwargs(cfg, params) -> dict:
    """The kernel/term/lam mapping every cfg-driven PU route shares
    (node, CLI --batch, serve fit/fit_seq).  QNN semantics are EXACT
    interpolation — the global solver uses lam=0 (ops/fit.py), so the PU
    route must too; only the explicit families take the user's ridge
    (otherwise the default lam=0.1 silently smooths the fit)."""
    from facedeform_tpu.config import RBFModelType
    from facedeform_tpu.ops import fit as fit_mod

    lam = (
        0.0 if cfg.model == RBFModelType.QNN
        else float(np.asarray(params.clamped().lam))
    )
    return dict(
        kernel=fit_mod.effective_kernel(cfg), term=cfg.term, lam=lam
    )


@_dataclasses.dataclass(frozen=True)
class PUNodeDeformer:
    """Deformer-compatible facade for the node path (cfg.solver == "pu").

    Exposes the contract FaceDeformNode drives (`report`, `cfg`, `params`,
    `apply(points, dist2, frame, group_mask, backend)`): the PU
    displacement field composed with the node's falloff / tangent / group
    semantics, byte-identical to deformer.apply_fn's treatment of the
    global model (eval loop src/SOP_FaceDeform.cpp:404-439).
    """

    pud: PUDeformer
    cfg: object
    params: object
    # mutable per-instance plan cache (mesh pos_id -> eval plan); compare/
    # repr excluded so the frozen dataclass semantics stay value-like
    _plans: dict = _dataclasses.field(
        default_factory=dict, compare=False, repr=False
    )

    @property
    def report(self):
        return self.pud.report

    def _plan_get(self, key):
        """LRU hit: move the key to the end so it outlives colder plans."""
        return _lru_hit(self._plans, key)

    def _plan_put(self, key, plan, cap: int = 8) -> None:
        """Bounded LRU insert.  A cook serves the main mesh PLUS its
        secondary accessories off one deformer (node.cook(secondary=...)),
        so a clear-on-miss single slot would rebuild every mesh's host KD
        plan each cook — keep the last `cap` plans, evict the oldest."""
        _lru_put(self._plans, key, plan, cap)

    @classmethod
    def fit(cls, rest_ctrl, deformed_ctrl, cfg, params,
            mesh_devices=None, confidence=None) -> "PUNodeDeformer":
        pud = PUDeformer.fit(
            rest_ctrl, deformed_ctrl,
            **node_fit_kwargs(cfg, params),  # QNN lam=0 quirk lives there
            eps="auto",                      # per-patch shape parameter
            mesh=mesh_devices,               # patch solves over the mesh
            confidence=confidence,
        )
        from facedeform_tpu.utils import errors

        errors.check_solve(pud.report)
        return cls(pud=pud, cfg=cfg, params=params)

    def apply(self, points, dist2=None, frame=None, group_mask=None,
              backend: str = "auto", plan_key=None, mesh_devices=None):
        from facedeform_tpu.ops.falloff import falloff_weight
        from facedeform_tpu.ops.tangent import project_to_tangents

        params = self.params.clamped()
        pts = jnp.asarray(points, jnp.float32)
        points_np = np.asarray(points, np.float32)
        if mesh_devices is not None:
            # Vertex-sharded PU eval across the device mesh
            # (parallel/pu_sharded.py): the PU analogue of the promoted
            # thread pool (src/SOP_FaceDeform.hpp:116-188) — sharding must
            # not change results.  Node fits use eps='auto', where the f32
            # tile kernel equals the df tiles (ops/pu.py module docstring),
            # so the Mosaic sharded path is exact for this route.
            from facedeform_tpu.parallel.pu_sharded import (
                pu_displacement_sharded, shard_tile_plan,
            )

            n_dev = int(np.asarray(mesh_devices.devices).size)
            skey = None if plan_key is None else (plan_key, "sharded", n_dev)
            splan = self._plan_get(skey) if skey is not None else None
            if splan is None:
                from facedeform_tpu.ops.pallas_pu import plan_eval_tiles

                tplan = plan_eval_tiles(self.pud.patches, points_np)
                splan = shard_tile_plan(tplan, n_dev)
                if skey is not None:
                    self._plan_put(skey, splan)
            disp = pu_displacement_sharded(
                self.pud, points_np, mesh_devices, splan=splan
            )
        else:
            # honor PU's own backend forcing ("xla"/"pallas" — the plan
            # TYPE selects the path); the node autotune's global-family
            # names ("dense"/"culled") and "auto" take the auto route.
            # The parameter used to be silently ignored (round-5 review).
            pu_backend = backend if backend in ("xla", "pallas") else "auto"
            plan = None
            if plan_key is not None:
                # node path: key the plan on the mesh's pos_id instead of
                # re-hashing the full point buffer every cook/frame
                # (+ the forced backend: each backend has its own plan)
                plan = self._plan_get((plan_key, pu_backend))
                if plan is None:
                    plan = self.pud.make_plan(points_np, backend=pu_backend)
                    self._plan_put((plan_key, pu_backend), plan)
            disp = self.pud.displacement(
                points_np, plan=plan, backend=pu_backend
            )
        if self.cfg.tangent and frame is not None:
            disp = project_to_tangents(*frame, jnp.asarray(disp))
        v = pts.shape[0]
        d2 = (
            jnp.zeros(v, jnp.float32) if dist2 is None
            else jnp.asarray(dist2, jnp.float32)
        )
        w, active = falloff_weight(
            d2, params.radius, params.falloffrate,
            strict_parity=self.cfg.strict_parity,
        )
        if group_mask is not None:
            active = jnp.logical_and(active, jnp.asarray(group_mask))
        w = jnp.where(active, w, 0.0)
        return pts + jnp.asarray(disp) * w[:, None], w

    def deformed_normals(self, points, normals, weight, frame=None):
        """Transport normals through y = x + w (T) s(x); see
        Deformer.deformed_normals — same contract, PU displacement field."""
        from facedeform_tpu.ops.jacobian import transport_normals

        return transport_normals(
            self.pud.jacobian(points), normals, weight, self.cfg, frame
        )

    def transform_attrs(self, points, attrs, weight, frame=None, kinds=None,
                        want_stretch=False, f_map=None):
        """Batch attribute transport through the PU Jacobian; same contract
        as Deformer.transform_attrs (one Jacobian shared by all attrs,
        and by the stretches when want_stretch)."""
        from facedeform_tpu.ops.jacobian import transport_attrs

        return transport_attrs(
            self.pud.jacobian(points), attrs, weight, self.cfg, frame, kinds,
            want_stretch=want_stretch, f_map=f_map,
        )

    def principal_stretches(self, points, weight, frame=None, f_map=None):
        """Singular values of the applied PU map's deformation gradient;
        same contract as Deformer.principal_stretches."""
        from facedeform_tpu.ops.jacobian import (
            _applied_gradient, principal_stretches,
        )

        f = _applied_gradient(self.pud.jacobian(points), weight, self.cfg, frame)
        if f_map is not None:
            f = f_map(f)
        return principal_stretches(f)
