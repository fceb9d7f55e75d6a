"""FaceDeformNode: the cook orchestrator (components A/B/C).

The reference's single public entry point is SOP_FaceDeform::cookMySop
(src/SOP_FaceDeform.cpp:216-489): lock inputs, validate, build RBF data,
drive capture -> RBF solve -> per-vertex eval -> morph-space pass, with
data-ID change tracking so capture/DBSE only re-run when their inputs
actually changed (InputGeoID, src/SOP_FaceDeform.hpp:47-64).

This class is the host-side equivalent.  Input contract (reference
:38-46, :228-234):

    inputs[0] = mesh (rest pose)          -- deformed copy is the output
    inputs[1] = rest control rig
    inputs[2] = deformed control rig      -- counts of 1 and 2 must match
    inputs[3:] = blendshapes              -- must match input0 point count,
                                             else skipped with a warning

Produced attributes (reference :179-185, :401, :425, :438, :474-480):
    P (deformed points), `fd_falloff` float, `Cd` color viz, `rest` float3,
    `weights` detail float array.

Cache improvements over the reference (documented deviations):
  * capture is also keyed on radius/maxedges/falloff params — fixing the
    FIXME at src/SOP_FaceDeform.cpp:310-312 (SURVEY.md quirk 4);
  * the RBF solve is cached on (rig data ids, params) instead of being
    re-run every cook (:330-368 always rebuilds).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from facedeform_tpu.capture.capture import CaptureResult, ProximityCapture
from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.ops import dbse as dbse_ops
from facedeform_tpu.utils import errors
from facedeform_tpu.utils.profiling import StageTimes, stage
from facedeform_tpu.utils.platform import on_tpu


@dataclasses.dataclass
class CookResult:
    """Everything a cook produces (the reference's output detail + node UI
    messages)."""

    mesh: Mesh                       # deformed copy of input 0
    warnings: List[str]
    messages: List[str]
    capture: Optional[CaptureResult]
    weights: Optional[np.ndarray]    # DBSE per-shape weights (detail attr)
    #: point attrs this cook rewrote beyond P/fd_falloff/Cd/rest
    #: (update_normals / transform_attrs / output_stretch outputs) —
    #: host adapters use this to write back only what changed
    transported: tuple = ()
    #: deformed copies of cook(secondary=...) accessory meshes, in order —
    #: driven by the same solved field, full displacement (no capture gate)
    secondary: tuple = ()


def _fit_params_key(params: DeformParams) -> tuple:
    """Only the params the RBF solve consumes — eval-only knobs (falloff
    rate/radius, weight clamps, maxedges) must not invalidate the cached
    solve.  CLAMPED to the cook-time floors in plain host floats
    (params.clamped() builds 0-d jnp scalars — fine for jit, wrong for a
    host cache key): sub-floor slider values (lam 0.001 vs 0.005, both
    floored to 0.01) used to trigger full spurious refits of a
    byte-identical model (round-5 review finding)."""
    return (
        max(float(params.qcoef), 0.1), max(float(params.zcoef), 0.1),
        max(float(params.radius), 0.01), max(float(params.lam), 0.01),
    )


def _all_params_key(params: DeformParams) -> tuple:
    """Every param as a plain float (params may carry 0-d jnp scalars)."""
    return tuple(float(v) for v in params[:-1]) + (int(params.maxedges),)


class FaceDeformNode:
    """Stateful node: holds caches across cooks like the SOP instance holds
    m_mesh_capture / m_direct_blends / m_input_tracker
    (src/SOP_FaceDeform.hpp:110-113)."""

    def __init__(self) -> None:
        self._capture = ProximityCapture()
        self._capture_key: Optional[tuple] = None
        self._capture_result: Optional[CaptureResult] = None
        self._dbse_key: Optional[tuple] = None
        self._dbse_model: Optional[dbse_ops.DBSEModel] = None
        self._fit_key: Optional[tuple] = None
        self._deformer: Optional[Deformer] = None
        # Pose-independent dense factorization (deformer.FitPlan), keyed on
        # everything in the fit key EXCEPT the deformed rig: an interactive
        # marker drag (new pose, same rest rig/params) re-solves through
        # plan.refit() at O(n^2) instead of refactoring at O(n^3) — the
        # change-tracking granularity the reference's per-cook ALGLIB
        # rebuild never had (src/SOP_FaceDeform.cpp:330-368).
        self._fit_plan = None
        self._fit_plan_key: Optional[tuple] = None
        self._rest_key: Optional[int] = None
        self._rest_attr: Optional[np.ndarray] = None
        # Autotuned eval backend (dense vs culled Pallas kernel), keyed on
        # (mesh pos id, solve key): culling efficacy depends on the rig's
        # locality and the mesh's vertex-order coherence, which no static
        # heuristic captures — measure both once, reuse across cooks/frames.
        self._backend_key: Optional[tuple] = None
        self._backend_choice: str = "auto"
        self._sym_key: Optional[tuple] = None
        self._sym_rigs: Optional[tuple] = None
        # Pose-space deformation (ops/psd.py): fitted correction model +
        # a child node that cooks the example poses through the SAME
        # pipeline (its FitPlan makes the K per-example base cooks one
        # factorization + K O(n^2) pose refits).
        self._psd_key: Optional[tuple] = None
        self._psd_deformer = None
        self._psd_corr_host: Optional[np.ndarray] = None
        self._psd_node: Optional["FaceDeformNode"] = None
        # host copy of an EXTERNAL (checkpoint-loaded) PSD's corrections;
        # keyed by object identity so repeated cooks with the same loaded
        # model pull the (K, V, 3) tensor through the tunnel only once
        self._psd_ext = None
        self._psd_ext_corr: Optional[np.ndarray] = None
        # pins the parent-cook external deformer captured in _psd_key (its
        # id() is part of the key and must not be GC-recycled)
        self._psd_parent_deformer_pin = None
        # device-resident corrections for the large-K·V route (psd.
        # psd_apply_on_host False): placed once per (psd, mesh) pair —
        # sharded over mesh_devices' vertex axis when a mesh is given
        self._psd_dev_key: Optional[tuple] = None
        self._psd_dev_corr = None
        self._psd_dev_pin = None
        # 1-ring neighbor table + LSQ gradient plan for the morphspace
        # transport gradient (ops/jacobian.field_gradient_plan), cached
        # on mesh topology / (topology, rest positions)
        self._nbr_key: Optional[int] = None
        self._nbr_table = None
        self._grad_plan_key: Optional[tuple] = None
        self._grad_plan = None

    # ---------------------------------------------------------- symmetrize
    def _symmetrized_rigs(self, rest_rig, deform_rig, plane, tol):
        """Symmetrized (rest, deform) rig Meshes + report, cached on the
        input data ids so unchanged inputs keep stable Mesh objects (and
        therefore warm capture/solve caches downstream)."""
        from facedeform_tpu.ops import symmetry as sym_ops

        def _plane_key(p):
            if isinstance(p, str):
                return p.lower()
            p = tuple(p)
            if len(p) == 2 and np.shape(p[0]) == (3,):
                return (tuple(float(x) for x in p[0]),
                        tuple(float(x) for x in p[1]))
            return tuple(float(x) for x in p)

        key = (
            rest_rig.pos_id, deform_rig.pos_id, rest_rig.attr_id,
            _plane_key(plane), None if tol is None else float(tol),
        )
        if key != self._sym_key:
            classes = rest_rig.attr("class")
            confidence = rest_rig.attr("confidence")
            r2, d2, cls2, conf2, report = sym_ops.symmetrize_rig_full(
                rest_rig.points, deform_rig.points, plane,
                tol=tol, classes=classes, confidence=confidence,
            )
            rest_m, dfm_m = Mesh(points=r2), Mesh(points=d2)
            if cls2 is not None:
                rest_m.set_attr("class", cls2)
            if conf2 is not None:
                # the later solve stage reads `confidence` off THIS mesh:
                # dropping it here would silently disable the weighted
                # ridge whenever symmetrize is on
                rest_m.set_attr("confidence", conf2)
            self._sym_rigs = (rest_m, dfm_m, report)
            self._sym_key = key
        return self._sym_rigs

    # ------------------------------------------------------------------ psd
    def _psd_fit(
        self, inputs, examples, cfg, params, group_mask, mesh_devices,
        symmetrize, symmetry_tol, psd_lam, psd_eps, psd_normalize,
        psd_align, warnings, times, deformer=None,
    ):
        """Fit (or reuse) the pose-space correction model for `examples`.

        Each example pose is cooked through a CHILD FaceDeformNode with
        this cook's exact configuration, so the stored corrections are
        sculpt-minus-*this-pipeline* — whatever capture/tangent/morph do
        at that pose is absorbed.  The child's own caches make the K base
        cooks cheap: one capture, one FitPlan factorization, K pose
        refits.  Returns a PSDDeformer or None (invalid/unsolvable
        examples degrade to a warning, the blendshape-mismatch
        convention, src/SOP_FaceDeform.cpp:201-204).
        """
        from facedeform_tpu.ops import psd as psd_ops

        mesh_in, rest_rig = inputs[0], inputs[1]
        blends = list(inputs[3:])
        valid = []
        skipped = 0
        for ex in examples:
            posed, sculpt = ex
            if (
                posed.num_points != rest_rig.num_points
                or sculpt.num_points != mesh_in.num_points
            ):
                skipped += 1
                continue
            valid.append((posed, sculpt))
        if skipped:
            warnings.append(
                f"psd: {skipped} example(s) don't match the rig/mesh "
                "point counts. Ignoring them."
            )
        if not valid:
            warnings.append("psd: no usable examples. Ignoring pose-space "
                            "deformation.")
            return None

        if symmetrize is None:
            sym_key = None
        elif isinstance(symmetrize, str):
            sym_key = (symmetrize.lower(),
                       None if symmetry_tol is None else float(symmetry_tol))
        else:
            sym_key = (repr(np.asarray(symmetrize, np.float64).tolist()),
                       None if symmetry_tol is None else float(symmetry_tol))
        mask_key = (
            None if group_mask is None
            else hash(np.asarray(group_mask, bool).tobytes())
        )
        key = (
            mesh_in.pos_id, mesh_in.top_id,
            rest_rig.pos_id, rest_rig.attr_id,
            tuple((p.pos_id, s.pos_id) for p, s in valid),
            tuple(b.pos_id for b in blends) if cfg.morphspace else (),
            cfg, _all_params_key(params), mask_key, sym_key,
            # an external deformer changes what the child cooks evaluate,
            # so it is part of the corrections' identity (pinned below so
            # id() cannot be recycled while the cache entry lives)
            None if deformer is None else id(deformer),
            float(psd_lam),
            None if psd_eps is None else float(psd_eps),
            bool(psd_normalize), bool(psd_align),
        )
        if key == self._psd_key:
            return self._psd_deformer

        with stage("psd_fit", times):
            if self._psd_node is None:
                self._psd_node = FaceDeformNode()
            feats, corr = [], []
            max_off_group = 0.0
            for posed, sculpt in valid:
                base = self._psd_node.cook(
                    [mesh_in, rest_rig, posed] + blends, cfg, params,
                    group_mask=group_mask, mesh_devices=mesh_devices,
                    symmetrize=symmetrize, symmetry_tol=symmetry_tol,
                    # the parent's external checkpoint field, if any: the
                    # corrections must be measured against the SAME field
                    # they will be applied on, or the example sculpt is
                    # not reproduced (round-5 review finding)
                    deformer=deformer,
                )
                c = (sculpt.points.astype(np.float32)
                     - base.mesh.points.astype(np.float32))
                if group_mask is not None:
                    # The group contract (src/SOP_FaceDeform.cpp:485) caps
                    # writes to the group; a sculpt editing off-group
                    # vertices cannot be reproduced — zero it and report.
                    mask = np.asarray(group_mask, bool)
                    if (~mask).any():
                        max_off_group = max(
                            max_off_group, float(np.abs(c[~mask]).max())
                        )
                    c = np.where(mask[:, None], c, np.float32(0.0))
                f, r = psd_ops.pose_feature(
                    rest_rig.points, posed.points, bool(psd_align)
                )
                # align: the stored correction lives in the rest
                # (head-local) frame; the apply pass rotates it back by
                # the QUERY pose's own rigid rotation (ops/psd.py)
                corr.append(c @ r if r is not None else c)
                feats.append(f)
            if max_off_group > 1e-6:
                warnings.append(
                    f"psd: sculpt(s) move off-group vertices by up to "
                    f"{max_off_group:.3g}; those edits are outside the "
                    "group and were dropped."
                )
            corr_arr = np.stack(corr)   # stacked ONCE: reused for the
            # host cache below (a second stack doubled the peak at the
            # 128 MiB host-cache bound)
            try:
                model, report = psd_ops.fit_psd(
                    np.stack(feats), corr_arr,
                    eps=psd_eps, lam=float(psd_lam),
                )
                errors.check_solve(report)
            except (ValueError, errors.SolveFailedError) as e:
                # not cached: a failing fit is cheap to re-derive and the
                # warning must re-emit on every cook that ignores examples
                warnings.append(
                    f"psd: {e} — ignoring pose-space deformation."
                )
                self._psd_key, self._psd_deformer = None, None
                self._psd_corr_host = None
                return None
            psd = psd_ops.PSDDeformer(
                model, normalize=bool(psd_normalize), report=report,
                align=bool(psd_align),
            )
        self._psd_key, self._psd_deformer = key, psd
        self._psd_parent_deformer_pin = deformer
        # Large K·V skips the persistent host cache: the apply pass then
        # contracts on device against model.corrections (one (V, 3) pull
        # per cook) instead of holding a second full-tensor host copy.
        self._psd_corr_host = (
            corr_arr
            if psd_ops.psd_apply_on_host(len(corr), mesh_in.num_points)
            else None
        )
        return psd

    def _psd_corrections_device(self, psd, mesh_devices):
        """(K, V, 3) corrections placed on the device mesh, sharded over
        the vertex axis (GSPMD handles non-divisible V).  The contraction
        w @ corr is row-local over vertices, so the sharded apply emits
        zero collectives; placement is cached per (psd, mesh) pair so the
        reshard happens once, not per cook.

        The mesh half of the key is the mesh's CONTENT (device tuple +
        axis names), not id(): callers that rebuild an identical Mesh
        per cook must still hit the cache (advisor r4 — an id() key
        silently re-paid the full (K, V, 3) sharded placement every
        cook).  The psd half stays id(), which is safe because the
        cached entry pins `psd` itself (no GC-reuse aliasing)."""
        key = (
            id(psd),
            tuple(np.asarray(mesh_devices.devices).reshape(-1).tolist()),
            mesh_devices.axis_names,
        )
        if self._psd_dev_key != key:
            import jax
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec as P

            from facedeform_tpu.parallel.sharding import VERTEX_AXIS

            corr = psd.model.corrections
            n_dev = mesh_devices.shape[VERTEX_AXIS]
            pad = (-int(corr.shape[1])) % n_dev
            if pad:
                # device_put needs divisible dims; padded vertices carry
                # zero corrections and the apply pass slices them off
                corr = jnp.pad(corr, ((0, 0), (0, pad), (0, 0)))
            self._psd_dev_corr = jax.device_put(
                corr,
                NamedSharding(mesh_devices, P(None, VERTEX_AXIS, None)),
            )
            self._psd_dev_key = key
            # pin the keyed psd object so its id() cannot be recycled
            # while this cache entry is alive
            self._psd_dev_pin = psd
        return self._psd_dev_corr

    def _transport_neighbors(self, mesh: Mesh):
        """Self-padded 1-ring table for ops/jacobian.mesh_field_gradient,
        cached on mesh topology (top_id) — one device upload per topology,
        not per cook."""
        if self._nbr_key != mesh.top_id:
            from facedeform_tpu.geometry.topology import (
                padded_neighbors, unique_edges,
            )
            from facedeform_tpu.ops.jacobian import TRANSPORT_MAX_DEGREE

            nbr, _ = padded_neighbors(
                mesh.num_points, unique_edges(mesh.faces),
                max_degree=TRANSPORT_MAX_DEGREE,
            )
            self._nbr_table = jnp.asarray(nbr)
            self._nbr_key = mesh.top_id
        return self._nbr_table

    def _transport_grad_plan(self, mesh: Mesh):
        """(nbr, coeff) for ops/jacobian.apply_field_gradient, cached on
        (top_id, pos_id): the geometry half of the LSQ gradient (edge
        gather + Gram + Cholesky) runs once per rest mesh, so each
        morph/PSD cook pays only the one-gather apply (the gathers are
        the cost on TPU: plan+apply measured 432 ms fused vs ~230 ms
        apply-only at 1M x 16 on v5e)."""
        key = (mesh.top_id, mesh.pos_id)
        if self._grad_plan_key != key:
            from facedeform_tpu.ops.jacobian import field_gradient_plan

            nbr = self._transport_neighbors(mesh)
            self._grad_plan = field_gradient_plan(
                jnp.asarray(mesh.points, jnp.float32), nbr
            )
            self._grad_plan_key = key
        return self._nbr_table, self._grad_plan

    # -------------------------------------------------------------- backend
    def _choose_backend(
        self, mesh_in: Mesh, deformer: Deformer, points, dist2, frame,
        group_mask,
    ) -> str:
        """Autotune dense vs culled Pallas eval, cached on (pos_id, solve
        key).  Culling wins 3-4x on localized rigs and costs up to ~16% on
        spatially incoherent vertex orders (measured, v5e); a one-time
        measurement of both is the only decision rule that is right on
        every mesh.  Off-TPU or below the size threshold, defer to
        Deformer.apply's own "auto"."""
        import time

        import jax

        from facedeform_tpu.ops import fit as fit_mod
        from facedeform_tpu.ops.pallas_eval import kernel_is_cullable

        from facedeform_tpu.ops.precise_eval import GROWING_KERNELS
        from facedeform_tpu.ops.pu import PUNodeDeformer

        if isinstance(deformer, PUNodeDeformer):
            return "auto"  # PU picks its own (Mosaic-tile) path internally
        kernel = fit_mod.effective_kernel(deformer.cfg)
        if (
            not on_tpu()
            or mesh_in.num_points < 4096
            or kernel in GROWING_KERNELS
        ):
            # Growing kernels MUST defer to apply's "auto" (the double-
            # float path) — routing them to the f32 kernel would silently
            # break the 5e-5 parity budget.
            return "auto"
        if not kernel_is_cullable(kernel):
            return "pallas"
        key = (mesh_in.pos_id, self._fit_key)
        if key != self._backend_key:
            timings = {}
            for cand in ("pallas", "pallas_culled"):
                out = deformer.apply(
                    points, dist2=dist2, frame=frame, group_mask=group_mask,
                    backend=cand,
                )
                float(jnp.sum(out[0]))  # compile + warm + sync
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = deformer.apply(
                        points, dist2=dist2, frame=frame,
                        group_mask=group_mask, backend=cand,
                    )
                    float(jnp.sum(out[0]))
                    best = min(best, time.perf_counter() - t0)
                timings[cand] = best
            self._backend_choice = min(timings, key=timings.get)
            self._backend_key = key
        return self._backend_choice

    def dbse_state(self):
        """(dbse_model, rest_attr) cached by the last cook, or (None, None).

        The animated-sequence batch path (cli deform-seq --batch) morphs
        frames 1+ in one vmapped dispatch; reusing the cook-cached blend
        basis guarantees the batched pass sees exactly the same filtered
        shapes / rest attr / packed factor as frame 0's full node cook
        (the setupBlends cache, src/SOP_FaceDeform.cpp:178-213).
        """
        return self._dbse_model, self._rest_attr

    def psd_state(self):
        """(PSDDeformer, host corrections (K, V, 3)) cached by the last
        cook's `examples=` fit (or its validated `psd=` checkpoint), or
        (None, None).

        The deform-seq batch path applies the pose-space correction to
        frames 1+ itself (one psd_weights dispatch for the shot + a host
        contraction); reusing the cook-cached fit guarantees those frames
        see exactly the corrections frame 0's full node cook derived.
        """
        if self._psd_deformer is not None:
            return self._psd_deformer, self._psd_corr_host
        return self._psd_ext, self._psd_ext_corr

    # ------------------------------------------------------------------ cook
    def cook(
        self,
        inputs: Sequence[Mesh],
        cfg: DeformConfig = DeformConfig(),
        params: DeformParams = DeformParams(),
        group_mask: Optional[np.ndarray] = None,
        group: Optional[str] = None,
        times: Optional[StageTimes] = None,
        mesh_devices=None,
        picked: bool = False,
        deformer=None,
        update_normals: bool = False,
        transform_attrs: Optional[Sequence[str]] = None,
        output_stretch: bool = False,
        recompute_normals: bool = False,
        symmetrize=None,
        symmetry_tol: Optional[float] = None,
        examples: Optional[Sequence] = None,
        psd_lam: float = 0.0,
        psd_eps: Optional[float] = None,
        psd_normalize: bool = False,
        psd_align: bool = False,
        psd=None,
        secondary: Optional[Sequence[Mesh]] = None,
    ) -> CookResult:
        """Run one cook; mirrors cookMySop's flow (src/SOP_FaceDeform.cpp:216-489).

        Raises ShapeMismatchError / CaptureError / SolveFailedError for the
        conditions the reference reports as node errors; non-fatal
        conditions are collected as warnings.  Pass a StageTimes to collect
        per-stage wall times (the solve/eval split is the reference's
        headline observability metric, SURVEY.md section 5).  Pass a
        jax.sharding.Mesh as mesh_devices to run the eval loop and the
        DBSE morph pass vertex-sharded across chips (parallel/).

        `deformer` (a solved Deformer or PUNodeDeformer, e.g. from
        utils/checkpoint) skips the RBF solve stage and cooks with the
        precomputed model — resume-from-checkpoint at node level, an
        extension over the reference's always-resolve cook (:330-368).
        Solve-relevant cfg fields (model/kernel/term/layers/solver) come
        from the deformer's own fit; THIS cook's cfg supplies only the
        eval-side toggles (tangent/morphspace/dofalloff/doclampweight/
        strict_parity/dbse_lstsq), so a checkpoint can never be evaluated
        under the wrong kernel.

        `update_normals` transports N by the cofactor rule;
        `transform_attrs` names further point attributes to push through
        the same deformation gradient ((V, 3) as vectors v' = F v, (V, 4)
        as orientation quaternions rotated by the polar factor of F) —
        both share ONE Jacobian pass.  The reference copies all non-P
        attributes through untouched (src/SOP_FaceDeform.cpp:438).
        `output_stretch` writes fd_stretch / fd_compress (max / min
        singular value of F per vertex) — rigging QC for where the map
        stretches or pinches the surface.
        `recompute_normals` rebuilds N geometrically from the FINAL
        output topology (area-weighted face normals) — unlike the
        analytic transport it also reflects the morphspace pass, but it
        needs faces and reads the surface, not the field (point clouds
        fall back to transport).  When both are set, the recompute wins
        (it runs on the written positions), and the analytic N
        transport is skipped outright — its output would be discarded.
        `symmetrize` ('x'/'y'/'z', a (3,) normal, or a (normal, origin)
        pair) closes the rig under the mirror reflection before
        capture/fit (ops/symmetry.py) so the deformation provably
        commutes with it; `symmetry_tol` overrides the marker-pairing
        tolerance.  The removed asymmetry is reported in messages.

        `examples` enables pose-space deformation (ops/psd.py): a sequence
        of (posed_rig, sculpt) Mesh pairs — the artist's corrected mesh at
        each example rig pose.  The node cooks each example pose through
        this same pipeline, stores sculpt-minus-base correction fields,
        fits a cardinal RBF over the example poses, and adds the blended
        correction AFTER the morph pass — so at an example pose the output
        reproduces that sculpt exactly, and nearby poses blend smoothly.
        `psd_lam` / `psd_eps` / `psd_normalize` tune the pose-space kernel
        (defaults: exact interpolation, auto radius, raw cardinal
        weights).  `psd_align=True` removes each pose's best-fit rigid
        transform before the descriptor and carries the corrections in
        the rest (head-local) frame — the same expression with the head
        moved still triggers the sculpt, rotated with the head (tracked
        rigs carry head motion; see ops/psd.rigid_align).  Pose-space weights land in
        mesh.detail_attrs['psd_weights'].  Alternatively pass `psd` (a
        PSDDeformer, e.g. utils/checkpoint.load_psd) to apply an
        already-fitted pose-space model without re-cooking the examples;
        `examples` wins when both are given.

        `secondary` is a sequence of accessory meshes (teeth, eyeballs,
        brows, collars) driven by the SAME solved field in this cook —
        the RBF map is spatial, so any point set evaluates against the
        one solve.  Secondaries deform fully (no capture gate: capture
        binds the main mesh's topology; this is the reference's
        no-capture semantics, src/SOP_FaceDeform.cpp:404-410) and skip
        the group/morph/psd passes (those are main-mesh concepts);
        cfg.tangent applies where a secondary carries its own
        tangentu/tangentv/N, and recompute_normals refreshes their N
        from faces.  Deformed copies land on CookResult.secondary in
        order, each with its fd_falloff.
        """
        if len(inputs) < 3:
            raise errors.ShapeMismatchError(
                "need at least 3 inputs: mesh, rest rig, deformed rig"
            )
        if group is not None:
            # Point-group restriction (the reference's `group` string
            # parameter, src/SOP_FaceDeform.cpp:119-120, applied :485).
            # Full Houdini pattern syntax: names, globs, ranges, ^/!
            # (cookInputGroups grammar, :156-173).
            if group_mask is not None:
                raise ValueError("pass either group or group_mask, not both")
            group_mask = inputs[0].select_points(group)
        warnings: List[str] = []
        messages: List[str] = []
        mesh_in, rest_rig, deform_rig = inputs[0], inputs[1], inputs[2]
        blends = list(inputs[3:])

        # Validation (:228-234).
        if rest_rig.num_points != deform_rig.num_points:
            raise errors.ShapeMismatchError(
                "Rest and deform geometry should match."
            )

        # ------------------------------------------------------- symmetrize
        if symmetrize is not None:
            # Close the rig under the mirror reflection BEFORE capture/fit
            # (ops/symmetry.py): paired markers get averaged symmetric
            # displacements, unpaired markers are mirrored in (carrying
            # their capture `class`), so the fitted field provably
            # commutes with the reflection.  Cached on the input rig data
            # ids so repeated cooks reuse the same symmetrized Mesh
            # objects and every downstream cache (capture/solve) stays
            # warm.  Beyond the reference (which packs the rig verbatim,
            # src/SOP_FaceDeform.cpp:268-287).
            rest_rig, deform_rig, sym_report = self._symmetrized_rigs(
                rest_rig, deform_rig, symmetrize, symmetry_tol
            )
            messages.append(
                f"symmetrize: {sym_report.n_paired} paired, "
                f"{sym_report.n_on_plane} on-plane, "
                f"{sym_report.n_appended} mirrored in; removed asymmetry "
                f"{sym_report.max_asymmetry:.3g} (pair tol "
                f"{sym_report.tol:.3g})"
            )
            if sym_report.n_skipped:
                warnings.append(
                    f"symmetrize: {sym_report.n_skipped} marker(s) not "
                    "mirrored in (the mirror would land within tol of an "
                    "existing marker — near-duplicate control point); the "
                    "deformation is not exactly symmetric around them."
                )

        # duplicatePointSource(0) (:226).
        out = mesh_in.copy()
        maxedges = max(int(params.maxedges), 1)
        radius = max(float(params.radius), 0.01)

        # ---------------------------------------------------------- capture
        cap_key = (
            mesh_in.pos_id, mesh_in.top_id, rest_rig.pos_id, rest_rig.top_id,
            rest_rig.attr_id,  # capture groups islands by the rig `class` attr
            maxedges, radius, bool(cfg.dofalloff), float(params.falloffrate),
            bool(cfg.strict_parity), cfg.falloff_metric,
        )
        if cap_key != self._capture_key:
            with stage("capture", times):
                self._capture.init(out, rest_rig)
                self._capture_result = self._capture.capture(
                    maxedges, radius, cfg.dofalloff, float(params.falloffrate),
                    strict_parity=cfg.strict_parity,
                    metric=cfg.falloff_metric,
                )
            self._capture_key = cap_key
        capture = self._capture_result

        # -------------------------------------------- rest attr + DBSE setup
        dbse_model = None
        valid_blends: List[Mesh] = []
        if cfg.morphspace and blends:
            # store/refresh `rest` attribute when the rest pose changed
            # (setupBlends, :178-185)
            if self._rest_key != mesh_in.pos_id or self._rest_attr is None:
                self._rest_attr = mesh_in.points.copy()
                self._rest_key = mesh_in.pos_id
            out.set_attr("rest", self._rest_attr)
            for b in blends:
                if b.num_points != mesh_in.num_points:
                    warnings.append(
                        "Some blendshapes don't match rest pose point count. "
                        "Ignoring them."
                    )
                    continue
                valid_blends.append(b)
            if valid_blends:
                dbse_key = (
                    mesh_in.pos_id,
                    tuple(b.pos_id for b in valid_blends),
                    not cfg.dbse_lstsq,
                )
                if dbse_key != self._dbse_key:
                    self._dbse_model = dbse_ops.build_model(
                        self._rest_attr,
                        [b.points for b in valid_blends],
                        parity=not cfg.dbse_lstsq,
                    )
                    self._dbse_key = dbse_key
                dbse_model = self._dbse_model
            else:
                warnings.append(
                    "Can't proceed with morph space deformation. Ignoring it."
                )
        elif cfg.morphspace:
            warnings.append("No blendshapes found. Ignoring morphspace deformation.")

        # -------------------------------------------------------- RBF solve
        # Keyed on cfg.solve_view(), not the full cfg: toggling eval-only
        # flags (tangent, morphspace, dofalloff, doclampweight, ...) must
        # not re-run the solve (it would pay the tunnel RTT every cook).
        # the EXTERNAL checkpoint argument, captured before the local is
        # rebound to the resolved/fitted deformer below — the PSD pass
        # must see the caller's checkpoint (None on ordinary cooks), not
        # a fresh per-cook fit whose id() would bust the PSD cache
        ext_deformer = deformer
        if deformer is not None:
            # Precomputed-solve cook: merge solve fields from the
            # deformer's fit with this cook's eval toggles, then skip the
            # solve stage entirely.
            cfg = dataclasses.replace(
                deformer.cfg,
                tangent=cfg.tangent, morphspace=cfg.morphspace,
                dofalloff=cfg.dofalloff, doclampweight=cfg.doclampweight,
                strict_parity=cfg.strict_parity, dbse_lstsq=cfg.dbse_lstsq,
            )
            model = getattr(deformer, "model", None)
            if (
                model is not None
                and int(model.ctrl.shape[-2]) != rest_rig.num_points
                # reduced-basis regressions (decimate.fit_reduced) choose
                # K < N centers on purpose — not a stale checkpoint
                and not getattr(deformer, "reduced", False)
            ):
                warnings.append(
                    f"precomputed deformer was fitted on "
                    f"{int(model.ctrl.shape[-2])} control points but the "
                    f"rest rig has {rest_rig.num_points}; capture islands "
                    "follow the rig, the deformation follows the checkpoint"
                )
            self._deformer = dataclasses.replace(
                deformer, cfg=cfg, params=params
            )
            self._fit_key = (
                "external", id(deformer), cfg.solve_view(),
                _all_params_key(params),
            )
            fit_key = self._fit_key
        else:
            # Per-marker confidence (rest-rig `confidence` point attr,
            # ops/fit._family_radii): consumed by the ridge families'
            # fits; warn-and-ignore elsewhere, matching the node's
            # contract for inapplicable knobs.
            confidence = rest_rig.attr("confidence")
            if confidence is not None:
                from facedeform_tpu.config import RBFModelType

                if cfg.model == RBFModelType.QNN:
                    # applies to the PU route too: QNN keeps lam=0 there
                    # (node_fit_kwargs), so lam/c would still be 0
                    warnings.append(
                        "confidence attr needs a ridge family (MULTILAYER "
                        "or KERNEL); QNN interpolates exactly — ignoring "
                        "it."
                    )
                    confidence = None
            fit_key = (
                rest_rig.pos_id, deform_rig.pos_id, cfg.solve_view(),
                # PU consumes only lam (auto per-patch radii): qcoef/zcoef/
                # radius slider changes must not re-run a scan-scale PU fit
                (float(params.lam),) if cfg.solver == "pu"
                else _fit_params_key(params),
                # confidence edits bump the rig's attr id -> refit; rigs
                # without the attr keep a constant key term
                rest_rig.attr_id if confidence is not None else None,
            )
        if fit_key != self._fit_key:
            with stage("solve", times):
                if cfg.solver == "pu":
                    # partition-of-unity model (ops/pu.py): any-N rigs at
                    # dense double-float precision, node semantics via the
                    # Deformer-compatible adapter
                    from facedeform_tpu.ops.pu import PUNodeDeformer

                    self._deformer = PUNodeDeformer.fit(
                        rest_rig.points, deform_rig.points, cfg, params,
                        mesh_devices=mesh_devices, confidence=confidence,
                    )
                else:
                    from facedeform_tpu.deformer import FitPlan

                    # The factor key is the fit key minus the deformed rig:
                    # a pose-only change (marker drag / next tracked frame)
                    # keeps it, so the cached FitPlan's O(n^2) refit
                    # replaces the O(n^3) refactorization.
                    factor_key = (
                        rest_rig.pos_id, cfg.solve_view(),
                        _fit_params_key(params),
                        rest_rig.attr_id if confidence is not None else None,
                    )
                    if FitPlan.supports(cfg, rest_rig.num_points):
                        if factor_key == self._fit_plan_key:
                            # plan cfg/params carry fit-time eval toggles;
                            # refresh to this cook's (solve fields match —
                            # they are in the factor key)
                            self._deformer = dataclasses.replace(
                                self._fit_plan.refit(deform_rig.points),
                                cfg=cfg, params=params,
                            )
                        else:
                            self._deformer, self._fit_plan = (
                                Deformer.fit_with_plan(
                                    rest_rig.points, deform_rig.points,
                                    cfg, params, confidence=confidence,
                                )
                            )
                            self._fit_plan_key = factor_key
                    else:
                        self._fit_plan = None
                        self._fit_plan_key = None
                        self._deformer = Deformer.fit(
                            rest_rig.points, deform_rig.points, cfg, params,
                            confidence=confidence,
                        )
            self._fit_key = fit_key
        elif (
            self._deformer.cfg != cfg
            or _all_params_key(self._deformer.params) != _all_params_key(params)
        ):
            # Cache hit with changed eval-side knobs (falloff rate, weight
            # clamps, eval-only cfg toggles): reuse the solved model, refresh
            # the knobs the cached Deformer captured at fit time.
            self._deformer = dataclasses.replace(
                self._deformer, cfg=cfg, params=params
            )
        deformer = self._deformer
        rep = deformer.report
        if rep.scale_norm is not None:
            # One host pull for all diagnostics (tunnel RTT).
            cond = rep.cond_est if rep.cond_est is not None else jnp.nan
            vals = np.asarray(jnp.stack([
                jnp.asarray(rep.residual_norm, jnp.float32),
                jnp.asarray(rep.rhs_norm, jnp.float32),
                jnp.asarray(rep.backward_error(), jnp.float32),
                jnp.asarray(cond, jnp.float32),
            ]))
            messages.append(
                f"Solve residual: {vals[0]:.3e} (rhs {vals[1]:.3e}, "
                f"backward error {vals[2]:.3e}, cond est {vals[3]:.2e})"
            )
        else:
            messages.append(
                f"Solve residual: {float(rep.residual_norm):.3e} "
                f"(rhs {float(rep.rhs_norm):.3e})"
            )

        # ------------------------------------------------- tangent frame
        frame = None
        if cfg.tangent:
            if out.has_tangent_frame():
                frame = (out.attr("tangentu"), out.attr("tangentv"), out.attr("N"))
            else:
                # reference warning text (:295-297)
                warnings.append(
                    "Append PolyFrameSOP and enable tangent[u/v] and N "
                    "attribute to allow tangent displacement."
                )

        # ------------------------------------------------------- eval loop
        dist2 = capture.dist2 if capture is not None else None
        from facedeform_tpu.ops.pu import PUNodeDeformer as _PUND

        with stage("eval", times):
            if mesh_devices is not None and isinstance(deformer, _PUND):
                # Vertex-sharded PU eval (parallel/pu_sharded.py): same
                # falloff/tangent/group composition as single-device, with
                # the displacement field computed across the mesh.
                new_pts, falloff = deformer.apply(
                    out.points, dist2=dist2, frame=frame,
                    group_mask=group_mask,
                    plan_key=(mesh_in.pos_id, out.num_points),
                    mesh_devices=mesh_devices,
                )
            elif mesh_devices is not None:
                from facedeform_tpu.parallel.sharding import sharded_apply

                v = out.num_points
                gate = (
                    np.asarray(group_mask, np.float32)
                    if group_mask is not None else np.ones(v, np.float32)
                )
                d2_arr = dist2 if dist2 is not None else np.zeros(v, np.float32)
                new_pts, falloff = sharded_apply(
                    deformer.model, jnp.asarray(out.points),
                    jnp.asarray(d2_arr), jnp.asarray(gate),
                    cfg, params, mesh_devices,
                    frame=frame,  # tangent projection shards with vertices
                )
                if group_mask is not None:
                    new_pts = jnp.where(
                        jnp.asarray(group_mask)[:, None], new_pts,
                        jnp.asarray(out.points),
                    )
            else:
                backend = self._choose_backend(
                    mesh_in, deformer, out.points, dist2, frame, group_mask
                )
                if isinstance(deformer, _PUND):
                    # plan keyed on the mesh positions' data id: no
                    # per-cook content hash of the full point buffer
                    new_pts, falloff = deformer.apply(
                        out.points, dist2=dist2, frame=frame,
                        group_mask=group_mask, backend=backend,
                        plan_key=(mesh_in.pos_id, out.num_points),
                    )
                else:
                    new_pts, falloff = deformer.apply(
                        out.points, dist2=dist2, frame=frame,
                        group_mask=group_mask, backend=backend,
                    )
            new_pts = np.asarray(new_pts)
        out.set_attr("fd_falloff", np.asarray(falloff, np.float32))

        if picked:
            # Eval-pass falloff viz: the reference maps falloff onto an HSV
            # 200..250 hue when the node is selected ("picked",
            # src/SOP_FaceDeform.cpp:426-436 — intent FIXME'd out there;
            # this is the working version), white otherwise.
            from facedeform_tpu.capture.capture import _hsv_to_rgb

            f = np.clip(np.asarray(falloff, np.float32), 0.0, 1.0)
            out.set_attr("Cd", _hsv_to_rgb(200.0 + f * 50.0))
        elif capture is not None:
            out.set_attr("Cd", capture.color)

        # ------------------------------------------------------ morph pass
        weights_out = None
        rbf_pts = new_pts  # RBF-pass output, kept for the morph Jacobian
        if dbse_model is not None:
          with stage("morph", times):
            rest_attr = jnp.asarray(self._rest_attr)
            cur = jnp.asarray(new_pts)
            if cfg.dbse_robust and not cfg.dbse_lstsq:
                warnings.append(
                    "dbse_robust requires the least-squares weight path "
                    "(dbse_lstsq=True); ignoring it for the parity recipe."
                )
            if cfg.dbse_lstsq and mesh_devices is not None:
                if cfg.dbse_robust:
                    from facedeform_tpu.parallel.dbse_sharded import (
                        weights_robust_sharded as _w_sharded,
                    )
                else:
                    from facedeform_tpu.parallel.dbse_sharded import (
                        weights_lstsq_sharded as _w_sharded,
                    )

                w, w_report = _w_sharded(
                    dbse_model.deltas, cur, rest_attr, mesh_devices
                )
                # Same Gram-solve health check as the single-device path:
                # an ill-conditioned blend basis must trip the warning on
                # both (src/SOP_FaceDeform.cpp:363-368's terminationtype).
                try:
                    errors.check_solve(w_report)
                    ok = True
                except errors.SolveFailedError:
                    ok = False
            elif cfg.dbse_lstsq:
                if cfg.dbse_robust:
                    w, w_report = dbse_ops.weights_robust(
                        dbse_model, cur, rest_attr
                    )
                else:
                    w, w_report = dbse_ops.weights_lstsq(
                        dbse_model, cur, rest_attr
                    )
                try:
                    errors.check_solve(w_report)
                    ok = True
                except errors.SolveFailedError:
                    ok = False
            else:
                w = dbse_ops.weights_parity(dbse_model, cur, rest_attr)
                ok = bool(np.isfinite(np.asarray(w)).all())
            if not ok:
                warnings.append(
                    "Can't compute weights for morphspace deformation. Ignoring it."
                )
            else:
                morphed = np.asarray(dbse_ops.morph_apply(
                    dbse_model, cur, rest_attr, w, cfg, params
                ))
                if group_mask is not None:
                    # group contract: the blend reconstruction writes all
                    # V rows; off-group vertices keep the (already gated)
                    # eval output — reproduced moving 0.014 off-group
                    # before this gate (round-5 review finding)
                    morphed = np.where(
                        np.asarray(group_mask, bool)[:, None],
                        morphed, new_pts,
                    )
                new_pts = morphed
                weights_out = np.asarray(w)
                out.detail_attrs["weights"] = weights_out

        # -------------------------------------------------------- psd pass
        psd_applied = False
        # Pose-space sculpt corrections (ops/psd.py) layered on top of the
        # full pipeline output; at an example pose the cook reproduces the
        # artist's sculpt exactly (the corrections were derived against
        # this same pipeline, so they absorb capture/tangent/morph).
        if examples:
            psd = self._psd_fit(
                inputs, examples, cfg, params, group_mask, mesh_devices,
                symmetrize, symmetry_tol, psd_lam, psd_eps, psd_normalize,
                psd_align, warnings, times, deformer=ext_deformer,
            )
            corr_host = self._psd_corr_host
        elif psd is not None:
            # checkpoint-loaded model: validate against THIS mesh/rig and
            # cache a host copy of the corrections (identity-keyed)
            kk, v_corr, _ = (int(s) for s in psd.model.corrections.shape)
            d_feat = int(psd.model.features.shape[1])
            # validate against the ORIGINAL inputs[1] rig: pose_feature
            # below reads inputs[1]/inputs[2], NOT the locally
            # symmetrized rest_rig (whose appended mirrors would
            # spuriously reject a valid checkpoint; round-5 review)
            n_rig_orig = inputs[1].num_points
            if v_corr != mesh_in.num_points or d_feat != 3 * n_rig_orig:
                warnings.append(
                    f"psd: checkpoint was fitted for {v_corr} mesh points / "
                    f"{d_feat // 3} rig markers; inputs have "
                    f"{mesh_in.num_points} / {n_rig_orig}. "
                    "Ignoring pose-space deformation."
                )
                psd = None
                corr_host = None
            else:
                if self._psd_ext is not psd:
                    from facedeform_tpu.ops import psd as psd_ops

                    self._psd_ext_corr = (
                        np.asarray(psd.model.corrections, np.float32)
                        if psd_ops.psd_apply_on_host(kk, v_corr)
                        else None
                    )
                    self._psd_ext = psd
                corr_host = self._psd_ext_corr
        else:
            corr_host = None
        if examples or psd is not None:
            if psd is not None:
                with stage("psd", times):
                    from facedeform_tpu.ops import psd as psd_ops

                    feat, r_q = psd_ops.pose_feature(
                        inputs[1].points, inputs[2].points, psd.align
                    )
                    # weights on device (K scalars through the tunnel)
                    w_psd = np.asarray(
                        psd_ops.psd_weights(
                            psd.model, feat, psd.kernel, psd.normalize
                        ),
                        np.float32,
                    )
                    if corr_host is not None:
                        # small K·V (psd.psd_apply_on_host): the (K) x
                        # (K, 3V) contraction on HOST against the cached
                        # host corrections — pulling a (V, 3) field per
                        # cook would cost ~1 s/1M verts on a tunneled
                        # runtime
                        delta = np.tensordot(
                            w_psd, corr_host, axes=1
                        ).astype(np.float32)
                    else:
                        # large K·V: corrections stay device-resident
                        # (sharded over mesh_devices' vertex axis when a
                        # mesh is given) — on-device contraction, ONE
                        # (V, 3) pull, no second full-tensor host copy
                        model = psd.model
                        if mesh_devices is not None:
                            model = model._replace(
                                corrections=self._psd_corrections_device(
                                    psd, mesh_devices
                                )
                            )
                        delta = np.asarray(
                            psd_ops.psd_delta(
                                model, feat, psd.kernel, psd.normalize
                            ),
                            np.float32,
                        )[: new_pts.shape[0]]
                    if r_q is not None:
                        # rest-frame corrections ride the query pose's
                        # rigid rotation back to world (rigid equivariance)
                        delta = delta @ r_q.T
                    if group_mask is not None:
                        # group contract (src/SOP_FaceDeform.cpp:485):
                        # writes cap to the group.  The examples route
                        # zeroes corrections at fit time; a checkpoint
                        # fitted without (or with another) group must be
                        # gated HERE too (round-5 review finding)
                        delta = np.where(
                            np.asarray(group_mask, bool)[:, None],
                            delta, np.float32(0.0),
                        )
                    new_pts = new_pts + delta
                    psd_applied = True
                out.detail_attrs["psd_weights"] = w_psd
                messages.append(
                    f"psd: {psd.model.features.shape[0]} example pose(s), "
                    f"max |w| {float(np.abs(w_psd).max()):.3f}"
                )

        # ---------------------------------------------- attribute transport
        # Extension over the reference: cookMySop writes positions only
        # (src/SOP_FaceDeform.cpp:438), leaving rest-pose N/v/orient frames
        # on the deformed surface.  The displacement field's closed-form
        # Jacobian transports them through the applied map (ops/jacobian.py)
        # — ONE Jacobian pass shared by N and every requested attribute.
        from facedeform_tpu.ops.jacobian import infer_attr_kind

        to_transport: Dict[str, np.ndarray] = {}
        transport_kinds: Dict[str, str] = {}
        # When the geometric recompute will run (faces present), it
        # overwrites any analytically transported N — skip the Jacobian
        # N transport rather than paying for output that is discarded.
        recompute_wins = bool(
            recompute_normals and out.faces is not None and len(out.faces)
        )
        if update_normals and recompute_wins:
            pass  # N comes from the geometric recompute below
        elif update_normals:
            if "N" not in out.point_attrs:
                warnings.append(
                    "update_normals: mesh has no N point attribute; skipping"
                )
            elif not hasattr(deformer, "transform_attrs"):
                warnings.append(
                    "update_normals: not available for this model family; "
                    "skipping"
                )
            else:
                to_transport["N"] = out.attr("N")
                transport_kinds["N"] = "normal"
        for name in transform_attrs or ():
            if name in to_transport:
                continue
            if name == "N" and recompute_wins:
                continue  # superseded by the geometric recompute
            vals = out.attr(name)
            if vals is None:
                warnings.append(
                    f"transform_attrs: mesh has no {name!r} point attribute;"
                    " skipping"
                )
                continue
            kind = infer_attr_kind(
                name, vals, out.attr_typeinfo.get(name)
            )
            if kind is None:
                warnings.append(
                    f"transform_attrs: {name!r} has shape "
                    f"{tuple(vals.shape)} — only (V, 3) vectors/normals and"
                    " (V, 4) quaternions transport; skipping"
                )
                continue
            if not hasattr(deformer, "transform_attrs"):
                warnings.append(
                    "transform_attrs: not available for this model family; "
                    "skipping"
                )
                break
            to_transport[name] = vals
            transport_kinds[name] = kind
        # Whole-map composition: after the morph and/or PSD passes, the
        # realized map is m(x) = x + d(x) + gamma*(P(x) - x), where P is
        # the RBF pass, gamma scales how much of the analytic RBF
        # Jacobian survives (the dofalloff-gated falloffradius residual
        # after a morph, ops/dbse.morph_pass; 1 when only PSD ran on top
        # of the full RBF output), and d is everything DISCRETE layered
        # on top — the reconstructed blend displacement (EFFECTIVE:
        # clamps and the parity x3 already applied) plus the blended PSD
        # sculpt correction.  Morph weights and PSD pose weights are
        # global constants of the map, so its spatial deformation
        # gradient is F = I + grad(d) + gamma*(F_P - I): grad(d) from ONE
        # 1-ring least-squares fit over the mesh edges
        # (ops/jacobian.mesh_field_gradient — exact on the tangent plane,
        # which is all the cofactor normal rule consumes; G is linear, so
        # blend + PSD fold into a single gradient), and F_P the
        # deformer's closed-form Jacobian.  Replaces the round-3
        # "transport reflects the RBF pass" warning.
        f_map = None
        if (weights_out is not None or psd_applied) and (
            update_normals or transform_attrs or output_stretch
        ):
            if out.faces is None or len(out.faces) == 0:
                warnings.append(
                    "morph/psd attribute transport needs mesh faces for "
                    "the discrete-displacement gradient; transported "
                    "attrs / stretch reflect the RBF pass only"
                )
            else:
                from facedeform_tpu.ops.jacobian import apply_field_gradient

                # keyed on the INPUT mesh: `out` is a copy with fresh
                # data ids, so keying on it would rebuild every cook
                nbr, grad_coeff = self._transport_grad_plan(mesh_in)
                if weights_out is None:
                    gamma = 1.0        # PSD on top of the full RBF pass
                else:
                    gamma = (
                        float(params.falloffradius)
                        if cfg.dofalloff
                        and float(params.falloffradius) != 0.0
                        else 0.0
                    )
                # rest positions: _rest_attr only exists on morphspace
                # cooks; the input mesh carries the same points always
                rest_pts = np.asarray(mesh_in.points, np.float32)
                d_field = (
                    new_pts - rest_pts - gamma * (rbf_pts - rest_pts)
                ).astype(np.float32)
                g_blend = apply_field_gradient(
                    jnp.asarray(d_field), nbr, grad_coeff,
                )
                eye3 = jnp.eye(3, dtype=jnp.float32)
                gm = jnp.float32(gamma)

                def f_map(f, _g=g_blend, _gm=gm, _eye=eye3):
                    return _eye[None] + _g + _gm * (f - _eye[None])

        # Sharded cooks on the global families ride the vertex-sharded
        # Jacobian pass (parallel/sharding.sharded_transport) — transport
        # and stretch computed together, one pass, zero collectives.  PU
        # keeps the single-device Jacobian (its plan gathers don't shard),
        # and morphspace cooks compose F_m single-device: the 1-ring
        # gradient gathers cross shard boundaries (halo exchange), and
        # the measured single-device cost doesn't justify it — 163 ms
        # per cook at 1M verts x 16-capped rings on v5e (gradient apply
        # 158 ms, gather-bound; the 240 ms geometry plan is cached per
        # rest mesh by _transport_grad_plan), a cook-rate cost on par
        # with one host round-trip of the result buffer.
        use_sharded_jac = (
            mesh_devices is not None
            and not isinstance(deformer, _PUND)
            and hasattr(deformer, "model")
            and f_map is None
        )
        stretch_sig = None
        transported_names: List[str] = []
        if to_transport:
            with stage("normals", times):
                # Query at the REST positions (where the map acted);
                # `falloff` is the per-vertex multiplier apply used
                # (incl. group gating), treated locally constant.
                w_arr = np.asarray(falloff, np.float32)
                if use_sharded_jac:
                    from facedeform_tpu.parallel.sharding import (
                        sharded_transport,
                    )

                    moved, stretch_sig = sharded_transport(
                        deformer.model, out.points, to_transport, w_arr,
                        deformer.cfg, mesh_devices, frame=frame,
                        kinds=transport_kinds,
                        want_stretch=output_stretch,
                    )
                elif output_stretch:
                    # one Jacobian/F pass covers the attrs AND the
                    # stretch QC (the Jacobian is the dominant cost)
                    moved, stretch_sig = deformer.transform_attrs(
                        out.points, to_transport, w_arr, frame=frame,
                        kinds=transport_kinds, want_stretch=True,
                        f_map=f_map,
                    )
                else:
                    moved = deformer.transform_attrs(
                        out.points, to_transport, w_arr, frame=frame,
                        kinds=transport_kinds, f_map=f_map,
                    )
                for name, arr in moved.items():
                    out.set_attr(name, np.asarray(arr, np.float32))
                    transported_names.append(name)
        if output_stretch:
            if stretch_sig is None and not hasattr(
                deformer, "principal_stretches"
            ):
                warnings.append(
                    "output_stretch: not available for this model family; "
                    "skipping"
                )
            else:
                with stage("stretch", times):
                    if stretch_sig is None and use_sharded_jac:
                        from facedeform_tpu.parallel.sharding import (
                            sharded_transport,
                        )

                        _, stretch_sig = sharded_transport(
                            deformer.model, out.points, {},
                            np.asarray(falloff, np.float32),
                            deformer.cfg, mesh_devices, frame=frame,
                            want_stretch=True,
                        )
                    elif stretch_sig is None:
                        stretch_sig = deformer.principal_stretches(
                            out.points, np.asarray(falloff, np.float32),
                            frame=frame, f_map=f_map,
                        )
                    sig = np.asarray(stretch_sig, np.float32)
                out.set_attr("fd_stretch", sig[:, 0])
                out.set_attr("fd_compress", sig[:, 2])
                transported_names += ["fd_stretch", "fd_compress"]
        out.set_points(new_pts)
        # ------------------------------------------- geometric normals
        # Runs on the FINAL positions (after the morph pass), so unlike
        # the analytic transport above it reflects everything written.
        if recompute_normals:
            if out.faces is None or len(out.faces) == 0:
                warnings.append(
                    "recompute_normals: mesh has no faces; skipping "
                    "(use update_normals for point clouds)"
                )
            else:
                from facedeform_tpu.geometry.topology import vertex_normals

                with stage("normals_topo", times):
                    out.set_attr("N", vertex_normals(out))
                if "N" not in transported_names:
                    transported_names.append("N")

        # ------------------------------------------------ secondary meshes
        # Extension over the reference: accessory geometry rides the same
        # solved field in the same cook (one fit, many meshes).  Full
        # displacement everywhere — dist2 defaults to zeros, reference
        # quirk 1's no-capture semantics (src/SOP_FaceDeform.cpp:404-410).
        sec_out: List[Mesh] = []
        if secondary:
            with stage("secondary", times):
                for sec in secondary:
                    s_out = sec.copy()
                    s_frame = None
                    if cfg.tangent and s_out.has_tangent_frame():
                        s_frame = (
                            s_out.attr("tangentu"),
                            s_out.attr("tangentv"),
                            s_out.attr("N"),
                        )
                    if isinstance(deformer, _PUND):
                        s_pts, s_w = deformer.apply(
                            s_out.points, frame=s_frame,
                            plan_key=(sec.pos_id, s_out.num_points),
                        )
                    else:
                        s_pts, s_w = deformer.apply(
                            s_out.points, frame=s_frame
                        )
                    s_out.set_points(np.asarray(s_pts))
                    s_out.set_attr("fd_falloff", np.asarray(s_w, np.float32))
                    if (recompute_normals and s_out.faces is not None
                            and len(s_out.faces)):
                        from facedeform_tpu.geometry.topology import (
                            vertex_normals,
                        )

                        s_out.set_attr("N", vertex_normals(s_out))
                    sec_out.append(s_out)

        return CookResult(
            mesh=out, warnings=warnings, messages=messages,
            capture=capture, weights=weights_out,
            transported=tuple(transported_names),
            secondary=tuple(sec_out),
        )
