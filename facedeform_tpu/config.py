"""Configuration surface for the facedeform-tpu framework.

Mirrors the 16-parameter public surface of the reference Houdini SOP node
(reference: src/SOP_FaceDeform.cpp:99-137 declares the PRM templates, and
:244-263 reads + clamps them at cook time).  The reference's ALGLIB model /
term enums live at src/SOP_FaceDeform.hpp:13-18.

Design notes (TPU-first):
  * Everything that changes traced *structure* (kernel choice, polynomial
    term, model family, layer count, feature toggles) is a static field of a
    frozen, hashable dataclass so it can key jit caches.
  * Everything that is a continuous knob (q, z, radius, lambda, falloff
    rate/radius, weight clamp range) is carried as dynamic scalars in
    :class:`DeformParams` so sliding a slider never triggers recompilation.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Tuple

import jax.numpy as jnp


class RBFModelType(enum.IntEnum):
    """RBF algorithm family.

    QNN / MULTILAYER mirror the reference's two ALGLIB algorithms
    (src/SOP_FaceDeform.cpp:342-349); KERNEL is the new explicit
    kernel-zoo mode (BASELINE config 2) where the user picks the basis
    function and a single global radius directly.
    """

    QNN = 0
    MULTILAYER = 1
    KERNEL = 2


class PolyTerm(enum.IntEnum):
    """Polynomial tail appended to the RBF system.

    Mirrors rbfset{lin,const,zero}term in the reference
    (src/SOP_FaceDeform.cpp:351-361).
    """

    LINEAR = 0    # 1, x, y, z  (4 extra rows/cols)
    CONSTANT = 1  # 1            (1 extra row/col)
    ZERO = 2      # none


class RBFKernel(enum.IntEnum):
    """Radial basis function zoo.

    The reference delegates the basis choice to ALGLIB's black boxes; the
    rebuild owns the math explicitly (SURVEY.md section 7).  GAUSSIAN is the
    basis underlying both QNN and multilayer modes.
    """

    GAUSSIAN = 0              # exp(-(r/eps)^2)
    THIN_PLATE = 1            # (r/eps)^2 log(r/eps)
    MULTIQUADRIC = 2          # sqrt(1 + (r/eps)^2)
    INVERSE_MULTIQUADRIC = 3  # 1/sqrt(1 + (r/eps)^2)
    LINEAR = 4                # r/eps
    CUBIC = 5                 # (r/eps)^3
    WENDLAND_C2 = 6           # (1-r/eps)^4_+ (4 r/eps + 1), compact support


@dataclasses.dataclass(frozen=True)
class DeformConfig:
    """Static (structure-affecting) configuration.

    Field-for-field covers the reference node's parameter surface
    (src/SOP_FaceDeform.cpp:99-137); see DeformParams for the dynamic
    scalars.  Extra fields beyond the reference are documented inline.
    """

    model: RBFModelType = RBFModelType.QNN
    kernel: RBFKernel = RBFKernel.GAUSSIAN   # used when model == KERNEL
    term: PolyTerm = PolyTerm.LINEAR
    layers: int = 4                          # multilayer layer count (:252)
    tangent: bool = False                    # project to tangent plane (:416-422)
    morphspace: bool = False                 # DBSE blendshape projection (:444)
    doclampweight: bool = False              # clamp per-shape weights (:454-458)
    dofalloff: bool = False                  # real capture distances (capture.cpp:71-75)

    # --- rebuild extensions -------------------------------------------------
    # Falloff distance metric: "euclidean" = straight-line to the nearest
    # rig primitive (reference semantics, capture.cpp:81-86); "geodesic" =
    # multi-source Dijkstra along the mesh edge graph from the marker
    # seeds, so falloff cannot bleed across surface gaps (upper lip to
    # lower lip).  Host-side capture data only — never a jit key
    # (solve_view/eval_view reset it).
    falloff_metric: str = "euclidean"
    # strict_parity preserves the reference's quirks verbatim:
    #   quirk 1: uncaptured vertices deform fully (d2 attr defaults to 0)
    #   quirk 2: d2 = -1 sentinel passes the radius test and *amplifies*
    #            displacement (capture.cpp:76-88 + SOP_FaceDeform.cpp:404-424)
    # With strict_parity=False (default) captured distances are clamped >= 0.
    strict_parity: bool = False
    # Iterative-refinement sweeps for the f32 on-device solve
    # (f64-compensated residual; SURVEY.md section 7 "hard parts" (a)).
    n_refine: int = 2
    # DBSE: True = genuine least-squares fit (BASELINE config 4);
    # False = reference-parity column-sum-of-packed-QR (dbse.cpp:53-55).
    dbse_lstsq: bool = True
    # DBSE robust mode: Huber-IRLS weight fit (ops/dbse.weights_robust) so
    # scan outliers (occlusion holes, marker glints) can't drag the shape
    # weights.  Requires dbse_lstsq (the parity recipe has no robust
    # analogue — the node warns and ignores it there).
    dbse_robust: bool = False
    # RBF solver: "auto" picks the dense factorization up to ~8k controls
    # and matrix-free Krylov (ops/krylov.py) beyond — block-Jacobi
    # preconditioned MINRES for the symmetric families (MULTILAYER/KERNEL),
    # restarted GMRES for QNN's non-symmetric per-point-radius system.
    # "direct"/"krylov" force a path; "pu" fits the partition-of-unity
    # model (ops/pu.py: dense double-float per patch, any N) — the node
    # then evaluates through the PU blend instead of the global RBF.
    solver: str = "auto"

    def __post_init__(self):
        object.__setattr__(self, "model", RBFModelType(self.model))
        object.__setattr__(self, "kernel", RBFKernel(self.kernel))
        object.__setattr__(self, "term", PolyTerm(self.term))
        if self.layers < 1:
            # reference clamp: layers >= 1 (src/SOP_FaceDeform.cpp:252)
            object.__setattr__(self, "layers", 1)
        if self.solver not in ("auto", "direct", "krylov", "pu"):
            raise ValueError(
                "solver must be 'auto', 'direct', 'krylov' or 'pu', "
                f"got {self.solver!r}"
            )
        if self.falloff_metric not in ("euclidean", "geodesic"):
            raise ValueError(
                "falloff_metric must be 'euclidean' or 'geodesic', "
                f"got {self.falloff_metric!r}"
            )

    @property
    def n_poly(self) -> int:
        """Number of polynomial tail basis functions."""
        return {PolyTerm.LINEAR: 4, PolyTerm.CONSTANT: 1, PolyTerm.ZERO: 0}[self.term]

    def solve_view(self) -> "DeformConfig":
        """This config reduced to the fields the RBF solve consumes.

        jit specializes on the whole (hashable) config; without this view,
        toggling eval-only switches (tangent, morphspace, falloff, weight
        clamping...) forces a full recompile of the fit program — tens of
        seconds per toggle on remote-compile TPU runtimes."""
        return dataclasses.replace(
            self, tangent=False, morphspace=False, dofalloff=False,
            doclampweight=False, strict_parity=False, dbse_lstsq=True,
            dbse_robust=False, falloff_metric="euclidean",
        )

    def eval_view(self) -> "DeformConfig":
        """Reduced to the fields the eval path consumes (model/kernel/term/
        layers/tangent/strict_parity); same recompile rationale."""
        return dataclasses.replace(
            self, morphspace=False, dofalloff=False, doclampweight=False,
            dbse_lstsq=True, dbse_robust=False, solver="auto", n_refine=2,
            falloff_metric="euclidean",
        )

    @property
    def n_layers(self) -> int:
        """Static number of solve layers (1 unless MULTILAYER)."""
        return self.layers if self.model == RBFModelType.MULTILAYER else 1


class DeformParams(NamedTuple):
    """Dynamic (traced) scalar knobs.

    Defaults and clamps mirror the reference's cook-time reads
    (src/SOP_FaceDeform.cpp:244-263).  All fields are python floats or
    0-d jnp arrays; they flow through jit as arguments.
    """

    qcoef: jnp.ndarray = 1.0          # QNN smoothness q, clamp >= 0.1 (:249)
    zcoef: jnp.ndarray = 5.0          # QNN deviation z, clamp >= 0.1 (:250)
    radius: jnp.ndarray = 1.0         # RBF base radius AND deform cutoff, >= 0.01 (:251)
    lam: jnp.ndarray = 0.1            # multilayer regularization, >= 0.01 (:253)
    falloffrate: jnp.ndarray = 1.0    # falloff exponent (:423-424)
    falloffradius: jnp.ndarray = 1.0  # morph-space-only residual scale (:467-470)
    weight_lo: jnp.ndarray = 0.0      # blendshape weight clamp range (:258-260)
    weight_hi: jnp.ndarray = 1.0
    maxedges: int = 4                 # capture flood-fill rings, >= 1 (:257); host-side

    def clamped(self) -> "DeformParams":
        """Apply the reference's cook-time clamps (src/SOP_FaceDeform.cpp:249-257).

        maxedges is host-side only (capture flood fill) and is clamped at its
        point of use so this method stays traceable under jit.
        """
        return self._replace(
            qcoef=jnp.maximum(self.qcoef, 0.1),
            zcoef=jnp.maximum(self.zcoef, 0.1),
            radius=jnp.maximum(self.radius, 0.01),
            lam=jnp.maximum(self.lam, 0.01),
            # The reference UI restricts the falloff exponent to [0, 2]
            # (falloffRange, src/SOP_FaceDeform.cpp:96); a negative rate
            # yields 0^negative = inf for vertices exactly at d2 == r^2.
            falloffrate=jnp.maximum(self.falloffrate, 0.0),
        )
