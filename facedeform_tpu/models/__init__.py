"""Model families: the rebuild's "model zoo".

The reference exposes two ALGLIB algorithm families behind one menu
(src/SOP_FaceDeform.cpp:48-53, dispatched :342-349).  Here each family is a
first-class class with a uniform fit/evaluate interface over the shared
RBFModel pytree, plus the explicit kernel-zoo family (BASELINE config 2):

    QNNDeformModel        — adaptive per-point-radius gaussians, exact
                            interpolation (rbfsetalgoqnn analogue)
    MultilayerDeformModel — coarse-to-fine residual-fitted gaussian stack
                            (rbfsetalgomultilayer analogue)
    KernelZooDeformModel  — user-chosen basis + global radius + ridge

These are thin, typed fronts over ops.fit / Deformer; use Deformer directly
for the full falloff/tangent/group pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from facedeform_tpu.config import DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType
from facedeform_tpu.deformer import Deformer


@dataclasses.dataclass(frozen=True)
class _DeformModelBase:
    """Shared fit/evaluate plumbing for the model families."""

    term: PolyTerm = PolyTerm.LINEAR

    def _config(self) -> DeformConfig:
        raise NotImplementedError

    def _params(self) -> DeformParams:
        return DeformParams()

    def fit(self, rest_ctrl, deformed_ctrl) -> Deformer:
        """Solve rest -> deformed control displacement; returns a Deformer."""
        return Deformer.fit(rest_ctrl, deformed_ctrl, self._config(), self._params())


@dataclasses.dataclass(frozen=True)
class QNNDeformModel(_DeformModelBase):
    """Exact-interpolating gaussians with per-point adaptive radii.

    qcoef scales each basis to its local point spacing; zcoef caps how far
    an isolated marker reaches (the reference's Q/Z sliders,
    src/SOP_FaceDeform.cpp:123-124, clamped :249-250).
    """

    qcoef: float = 1.0
    zcoef: float = 5.0

    def _config(self) -> DeformConfig:
        return DeformConfig(model=RBFModelType.QNN, term=self.term)

    def _params(self) -> DeformParams:
        return DeformParams(qcoef=self.qcoef, zcoef=self.zcoef)


@dataclasses.dataclass(frozen=True)
class MultilayerDeformModel(_DeformModelBase):
    """Coarse-to-fine gaussian layers with ridge regularization.

    radius is the first layer's scale, halving per layer; lam is the ridge
    (the reference's Radius/Layers/Lambda, src/SOP_FaceDeform.cpp:347).
    """

    radius: float = 1.0
    layers: int = 4
    lam: float = 0.1

    def _config(self) -> DeformConfig:
        return DeformConfig(
            model=RBFModelType.MULTILAYER, layers=self.layers, term=self.term
        )

    def _params(self) -> DeformParams:
        return DeformParams(radius=self.radius, lam=self.lam)


@dataclasses.dataclass(frozen=True)
class KernelZooDeformModel(_DeformModelBase):
    """Explicit basis choice (rebuild extension; BASELINE config 2)."""

    kernel: RBFKernel = RBFKernel.GAUSSIAN
    radius: float = 1.0
    lam: float = 0.01

    def _config(self) -> DeformConfig:
        return DeformConfig(
            model=RBFModelType.KERNEL, kernel=self.kernel, term=self.term
        )

    def _params(self) -> DeformParams:
        return DeformParams(radius=self.radius, lam=self.lam)


@dataclasses.dataclass(frozen=True)
class PartitionOfUnityModel(_DeformModelBase):
    """Any-N precision family (rebuild extension, ops/pu.py): overlapping
    kd-cell patches, dense double-float solves, Wendland-blended eval.
    The full-precision counterpart of ALGLIB v2's hierarchical any-N
    models.  fit() returns a PUDeformer (displacement-only surface)."""

    kernel: RBFKernel = RBFKernel.THIN_PLATE
    eps: object = "auto"     # per-patch shape parameter, or a float
    lam: float = 0.01
    patch_size: int = 192
    overlap: float = 1.3

    def fit(self, rest_ctrl, deformed_ctrl):
        from facedeform_tpu.ops.pu import PUDeformer

        return PUDeformer.fit(
            rest_ctrl, deformed_ctrl, kernel=self.kernel, term=self.term,
            eps=self.eps, lam=self.lam, patch_size=self.patch_size,
            overlap=self.overlap,
        )


__all__ = [
    "QNNDeformModel",
    "MultilayerDeformModel",
    "KernelZooDeformModel",
    "PartitionOfUnityModel",
]
