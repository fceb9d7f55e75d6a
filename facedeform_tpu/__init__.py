"""facedeform-tpu: a TPU-native RBF mesh-deformation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
symek/facedeform Houdini SOP plugin (reference layout: SURVEY.md).  The
compute path is pure JAX + Pallas TPU kernels; irregular host-side geometry
(KD-trees, edge flood fill) lives in a small C++ extension with numpy
fallbacks.

Public API:
  DeformConfig / DeformParams  — the node's 16-parameter surface
  Deformer                     — fit(rest_rig, deformed_rig) -> apply(points)
  FaceDeformNode               — full cook orchestration with caching,
                                 capture and blendshape (DBSE) passes
  Mesh                         — numpy point-attribute geometry container
"""

from facedeform_tpu.config import (
    DeformConfig,
    DeformParams,
    PolyTerm,
    RBFKernel,
    RBFModelType,
)
from facedeform_tpu.capture.capture import CaptureResult, ProximityCapture
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.inverse import InverseRigResult, fit_rig
from facedeform_tpu.node import CookResult, FaceDeformNode
from facedeform_tpu.ops.fit import RBFModel, fit
from facedeform_tpu.utils.errors import (
    CaptureError,
    FaceDeformError,
    ShapeMismatchError,
    SolveFailedError,
)

__version__ = "0.1.0"

__all__ = [
    "DeformConfig",
    "DeformParams",
    "PolyTerm",
    "RBFKernel",
    "RBFModelType",
    "Deformer",
    "FaceDeformNode",
    "CookResult",
    "ProximityCapture",
    "CaptureResult",
    "Mesh",
    "RBFModel",
    "fit",
    "fit_rig",
    "InverseRigResult",
    "FaceDeformError",
    "ShapeMismatchError",
    "SolveFailedError",
    "CaptureError",
]
