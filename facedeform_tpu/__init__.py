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

import os as _os

import jax as _jax

# Persistent client-side compilation cache: on remote-compile TPU runtimes
# a single fit program can take minutes to compile and the service-side
# cache is unreliable; the local cache turns repeat launches into ~1 s
# loads (measured 76 s -> 1.6 s).  Respect any user-provided setting.
# NOT enabled when the process runs on the CPU backend (tests, the driver's
# multichip dryrun): XLA:CPU caches AOT machine code whose machine-feature
# set may not match the loading host, drowning logs in loader errors.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") and not _os.environ.get(
    "FACEDEFORM_TPU_NO_CACHE"
):
    try:
        _plat = _jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS", "")
        # Only the PRIMARY platform matters: "axon,cpu" (the sitecustomize
        # pin plus CPU fallback) still runs on the TPU — a substring test
        # for "cpu" silently disabled the cache on exactly that string.
        # An empty string (platform auto-detect) keeps the cache ON: that
        # is the common non-axon TPU deployment.
        _primary = str(_plat).split(",")[0].strip().lower()
        if (
            _jax.config.jax_compilation_cache_dir is None
            and _primary != "cpu"
        ):
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/facedeform_tpu/jax"),
            )
            # Default min-compile-time (1 s) assumes local compiles are
            # cheap; on a remote-compile runtime even sub-second-to-
            # compile programs cost a full service round trip (tens of
            # seconds under load), so cache everything.
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0
            )
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass

from facedeform_tpu.config import (
    DeformConfig,
    DeformParams,
    PolyTerm,
    RBFKernel,
    RBFModelType,
)
from facedeform_tpu.capture.capture import CaptureResult, ProximityCapture
from facedeform_tpu.deformer import Deformer, FitPlan
from facedeform_tpu.geometry.mesh import Mesh
from facedeform_tpu.inverse import InverseRigResult, fit_rig
from facedeform_tpu.node import CookResult, FaceDeformNode
from facedeform_tpu.ops.fit import RBFModel, fit
from facedeform_tpu.ops.pu import PUDeformer
from facedeform_tpu.utils.errors import (
    CaptureError,
    FaceDeformError,
    ShapeMismatchError,
    SolveFailedError,
)

__version__ = "0.2.0"

__all__ = [
    "DeformConfig",
    "DeformParams",
    "PolyTerm",
    "RBFKernel",
    "RBFModelType",
    "Deformer",
    "FitPlan",
    "FaceDeformNode",
    "CookResult",
    "ProximityCapture",
    "CaptureResult",
    "Mesh",
    "PUDeformer",
    "RBFModel",
    "fit",
    "fit_rig",
    "InverseRigResult",
    "FaceDeformError",
    "ShapeMismatchError",
    "SolveFailedError",
    "CaptureError",
]
