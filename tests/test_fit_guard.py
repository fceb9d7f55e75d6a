"""fit solver-routing guards."""

import numpy as np
import pytest

from facedeform_tpu import DeformConfig, DeformParams, Deformer, RBFModelType
from facedeform_tpu.geometry.primitives import fibonacci_points


def test_qnn_krylov_rejected(rng):
    """MINRES needs symmetry; QNN's per-point radii break it — explicit
    solver='krylov' must fail loudly instead of misconverging silently."""
    rest = fibonacci_points(30)
    cfg = DeformConfig(model=RBFModelType.QNN, solver="krylov")
    with pytest.raises(ValueError, match="non-symmetric"):
        Deformer.fit(rest, rest * 1.05, cfg, DeformParams())


def test_auto_stays_direct_for_qnn(rng):
    rest = fibonacci_points(30)
    d = Deformer.fit(rest, rest * 1.05, DeformConfig(solver="auto"), DeformParams())
    disp = np.asarray(d.displacement(rest))
    np.testing.assert_allclose(disp, rest * 0.05, atol=5e-5)
