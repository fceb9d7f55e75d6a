"""Randomized cross-feature parity fuzz: every cook option against the
f64 oracle.

Individual features are unit-tested elsewhere; this sweep exercises the
INTERACTIONS (kernel x term x layers x tangent x falloff x group x
strict_parity x solver routing) that enumerated tests don't cover.  Each
trial draws a full configuration, runs the real Deformer pipeline, and
checks the displacement against tests/oracle.py within the 5e-5 budget
(scaled up by the measured f32 floor only where the oracle itself rounds
differently: strict_parity amplification can exceed 1).
"""

import numpy as np
import pytest

import oracle
from facedeform_tpu import Deformer, DeformConfig, DeformParams
from facedeform_tpu.config import PolyTerm, RBFKernel, RBFModelType
from facedeform_tpu.geometry.primitives import fibonacci_points

KERNELS = list(RBFKernel)


def _random_cfg(rng):
    model = RBFModelType(int(rng.integers(0, 3)))
    return DeformConfig(
        model=model,
        kernel=KERNELS[int(rng.integers(0, len(KERNELS)))],
        term=PolyTerm(int(rng.integers(0, 3))),
        layers=int(rng.integers(1, 4)),
        tangent=bool(rng.integers(0, 2)),
        strict_parity=bool(rng.integers(0, 2)),
        solver="krylov" if rng.random() < 0.25 else "direct",
    )


@pytest.mark.parametrize("trial", range(24))
def test_fuzzed_config_matches_oracle(trial):
    rng = np.random.default_rng(1000 + trial)
    cfg = _random_cfg(rng)
    n = int(rng.integers(12, 120))
    v = int(rng.integers(50, 400))
    rest = fibonacci_points(n) * float(rng.uniform(0.5, 2.0))
    rest = rest + rng.uniform(-5, 5, 3).astype(np.float32)  # off-origin
    deformed = rest + 0.05 * rng.standard_normal((n, 3)).astype(np.float32)
    params = DeformParams(
        qcoef=float(rng.uniform(0.5, 2.0)),
        zcoef=float(rng.uniform(1.0, 8.0)),
        radius=float(rng.uniform(0.3, 2.0)),
        lam=float(rng.uniform(0.01, 0.3)),
        falloffrate=float(rng.uniform(0.0, 2.0)),
    )
    pts = (rng.standard_normal((v, 3)) * rng.uniform(0.3, 1.5)).astype(
        np.float32
    ) + np.asarray(rest.mean(0))
    dist2 = None
    if rng.random() < 0.5:
        dist2 = np.abs(rng.standard_normal(v)).astype(np.float32) * float(
            params.radius
        ) ** 2
        if cfg.strict_parity and rng.random() < 0.5:
            dist2[rng.integers(0, v, v // 10)] = -1.0  # quirk-2 sentinel
    frame = None
    if cfg.tangent:
        frame = tuple(
            rng.standard_normal((v, 3)).astype(np.float32) for _ in range(3)
        )
    group_mask = None
    if rng.random() < 0.4:
        group_mask = rng.standard_normal(v) > 0

    try:
        d = Deformer.fit(rest, deformed, cfg, params)
    except Exception as e:  # solver-declared failure is a legal outcome
        from facedeform_tpu.utils.errors import SolveFailedError

        assert isinstance(e, SolveFailedError), e
        return
    got, got_w = d.apply(pts, dist2=dist2, frame=frame, group_mask=group_mask)
    want, want_w = oracle.deform(
        rest, deformed, pts, cfg, params,
        dist2=dist2, frame=frame, group_mask=group_mask,
    )
    got = np.asarray(got, np.float64)
    # Scale-aware budget: growing kernels carry |disp| up to O(|w|); the
    # 5e-5 contract is on displacement at BASELINE-like magnitudes, so
    # normalize by the oracle displacement scale when it exceeds 1.
    scale = max(1.0, np.abs(want - pts).max())
    err = np.abs(got - want).max() / scale
    assert err < 5e-5, (
        f"trial {trial}: cfg={cfg} err={err:.2e} scale={scale:.1f}"
    )
    np.testing.assert_allclose(
        np.asarray(got_w), want_w, atol=1e-5,
        err_msg=f"trial {trial} falloff mismatch",
    )
