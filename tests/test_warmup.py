"""Cold-compile bootstrap (facedeform_tpu/warmup.py) + warm CLI flags.

The real value of `warm` is only measurable on the remote-compile chip
(docs/PERFORMANCE.md records the cold->warm numbers); these tests keep
the code paths and the flag wiring from rotting on CPU.
"""

import numpy as np
import pytest

from facedeform_tpu.cli import _build_parser


pytestmark = pytest.mark.filterwarnings("ignore")


def test_warm_transport_tiny_shapes():
    """warm_transport compiles all three transport program families at
    tiny shapes, including BOTH bucketed gradient widths (8 for quad/tri
    degree, 16 for capped pole rings — round-5 review finding: warming
    only the uv-sphere's width-16 table left production meshes cold)."""
    from facedeform_tpu import warmup

    msgs = []
    # 777 is deliberately non-square: the programs key on the EXACT V, so
    # warm must honor the requested count (an earlier uv-sphere-based
    # version silently warmed res^2+2 instead)
    t = warmup.warm_transport(
        verts=777, controls=40, frames=2, progress=msgs.append
    )
    assert {"transport_normals", "transport_morph_composed",
            "transport_frames", "total"} <= set(t)
    assert t["total"] > 0.0 and len(msgs) == 3


def test_warm_cli_solver_flag_isolated_from_cook_solver():
    """`warm --solver dense` must parse (round-5 review finding: the dest
    collided with _add_model_flags' cook-level solver default, so the
    flag's own documented default was rejected by DeformConfig), and the
    model flags must reach the PU warm path."""
    p = _build_parser()
    a = p.parse_args(["warm", "--solver", "dense"])
    assert a.warm_solver == "dense" and a.solver == "auto"
    a = p.parse_args(
        ["warm", "--solver", "pu", "--kernel", "gaussian", "--lambda", "0.01"]
    )
    assert a.warm_solver == "pu" and a.kernel == "gaussian" and a.lam == 0.01
    a = p.parse_args(["warm"])
    assert a.warm_solver == "dense" and a.solver == "auto"
