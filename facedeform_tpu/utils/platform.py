"""Where will the next computation actually run?

Every TPU-vs-CPU routing decision in the package (fused Pallas kernel vs
XLA fallback, `interpret=` mode for pallas_call) must agree with the
device JAX will REALLY place work on.  `jax.default_backend()` alone is
not enough: once the axon/TPU backend has initialized,
`jax.config.update("jax_platforms", "cpu")` is a no-op, and an active
`jax.default_device(cpu)` scope (the driver's multichip dryrun pins CPU
devices this way, __graft_entry__.py) moves arrays to CPU while
default_backend() still reports "tpu" — compiled-mode pallas_call then
dies with "Only interpret mode is supported on CPU backend".

`on_tpu()` is the one shared answer: the active default-device scope
wins; otherwise the process default backend.  Mesh-scoped code paths
(shard_map over an explicit device mesh) should keep deciding from the
mesh's own devices — see parallel/batched._mesh_on_tpu.
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when default-placed computation will land on a TPU."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax.default_device also accepts a platform-name string
        plat = dev if isinstance(dev, str) else dev.platform
        return plat == "tpu"
    return jax.default_backend() == "tpu"
