"""Test harness config: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding logic is exercised host-side per SURVEY.md section 4:
XLA_FLAGS=--xla_force_host_platform_device_count=8 + a CPU jax.Mesh lets the
pjit/shard_map paths run without TPU hardware.

Note: this machine's environment pins JAX_PLATFORMS=axon via a sitecustomize
hook (/root/.axon_site), which overrides the env var at import time — so the
platform must be forced with jax.config.update *after* importing jax.
XLA_FLAGS still must be set before backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The package enables a persistent compile cache by default (vital on the
# remote-compile TPU runtime); on CPU the AOT artifacts are
# machine-feature-sensitive, so keep tests hermetic without it.
jax.config.update("jax_compilation_cache_dir", None)

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# Every XLA:CPU JIT-compiled executable holds ~15 mmap'd code/data regions
# (measured); the full suite compiles thousands of programs (interpret-mode
# Pallas, shard_map variants, eager micro-ops), which can exhaust the
# kernel's vm.max_map_count (65530 default).  The mmap failure surfaces as
# a SEGFAULT inside backend_compile — observed twice at ~90% of the suite,
# in whatever test happened to compile next.  Dropping the jit caches
# releases the regions (measured 3374 -> 482 maps), at the cost of
# recompiling shared programs afterwards — so only clear under pressure.
_MAPS_SOFT_LIMIT = 40_000


def _n_maps() -> int:
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-procfs platform: guard disabled
        return 0


@pytest.fixture(autouse=True)
def _jit_map_pressure_guard():
    yield
    if _n_maps() > _MAPS_SOFT_LIMIT:
        jax.clear_caches()
        gc.collect()
