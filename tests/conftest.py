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


# --- smoke lane -------------------------------------------------------------
# One representative test per major route (dense / krylov / PU / DBSE /
# capture / sharded / pallas / serve / CLI / IO / skinning / blendshapes /
# PSD), curated so `pytest -m smoke` stays under 5 minutes on this 1-core
# box while the full 600+-test suite remains the nightly gate.  Keyed by
# "file::name" so parametrized variants of a listed test are all included.
_SMOKE = {
    "test_node.py::test_cook_basic",
    "test_node.py::test_cook_caches_solve_and_capture",
    "test_solve.py::test_lu_refined_close_to_f64",
    "test_krylov.py::test_fit_krylov_matches_direct",
    "test_pu.py::test_pu_exact_interpolation_and_global_parity",
    "test_pu.py::test_node_cook_with_pu_solver",
    "test_dbse.py::test_lstsq_recovers_known_weights",
    "test_dbse.py::test_parity_weights_match_reference_recipe",
    "test_capture.py::test_end_to_end_with_capture",
    "test_sharding.py::test_sharded_apply_matches_single_device",
    "test_sharding.py::test_fit_sharded_matches_single_device",
    "test_serve.py::test_serve_fit_apply_roundtrip",
    "test_cli.py::test_cli_deform_roundtrip",
    "test_pallas.py::test_pallas_gate_freezes",
    "test_pallas.py::test_pallas_radius_skip",
    "test_gltf_io.py::test_save_glb_static_roundtrip",
    "test_skinning.py::test_two_rigid_clusters_recover_exactly",
    "test_blendshapes.py::test_full_rank_reconstructs_exactly",
    "test_geo_io.py::test_geo_roundtrip_full",
    "test_grouppattern.py::test_plain_name_matches_group_mask",
    "test_psd.py::test_exact_reproduction_at_examples",
    # round-4 routes
    "test_blendshapes_sharded.py::test_sharded_matches_single_device",
    "test_psd.py::test_node_device_route_matches_host",
    "test_skinning.py::test_edges_without_lambda_only_report",
    # round-5 routes
    "test_multihost_2proc.py::test_two_process_sharded_eval_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _SMOKE:
            item.add_marker(pytest.mark.smoke)


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
