"""Packaging sanity (VERDICT.md round-1 gap: no install story).

The full cycle — `pip wheel` + install into a clean venv + deform through
the installed package + `facedeform-tpu` console script — is driven
manually/by the verify flow (it needs a venv and ~30 s); these tests pin
the metadata invariants that would silently break it.
"""

import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _project():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_version_matches_package():
    import facedeform_tpu

    assert _project()["project"]["version"] == facedeform_tpu.__version__


def test_native_source_ships():
    data = _project()["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in data["facedeform_tpu.native"]
    assert (REPO / "facedeform_tpu" / "native" / "fastgeo.cpp").exists()


def test_console_script_target_exists():
    target = _project()["project"]["scripts"]["facedeform-tpu"]
    mod, fn = target.split(":")
    import importlib

    assert callable(getattr(importlib.import_module(mod), fn))


def test_core_deps_declared():
    deps = " ".join(_project()["project"]["dependencies"])
    assert "jax" in deps and "numpy" in deps
    # scipy is intentionally an extra: the native extension replaces it and
    # the package degrades gracefully without either.
    assert "scipy" not in deps
