"""Shared fixtures for the test suite.

Multi-chip sharding tests run on a virtual 8-device CPU mesh: we force the
CPU platform with 8 host devices BEFORE jax initializes (SURVEY.md section 4:
test sharded paths without a pod). Set KZG_TPU_TEST_REAL_DEVICE=1 to run on
whatever real accelerator is attached instead.
"""

from __future__ import annotations

import os
import pathlib

if not os.environ.get("KZG_TPU_TEST_REAL_DEVICE"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax
import pytest

# Limb-arithmetic graphs are compile-heavy; persist compiled executables so
# repeat test runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
VECTOR_DIR = REPO_ROOT / "tests" / "vectors"
TRUSTED_SETUP_TXT = REPO_ROOT / "data" / "trusted_setup.txt"
TRUSTED_SETUP_JSON = REPO_ROOT / "data" / "testing_trusted_setups.json"


def backend_name() -> str:
    return os.environ.get("KZG_TPU_BACKEND", "jax")


@pytest.fixture(scope="session")
def backend():
    from kzg_rust_tpu.backends import get_backend

    return get_backend(backend_name())


@pytest.fixture(scope="session")
def settings():
    """The mainnet trusted setup (reference: lib.rs:22,:32 loads the same file)."""
    from kzg_rust_tpu import Kzg

    return Kzg.load_trusted_setup_file(TRUSTED_SETUP_TXT)
