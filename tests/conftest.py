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
    # Force-override: the ambient environment may register a real-accelerator
    # PJRT plugin (e.g. a tunneled TPU) that ignores the JAX_PLATFORMS env
    # var, so pin the platform through jax.config below as well.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax
import pytest

if not os.environ.get("KZG_TPU_TEST_REAL_DEVICE"):
    jax.config.update("jax_platforms", "cpu")

# Automatic multi-device sharding would trigger a fresh shard_map compile
# for EVERY batch shape in the suite (minutes each on XLA-CPU).  The mesh
# path gets dedicated coverage instead: test_parallel_sharded.py (kernels)
# and its API-level test (which re-enables this knob explicitly).
os.environ.setdefault("KZG_TPU_SHARD", "0")

# Limb-arithmetic graphs are compile-heavy; persist compiled executables so
# repeat test runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_kzg"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
VECTOR_DIR = REPO_ROOT / "tests" / "vectors"
TRUSTED_SETUP_TXT = REPO_ROOT / "data" / "trusted_setup.txt"
TRUSTED_SETUP_JSON = REPO_ROOT / "data" / "testing_trusted_setups.json"


def backend_name() -> str:
    """Backend for the conformance suite.

    Default: the jax device path when a real accelerator is attached
    (KZG_TPU_TEST_REAL_DEVICE=1), else the golden oracle.  XLA-on-CPU cannot
    run the mainnet-width device kernels in tolerable time, so the CPU-side
    coverage of the device path is the small-width unit tests
    (test_ops_*.py) plus the sharded-mesh tests; the device path's 208-vector
    conformance run happens on TPU (and in bench.py).  Override with
    KZG_TPU_BACKEND=jax|golden.
    """
    env = os.environ.get("KZG_TPU_BACKEND")
    if env:
        return env
    if os.environ.get("KZG_TPU_TEST_REAL_DEVICE"):
        # On real hardware the conformance suite must exercise the DEVICE
        # branch of the jax backend, not silently fall through to the native
        # host runtime (round-1 VERDICT finding): default the placement
        # knobs to the device unless explicitly overridden.
        os.environ.setdefault("KZG_TPU_EVAL", "device")
        os.environ.setdefault("KZG_TPU_PROVER", "device")
        return "jax"
    return "golden"


@pytest.fixture(scope="session")
def backend():
    from kzg_rust_tpu.backends import get_backend

    return get_backend(backend_name())


@pytest.fixture(scope="session")
def settings():
    """The mainnet trusted setup (reference: lib.rs:22,:32 loads the same file)."""
    from kzg_rust_tpu import Kzg

    return Kzg.load_trusted_setup_file(TRUSTED_SETUP_TXT)
