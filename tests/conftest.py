"""Test configuration: force an 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: golden numeric tests need f32 conv semantics, and the virtual
# 8-device mesh only exists on the host platform. The axon sitecustomize
# imports jax at interpreter startup (locking in JAX_PLATFORMS=axon), so the
# env var alone is not enough — update the already-imported config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles of the
# UNet/VQGAN test graphs; caching makes re-runs minutes instead of tens of
# minutes.
_CACHE_DIR = os.environ.get("JAX_TEST_CACHE", "/root/.cache/jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO))


def has_reference() -> bool:
    return REFERENCE.exists()


requires_reference = pytest.mark.skipif(
    not REFERENCE.exists(),
    reason="reference repo not mounted (golden parity tests need /root/reference)",
)


@pytest.fixture(autouse=True)
def _scoped_reference_stubs():
    """Tear down reference_stub's sys.modules stubs after every test so a
    stub never leaks into an unrelated test's imports (each parity test calls
    install_reference() itself, which recreates the stubs on demand)."""
    yield
    from tests.reference_stub import uninstall_stubs

    uninstall_stubs()


@pytest.fixture(scope="session")
def reference_path():
    if not REFERENCE.exists():
        pytest.skip("no reference checkout")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    return REFERENCE


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "fast: <10-min tier (tools/pytest_cpu.sh -m fast) — schedules, "
        "data, quantizers, tokenizers, tiling, toy-scale samplers; the "
        "full suite (golden parity, CLI, flagship) has no marker")
