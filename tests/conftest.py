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


@pytest.fixture(scope="session")
def reference_path():
    if not REFERENCE.exists():
        pytest.skip("no reference checkout")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    return REFERENCE
