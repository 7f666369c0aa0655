"""Backend dispatch for Pallas kernels.

Kernels are compiled only on TPU; on CPU (tests, 8-device virtual mesh) the
jnp formulations run instead. ``FRIDO_PALLAS=interpret`` forces the kernels
through the Pallas interpreter so their numerics are testable on CPU;
``FRIDO_PALLAS=0`` disables them everywhere.
"""

from __future__ import annotations

import os

import jax


def _mode() -> str:
    return os.environ.get("FRIDO_PALLAS", "auto")


def use_pallas() -> bool:
    """True if Pallas kernels should be used (trace-time decision)."""
    mode = _mode()
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    # honor `with jax.default_device(cpu)` islands (e.g. host-side param
    # init in a TPU process): compiled pallas calls can't lower for CPU
    dd = jax.config.jax_default_device
    if dd is not None and dd.platform != "tpu":
        return False
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """True if kernels must run via the Pallas interpreter (CPU testing)."""
    return _mode() == "interpret" or jax.default_backend() != "tpu"
