"""Device mesh + sharding helpers.

The reference's entire parallelism story is data-parallel training via
Lightning DDP plus embarrassingly-parallel sharded inference
(SURVEY.md §2.7). The TPU-native mapping is a single ``jax.sharding.Mesh``
with a ``data`` axis (gradients allreduced over ICI by XLA's ``psum``
lowering) and a reserved ``model`` axis for future tensor sharding.

Batch tensors are sharded on their leading axis; params/opt-state are
replicated — the faithful mapping for the <1B-param Frido family.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for [B, ...] tensors."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device_put a pytree of [B, ...] arrays sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def fold_rng_per_device(rng, mesh: Mesh):
    """Per-device PRNG folding for sharded sampling: one key per data-shard
    (replaces the reference's rank-shifted seeds, ``main.py:835-842``)."""
    n = mesh.shape["data"]
    return jax.vmap(lambda i: jax.random.fold_in(rng, i))(np.arange(n))
