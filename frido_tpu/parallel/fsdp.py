"""Fully-sharded data parallelism (ZeRO-3 equivalent) over the ``data`` axis.

The reference replicates all state on every GPU (Lightning DDP,
SURVEY.md §2.7) — fine at Frido's <1B params, but the TPU-native design
should scale past what one chip's HBM holds. Here the params, optimizer
moments and EMA shadow are sharded over the SAME mesh axis the batch is
sharded on: GSPMD all-gathers each layer's params just-in-time for its
forward/backward op and reduce-scatters the gradients, so peak HBM for
state drops by ~n_data while the batch math is unchanged. No hand-written
collectives — the sharding annotations are the whole implementation, and
XLA schedules the gathers to overlap with compute on ICI.

Composes with tensor parallelism (``parallel/tp.py``): a leaf already
sharded on ``model`` gets its largest *remaining* axis sharded on
``data``. Leaves smaller than ``min_size`` elements stay replicated —
gathering a bias over ICI costs more latency than the bytes are worth.

Numerics: identical to DP/TP up to float reduction order
(tests/test_fsdp.py pins the train step against the replicated one on the
8-device CPU mesh).
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frido_tpu.parallel import tp

# Leaves below this many elements stay replicated: at bf16/fp32 this is
# ~128-256 KB across 8 ways — under the latency floor of an ICI gather.
MIN_SHARD_SIZE = 2 ** 15


def _leaf_spec(path: str, shape, n_data: int, n_model: int,
               min_size: int = MIN_SHARD_SIZE) -> P:
    """TP spec for the leaf, extended with 'data' on the largest free axis."""
    base = tp._leaf_spec(path, shape, n_model)
    if n_data <= 1 or len(shape) < 2 or math.prod(shape) < min_size:
        return base
    entries = list(base) + [None] * (len(shape) - len(base))
    free = [i for i, e in enumerate(entries)
            if e is None and shape[i] % n_data == 0]
    if not free:
        return base
    ax = max(free, key=lambda i: shape[i])
    entries[ax] = "data"
    return P(*entries)


# Key-path stringification must match TP's (the specs key off the same
# rule), so reuse it rather than carrying a second copy.
_path_str = tp._path_str


def state_shardings(mesh: Mesh, tree: Any,
                    min_size: int = MIN_SHARD_SIZE) -> Any:
    """NamedSharding tree for a params / TrainState pytree under FSDP.

    Works on any pytree whose leaves are arrays: optimizer moments and the
    EMA shadow mirror their params' shapes, so the same shape rule shards
    them identically (the `endswith("embedding")` name rule also still
    fires — optax state keeps the param subtree paths).
    """
    n_data = mesh.shape.get("data", 1)
    n_model = mesh.shape.get("model", 1)

    def spec(path, leaf):
        return NamedSharding(mesh, _leaf_spec(
            _path_str(path), getattr(leaf, "shape", ()), n_data, n_model,
            min_size))

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_state(mesh: Mesh, tree: Any,
                min_size: int = MIN_SHARD_SIZE) -> Any:
    """device_put the pytree with FSDP shardings."""
    sh = state_shardings(mesh, tree, min_size)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)
