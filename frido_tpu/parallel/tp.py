"""Rule-based tensor parallelism over the mesh's ``model`` axis.

The reference has no tensor sharding of any kind (SURVEY.md §2.7 — largest
config is ~700M params, replicated everywhere). The TPU design keeps the
mesh 2-axis and goes one step further: a shape-rule param-sharding tree
that GSPMD partitions the forward/backward with, so the same train step
runs DP-only (model=1) or DP x TP with no model-code changes.

Rules (applied to every param leaf, most-specific first):
  * conv kernels  [kh, kw, cin, cout]  -> shard cout over 'model'
  * dense kernels [cin, cout]          -> shard cout over 'model'
  * conv-transpose kernels             -> shard cout over 'model'
  * embeddings    [vocab, dim]         -> shard vocab over 'model'
    (gather of a sharded table all-gathers a tiny row set over ICI)
  * 1-D leaves (bias/scale)            -> replicated
A leaf is only sharded when the target axis divides evenly by the model
axis size; everything else stays replicated. XLA inserts the matching
collectives (allreduce of partial sums after cout-sharded convs feeding
replicated consumers, etc.) — no NCCL-style hand-written comms.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(path: str, shape, n_model: int) -> P:
    if n_model <= 1 or len(shape) < 2:
        return P()
    last = shape[-1]
    if path.endswith("embedding"):
        # [vocab, dim]: vocab rows over model axis
        return P("model", None) if shape[0] % n_model == 0 else P()
    if last % n_model != 0:
        return P()
    # kernel / kernel_t / dense: output features are the last axis
    return P(*([None] * (len(shape) - 1) + ["model"]))


def _path_str(path) -> str:
    return "/".join(
        getattr(p, "key", getattr(p, "name", str(p))) for p in path)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for a params pytree under the given mesh."""
    n_model = mesh.shape.get("model", 1)

    def spec(path, leaf):
        return NamedSharding(
            mesh, _leaf_spec(_path_str(path), leaf.shape, n_model))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """device_put the params pytree with the rule-based shardings."""
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
