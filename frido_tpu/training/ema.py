"""Exponential moving average of a param pytree.

Functional re-design of ``LitEma`` (``/root/reference/frido/modules/ema.py``):
the shadow params are a pytree of the same structure; the decay ramps as
``min(decay, (1 + n) / (10 + n))``. ``store``/``copy_to``/``restore``
become pure value swaps — the caller keeps both trees.

Checkpoint note: the reference flattens shadow buffer names by dropping dots
(``ema.py:16-20``); ``import_ema`` maps those keys back onto the pytree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_ema(params: Any) -> Tuple[Any, jnp.ndarray]:
    """Returns (shadow_params, num_updates).

    The shadow leaves are COPIES: ``jnp.asarray`` on a jax array is a
    no-op, and aliased shadow/param buffers break buffer donation of the
    train state ("attempt to donate the same buffer twice")."""
    return (jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params),
            jnp.zeros((), jnp.int32))


def update_ema(shadow: Any, params: Any, num_updates: jnp.ndarray,
               decay: float = 0.9999) -> Tuple[Any, jnp.ndarray]:
    n = num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    new = jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p), shadow, params)
    return new, n


def import_ema(params_tree: Dict[str, Any], state_dict, prefix: str = "model_ema.",
               torch_prefix: str = "model.",
               report: Dict[str, Any] = None) -> Dict[str, Any]:
    """Fill an EMA shadow tree (same structure as ``params_tree['model']``
    subtree) from the reference's flattened ``model_ema.*`` buffers.

    The flattened name of torch param ``model.diffusion_model.a.0.b.weight``
    is ``diffusion_model`` + name with dots removed; we regenerate each
    expected flat key from the destination tree path.

    ``report`` (optional dict) is filled with ``used``/``missing`` torch
    keys for coverage audits, like ``import_state_dict``.
    """
    from frido_tpu.io.torch_import import convert_leaf, flax_path_to_torch_key

    used, missing = set(), []

    def build(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = build(v, p)
            else:
                torch_key = torch_prefix + flax_path_to_torch_key(p)
                # LitEma flattens the param name (relative to the wrapper,
                # i.e. without the leading 'model.') by deleting dots
                flat = prefix + torch_key.replace(".", "")[len("model"):]
                if flat in state_dict:
                    used.add(flat)
                    leaf = convert_leaf(np.asarray(state_dict[flat]), k)
                    out[k] = leaf.astype(np.asarray(v).dtype)
                else:
                    missing.append(flat)
                    out[k] = np.asarray(v)
        return out

    tree = build(params_tree, ())
    if report is not None:
        report["used"] = used
        report["missing"] = missing
    return tree
