"""One-way PyTorch -> JAX checkpoint importer.

Maps a reference Lightning ``state_dict`` (key tree described in SURVEY.md
§3.5: ``model.diffusion_model.*``, ``first_stage_model.*``,
``cond_stage_model.*``, ``model_ema.*``, schedule buffers, ``scale_factor``)
onto frido_tpu flax param pytrees.

The mapping is driven by the *destination* tree: for every flax param leaf we
derive the expected torch key from the flax path (module naming convention:
``xs__{i}`` == torch ``xs.{i}``) and apply the layout conversion dictated by
the leaf name:

==============  =======================  =========================
flax leaf       torch tensor             conversion
==============  =======================  =========================
kernel (4-d)    Conv2d [O, I, kH, kW]    transpose -> [kH, kW, I, O]
kernel (3-d)    Conv1d [O, I, k]         transpose -> [k, I, O]
kernel (2-d)    Linear [O, I]            transpose -> [I, O]
kernel_t (4-d)  ConvT  [I, O, kH, kW]    flip HW, -> [kH, kW, I, O]
scale           norm weight              as-is
bias            bias                     as-is
embedding       Embedding [N, D]         as-is
==============  =======================  =========================
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

LEAF_TO_TORCH = {
    "kernel": "weight",
    "kernel_t": "weight",
    "scale": "weight",
    "bias": "bias",
    "embedding": "weight",
    "logit_scale": "logit_scale",
    # ActNorm's torch param is literally named 'scale', which would collide
    # with the norm-weight convention above; its flax leaf is 'scale_v'
    "scale_v": "scale",
}


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """('down__0__block__1', 'norm1', 'scale') -> 'down.0.block.1.norm1.weight'."""
    parts = []
    for comp in path[:-1]:
        parts.extend(comp.split("__"))
    # the leaf itself may carry nesting too (a direct self.param like
    # 'embeddings__class_embedding'); only its final segment is a leaf name
    segs = path[-1].split("__")
    parts.extend(segs[:-1])
    parts.append(LEAF_TO_TORCH.get(segs[-1], segs[-1]))
    return ".".join(parts)


def convert_leaf(value: np.ndarray, leaf_name: str) -> np.ndarray:
    v = np.asarray(value)
    if leaf_name == "kernel":
        if v.ndim == 4:
            return v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if v.ndim == 3:
            return v.transpose(2, 1, 0)  # OIk -> kIO
        if v.ndim == 2:
            return v.transpose(1, 0)  # [O, I] -> [I, O]
        return v
    if leaf_name == "kernel_t":
        assert v.ndim == 4, "conv-transpose weight must be 4-d"
        return np.flip(v, axis=(2, 3)).transpose(2, 3, 0, 1)  # IOHW -> HWIO(flipped)
    if leaf_name in ("loc", "scale_v"):
        return v.reshape(-1)  # ActNorm [1, C, 1, 1] -> [C]
    return v


def _iter_leaves(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _iter_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def import_state_dict(
    params: Dict[str, Any],
    state_dict: Mapping[str, Any],
    prefix: str = "",
    strict: bool = True,
    report: Dict[str, Any] = None,
) -> Dict[str, Any]:
    """Fill a flax params tree from a torch state_dict.

    Args:
      params: the flax ``{'params': ...}`` inner tree (or any nested dict of
        arrays) produced by ``module.init``.
      state_dict: torch name -> tensor/ndarray mapping.
      prefix: torch key prefix, e.g. ``'model.diffusion_model.'``.
      strict: raise on missing keys (shape mismatches always raise).
      report: optional dict; filled with ``used`` (set of torch keys
        consumed) and ``missing`` (list of torch keys expected by flax
        leaves but absent) for key-coverage audits.

    Returns:
      A new tree of numpy arrays with the same structure as ``params``.
    """
    missing = []
    used = set()
    out: Dict[str, Any] = {}

    def build(tree: Mapping[str, Any], path: Tuple[str, ...]) -> Any:
        node = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, Mapping):
                node[k] = build(v, p)
            else:
                torch_key = prefix + flax_path_to_torch_key(p)
                if torch_key not in state_dict:
                    missing.append(torch_key)
                    node[k] = np.asarray(v)
                    continue
                used.add(torch_key)
                leaf = convert_leaf(_to_numpy(state_dict[torch_key]), k)
                expect = tuple(np.shape(v))
                if tuple(leaf.shape) != expect:
                    raise ValueError(
                        f"shape mismatch for {torch_key}: torch {leaf.shape} "
                        f"vs flax {expect} at {'/'.join(p)}"
                    )
                node[k] = leaf.astype(np.asarray(v).dtype)
        return node

    out = build(params, ())
    if report is not None:
        report["used"] = used
        report["missing"] = list(missing)
    if missing and strict:
        raise KeyError(f"{len(missing)} keys missing from state_dict: {missing[:10]}...")
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/Lightning .ckpt into a flat name->ndarray dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in sd.items()}


def subdict(state_dict: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Strip ``prefix`` and keep only matching keys."""
    n = len(prefix)
    return {k[n:]: v for k, v in state_dict.items() if k.startswith(prefix)}
