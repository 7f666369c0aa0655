"""Config tree + string-target factory.

Mirrors the reference's OmegaConf-based config system
(``/root/reference/main.py:19-24,653-655``): YAML files are merged
left-to-right, CLI dot-list overrides are applied on top, and objects are
built from ``{target: "module.Class", params: {...}}`` nodes.

Reference target strings (``frido.models...``, ``taming.models...``) are
remapped onto frido_tpu classes so the shipped configs run unmodified.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, List

import yaml

# Reference (torch) dotted paths -> frido_tpu dotted paths. Kept here, in one
# place, so `configs/**` written against the reference API resolve natively.
_TARGET_ALIASES: Dict[str, str] = {
    # diffusion models (frido/models/diffusion/frido.py:45,478)
    "frido.models.diffusion.frido.DDPM": "frido_tpu.models.frido.DDPM",
    "frido.models.diffusion.frido.FridoDiffusion": "frido_tpu.models.frido.FridoDiffusion",
    # denoiser (frido/modules/diffusionmodules/pyunet.py:447)
    "frido.modules.diffusionmodules.pyunet.PyUNetModel": "frido_tpu.nn.pyunet.PyUNetModel",
    # first stages (taming/models/msvqgan.py:16,320; frido/models/autoencoder.py)
    "taming.models.msvqgan.MSFPNVQModel": "frido_tpu.models.msvqgan.MSFPNVQModel",
    "taming.models.msvqgan.VQModelInterface": "frido_tpu.models.msvqgan.VQModelInterface",
    "frido.models.autoencoder.VQModel": "frido_tpu.models.autoencoder.VQModel",
    "frido.models.autoencoder.VQModelInterface": "frido_tpu.models.autoencoder.VQModelInterface",
    "frido.models.autoencoder.AutoencoderKL": "frido_tpu.models.autoencoder.AutoencoderKL",
    "frido.models.autoencoder.IdentityFirstStage": "frido_tpu.models.autoencoder.IdentityFirstStage",
    # conditioning encoders (frido/modules/encoders/modules.py)
    "frido.modules.encoders.modules.BERTEmbedder": "frido_tpu.nn.encoders.BERTEmbedder",
    "frido.modules.encoders.modules.ClassEmbedder": "frido_tpu.nn.encoders.ClassEmbedder",
    "frido.modules.encoders.modules.TransformerEmbedder": "frido_tpu.nn.encoders.TransformerEmbedder",
    "frido.modules.encoders.modules.SpatialRescaler": "frido_tpu.nn.encoders.SpatialRescaler",
    "frido.modules.encoders.modules.BERTEmbedderVQTInterface": "frido_tpu.nn.encoders.BERTEmbedderVQTInterface",
    "frido.modules.encoders.modules.FrozenCLIPEmbedder": "frido_tpu.nn.encoders.FrozenCLIPEmbedder",
    "frido.modules.encoders.modules.FrozenCLIPTextEmbedder": "frido_tpu.nn.encoders.FrozenCLIPTextEmbedder",
    "frido.modules.encoders.modules.FrozenClipImageEmbedder": "frido_tpu.nn.encoders.FrozenClipImageEmbedder",
    # losses (taming/modules/losses/*, frido/modules/losses/*)
    "taming.modules.losses.DummyLoss": "frido_tpu.losses.vqperceptual.DummyLoss",
    "taming.modules.losses.vqperceptual.DummyLoss": "frido_tpu.losses.vqperceptual.DummyLoss",
    "taming.modules.losses.vqperceptual.VQLPIPSWithDiscriminator": "frido_tpu.losses.vqperceptual.VQLPIPSWithDiscriminator",
    "frido.modules.losses.vqperceptual.VQLPIPSWithDiscriminator": "frido_tpu.losses.vqperceptual.VQLPIPSWithDiscriminator",
    # lr schedulers (frido/lr_scheduler.py)
    "frido.lr_scheduler.LambdaLinearScheduler": "frido_tpu.training.optim.LambdaLinearScheduler",
    "frido.lr_scheduler.LambdaWarmUpCosineScheduler": "frido_tpu.training.optim.LambdaWarmUpCosineScheduler",
    # data layer (taming/data/*)
    "taming.data.annotated_objects_coco.AnnotatedObjectsCoco": "frido_tpu.data.coco.AnnotatedObjectsCoco",
    "taming.data.annotated_objects_vg.AnnotatedObjectsVg": "frido_tpu.data.vg.AnnotatedObjectsVg",
    "taming.data.annotated_objects_vg_cocostyle.AnnotatedObjectsVg": "frido_tpu.data.vg_cocostyle.AnnotatedObjectsVgCocoStyle",
    "taming.data.annotated_objects_open_images.AnnotatedObjectsOpenImages": "frido_tpu.data.open_images.AnnotatedObjectsOpenImages",
    "main.DataModuleFromConfig": "frido_tpu.data.datamodule.DataModuleFromConfig",
    "scripts.sample_diffusion.DataModuleFromConfig": "frido_tpu.data.datamodule.DataModuleFromConfig",
}


def resolve_target(target: str) -> Any:
    """Resolve a dotted target string to a class/callable."""
    target = _TARGET_ALIASES.get(target, target)
    module, _, name = target.rpartition(".")
    if not module:
        raise ValueError(f"target '{target}' is not a dotted path")
    return getattr(importlib.import_module(module), name)


def instantiate_from_config(config: Dict[str, Any], **extra_kwargs) -> Any:
    """Build the object described by ``{target: ..., params: {...}}``.

    Mirrors ``/root/reference/main.py:209-212`` (plus the kwargs variant at
    ``frido/util.py:74-95``). The sentinels ``__is_first_stage__`` and
    ``__is_unconditional__`` are passed through untouched.
    """
    if isinstance(config, str):
        return config  # sentinel
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    cls = resolve_target(config["target"])
    params = dict(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return cls(**params)


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def merge_dicts(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Deep merge: values in ``override`` win; dicts merge recursively."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def _parse_value(text: str) -> Any:
    return yaml.safe_load(text)


def apply_dotlist(config: Dict[str, Any], dotlist: List[str]) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` CLI overrides (the OmegaConf dot-list idiom,
    ``/root/reference/main.py:653-655``)."""
    out = {k: v for k, v in config.items()}
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist entry '{item}' is not of form key=value")
        key, _, raw = item.partition("=")
        parts = key.strip().split(".")
        node = out
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
            else:
                nxt = dict(nxt)
            node[p] = nxt
            node = nxt
        node[parts[-1]] = _parse_value(raw)
    return out


def load_configs(paths: List[str], dotlist: List[str] | None = None) -> Dict[str, Any]:
    """Left-to-right merge of YAML files plus dot-list overrides."""
    cfg: Dict[str, Any] = {}
    for p in paths:
        cfg = merge_dicts(cfg, load_yaml(p))
    if dotlist:
        cfg = apply_dotlist(cfg, dotlist)
    return cfg
