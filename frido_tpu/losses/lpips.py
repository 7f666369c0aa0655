"""LPIPS perceptual distance (frozen VGG16 features + learned 1x1 weights).

Re-design of ``/root/reference/taming/modules/losses/lpips.py``. The
pretrained weights (torchvision VGG16 + the LPIPS "vgg.pth" lin layers)
cannot be downloaded in this zero-egress environment; point
``FRIDO_TPU_VGG16`` / ``FRIDO_TPU_LPIPS`` at local torch checkpoints to
enable. Until then ``lpips_available()`` is False and the VQGAN loss falls
back to perceptual_weight=0 with a warning.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from frido_tpu.nn.layers import Conv2d

# torchvision VGG16 "features" conv plan; M = maxpool. Feature taps after the
# ReLU at indices 3, 8, 15, 22, 29 (relu1_2, 2_2, 3_3, 4_3, 5_3).
_VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
_TAPS = {3, 8, 15, 22, 29}

LPIPS_CHNS = [64, 128, 256, 512, 512]


class VGG16Features(nn.Module):
    """VGG16 feature trunk emitting the five LPIPS tap activations."""

    def setup(self):
        convs = []
        idx = 0
        for item in _VGG_PLAN:
            if item == "M":
                idx += 1
                continue
            convs.append((idx, Conv2d(item, 3, padding=1,
                                      name=f"features__{idx}")))
            idx += 2  # conv + relu
        self.convs = convs

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        import jax

        taps = []
        ci = 0
        idx = 0
        for item in _VGG_PLAN:
            if item == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                idx += 1
                continue
            x = jax.nn.relu(self.convs[ci][1](x))
            ci += 1
            idx += 1  # conv
            if idx in _TAPS:
                taps.append(x)
            idx += 1  # relu
        return taps


class LPIPS(nn.Module):
    """scaling -> VGG taps -> unit-normalize -> squared diff -> 1x1 lin ->
    spatial mean -> sum (``lpips.py:41-54``)."""

    def setup(self):
        self.net = VGG16Features(name="net")
        self.lins = [Conv2d(1, 1, use_bias=False, name=f"lin{k}__model__1")
                     for k in range(5)]
        self.shift = jnp.asarray([-0.030, -0.088, -0.188])
        self.scale = jnp.asarray([0.458, 0.448, 0.450])

    def _scaled(self, x):
        return (x - self.shift) / self.scale

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        f0 = self.net(self._scaled(x))
        f1 = self.net(self._scaled(y))
        total = 0.0
        for k in range(5):
            a = f0[k] / (jnp.linalg.norm(f0[k], axis=-1, keepdims=True) + 1e-10)
            b = f1[k] / (jnp.linalg.norm(f1[k], axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            total = total + self.lins[k](d).mean(axis=(1, 2), keepdims=True)
        return total  # [N, 1, 1, 1]


def lpips_available() -> bool:
    return bool(os.environ.get("FRIDO_TPU_VGG16")) and bool(
        os.environ.get("FRIDO_TPU_LPIPS"))


def load_lpips_params(params_tree) -> dict:
    """Import torchvision vgg16 + LPIPS lin weights into the flax tree.

    ``FRIDO_TPU_VGG16``: torch vgg16 state_dict (.pth);
    ``FRIDO_TPU_LPIPS``: the taming 'vgg.pth' lin/scaling checkpoint.
    """
    import torch

    from frido_tpu.io.torch_import import import_state_dict

    vgg_sd = torch.load(os.environ["FRIDO_TPU_VGG16"], map_location="cpu")
    lp_sd = torch.load(os.environ["FRIDO_TPU_LPIPS"], map_location="cpu")
    merged = {}
    for k, v in vgg_sd.items():
        if k.startswith("features."):
            merged["net." + k] = v
    for k, v in lp_sd.items():
        merged[k] = v  # lin{k}.model.1.weight
    return import_state_dict(params_tree, merged, strict=False)
