"""Import helpers for golden-parity tests against the torch reference.

The reference's model files import pytorch_lightning / torchvision which are
not installed; the network modules themselves are pure torch, so we stub the
missing packages and import the real reference code read-only. Used only by
tests — the framework itself never touches the reference.
"""

from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"


def install_reference(monkeypatch=None):
    import torch

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            @property
            def device(self):
                return torch.device("cpu")

        pl.LightningModule = LightningModule
        pl.Callback = object
        sys.modules["pytorch_lightning"] = pl
        util = types.ModuleType("pytorch_lightning.utilities")
        dist = types.ModuleType("pytorch_lightning.utilities.distributed")
        dist.rank_zero_only = lambda fn: fn
        util.distributed = dist
        sys.modules["pytorch_lightning.utilities"] = util
        sys.modules["pytorch_lightning.utilities.distributed"] = dist
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")

        def _missing(name):
            raise RuntimeError(f"torchvision stub has no attr {name}")

        tvm.__getattr__ = _missing
        tv.models = tvm
        tvu = types.ModuleType("torchvision.utils")

        def make_grid(t, nrow=8, **kw):
            return t

        tvu.make_grid = make_grid
        tv.utils = tvu
        tv.__path__ = []  # mark as package so submodule imports resolve
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.utils"] = tvu
    if "kornia" not in sys.modules:
        sys.modules["kornia"] = types.ModuleType("kornia")
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        oc.ListConfig = ListConfig
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def state_dict_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


SMALL_EDCONFIG = dict(
    multiscale=2, double_z=False, z_channels=[4, 4], resolution=64,
    in_channels=3, out_ch=3, ch=32, ch_mult=[1, 1, 2], num_res_blocks=1,
    attn_resolutions=[16], dropout=0.0,
)
SMALL_DDCONFIG = dict(
    double_z=False, z_channels=8, resolution=64, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 1, 2], num_res_blocks=1, attn_resolutions=[16],
    dropout=0.0,
)
