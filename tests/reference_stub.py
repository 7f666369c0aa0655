"""Import helpers for golden-parity tests against the torch reference.

The reference's model files import pytorch_lightning / torchvision which are
not installed; the network modules themselves are pure torch, so we stub the
missing packages and import the real reference code read-only. Used only by
tests — the framework itself never touches the reference.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE = "/root/reference"

#: names install_reference() put into sys.modules (for scoped teardown)
INSTALLED_STUBS: list = []


def _stub_module(name: str) -> types.ModuleType:
    """A stub with a real ModuleSpec so ``importlib.util.find_spec`` on it
    (e.g. transformers' availability probes) doesn't raise
    ``ValueError: __spec__ is None`` after the stub is installed."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    INSTALLED_STUBS.append(name)
    return mod


def uninstall_stubs():
    """Remove every stub this module installed. Reference modules already
    imported keep their bound references; a later install_reference() call
    re-creates the stubs for new imports."""
    for name in INSTALLED_STUBS:
        sys.modules.pop(name, None)
    INSTALLED_STUBS.clear()


def install_reference(monkeypatch=None):
    import torch

    if "pytorch_lightning" not in sys.modules:
        pl = _stub_module("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            @property
            def device(self):
                return torch.device("cpu")

        pl.LightningModule = LightningModule
        pl.Callback = object
        util = _stub_module("pytorch_lightning.utilities")
        dist = _stub_module("pytorch_lightning.utilities.distributed")
        dist.rank_zero_only = lambda fn: fn
        util.distributed = dist
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tvm = _stub_module("torchvision.models")

        def _missing(name):
            # AttributeError, not RuntimeError: module __getattr__ must obey
            # the attribute protocol or hasattr() probes by unrelated code
            # (e.g. inspect.getmodule scanning sys.modules) blow up.
            raise AttributeError(f"torchvision stub has no attr {name}")

        tvm.__getattr__ = _missing
        tv.models = tvm
        tvu = _stub_module("torchvision.utils")

        def make_grid(t, nrow=8, **kw):
            return t

        tvu.make_grid = make_grid
        tv.utils = tvu
        tv.__path__ = []  # mark as package so submodule imports resolve
    if "kornia" not in sys.modules:
        _stub_module("kornia")
    if "omegaconf" not in sys.modules:
        oc = _stub_module("omegaconf")
        lc = _stub_module("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        oc.ListConfig = ListConfig
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
