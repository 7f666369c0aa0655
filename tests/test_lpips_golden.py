"""Value-level golden test for the LPIPS module.

The real VGG16/LPIPS weights can't be fetched here (zero egress), so the
implementation is pinned with *random* weights against a hand-ported torch
forward of the reference graph (``/root/reference/taming/modules/losses/
lpips.py:11-54`` + torchvision VGG16 features): same state_dict in both,
distances must match. This catches tap-index, normalization-eps, and
importer-key drift now, before real weights ever arrive.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from frido_tpu.losses.lpips import LPIPS, LPIPS_CHNS, load_lpips_params  # noqa: E402

# torchvision vgg16.features layout: conv indices, pool indices, relu taps
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_POOL_IDX = {4, 9, 16, 23, 30}
_TAP_IDX = {3, 8, 15, 22, 29}
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _random_vgg_sd(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    cin = 3
    plan = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for idx, cout in zip(_CONV_IDX, plan):
        sd[f"features.{idx}.weight"] = (
            rng.randn(cout, cin, 3, 3) / np.sqrt(cin * 9)).astype(np.float32)
        sd[f"features.{idx}.bias"] = (
            0.1 * rng.randn(cout)).astype(np.float32)
        cin = cout
    return sd


def _random_lin_sd(seed=1):
    rng = np.random.RandomState(seed)
    return {f"lin{k}.model.1.weight":
            np.abs(rng.randn(1, c, 1, 1)).astype(np.float32)
            for k, c in enumerate(LPIPS_CHNS)}


def _torch_vgg_taps(sd, h):
    taps = []
    for i in range(31):
        if i in _POOL_IDX:
            h = F.max_pool2d(h, 2)
        elif i in _CONV_IDX:
            h = F.conv2d(h, torch.from_numpy(sd[f"features.{i}.weight"]),
                         torch.from_numpy(sd[f"features.{i}.bias"]),
                         padding=1)
        else:
            h = F.relu(h)
            if i in _TAP_IDX:
                taps.append(h)
    return taps


@torch.no_grad()
def _torch_lpips(vgg_sd, lin_sd, x, y):
    f0 = _torch_vgg_taps(vgg_sd, (x - _SHIFT) / _SCALE)
    f1 = _torch_vgg_taps(vgg_sd, (y - _SHIFT) / _SCALE)
    total = 0.0
    for k in range(5):
        a = f0[k] / (f0[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        b = f1[k] / (f1[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        w = torch.from_numpy(lin_sd[f"lin{k}.model.1.weight"])
        total = total + F.conv2d((a - b) ** 2, w).mean((2, 3), keepdim=True)
    return total


def test_lpips_value_parity(tmp_path, monkeypatch):
    vgg_sd = _random_vgg_sd()
    lin_sd = _random_lin_sd()
    torch.save({k: torch.from_numpy(v) for k, v in vgg_sd.items()},
               tmp_path / "vgg16.pth")
    torch.save({k: torch.from_numpy(v) for k, v in lin_sd.items()},
               tmp_path / "lpips.pth")
    monkeypatch.setenv("FRIDO_TPU_VGG16", str(tmp_path / "vgg16.pth"))
    monkeypatch.setenv("FRIDO_TPU_LPIPS", str(tmp_path / "lpips.pth"))

    module = LPIPS()
    rng = np.random.RandomState(7)
    x = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
    y = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(y))
    params = {"params": load_lpips_params(params["params"])}

    got = np.asarray(module.apply(params, jnp.asarray(x), jnp.asarray(y)))
    want = _torch_lpips(
        vgg_sd, lin_sd,
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    assert got.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(got.ravel(), want.ravel(), atol=1e-4,
                               rtol=1e-4)


def test_lpips_zero_for_identical_inputs():
    module = LPIPS()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                    jnp.float32)
    params = module.init(jax.random.PRNGKey(1), x, x)
    out = np.asarray(module.apply(params, x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
