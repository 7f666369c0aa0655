"""Hand-ported torch forward of the FID InceptionV3 graph (test golden).

This is the pytorch-fid / torch-fidelity feature extractor
(``/root/reference/README.md:334-344`` runs it via the torch-fidelity CLI)
re-expressed with ``torch.nn.functional`` directly from a state_dict, so the
JAX implementation in ``frido_tpu/eval/inception.py`` can be golden-tested
with random weights in an environment that has neither torchvision nor
pytorch-fid installed. Test-only code — the framework never imports it.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F

BN_EPS = 1e-3


def _bc(sd, name, x, stride=1, pad=(0, 0)):
    w = sd[f"{name}.conv.weight"]
    x = F.conv2d(x, w, stride=stride, padding=pad)
    x = F.batch_norm(
        x, sd[f"{name}.bn.running_mean"], sd[f"{name}.bn.running_var"],
        sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"], False, 0.0, BN_EPS)
    return F.relu(x)


def _avg_nopad(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def _inception_a(sd, b, x):
    b1 = _bc(sd, f"{b}.branch1x1", x)
    b5 = _bc(sd, f"{b}.branch5x5_2", _bc(sd, f"{b}.branch5x5_1", x),
             pad=(2, 2))
    bd = _bc(sd, f"{b}.branch3x3dbl_1", x)
    bd = _bc(sd, f"{b}.branch3x3dbl_2", bd, pad=(1, 1))
    bd = _bc(sd, f"{b}.branch3x3dbl_3", bd, pad=(1, 1))
    bp = _bc(sd, f"{b}.branch_pool", _avg_nopad(x))
    return torch.cat([b1, b5, bd, bp], 1)


def _inception_b(sd, x):
    b3 = _bc(sd, "Mixed_6a.branch3x3", x, stride=2)
    bd = _bc(sd, "Mixed_6a.branch3x3dbl_1", x)
    bd = _bc(sd, "Mixed_6a.branch3x3dbl_2", bd, pad=(1, 1))
    bd = _bc(sd, "Mixed_6a.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _inception_c(sd, b, x):
    b1 = _bc(sd, f"{b}.branch1x1", x)
    b7 = _bc(sd, f"{b}.branch7x7_1", x)
    b7 = _bc(sd, f"{b}.branch7x7_2", b7, pad=(0, 3))
    b7 = _bc(sd, f"{b}.branch7x7_3", b7, pad=(3, 0))
    bd = _bc(sd, f"{b}.branch7x7dbl_1", x)
    for i, pad in ((2, (3, 0)), (3, (0, 3)), (4, (3, 0)), (5, (0, 3))):
        bd = _bc(sd, f"{b}.branch7x7dbl_{i}", bd, pad=pad)
    bp = _bc(sd, f"{b}.branch_pool", _avg_nopad(x))
    return torch.cat([b1, b7, bd, bp], 1)


def _inception_d(sd, x):
    b3 = _bc(sd, "Mixed_7a.branch3x3_2",
             _bc(sd, "Mixed_7a.branch3x3_1", x), stride=2)
    b7 = _bc(sd, "Mixed_7a.branch7x7x3_1", x)
    b7 = _bc(sd, "Mixed_7a.branch7x7x3_2", b7, pad=(0, 3))
    b7 = _bc(sd, "Mixed_7a.branch7x7x3_3", b7, pad=(3, 0))
    b7 = _bc(sd, "Mixed_7a.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _inception_e(sd, b, x, pool):
    b1 = _bc(sd, f"{b}.branch1x1", x)
    h = _bc(sd, f"{b}.branch3x3_1", x)
    b3 = torch.cat([_bc(sd, f"{b}.branch3x3_2a", h, pad=(0, 1)),
                    _bc(sd, f"{b}.branch3x3_2b", h, pad=(1, 0))], 1)
    h = _bc(sd, f"{b}.branch3x3dbl_2",
            _bc(sd, f"{b}.branch3x3dbl_1", x), pad=(1, 1))
    bd = torch.cat([_bc(sd, f"{b}.branch3x3dbl_3a", h, pad=(0, 1)),
                    _bc(sd, f"{b}.branch3x3dbl_3b", h, pad=(1, 0))], 1)
    pooled = _avg_nopad(x) if pool == "avg" \
        else F.max_pool2d(x, 3, stride=1, padding=1)
    bp = _bc(sd, f"{b}.branch_pool", pooled)
    return torch.cat([b1, b3, bd, bp], 1)


@torch.no_grad()
def features(sd, x):
    """pool3 features [N, 2048] of NCHW x in [-1, 1]."""
    h = _bc(sd, "Conv2d_1a_3x3", x, stride=2)
    h = _bc(sd, "Conv2d_2a_3x3", h)
    h = _bc(sd, "Conv2d_2b_3x3", h, pad=(1, 1))
    h = F.max_pool2d(h, 3, 2)
    h = _bc(sd, "Conv2d_3b_1x1", h)
    h = _bc(sd, "Conv2d_4a_3x3", h)
    h = F.max_pool2d(h, 3, 2)
    for b in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        h = _inception_a(sd, b, h)
    h = _inception_b(sd, h)
    for b in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        h = _inception_c(sd, b, h)
    h = _inception_d(sd, h)
    h = _inception_e(sd, "Mixed_7b", h, pool="avg")
    h = _inception_e(sd, "Mixed_7c", h, pool="max")
    return torch.mean(h, dim=(2, 3))


@torch.no_grad()
def logits(sd, x):
    return F.linear(features(sd, x), sd["fc.weight"], sd["fc.bias"])
