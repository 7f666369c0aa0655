"""FID-standard InceptionV3 feature extractor, JAX-native.

The reference's acceptance metric is torch-fidelity FID
(``/root/reference/README.md:334-344``), whose feature extractor is NOT the
stock torchvision inception_v3 but the pytorch-fid / TF-"2015-12-05" variant:

  * ``Mixed_5b/5c/5d`` and ``Mixed_6b..6e`` and ``Mixed_7b`` use 3x3 average
    pools with ``count_include_pad=False`` (the TF default) where torchvision
    uses ``True``;
  * ``Mixed_7c``'s pool branch is a **max** pool (a quirk of the original TF
    port that every published FID number bakes in);
  * the classifier head has **1008** classes (TF-slim label space).

Published Frido FIDs (BASELINE.md) are only reproducible against this exact
graph, so it is implemented here as a pure-functional JAX forward over a
params pytree: eval-only, BN folded into per-channel affine at import time,
jit/pjit-friendly (static shapes, NHWC, MXU-tiled convs). Weights come from a
locally provided pytorch-fid state_dict (zero egress); the graph itself is
golden-tested against a hand-ported torch forward with random weights in
``tests/test_inception_fid.py``.
"""

from __future__ import annotations

import functools
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
NUM_CLASSES_FID = 1008  # TF-slim label space of the 2015-12-05 weights

# name -> (c_in, c_out, (kh, kw), stride, (ph, pw))
_A_BRANCHES = (
    ("branch1x1", 64, (1, 1), 1, (0, 0)),
    ("branch5x5_1", 48, (1, 1), 1, (0, 0)),
    ("branch5x5_2", 64, (5, 5), 1, (2, 2)),
    ("branch3x3dbl_1", 64, (1, 1), 1, (0, 0)),
    ("branch3x3dbl_2", 96, (3, 3), 1, (1, 1)),
    ("branch3x3dbl_3", 96, (3, 3), 1, (1, 1)),
)
_C_BRANCHES = (
    ("branch1x1", 192, (1, 1), 1, (0, 0)),
    ("branch7x7_1", None, (1, 1), 1, (0, 0)),
    ("branch7x7_2", None, (1, 7), 1, (0, 3)),
    ("branch7x7_3", 192, (7, 1), 1, (3, 0)),
    ("branch7x7dbl_1", None, (1, 1), 1, (0, 0)),
    ("branch7x7dbl_2", None, (7, 1), 1, (3, 0)),
    ("branch7x7dbl_3", None, (1, 7), 1, (0, 3)),
    ("branch7x7dbl_4", None, (7, 1), 1, (3, 0)),
    ("branch7x7dbl_5", 192, (1, 7), 1, (0, 3)),
)
_E_BRANCHES = (
    ("branch1x1", 320, (1, 1), 1, (0, 0)),
    ("branch3x3_1", 384, (1, 1), 1, (0, 0)),
    ("branch3x3_2a", 384, (1, 3), 1, (0, 1)),
    ("branch3x3_2b", 384, (3, 1), 1, (1, 0)),
    ("branch3x3dbl_1", 448, (1, 1), 1, (0, 0)),
    ("branch3x3dbl_2", 384, (3, 3), 1, (1, 1)),
    ("branch3x3dbl_3a", 384, (1, 3), 1, (0, 1)),
    ("branch3x3dbl_3b", 384, (3, 1), 1, (1, 0)),
)


def conv_specs() -> Dict[str, Tuple[int, int, Tuple[int, int], int,
                                    Tuple[int, int]]]:
    """Every BasicConv2d in the graph: name -> (cin, cout, k, stride, pad).

    Drives random init (tests), the torch importer's shape checks, and the
    in-test torch golden — a single source of truth for the topology.
    """
    s: Dict[str, Tuple] = {
        "Conv2d_1a_3x3": (3, 32, (3, 3), 2, (0, 0)),
        "Conv2d_2a_3x3": (32, 32, (3, 3), 1, (0, 0)),
        "Conv2d_2b_3x3": (32, 64, (3, 3), 1, (1, 1)),
        "Conv2d_3b_1x1": (64, 80, (1, 1), 1, (0, 0)),
        "Conv2d_4a_3x3": (80, 192, (3, 3), 1, (0, 0)),
    }

    def add(block, cin, branches, pool_out):
        chain_in = cin
        for name, cout, k, stride, pad in branches:
            # branch roots (…1x1 / …_1) read the block input; later links
            # read the previous conv in their chain
            src = cin if (name.endswith("1x1") or name.endswith("_1")) \
                else chain_in
            s[f"{block}.{name}"] = (src, cout, k, stride, pad)
            chain_in = cout
        if pool_out:
            s[f"{block}.branch_pool"] = (cin, pool_out, (1, 1), 1, (0, 0))

    # InceptionA: Mixed_5b/5c/5d (pool_features 32/64/64)
    for block, cin, pf in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                           ("Mixed_5d", 288, 64)):
        add(block, cin, _A_BRANCHES, pf)
    # InceptionB: Mixed_6a
    s["Mixed_6a.branch3x3"] = (288, 384, (3, 3), 2, (0, 0))
    s["Mixed_6a.branch3x3dbl_1"] = (288, 64, (1, 1), 1, (0, 0))
    s["Mixed_6a.branch3x3dbl_2"] = (64, 96, (3, 3), 1, (1, 1))
    s["Mixed_6a.branch3x3dbl_3"] = (96, 96, (3, 3), 2, (0, 0))
    # InceptionC: Mixed_6b..6e (channels_7x7 128/160/160/192)
    for block, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                      ("Mixed_6d", 160), ("Mixed_6e", 192)):
        branches = tuple(
            (n, (cout if cout is not None else c7), k, st, p)
            for n, cout, k, st, p in _C_BRANCHES)
        add(block, 768, branches, 192)
    # InceptionD: Mixed_7a
    s["Mixed_7a.branch3x3_1"] = (768, 192, (1, 1), 1, (0, 0))
    s["Mixed_7a.branch3x3_2"] = (192, 320, (3, 3), 2, (0, 0))
    s["Mixed_7a.branch7x7x3_1"] = (768, 192, (1, 1), 1, (0, 0))
    s["Mixed_7a.branch7x7x3_2"] = (192, 192, (1, 7), 1, (0, 3))
    s["Mixed_7a.branch7x7x3_3"] = (192, 192, (7, 1), 1, (3, 0))
    s["Mixed_7a.branch7x7x3_4"] = (192, 192, (3, 3), 2, (0, 0))
    # InceptionE: Mixed_7b/7c
    for block, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        add(block, cin, _E_BRANCHES, 192)
    return s


_SPECS = conv_specs()


# ---------------------------------------------------------------------------
# params: {conv_name: {w: HWIO, a: [C], b: [C]}} + {"fc": {w, b}}
# (BN folded: a = gamma/sqrt(var+eps), b = beta - mean*a)
# ---------------------------------------------------------------------------

def import_torch_state_dict(sd: Mapping[str, np.ndarray],
                            num_classes: int = NUM_CLASSES_FID) -> Dict:
    """pytorch-fid / torchvision state_dict -> folded params pytree.

    Accepts torch tensors or ndarrays; ``AuxLogits.*`` and
    ``num_batches_tracked`` entries are ignored (not part of the eval
    graph). Raises on missing conv/bn/fc keys or shape drift.
    """
    def get(key):
        if key not in sd:
            raise KeyError(f"inception state_dict missing {key}")
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    params: Dict = {}
    for name, (cin, cout, (kh, kw), _, _) in _SPECS.items():
        w = get(f"{name}.conv.weight")
        if w.shape != (cout, cin, kh, kw):
            raise ValueError(
                f"{name}: expected OIHW {(cout, cin, kh, kw)}, got {w.shape}")
        gamma = get(f"{name}.bn.weight")
        beta = get(f"{name}.bn.bias")
        mean = get(f"{name}.bn.running_mean")
        var = get(f"{name}.bn.running_var")
        a = gamma / np.sqrt(var + BN_EPS)
        params[name] = {
            "w": np.transpose(w, (2, 3, 1, 0)),  # OIHW -> HWIO
            "a": a,
            "b": beta - mean * a,
        }
    fw = get("fc.weight")
    if fw.shape != (num_classes, 2048):
        raise ValueError(f"fc: expected {(num_classes, 2048)}, got {fw.shape}")
    params["fc"] = {"w": fw.T, "b": get("fc.bias")}
    return params


def random_state_dict(seed: int = 0,
                      num_classes: int = NUM_CLASSES_FID) -> Dict[str, np.ndarray]:
    """A torch-layout state_dict with random values — lets the graph be
    golden-tested (and the importer exercised) without the real weights."""
    rng = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}
    for name, (cin, cout, (kh, kw), _, _) in _SPECS.items():
        fan_in = cin * kh * kw
        sd[f"{name}.conv.weight"] = (
            rng.randn(cout, cin, kh, kw) / np.sqrt(fan_in)).astype(np.float32)
        sd[f"{name}.bn.weight"] = (
            0.5 + rng.rand(cout).astype(np.float32))
        sd[f"{name}.bn.bias"] = 0.1 * rng.randn(cout).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = 0.1 * rng.randn(cout).astype(np.float32)
        sd[f"{name}.bn.running_var"] = (
            0.5 + rng.rand(cout).astype(np.float32))
    sd["fc.weight"] = rng.randn(num_classes, 2048).astype(np.float32) * 0.01
    sd["fc.bias"] = np.zeros(num_classes, np.float32)
    return sd


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _conv_bn_relu(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y * p["a"] + p["b"])


def _max_pool(x, k=3, s=2, p=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (p, p), (p, p), (0, 0)))


def _avg_pool_3x3_nopad(x):
    """3x3 stride-1 pad-1 average pool with ``count_include_pad=False``:
    border windows divide by the number of *valid* taps (TF semantics)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


def _block(params, block):
    def bc(x, name):
        _, _, _, stride, pad = _SPECS[f"{block}.{name}"]
        return _conv_bn_relu(params[f"{block}.{name}"], x, stride, pad)
    return bc


def _inception_a(params, block, x):
    bc = _block(params, block)
    b1 = bc(x, "branch1x1")
    b5 = bc(bc(x, "branch5x5_1"), "branch5x5_2")
    b3 = bc(bc(bc(x, "branch3x3dbl_1"), "branch3x3dbl_2"), "branch3x3dbl_3")
    bp = bc(_avg_pool_3x3_nopad(x), "branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, x):
    bc = _block(params, "Mixed_6a")
    b3 = bc(x, "branch3x3")
    bd = bc(bc(bc(x, "branch3x3dbl_1"), "branch3x3dbl_2"), "branch3x3dbl_3")
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _inception_c(params, block, x):
    bc = _block(params, block)
    b1 = bc(x, "branch1x1")
    b7 = bc(bc(bc(x, "branch7x7_1"), "branch7x7_2"), "branch7x7_3")
    bd = x
    for i in range(1, 6):
        bd = bc(bd, f"branch7x7dbl_{i}")
    bp = bc(_avg_pool_3x3_nopad(x), "branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, x):
    bc = _block(params, "Mixed_7a")
    b3 = bc(bc(x, "branch3x3_1"), "branch3x3_2")
    b7 = x
    for i in range(1, 5):
        b7 = bc(b7, f"branch7x7x3_{i}")
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _inception_e(params, block, x, pool: str):
    bc = _block(params, block)
    b1 = bc(x, "branch1x1")
    h = bc(x, "branch3x3_1")
    b3 = jnp.concatenate([bc(h, "branch3x3_2a"), bc(h, "branch3x3_2b")], -1)
    h = bc(bc(x, "branch3x3dbl_1"), "branch3x3dbl_2")
    bd = jnp.concatenate([bc(h, "branch3x3dbl_3a"), bc(h, "branch3x3dbl_3b")],
                         -1)
    pooled = _avg_pool_3x3_nopad(x) if pool == "avg" \
        else _max_pool(x, k=3, s=1, p=1)
    bp = bc(pooled, "branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def features(params, x: jnp.ndarray) -> jnp.ndarray:
    """pool3 features [N, 2048] of NHWC ``x`` in [-1, 1] (299x299x3)."""
    h = _conv_bn_relu(params["Conv2d_1a_3x3"], x, 2, (0, 0))
    h = _conv_bn_relu(params["Conv2d_2a_3x3"], h, 1, (0, 0))
    h = _conv_bn_relu(params["Conv2d_2b_3x3"], h, 1, (1, 1))
    h = _max_pool(h)
    h = _conv_bn_relu(params["Conv2d_3b_1x1"], h, 1, (0, 0))
    h = _conv_bn_relu(params["Conv2d_4a_3x3"], h, 1, (0, 0))
    h = _max_pool(h)
    for block in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        h = _inception_a(params, block, h)
    h = _inception_b(params, h)
    for block in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        h = _inception_c(params, block, h)
    h = _inception_d(params, h)
    h = _inception_e(params, "Mixed_7b", h, pool="avg")
    h = _inception_e(params, "Mixed_7c", h, pool="max")  # the FID quirk
    return jnp.mean(h, axis=(1, 2))


def logits(params, x: jnp.ndarray) -> jnp.ndarray:
    """Classifier logits [N, num_classes] (for Inception Score)."""
    f = features(params, x)
    return f @ params["fc"]["w"] + params["fc"]["b"]


def preprocess(images01: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """[N, H, W, 3] floats in [0, 1] -> bilinear-resized [-1, 1] NHWC.

    Matches pytorch-fid's ``F.interpolate(..., mode='bilinear',
    align_corners=False)`` (half-pixel centers, no antialias)."""
    n = images01.shape[0]
    if images01.shape[1:3] != (size, size):
        images01 = jax.image.resize(
            images01, (n, size, size, images01.shape[3]), "bilinear",
            antialias=False)
    return images01 * 2.0 - 1.0


@functools.partial(jax.jit, static_argnames=("want_logits",))
def _run(params, x, want_logits=False):
    return logits(params, x) if want_logits else features(params, x)


def run_batched(params, images01: np.ndarray, batch: int = 32,
                want_logits: bool = False) -> np.ndarray:
    """Host loop over jitted fixed-shape batches (pads the tail batch so
    one compiled program serves the whole set)."""
    outs = []
    n = len(images01)
    for i in range(0, n, batch):
        chunk = np.asarray(images01[i:i + batch], np.float32)
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)])
        x = preprocess(jnp.asarray(chunk))
        out = np.asarray(_run(params, x, want_logits))
        outs.append(out[:batch - pad] if pad else out)
    return np.concatenate(outs)
