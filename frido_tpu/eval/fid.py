"""FID evaluation (Frechet Inception Distance).

The reference computes FID with the external torch-fidelity CLI
(``/root/reference/README.md:334-344``); here the pipeline is in-framework:
the jitted FID-standard InceptionV3 from ``frido_tpu.eval.inception``
(pytorch-fid's modified pool3 graph — NOT stock torchvision; see that
module's docstring) + the Frechet distance over feature statistics.

Weights must be provided locally (zero egress): ``FRIDO_TPU_INCEPTION`` ->
a pytorch-fid ``pt_inception-2015-12-05`` state_dict (.pth) or an .npz of
the same key->array mapping. The statistics/distance math works regardless
and is also exposed for precomputed feature sets.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Tuple

import numpy as np


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """FID between two gaussians fitted to feature sets (Heusel et al.)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    return frechet_distance(*feature_statistics(feats1),
                            *feature_statistics(feats2))


def inception_available() -> bool:
    return bool(os.environ.get("FRIDO_TPU_INCEPTION"))


def load_images(folder: str, size: Optional[int] = None,
                limit: int = -1) -> np.ndarray:
    """Load a PNG/JPG tree into [N, H, W, 3] float32 in [0, 1].

    By default images keep their native size (they must be uniform, as
    Frido eval outputs are) — the 299 resize happens inside the jitted
    Inception preprocess with pytorch-fid's exact bilinear convention.
    PIL resampling here would silently change the FID. Pass ``size`` only
    for non-uniform folders (a documented deviation)."""
    from PIL import Image

    paths = sorted(
        p for p in os.listdir(folder)
        if p.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit > 0:
        paths = paths[:limit]
    out = []
    for p in paths:
        img = Image.open(os.path.join(folder, p)).convert("RGB")
        if size is not None:
            img = img.resize((size, size), Image.BILINEAR)
        out.append(np.asarray(img, np.float32) / 255.0)
    shapes = {a.shape for a in out}
    if len(shapes) > 1:
        raise ValueError(
            f"{folder} contains {len(shapes)} different image sizes "
            f"(e.g. {sorted(shapes)[:3]}); pass size= (--size in "
            "scripts/eval_fid.py) to PIL-resize them — a documented "
            "deviation from the native-resolution FID convention")
    return np.stack(out)


# cache keyed on the resolved weight path, so changing FRIDO_TPU_INCEPTION
# within one process (e.g. comparing two weight files) reloads correctly
_INCEPTION_PARAMS: dict = {}


def _inception_params():
    """Load + cache the FID-Inception params pytree from
    ``FRIDO_TPU_INCEPTION`` (a .pth torch state_dict or equivalent .npz)."""
    if not inception_available():
        raise RuntimeError(
            "Set FRIDO_TPU_INCEPTION to a local pytorch-fid inception "
            "state_dict (.pth or .npz) to compute FID features (no egress "
            "here).")
    path = os.path.abspath(os.environ["FRIDO_TPU_INCEPTION"])
    if path in _INCEPTION_PARAMS:
        return _INCEPTION_PARAMS[path]
    from frido_tpu.eval import inception

    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu")
        sd = sd.get("state_dict", sd)
    _INCEPTION_PARAMS[path] = inception.import_torch_state_dict(sd)
    return _INCEPTION_PARAMS[path]


def inception_features(images: np.ndarray, batch: int = 32) -> np.ndarray:
    """FID-standard pool3 features [N, 2048] of [N, H, W, 3] images in
    [0, 1] (jitted; resize to 299 + scaling happen inside)."""
    from frido_tpu.eval import inception

    return inception.run_batched(_inception_params(), images, batch=batch)


def inception_logits(images: np.ndarray, batch: int = 32) -> np.ndarray:
    """Classifier logits [N, 1008] for Inception Score."""
    from frido_tpu.eval import inception

    return inception.run_batched(_inception_params(), images, batch=batch,
                                 want_logits=True)


def logits_from_features(features: np.ndarray,
                         params: Optional[dict] = None) -> np.ndarray:
    """Classifier logits from already-computed pool3 features — the fc head
    is a plain affine map, so callers that have features (e.g. from a FID
    pass) get IS logits without a second tower forward.

    ``params``: an explicit inception params pytree (as returned by
    ``inception.import_torch_state_dict``); default loads from
    ``FRIDO_TPU_INCEPTION`` via the path-keyed cache."""
    fc = (params if params is not None else _inception_params())["fc"]
    return features @ np.asarray(fc["w"]) + np.asarray(fc["b"])


def fid_between_folders(real_dir: str, fake_dir: str,
                        limit: int = -1,
                        size: Optional[int] = None) -> float:
    real = inception_features(load_images(real_dir, size=size, limit=limit))
    fake = inception_features(load_images(fake_dir, size=size, limit=limit))
    return fid_from_features(real, fake)
