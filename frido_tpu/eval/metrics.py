"""Reconstruction / generation metrics beyond FID.

The reference's acceptance metrics (``/root/reference/README.md:334-368``)
are all external hand-run tools: torch-fidelity (FID/IS), CLIPScore, ADM
precision/recall scripts, PSNR/SSIM for MS-VQGAN reconstruction. Here they
are wired in-framework:

  * PSNR / SSIM — pure numpy (gaussian-window SSIM, Wang et al. 2004
    constants), for first-stage reconstruction quality.
  * Inception Score — softmax-logit form (Salimans et al. 2016) over
    features from ``frido_tpu.eval.fid.inception_logits``.
  * improved precision/recall — k-NN manifold estimation
    (Kynkäänniemi et al. 2019) over any feature set.
  * CLIPScore — cosine(text, image) via the native CLIP towers in
    ``frido_tpu.nn.clip`` (needs local CLIP weights; no egress here).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


# ---------------------------------------------------------------------------
# PSNR / SSIM
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio; default range matches [-1, 1] images."""
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    w = np.outer(g, g)
    return w / w.sum()


def _filter2d(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    """valid-mode 2-D correlation of [H, W] with the window."""
    from numpy.lib.stride_tricks import sliding_window_view

    k = window.shape[0]
    patches = sliding_window_view(img, (k, k))
    return np.einsum("hwij,ij->hw", patches, window)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 2.0,
         window_size: int = 11, sigma: float = 1.5) -> float:
    """Mean SSIM over channels of one [H, W, C] (or [H, W]) image pair."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    w = _gaussian_window(window_size, sigma)
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mx = _filter2d(x, w)
        my = _filter2d(y, w)
        mxx = _filter2d(x * x, w) - mx * mx
        myy = _filter2d(y * y, w) - my * my
        mxy = _filter2d(x * y, w) - mx * my
        s = ((2 * mx * my + c1) * (2 * mxy + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (mxx + myy + c2))
        vals.append(np.mean(s))
    return float(np.mean(vals))


def psnr_ssim_batch(a: np.ndarray, b: np.ndarray,
                    data_range: float = 2.0) -> Tuple[float, float]:
    """Mean PSNR/SSIM over a [N, H, W, C] batch pair."""
    ps = [psnr(x, y, data_range) for x, y in zip(a, b)]
    ss = [ssim(x, y, data_range) for x, y in zip(a, b)]
    return float(np.mean(ps)), float(np.mean(ss))


# ---------------------------------------------------------------------------
# Inception Score
# ---------------------------------------------------------------------------

def inception_score(logits: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over class logits [N, 1000]."""
    logits = np.asarray(logits, np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    scores = []
    n = len(probs)
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        if len(part) == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = np.sum(part * (np.log(part + 1e-16) - np.log(marginal + 1e-16)),
                    axis=1)
        scores.append(float(np.exp(np.mean(kl))))
    return float(np.mean(scores)), float(np.std(scores))


# ---------------------------------------------------------------------------
# improved precision / recall (Kynkäänniemi et al. 2019)
# ---------------------------------------------------------------------------

def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aa = np.sum(a * a, axis=1)[:, None]
    bb = np.sum(b * b, axis=1)[None, :]
    return np.maximum(aa + bb - 2.0 * a @ b.T, 0.0)


def _knn_radii(feats: np.ndarray, k: int) -> np.ndarray:
    d = _pairwise_sq_dists(feats, feats)
    np.fill_diagonal(d, np.inf)
    return np.sort(d, axis=1)[:, k - 1]


def precision_recall(real: np.ndarray, fake: np.ndarray,
                     k: int = 3) -> Tuple[float, float]:
    """precision = frac of fakes inside the real k-NN manifold;
    recall = frac of reals inside the fake manifold."""
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)
    r_real = _knn_radii(real, k)
    r_fake = _knn_radii(fake, k)
    d_fr = _pairwise_sq_dists(fake, real)
    precision = float(np.mean(np.any(d_fr <= r_real[None, :], axis=1)))
    d_rf = d_fr.T
    recall = float(np.mean(np.any(d_rf <= r_fake[None, :], axis=1)))
    return precision, recall


# ---------------------------------------------------------------------------
# CLIPScore
# ---------------------------------------------------------------------------

def clip_score(image_embeds: np.ndarray, text_embeds: np.ndarray,
               w: float = 2.5) -> float:
    """CLIPScore (Hessel et al. 2021): w * max(0, cos(img, txt)), averaged.

    Embeddings from ``frido_tpu.nn.clip`` towers (already or not yet
    normalized — normalization is applied here)."""
    img = image_embeds / np.linalg.norm(image_embeds, axis=1, keepdims=True)
    txt = text_embeds / np.linalg.norm(text_embeds, axis=1, keepdims=True)
    cos = np.sum(img * txt, axis=1)
    return float(np.mean(w * np.maximum(cos, 0.0)))
