"""Evaluation: FID + IS / precision-recall / PSNR / SSIM / CLIPScore."""

from frido_tpu.eval.fid import (  # noqa: F401
    feature_statistics,
    fid_between_folders,
    fid_from_features,
    frechet_distance,
)
from frido_tpu.eval.metrics import (  # noqa: F401
    clip_score,
    inception_score,
    precision_recall,
    psnr,
    psnr_ssim_batch,
    ssim,
)
