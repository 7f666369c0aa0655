#!/usr/bin/env python
"""PSNR/SSIM between two image folders (MS-VQGAN reconstruction quality,
the reference's hand-run workflow per ``README.md:345-368``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real", required=True, help="ground-truth image folder")
    p.add_argument("--fake", required=True, help="reconstruction folder")
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    from frido_tpu.eval.fid import load_images
    from frido_tpu.eval.metrics import psnr_ssim_batch

    real = load_images(args.real, size=args.size, limit=args.limit)
    fake = load_images(args.fake, size=args.size, limit=args.limit)
    n = min(len(real), len(fake))
    ps, ss = psnr_ssim_batch(real[:n], fake[:n], data_range=1.0)
    print(f"PSNR: {ps:.4f}  SSIM: {ss:.4f}  (n={n})")


if __name__ == "__main__":
    main()
