#!/usr/bin/env python
"""FID between two image folders (the reference's torch-fidelity workflow,
``README.md:334-344``). Needs local inception weights; see
``frido_tpu/eval/fid.py``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real", required=True)
    p.add_argument("--fake", required=True)
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--size", type=int, default=None,
                   help="PIL-resize images to SIZExSIZE before the "
                        "Inception preprocess — needed for folders of "
                        "non-uniform sizes (e.g. raw COCO val). Default "
                        "keeps native resolution (pytorch-fid convention; "
                        "the 299 bilinear resize happens inside the jitted "
                        "Inception graph)")
    p.add_argument("--inception_score", action="store_true",
                   help="also print IS of --fake (torch-fidelity's isc)")
    args = p.parse_args()

    from frido_tpu.eval.fid import (fid_between_folders,
                                    inception_available, inception_logits,
                                    load_images)
    from frido_tpu.eval.metrics import inception_score

    if not inception_available():
        print("FID skipped: set FRIDO_TPU_INCEPTION to a local pytorch-fid "
              "inception state_dict (zero-egress environment).")
        return
    fid = fid_between_folders(args.real, args.fake, args.limit,
                              size=args.size)
    print(f"FID: {fid:.4f}")
    if args.inception_score:
        logits = inception_logits(load_images(args.fake, size=args.size,
                                              limit=args.limit))
        mean, std = inception_score(logits)
        print(f"IS: {mean:.4f} +/- {std:.4f}")


if __name__ == "__main__":
    main()
