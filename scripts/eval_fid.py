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

    from frido_tpu.eval.fid import (fid_from_features, inception_available,
                                    inception_features, load_images,
                                    logits_from_features)
    from frido_tpu.eval.metrics import inception_score

    if not inception_available():
        print("FID skipped: set FRIDO_TPU_INCEPTION to a local pytorch-fid "
              "inception state_dict (zero-egress environment).")
        return
    real = inception_features(load_images(args.real, size=args.size,
                                          limit=args.limit))
    fake = inception_features(load_images(args.fake, size=args.size,
                                          limit=args.limit))
    print(f"FID: {fid_from_features(real, fake):.4f}")
    if args.inception_score:
        # IS logits are the fc head over the pool3 features just computed —
        # no second image load / tower pass.
        mean, std = inception_score(logits_from_features(fake))
        print(f"IS: {mean:.4f} +/- {std:.4f}")


if __name__ == "__main__":
    main()
