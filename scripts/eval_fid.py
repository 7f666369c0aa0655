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
    args = p.parse_args()

    from frido_tpu.eval.fid import fid_between_folders, inception_available

    if not inception_available():
        print("FID skipped: set FRIDO_TPU_INCEPTION to local inception_v3 "
              "weights (zero-egress environment).")
        return
    fid = fid_between_folders(args.real, args.fake, args.limit)
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
