#!/usr/bin/env bash
set -e
python3 scripts/train_msvqgan.py --base configs/msvqgan/msvqgan_f8f4_openimage.yaml \
    -t True -l ./exp_my/msvqgan -n f8f4_openimage
