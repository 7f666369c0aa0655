#!/usr/bin/env bash
set -e
python3 scripts/train_msvqgan.py --base configs/msvqgan/msvqgan_f16f8_coco.yaml \
    -t True -l ./exp_my/msvqgan -n f16f8_coco
