#!/usr/bin/env bash
set -e
python3 main.py --base configs/frido/t2i/frido_f16f8_coco.yaml \
    -t True -l ./exp_my/frido/t2i -n frido_f16f8_coco --scale_lr False
