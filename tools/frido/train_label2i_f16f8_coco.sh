#!/usr/bin/env bash
set -e
python3 main.py --base configs/frido/label2i/frido_f16f8_coco.yaml -t True -l ./exp_my/frido/label2i -n label2i_f16f8_coco --scale_lr False
