#!/usr/bin/env bash
set -e
python3 main.py --base configs/frido/sg2i/frido_f16f8_coco.yaml -t True -l ./exp_my/frido/sg2i -n sg2i_f16f8_coco --scale_lr False
