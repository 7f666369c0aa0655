#!/usr/bin/env bash
set -e
python3 main.py --base configs/frido/layout2i/frido_f8f4_coco_seg.yaml -t True -l ./exp_my/frido/layout2i -n layout2i_f8f4_coco --scale_lr False
