#!/usr/bin/env bash
set -e
python3 main.py --base configs/frido/layout2i/frido_f8f4_openimage.yaml \
    -t True -l ./exp_my/frido/layout2i -n frido_f8f4_openimage --scale_lr False
