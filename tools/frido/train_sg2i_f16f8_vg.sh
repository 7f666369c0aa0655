#!/usr/bin/env bash
set -e
python3 main.py --base configs/frido/sg2i/frido_f16f8_vg.yaml \
    -t True -l ./exp_my/frido/sg2i -n frido_f16f8_vg --scale_lr False
