#!/usr/bin/env bash
set -e
python3 scripts/sample_diffusion.py -cfg configs/frido/layout2i/frido_f8f4_coco_seg.yaml \
    -r "${CKPT:-exp/layout2i/model.ckpt}" -plms -G -gs 1.5 -c 200 -name full -o exp/layout2i/samples
