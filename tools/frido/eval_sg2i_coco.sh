#!/usr/bin/env bash
set -e
python3 scripts/sample_diffusion.py -cfg configs/frido/sg2i/frido_f16f8_coco.yaml \
    -r "${CKPT:-exp/sg2i/model.ckpt}" -plms -G -gs 1.5 -c 200 -name full -o exp/sg2i/samples
