#!/usr/bin/env bash
# PLMS eval variant: 50 steps, eta 0 (PLMS requires it), CFG 1.5
# (reference protocol: tools/frido/eval_t2i_plms.sh).
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/t2i/frido_f16f8_coco.yaml \
    -r "${CKPT:-exp/t2i/frido_f16f8_coco/model.ckpt}" \
    -e 0 -G -gs 1.5 -c 50 -plms -name full -o exp/t2i/samples
