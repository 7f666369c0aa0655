#!/usr/bin/env bash
# Mini-val t2i smoke eval (1000 fixed images; expected FID ~64.85).
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/t2i/frido_f16f8_coco_mini.yaml \
    -r "${CKPT:-exp/t2i/frido_f16f8_coco/model.ckpt}" \
    -plms -G -gs 1.5 -c 200 -name mini -o exp/t2i/samples
python3 scripts/eval_fid.py \
    --real exp/t2i/samples/mini/inputs --fake exp/t2i/samples/mini/sample || true
