#!/usr/bin/env bash
# layout2i mini-val smoke eval: 320 fixed images, 100 DDIM steps,
# no guidance (expected FID ~121.23, BASELINE.md).
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/layout2i/frido_f8f4_coco_seg_mini.yaml \
    -r "${CKPT:-exp/layout2i/frido_f8f4_coco_seg/model.ckpt}" \
    -c 100 -name mini -o exp/layout2i/samples
python3 scripts/eval_fid.py \
    --real exp/layout2i/samples/mini/inputs \
    --fake exp/layout2i/samples/mini/sample || true
