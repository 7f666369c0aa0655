#!/usr/bin/env bash
# label2i on COCO-stuff with sg2im-style 3-8 instance filtering
# (FID 47.39 row in BASELINE.md), DDIM 200, no guidance.
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/label2i/frido_f16f8_coco_sg2im.yaml \
    -r "${CKPT:-exp/label2i/frido_f16f8_coco_sg2im/model.ckpt}" \
    -c 200 -name full -o exp/label2i_sg2im/samples
python3 scripts/eval_fid.py \
    --real exp/label2i_sg2im/samples/full/inputs \
    --fake exp/label2i_sg2im/samples/full/sample || true
