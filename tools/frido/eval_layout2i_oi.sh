#!/usr/bin/env bash
# layout2i on OpenImages (FID 29.04 @ 2048 val imgs, BASELINE.md),
# DDIM 200, no guidance.
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/layout2i/frido_f8f4_openimage.yaml \
    -r "${CKPT:-exp/layout2i/frido_f8f4_openimage/model.ckpt}" \
    -c 200 -name full -o exp/layout2i_oi/samples
python3 scripts/eval_fid.py \
    --real exp/layout2i_oi/samples/full/inputs \
    --fake exp/layout2i_oi/samples/full/sample || true
