#!/usr/bin/env bash
# layout2i on Visual Genome (FID 17.24 @ DDIM 250 steps, BASELINE.md),
# no guidance.
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/layout2i/frido_f8f4_vg.yaml \
    -r "${CKPT:-exp/layout2i/frido_f8f4_vg/model.ckpt}" \
    -c 250 -name full -o exp/layout2i_vg/samples
python3 scripts/eval_fid.py \
    --real exp/layout2i_vg/samples/full/inputs \
    --fake exp/layout2i_vg/samples/full/sample || true
