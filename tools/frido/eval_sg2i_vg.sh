#!/usr/bin/env bash
# Scene-graph-to-image on Visual Genome (FID 31.61 row in BASELINE.md).
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/sg2i/frido_f16f8_vg.yaml \
    -r "${CKPT:-exp/sg2i/frido_f16f8_vg/model.ckpt}" \
    -G -gs 1.5 -c 200 -name full -o exp/sg2i_vg/samples
python3 scripts/eval_fid.py \
    --real exp/sg2i_vg/samples/full/inputs \
    --fake exp/sg2i_vg/samples/full/sample || true
