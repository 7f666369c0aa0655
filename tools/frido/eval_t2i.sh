#!/usr/bin/env bash
# Full COCO t2i eval: PLMS 200 steps, CFG 1.5. FID via torch-fidelity
# (if installed) over the sample/ vs inputs/ trees.
set -e
python3 scripts/sample_diffusion.py \
    -cfg configs/frido/t2i/frido_f16f8_coco.yaml \
    -r "${CKPT:-exp/t2i/frido_f16f8_coco/model.ckpt}" \
    -plms -G -gs 1.5 -c 200 -name full -o exp/t2i/samples
python3 scripts/eval_fid.py \
    --real exp/t2i/samples/full/inputs --fake exp/t2i/samples/full/sample || true
