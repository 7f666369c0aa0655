#!/usr/bin/env bash
# Sharded layout2i inference across N processes, each taking a
# deterministic 1/N of the test set (reference: eval_layout2i_multiGPU.sh).
# On a single multi-chip host prefer one process — the batch is already
# sharded over the device mesh.
set -e
N=${1:-2}
for i in $(seq 0 $((N - 1))); do
  python3 scripts/sample_diffusion.py \
      -cfg configs/frido/layout2i/frido_f8f4_coco_seg.yaml \
      -r "${CKPT:-exp/layout2i/frido_f8f4_coco_seg/model.ckpt}" \
      -c 200 -ngpu "$N" -igpu "$i" -name full -o exp/layout2i/samples &
done
wait
