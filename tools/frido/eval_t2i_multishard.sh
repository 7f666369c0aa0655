#!/usr/bin/env bash
# Sharded inference across N hosts/processes: each takes 1/N of the test set
# deterministically. On a single multi-chip host prefer one process — the
# batch is already sharded over the mesh.
set -e
N=${1:-2}
for i in $(seq 0 $((N - 1))); do
  python3 scripts/sample_diffusion.py \
      -cfg configs/frido/t2i/frido_f16f8_coco.yaml \
      -r "${CKPT:-exp/t2i/frido_f16f8_coco/model.ckpt}" \
      -plms -G -gs 1.5 -c 200 -ngpu "$N" -igpu "$i" -name full -o exp/t2i/samples &
done
wait
