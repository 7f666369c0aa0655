#!/usr/bin/env bash
# Fetch pretrained reference checkpoints (torch .ckpt) into exp/.
# The torch key tree is converted to the frido_tpu pytree on load by
# frido_tpu.io.torch_import (OIHW->HWIO transposes, scale_factor fixup) —
# the same checkpoints the reference publishes work here unchanged.
#
# Upstream hosts the checkpoints on Azure blob storage; mirror URLs must be
# provided via env because the original links rotate:
#   FRIDO_CKPT_BASE=https://<mirror>/frido bash tools/download.sh t2i
set -e
TASK=${1:-t2i}
BASE=${FRIDO_CKPT_BASE:?set FRIDO_CKPT_BASE to a checkpoint mirror URL}
declare -A PATHS=(
  [t2i]=t2i/frido_f16f8_coco
  [t2i_clip]=t2i/frido_f16f8_coco_clip
  [layout2i]=layout2i/frido_f8f4_coco_seg
  [layout2i_oi]=layout2i/frido_f8f4_openimage
  [layout2i_vg]=layout2i/frido_f8f4_vg
  [sg2i]=sg2i/frido_f16f8_coco
  [sg2i_vg]=sg2i/frido_f16f8_vg
  [label2i]=label2i/frido_f16f8_coco
  [label2i_sg2im]=label2i/frido_f16f8_coco_sg2im
  [msvqgan_f16f8]=msvqgan/f16f8
  [msvqgan_f8f4]=msvqgan/f8f4
)
REL=${PATHS[$TASK]:?unknown task $TASK}
mkdir -p "exp/$(dirname "$REL")"
wget -c "$BASE/$REL/model.ckpt" -O "exp/$REL/model.ckpt"
echo "checkpoint at exp/$REL/model.ckpt"
