#!/usr/bin/env bash
# Reference-compatible alias (tools/frido/eval_layout2i_f8f4_coco_seg.sh).
exec "$(dirname "$0")/eval_layout2i_coco.sh" "$@"
