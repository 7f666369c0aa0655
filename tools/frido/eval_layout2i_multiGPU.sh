#!/usr/bin/env bash
# Reference-compatible alias (tools/frido/eval_layout2i_multiGPU.sh).
exec "$(dirname "$0")/eval_layout2i_multishard.sh" "$@"
