#!/usr/bin/env bash
# Reference-compatible alias (tools/frido/eval_t2i_multiGPU.sh); on TPU the
# sharding is by host process, not GPU index.
exec "$(dirname "$0")/eval_t2i_multishard.sh" "$@"
