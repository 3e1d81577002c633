#!/usr/bin/env bash
# Counterpart of the reference eval.sh (torchrun utils/eval.py --mst --amp).
set -e
python tools/eval.py \
    --config=${CONFIG:-local_configs.NYUDepthv2.DFormer_Large} \
    --continue_fpath=${CKPT:?set CKPT=path/to/checkpoint} \
    --mst \
    "$@"
