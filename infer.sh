#!/usr/bin/env bash
# Counterpart of the reference infer.sh (prediction PNG dumps).
set -e
python tools/infer.py \
    --config=${CONFIG:-local_configs.NYUDepthv2.DFormer_Large} \
    --continue_fpath=${CKPT:?set CKPT=path/to/checkpoint} \
    --save_path=${SAVE:-output/preds} \
    "$@"
