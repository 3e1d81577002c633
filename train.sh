#!/usr/bin/env bash
# TPU-native training launcher (counterpart of the reference train.sh, which
# used torch.distributed.launch over 2 GPUs). On TPU a single process drives
# all local chips through the mesh; multi-host runs launch this once per host.
set -e
python tools/train.py \
    --config=${CONFIG:-local_configs.NYUDepthv2.DFormer_Base} \
    --amp --mst --syncbn \
    "$@"
