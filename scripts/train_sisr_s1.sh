#!/usr/bin/env bash
# SISR stage-1 training (reference `SRGAN/train_S1.sh`). No
# torch.distributed.launch: one JAX process drives all local TPU chips.
set -e
cd "$(dirname "$0")/.."
python train.py -opt options/MambaSISR15_x4.yml "$@"
