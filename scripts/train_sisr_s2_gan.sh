#!/usr/bin/env bash
# SISR stage-2 GAN fine-tune (reference `SRGAN/train_S2.sh`).
set -e
cd "$(dirname "$0")/.."
python train.py -opt options/MambaSISR15GAN_x4.yml "$@"
