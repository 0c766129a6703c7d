#!/usr/bin/env bash
# RealSR stage-2 GAN training (reference `RealSR/train_S2.sh`).
set -e
cd "$(dirname "$0")/.."
python train.py -opt options/mambaSR11GAN_x4.yml "$@"
