#!/usr/bin/env bash
# RealSR stage-1 training (reference `RealSR/train_S1.sh`).
set -e
cd "$(dirname "$0")/.."
python train.py -opt options/mambaSR11_x4.yml "$@"
