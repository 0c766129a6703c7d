#!/usr/bin/env bash
# Deraining training (reference `Deraining/train.sh`).
set -e
cd "$(dirname "$0")/.."
python train.py -opt options/Deraining_mamber33.yml "$@"
