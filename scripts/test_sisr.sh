#!/usr/bin/env bash
# SISR evaluation (reference `SRGAN/test.sh`).
set -e
cd "$(dirname "$0")/.."
python test.py -opt options/test_MambaSISR15_x4.yml "$@"
