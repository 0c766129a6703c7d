#!/usr/bin/env bash
# Deraining evaluation over the 5 standard sets (reference
# `Deraining/Deraining_test.sh`).
set -e
cd "$(dirname "$0")/.."
python test.py -opt options/test_Deraining_mamber33.yml "$@"
