#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
# Stage 1/3: acquire MuST-C (parity: reference must-c/01-download.sh).
# Download from https://ict.fbk.eu/must-c/ (license click-through):
#   MUSTC_v1.0_en-{de,es,fr,it,nl,pt,ro,ru}.tar.gz
# Usage: ./01-download.sh SAVE_PATH
set -e
if [[ ! -n "$1" ]]; then
    echo "Usage: ./01-download.sh SAVE_PATH"
    exit 1
fi
DATA_PATH="$1"/raw/
mkdir -p $DATA_PATH
echo "Download the MuST-C tarballs from https://ict.fbk.eu/must-c/"
echo "and place MUSTC_v1.0_en-<lang>.tar.gz under $DATA_PATH"
for lang in de es fr it nl pt ro ru; do
    f=MUSTC_v1.0_en-${lang}.tar.gz
    if [[ -f $DATA_PATH/$f ]]; then echo "found: $f"; else echo "missing: $f"; fi
done
