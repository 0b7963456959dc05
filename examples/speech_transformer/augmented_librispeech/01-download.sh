#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
#
# Stage 1/3: acquire the Augmented LibriSpeech (libri-trans) corpus.
# Parity: reference examples/speech_transformer/augmented_librispeech/
# 01-download.sh — the corpus is distributed via
#   https://github.com/alicank/Translation-Augmented-LibriSpeech-Corpus
# and must be downloaded manually (license click-through):
#   - train_100h.zip
#   - dev.zip
#   - test.zip
#
# Usage: ./01-download.sh SAVE_PATH
set -e

if [[ ! -n "$1" ]]; then
    echo "Usage: ./01-download.sh SAVE_PATH"
    exit 1
else
    DATA_PATH="$1"
fi

DATA_PATH=$DATA_PATH/raw/
mkdir -p $DATA_PATH

echo "Download the Augmented LibriSpeech zips from"
echo "  https://github.com/alicank/Translation-Augmented-LibriSpeech-Corpus"
echo "and place train_100h.zip, dev.zip, test.zip under $DATA_PATH"

for f in train_100h.zip dev.zip test.zip; do
    if [[ -f $DATA_PATH/$f ]]; then
        echo "found: $DATA_PATH/$f"
    else
        echo "MISSING: $DATA_PATH/$f"
    fi
done
