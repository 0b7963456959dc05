#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
# Stage 1/3: acquire GigaSpeech (parity: reference gigaspeech/
# 01-download.sh). The corpus requires signing up at
#   https://github.com/SpeechColab/GigaSpeech
# Expected layout under SAVE_PATH:
#   audio/{audiobook,podcast,youtube}/P*/..., GigaSpeech.json
# Usage: ./01-download.sh SAVE_PATH
set -e
if [[ ! -n "$1" ]]; then
    echo "Usage: ./01-download.sh SAVE_PATH"
    exit 1
fi
DATA_PATH="$1"
mkdir -p $DATA_PATH
echo "Follow https://github.com/SpeechColab/GigaSpeech to obtain the"
echo "corpus (license agreement required) into $DATA_PATH"
[[ -f $DATA_PATH/GigaSpeech.json ]] && echo "found: GigaSpeech.json" \
    || echo "missing: GigaSpeech.json"
