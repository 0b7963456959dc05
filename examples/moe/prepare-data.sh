#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
#
# MoE uses the SAME data as the dense translation recipe — this simply
# delegates to the translation pack's preparation (wordpiece variant;
# pass "bpe" as $2 for joint BPE).
#
# Usage: ./prepare-data.sh [DATA_PATH] [wp|bpe]
set -e
THIS_DIR="$( cd "$( dirname "$0" )" && pwd )"
DATA_PATH=${1:-wmt14_en_de}
VARIANT=${2:-wp}
if [ "$VARIANT" = "bpe" ]; then
  bash "$THIS_DIR/../translation/prepare-wmt14en2de-bpe.sh" "$DATA_PATH"
else
  bash "$THIS_DIR/../translation/prepare-wmt14en2de-wp.sh" "$DATA_PATH"
fi
