#!/usr/bin/env bash
# Parity: reference examples/iwslt21/scripts/evaluate_cascade.sh —
# ASR decode then MT decode of the hypotheses (cascade_st CLI).
# Usage: ./evaluate_cascade.sh RECORDS_PATH ASR_MODEL_DIR MT_MODEL_DIR OUTPUT_PATH
set -e
if [[ ! -n "$4" ]]; then
    echo "Usage: ./evaluate_cascade.sh RECORDS_PATH ASR_MODEL_DIR MT_MODEL_DIR OUTPUT_PATH"
    exit 1
fi
RECORDS_PATH=$1
ASR_MODEL_DIR=$2
MT_MODEL_DIR=$3
OUTPUT_PATH=$4
mkdir -p $OUTPUT_PATH
python3 -m neurst_tpu.cli.cascade_st \
    --asr_model_dir $ASR_MODEL_DIR \
    --mt_model_dir $MT_MODEL_DIR \
    --dataset AudioTripleTFRecordDataset \
    --data_path $RECORDS_PATH \
    --output_file $OUTPUT_PATH/cascade.hypo.txt
