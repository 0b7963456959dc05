#!/usr/bin/env bash
# Parity: reference examples/iwslt21/scripts/evaluate_e2e.sh —
# direct (end-to-end) ST decode of MuST-C audio records.
# Usage: ./evaluate_e2e.sh RECORDS_PATH MODEL_DIR OUTPUT_PATH
set -e
if [[ ! -n "$3" ]]; then
    echo "Usage: ./evaluate_e2e.sh RECORDS_PATH MODEL_DIR OUTPUT_PATH"
    echo "RECORDS_PATH: audio records from examples/speech_transformer/must-c stage 2"
    exit 1
fi
RECORDS_PATH=$1
MODEL_DIR=$2
OUTPUT_PATH=$3
mkdir -p $OUTPUT_PATH
python3 -m neurst_tpu.cli.run_exp --entry predict \
    --model_dir $MODEL_DIR \
    --dataset AudioTripleTFRecordDataset \
    --data_path $RECORDS_PATH --transcript_key translation \
    --search_method beam_search \
    --search_method.params "{beam_size: 4, length_penalty: 0.6, maximum_decode_length: 220}" \
    --metric bleu \
    --output_file $OUTPUT_PATH/e2e.hypo.txt
