#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
# Stage 3/3: project the DEV/TEST subsets into single-shard records.
# Parity: reference gigaspeech/03-create_devtest_set.sh.
# Usage: ./03-create_devtest_set.sh DATA_PATH
set -e
THIS_DIR="$( cd "$( dirname "$0" )" && pwd )"
if [[ ! -n "$1" ]]; then
    echo "Usage: ./03-create_devtest_set.sh DATA_PATH"
    exit 1
fi
DATA_PATH="$1"
ASR_OUTPUT_PATH=$DATA_PATH/asr
mkdir -p $ASR_OUTPUT_PATH/devtest
for subset in DEV TEST; do
    sed -e "s#DATA_PATH#${DATA_PATH}#g" -e "s#SUBSET#${subset}#g" \
        -e "s#REMOVE_PUNCTUATION#True#g" \
        $THIS_DIR/asr_data_prep.yml > _tmp_prep_${subset}
    lower=$(echo $subset | tr 'A-Z' 'a-z')
    nice -n 10 python3 -m neurst_tpu.cli.create_records \
        --processor_id 0 --num_processors 1 \
        --num_output_shards 1 \
        --output_range_begin 0 --output_range_end 1 \
        --output_template $ASR_OUTPUT_PATH/devtest/${lower}.tfrecords-%5.5d-of-%5.5d \
        --config_paths _tmp_prep_${subset} &
done
wait
rm -f _tmp_prep_DEV _tmp_prep_TEST
