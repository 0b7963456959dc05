#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
# Stage 2/3: extract transcripts + fbank feature records per split.
# Parity: reference must-c/02-audio_feature_extraction.sh, using
# neurst_tpu.cli.create_records (same flag surface) and the MuSTC
# adapter's --extraction split selector.
# Usage: ./02-audio_feature_extraction.sh ROOT_DATA_PATH TRG_LANG
set -e
DATA_PATH="$1"
TRG_LANGUAGE="$2"
if [[ -z $DATA_PATH ]] || [[ -z $TRG_LANGUAGE ]]; then
    echo "Usage: ./02-audio_feature_extraction.sh ROOT_DATA_PATH TRG_LANG"
    exit 1
fi
RAW_DATA_PATH=$DATA_PATH/raw
TRANSCRIPT_PATH=$DATA_PATH/transcripts/${TRG_LANGUAGE}
INPUT_TARBALL=$RAW_DATA_PATH/MUSTC_v1.0_en-${TRG_LANGUAGE}.tar.gz
mkdir -p $TRANSCRIPT_PATH

if [[ ! -f $INPUT_TARBALL ]]; then
    echo "File not exists: $INPUT_TARBALL"
    exit 1
fi

echo "=== First pass, collecting transcripts ==="
for subset in train dev tst-COMMON; do
    set -x
    python3 -m neurst_tpu.cli.extract_audio_transcripts \
        --dataset MuSTC --extraction $subset \
        --trg_lang ${TRG_LANGUAGE} \
        --input_tarball $INPUT_TARBALL \
        --output_transcript_file $TRANSCRIPT_PATH/${subset}.en.txt \
        --output_translation_file $TRANSCRIPT_PATH/${subset}.${TRG_LANGUAGE}.txt &
    set +x
done
wait

echo "=== Second pass, generating records with audio features ==="
mkdir -p $DATA_PATH/train/${TRG_LANGUAGE} $DATA_PATH/devtest
rm -f FAILED

PROCESSORS_IN_PARALLEL=4
NUM_PROCESSORS=8
TOTAL_SHARDS=128
SHARD_PER_PROCESS=$((TOTAL_SHARDS / NUM_PROCESSORS))
LOOP=$((NUM_PROCESSORS / PROCESSORS_IN_PARALLEL))

for loopid in $(seq 1 ${LOOP}); do
    start=$(($((loopid - 1)) * ${PROCESSORS_IN_PARALLEL}))
    end=$(($start + PROCESSORS_IN_PARALLEL - 1))
    for procid in $(seq $start $end); do
        set -x
        nice -n 10 python3 -m neurst_tpu.cli.create_records \
            --processor_id $procid --num_processors $NUM_PROCESSORS \
            --num_output_shards $TOTAL_SHARDS \
            --output_range_begin "$((SHARD_PER_PROCESS * procid))" \
            --output_range_end "$((SHARD_PER_PROCESS * procid + SHARD_PER_PROCESS))" \
        --dataset MuSTC --extraction train \
        --trg_lang ${TRG_LANGUAGE} \
        --feature_extractor.class fbank \
        --feature_extractor.params '{"nfilt": 80}' \
        --input_tarball $INPUT_TARBALL \
        --output_template $DATA_PATH/train/${TRG_LANGUAGE}/train.tfrecords-%5.5d-of-%5.5d || touch FAILED &
        set +x
    done
    wait
    ! [[ -f FAILED ]]
done

for subset in dev tst-COMMON; do
    set -x
    nice -n 10 python3 -m neurst_tpu.cli.create_records \
        --processor_id 0 --num_processors 1 \
        --num_output_shards 1 \
        --output_range_begin 0 --output_range_end 1 \
    --dataset MuSTC --extraction $subset \
    --trg_lang ${TRG_LANGUAGE} \
    --feature_extractor.class fbank \
    --feature_extractor.params '{"nfilt": 80}' \
    --input_tarball $INPUT_TARBALL \
    --output_template $DATA_PATH/devtest/${subset}.en-${TRG_LANGUAGE}.tfrecords-%5.5d-of-%5.5d || touch FAILED &
    set +x
done
wait
! [[ -f FAILED ]]
