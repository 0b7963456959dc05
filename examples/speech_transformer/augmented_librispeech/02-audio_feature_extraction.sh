#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
#
# Stage 2/3: extract transcripts, then stream the zips (no extraction)
# into sharded record files with 80-dim log-mel fbank features + CMVN.
# Parity: reference examples/speech_transformer/augmented_librispeech/
# 02-audio_feature_extraction.sh, using `neurst_tpu.cli.create_records`
# with the same processor/shard flag surface as create_tfrecords.
#
# Usage: ./02-audio_feature_extraction.sh ROOT_DATA_PATH
set -e

if [[ ! -n "$1" ]]; then
    echo "Usage: ./02-audio_feature_extraction.sh ROOT_DATA_PATH"
    exit 1
else
    DATA_PATH="$1"
fi

RAW_DATA_PATH=$DATA_PATH/raw
TRANSCRIPT_PATH=$DATA_PATH/transcripts
mkdir -p $TRANSCRIPT_PATH

for f in train_100h.zip dev.zip test.zip; do
    if [[ ! -f $RAW_DATA_PATH/$f ]]; then
        echo "File not exists: $RAW_DATA_PATH/$f"
        echo "Please download and save it to $RAW_DATA_PATH in advance"
        exit 1
    fi
done

echo "=== First pass, collecting transcripts ==="
set -x
python3 -m neurst_tpu.cli.extract_audio_transcripts \
    --dataset AugmentedLibriSpeech \
    --input_tarball $RAW_DATA_PATH/train_100h.zip \
    --output_transcript_file $TRANSCRIPT_PATH/train.en.txt \
    --output_translation_file $TRANSCRIPT_PATH/train.fr.txt

python3 -m neurst_tpu.cli.extract_audio_transcripts \
    --dataset AugmentedLibriSpeech \
    --input_tarball $RAW_DATA_PATH/dev.zip \
    --output_transcript_file $TRANSCRIPT_PATH/dev.en.txt \
    --output_translation_file $TRANSCRIPT_PATH/dev.fr.txt

python3 -m neurst_tpu.cli.extract_audio_transcripts \
    --dataset AugmentedLibriSpeech \
    --input_tarball $RAW_DATA_PATH/test.zip \
    --output_transcript_file $TRANSCRIPT_PATH/test.en.txt \
    --output_translation_file $TRANSCRIPT_PATH/test.fr.txt
set +x

echo "=== Second pass, generating records with audio features and raw transcripts ==="
mkdir -p $DATA_PATH/train
rm -f FAILED

PROCESSORS_IN_PARALLEL=4
NUM_PROCESSORS=8
TOTAL_SHARDS=64
SHARD_PER_PROCESS=$((TOTAL_SHARDS / NUM_PROCESSORS))
LOOP=$((NUM_PROCESSORS / PROCESSORS_IN_PARALLEL))

for loopid in $(seq 1 ${LOOP}); do
    start=$(($((loopid - 1)) * ${PROCESSORS_IN_PARALLEL}))
    end=$(($start + PROCESSORS_IN_PARALLEL - 1))
    echo $start, $end
    for procid in $(seq $start $end); do
        set -x
        nice -n 10 python3 -m neurst_tpu.cli.create_records \
            --processor_id $procid --num_processors $NUM_PROCESSORS \
            --num_output_shards $TOTAL_SHARDS \
            --output_range_begin "$((SHARD_PER_PROCESS * procid))" \
            --output_range_end "$((SHARD_PER_PROCESS * procid + SHARD_PER_PROCESS))" \
        --dataset AugmentedLibriSpeech \
        --feature_extractor.class fbank \
        --feature_extractor.params '{"nfilt": 80}' \
        --input_tarball $RAW_DATA_PATH/train_100h.zip \
        --output_template $DATA_PATH/train/train.tfrecords-%5.5d-of-%5.5d || touch FAILED &
        set +x
    done
    wait
    ! [[ -f FAILED ]]
done

mkdir -p $DATA_PATH/devtest
for subset in dev test; do
    set -x
    nice -n 10 python3 -m neurst_tpu.cli.create_records \
        --processor_id 0 --num_processors 1 \
        --num_output_shards 1 \
        --output_range_begin 0 \
        --output_range_end 1 \
    --dataset AugmentedLibriSpeech \
    --feature_extractor.class fbank \
    --feature_extractor.params '{"nfilt": 80}' \
    --input_tarball $RAW_DATA_PATH/${subset}.zip \
    --output_template $DATA_PATH/devtest/${subset}.tfrecords-%5.5d-of-%5.5d || touch FAILED &
    set +x
done
wait
! [[ -f FAILED ]]
