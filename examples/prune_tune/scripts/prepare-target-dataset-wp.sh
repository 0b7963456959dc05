#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
# Prune-Tune target-domain data prep (wordpiece). Parity:
# reference examples/prune_tune/scripts/prepare-target-dataset-wp.sh —
# projects a target-domain parallel corpus (train/dev/test.{en,de})
# with the GENERAL-domain wordpiece vocab into sharded records.
# Usage: ./prepare-target-dataset-wp.sh DATA_PATH VOCAB_PATH
set -e
THIS_DIR="$( cd "$( dirname "$0" )" && pwd )"
DATA_PATH=$1
VOCAB=${2:-$DATA_PATH/vocab}
if [[ -z $DATA_PATH ]]; then
    echo "Usage: ./prepare-target-dataset-wp.sh DATA_PATH [VOCAB_PATH]"
    exit 1
fi
DATA_PATH="$( cd "$DATA_PATH" && pwd )"
TRAIN_SRC=$DATA_PATH/train.en
TRAIN_TRG=$DATA_PATH/train.de

echo "shuffling..."
get_seeded_random()
{
  seed="$1"
  openssl enc -aes-256-ctr -pass pass:"$seed" -nosalt \
    </dev/zero 2>/dev/null
}
random_source=`date +%N`
shuf --random-source=<(get_seeded_random $random_source) \
    $TRAIN_SRC > $DATA_PATH/train.en.shuf
shuf --random-source=<(get_seeded_random $random_source) \
    $TRAIN_TRG > $DATA_PATH/train.de.shuf
mv $DATA_PATH/train.en.shuf $TRAIN_SRC
mv $DATA_PATH/train.de.shuf $TRAIN_TRG

RECORDS_PATH=$DATA_PATH/train_records
mkdir -p $RECORDS_PATH
rm -f FAILED
NUM_PROCESSORS=8
TOTAL_SHARDS=32
SHARD_PER_PROCESS=$((TOTAL_SHARDS / NUM_PROCESSORS))
for procid in $(seq 0 $((NUM_PROCESSORS - 1))); do
    nice -n 10 python3 -m neurst_tpu.cli.create_records \
        --processor_id $procid --num_processors $NUM_PROCESSORS \
        --num_output_shards $TOTAL_SHARDS \
        --output_range_begin "$((SHARD_PER_PROCESS * procid))" \
        --output_range_end "$((SHARD_PER_PROCESS * procid + SHARD_PER_PROCESS))" \
    --dataset ParallelTextDataset \
    --src_file $TRAIN_SRC --trg_file $TRAIN_TRG \
    --task.class translation \
    --task.params "
        src_data_pipeline.class: TextDataPipeline
        src_data_pipeline.params:
          language: en
          subtokenizer: wordpiece
          subtokenizer_codes: $VOCAB
          vocab_path: $VOCAB
        trg_data_pipeline.class: TextDataPipeline
        trg_data_pipeline.params:
          language: de
          subtokenizer: wordpiece
          subtokenizer_codes: $VOCAB
          vocab_path: $VOCAB" \
    --output_template $RECORDS_PATH/train.tfrecords-%5.5d-of-%5.5d || touch FAILED &
done
wait
! [[ -f FAILED ]]

for stage in training validation prediction; do
    sed -e "s#DATA_PATH#${DATA_PATH}#g" -e "s#VOCAB_PATH#${VOCAB}#g" \
        $THIS_DIR/${stage}_args.yml > $DATA_PATH/${stage}_args.yml
done
echo "Done."
