#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
#
# Stage 3/3: learn joint 8k BPE over the transcripts, project the
# record text fields (ASR/ST), and assemble the MT corpus + configs.
# Parity: reference examples/speech_transformer/augmented_librispeech/
# 03-preprocess.sh, fully self-contained (process_text replaces the
# moses perl tokenizer, learn_bpe replaces external subword-nmt).
#
# Usage: ./03-preprocess.sh DATA_PATH
set -e

THIS_DIR="$( cd "$( dirname "$0" )" && pwd )"

if [[ ! -n "$1" ]]; then
    echo "Usage: ./03-preprocess.sh DATA_PATH"
    exit 1
else
    DATA_PATH="$1"
fi

TRANSCRIPT_PATH=$DATA_PATH/transcripts

for f in train.en.txt train.fr.txt; do
    if [[ ! -f $TRANSCRIPT_PATH/$f ]]; then
        echo "Missing file: $TRANSCRIPT_PATH/$f (run 02-audio_feature_extraction.sh first)"
        exit 1
    fi
done

ASRST_OUTPUT_PATH=$DATA_PATH/asr_st
MT_OUTPUT_PATH=$DATA_PATH/mt
mkdir -p $ASRST_OUTPUT_PATH/train $MT_OUTPUT_PATH/train

echo "tokenize the target side and learn joint 8k BPE..."
python3 -m neurst_tpu.cli.process_text \
    --tokenizer moses --language fr \
    --input $TRANSCRIPT_PATH/train.fr.txt \
    --output $TRANSCRIPT_PATH/train.fr.tok.txt

python3 -m neurst_tpu.cli.learn_bpe \
    --input $TRANSCRIPT_PATH/train.en.txt $TRANSCRIPT_PATH/train.fr.tok.txt \
    --symbols 8000 \
    --output $TRANSCRIPT_PATH/codes.bpe \
    --write_vocabulary $TRANSCRIPT_PATH/vocab.en $TRANSCRIPT_PATH/vocab.fr

python3 -m neurst_tpu.cli.process_text \
    --tokenizer bpe --subtokenizer_codes $TRANSCRIPT_PATH/codes.bpe \
    --input $TRANSCRIPT_PATH/train.en.txt \
    --output $TRANSCRIPT_PATH/train.en.bpe.txt &
python3 -m neurst_tpu.cli.process_text \
    --tokenizer bpe --subtokenizer_codes $TRANSCRIPT_PATH/codes.bpe \
    --input $TRANSCRIPT_PATH/train.fr.tok.txt \
    --output $TRANSCRIPT_PATH/train.fr.tok.bpe.txt &
wait

get_seeded_random()
{
  seed="$1"
  openssl enc -aes-256-ctr -pass pass:"$seed" -nosalt \
    </dev/zero 2>/dev/null
}
random_source=`date +%N`
shuf --random-source=<(get_seeded_random $random_source) \
    $TRANSCRIPT_PATH/train.en.bpe.txt > $TRANSCRIPT_PATH/train.en.bpe.txt.shuf
shuf --random-source=<(get_seeded_random $random_source) \
    $TRANSCRIPT_PATH/train.fr.tok.bpe.txt > $TRANSCRIPT_PATH/train.fr.tok.bpe.txt.shuf

echo "=== Generating records with projected transcripts ==="
rm -f FAILED
SERIES=4
SHARDS=8
SERIES_PER_SHARD=$((${SHARDS} / ${SERIES}))

for series in $(seq 1 ${SERIES}); do
    start=$(($(($series - 1)) * ${SERIES_PER_SHARD}))
    end=$(($start + $SERIES_PER_SHARD - 1))
    for subshard in $(seq $start $end); do
        set -x
        nice -n 10 python3 -m neurst_tpu.cli.create_records \
            --processor_id ${subshard} --num_processors 8 \
            --num_output_shards 64 \
            --output_range_begin "$((8 * subshard))" \
            --output_range_end "$((8 * subshard + 8))" \
            --dataset AudioTripleTFRecordDataset --feature_key "audio" \
            --transcript_key "transcript" --translation_key "translation" \
            --data_path $DATA_PATH/train \
            --output_template $ASRST_OUTPUT_PATH/train/train.tfrecords-%5.5d-of-%5.5d \
            --task MultiTaskSpeechTranslation \
            --task.params "
                transcript_data_pipeline.class: TranscriptDataPipeline
                transcript_data_pipeline.params:
                    remove_punctuation: True
                    lowercase: True
                    language: en
                    tokenizer: moses
                    subtokenizer: bpe
                    subtokenizer_codes: $TRANSCRIPT_PATH/codes.bpe
                    vocab_path: $TRANSCRIPT_PATH/vocab.en
                translation_data_pipeline.class: TranscriptDataPipeline
                translation_data_pipeline.params:
                    remove_punctuation: False
                    lowercase: False
                    language: fr
                    tokenizer: moses
                    subtokenizer: bpe
                    subtokenizer_codes: $TRANSCRIPT_PATH/codes.bpe
                    vocab_path: $TRANSCRIPT_PATH/vocab.fr" || touch FAILED &
        set +x
    done
    wait
    ! [[ -f FAILED ]]
done

cp $TRANSCRIPT_PATH/codes.bpe $MT_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/codes.bpe $ASRST_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/vocab.fr $MT_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/vocab.en $MT_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/vocab.fr $ASRST_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/vocab.en $ASRST_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/train.en.bpe.txt.shuf $MT_OUTPUT_PATH/train/train.en.bpe.txt
cp $TRANSCRIPT_PATH/train.fr.tok.bpe.txt.shuf $MT_OUTPUT_PATH/train/train.fr.tok.bpe.txt

for kind in mt asr st; do
    for stage in training validation prediction; do
        src=$THIS_DIR/${kind}_${stage}_args.yml
        if [[ $kind == mt ]]; then dst=$MT_OUTPUT_PATH; else dst=$ASRST_OUTPUT_PATH; fi
        sed "s#DATA_PATH#${DATA_PATH}#" $src > $dst/${kind}_${stage}_args.yml
    done
done

rm -f $TRANSCRIPT_PATH/codes.* $TRANSCRIPT_PATH/vocab.* \
    $TRANSCRIPT_PATH/train.en.bpe* $TRANSCRIPT_PATH/train.fr.tok*
echo "Done."
