#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
# Stage 3/3 (separate-BPE variant): learn per-language 8k BPE instead
# of joint codes — use when source/target scripts differ too much for
# shared subwords. Parity: reference must-c/03-preprocess_alone.sh,
# self-contained (process_text + learn_bpe replace moses perl +
# subword-nmt).
# Usage: ./03-preprocess_alone.sh ROOT_DATA_PATH TRG_LANG
set -e
THIS_DIR="$( cd "$( dirname "$0" )" && pwd )"
DATA_PATH="$1"
TRG_LANGUAGE="$2"
if [[ -z $DATA_PATH ]] || [[ -z $TRG_LANGUAGE ]]; then
    echo "Usage: ./03-preprocess.sh ROOT_DATA_PATH TRG_LANG"
    exit 1
fi
TRANSCRIPT_PATH=$DATA_PATH/transcripts/${TRG_LANGUAGE}

for f in train.en.txt train.${TRG_LANGUAGE}.txt; do
    if [[ ! -f $TRANSCRIPT_PATH/$f ]]; then
        echo "Missing file: $TRANSCRIPT_PATH/$f (run 02-audio_feature_extraction.sh first)"
        exit 1
    fi
done

ASRST_OUTPUT_PATH=$DATA_PATH/asr_st/${TRG_LANGUAGE}
MT_OUTPUT_PATH=$DATA_PATH/mt/${TRG_LANGUAGE}
mkdir -p $ASRST_OUTPUT_PATH/train $MT_OUTPUT_PATH/train

echo "clean + tokenize + learn per-language 8k BPE..."
python3 -m neurst_tpu.cli.process_text \
    --tokenizer moses --language en --normalize_punctuation \
    --input $TRANSCRIPT_PATH/train.en.txt \
    --output $TRANSCRIPT_PATH/train.en.clean.tok.txt &
python3 -m neurst_tpu.cli.process_text \
    --tokenizer moses --language ${TRG_LANGUAGE} --normalize_punctuation \
    --input $TRANSCRIPT_PATH/train.${TRG_LANGUAGE}.txt \
    --output $TRANSCRIPT_PATH/train.${TRG_LANGUAGE}.tok.txt &
wait

python3 -m neurst_tpu.cli.learn_bpe \
    --input $TRANSCRIPT_PATH/train.en.clean.tok.txt \
    --symbols 8000 \
    --output $TRANSCRIPT_PATH/codes.bpe.en \
    --write_vocabulary $TRANSCRIPT_PATH/vocab.en &

python3 -m neurst_tpu.cli.learn_bpe \
    --input $TRANSCRIPT_PATH/train.${TRG_LANGUAGE}.tok.txt \
    --symbols 8000 \
    --output $TRANSCRIPT_PATH/codes.bpe.${TRG_LANGUAGE} \
    --write_vocabulary $TRANSCRIPT_PATH/vocab.${TRG_LANGUAGE} &
wait

python3 -m neurst_tpu.cli.process_text \
    --tokenizer bpe --subtokenizer_codes $TRANSCRIPT_PATH/codes.bpe.en \
    --input $TRANSCRIPT_PATH/train.en.clean.tok.txt \
    --output $TRANSCRIPT_PATH/train.en.bpe.txt &
python3 -m neurst_tpu.cli.process_text \
    --tokenizer bpe --subtokenizer_codes $TRANSCRIPT_PATH/codes.bpe.${TRG_LANGUAGE} \
    --input $TRANSCRIPT_PATH/train.${TRG_LANGUAGE}.tok.txt \
    --output $TRANSCRIPT_PATH/train.${TRG_LANGUAGE}.tok.bpe.txt &
wait

echo "=== Generating records with projected transcripts ==="
rm -f FAILED
for subshard in 0 1 2 3 4 5 6 7; do
    set -x
    nice -n 10 python3 -m neurst_tpu.cli.create_records \
        --processor_id ${subshard} --num_processors 8 \
        --num_output_shards 128 \
        --output_range_begin "$((16 * subshard))" \
        --output_range_end "$((16 * subshard + 16))" \
        --dataset AudioTripleTFRecordDataset --feature_key "audio" \
        --transcript_key "transcript" --translation_key "translation" \
        --data_path $DATA_PATH/train/${TRG_LANGUAGE} \
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
                subtokenizer_codes: $TRANSCRIPT_PATH/codes.bpe.en
                vocab_path: $TRANSCRIPT_PATH/vocab.en
            translation_data_pipeline.class: TranscriptDataPipeline
            translation_data_pipeline.params:
                remove_punctuation: False
                lowercase: False
                language: ${TRG_LANGUAGE}
                tokenizer: moses
                subtokenizer: bpe
                subtokenizer_codes: $TRANSCRIPT_PATH/codes.bpe.${TRG_LANGUAGE}
                vocab_path: $TRANSCRIPT_PATH/vocab.${TRG_LANGUAGE}" || touch FAILED &
    set +x
done
wait
! [[ -f FAILED ]]

cp $TRANSCRIPT_PATH/codes.bpe.en $TRANSCRIPT_PATH/codes.bpe.${TRG_LANGUAGE} $MT_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/codes.bpe.en $TRANSCRIPT_PATH/codes.bpe.${TRG_LANGUAGE} $ASRST_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/vocab.en $TRANSCRIPT_PATH/vocab.${TRG_LANGUAGE} $MT_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/vocab.en $TRANSCRIPT_PATH/vocab.${TRG_LANGUAGE} $ASRST_OUTPUT_PATH/
cp $TRANSCRIPT_PATH/train.en.bpe.txt $MT_OUTPUT_PATH/train/train.en.bpe.txt
cp $TRANSCRIPT_PATH/train.${TRG_LANGUAGE}.tok.bpe.txt $MT_OUTPUT_PATH/train/train.${TRG_LANGUAGE}.tok.bpe.txt

for kind in mt asr st; do
    for stage in training validation prediction; do
        src=$THIS_DIR/${kind}_${stage}_args.yml
        [[ -f $src ]] || continue
        if [[ $kind == mt ]]; then dst=$MT_OUTPUT_PATH; else dst=$ASRST_OUTPUT_PATH; fi
        sed -e "s#DATA_PATH#${DATA_PATH}#g" -e "s#TRG_LANG#${TRG_LANGUAGE}#g" \
            $src > $dst/${kind}_${stage}_args.yml
    done
done
echo "Done."
