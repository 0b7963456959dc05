#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
# Stage 2/3: collect transcripts, learn the subword model, and project
# the training subset into sharded records.
# Parity: reference gigaspeech/02-create_training_set.sh.
# Usage: ./02-create_training_set.sh DATA_PATH SUBSET (--keep-punctuation)
set -e
REMOVE_PUNCTUATION=True
until [[ -z $1 ]]; do
    case $1 in
        --keep-punctuation)
            shift; REMOVE_PUNCTUATION=False;;
        *)
            if [[ -z $DATA_PATH ]]; then DATA_PATH=$1;
            elif [[ -z $SUBSET ]]; then SUBSET=$1; fi
            shift;;
    esac
done
if [[ -z $DATA_PATH ]] || [[ -z $SUBSET ]]; then
    echo "Usage: ./02-create_training_set.sh DATA_PATH SUBSET (--keep-punctuation)"
    exit 1
fi
SUBSETS="XL L M S XS"
if [[ ! $SUBSETS =~ $SUBSET ]]; then
    echo "${SUBSET} not supported. Please provide a subset in ${SUBSETS}"
    exit 1
fi
THIS_DIR="$( cd "$( dirname "$0" )" && pwd )"
META_FILE=$DATA_PATH/GigaSpeech.json
if [[ ! -f $META_FILE ]]; then
    echo "GigaSpeech.json does not exist at ${DATA_PATH}."
    exit 1
fi

echo "Collecting transcripts from ${META_FILE}..."
LOCAL_TRANSCRIPT=$THIS_DIR/text_all
python3 - "$META_FILE" "$LOCAL_TRANSCRIPT" "$REMOVE_PUNCTUATION" <<'PYEOF'
import json, sys
meta_file, out_file, remove_punct = sys.argv[1], sys.argv[2], sys.argv[3]
remove_punct = remove_punct == "True"
repl_w = [['<QUESTIONMARK>', '?'], ['<EXCLAMATIONPOINT>', '!'],
          ['<PERIOD>', '.'], ['<COMMA>', ','],
          [' ?', '?'], [' !', '!'], [' .', '.'], [' ,', ',']]
repl_wo = [['<QUESTIONMARK>', ''], ['<EXCLAMATIONPOINT>', ''],
           ['<PERIOD>', ''], ['<COMMA>', ''], ['  ', ' ']]
with open(meta_file) as fp, open(out_file, "w") as transcript:
    for audio in json.load(fp)["audios"]:
        for segment in audio["segments"]:
            subsets = segment.get("subsets") or []
            if "{TEST}" in subsets or "{DEV}" in subsets:
                continue
            text = segment["text_tn"]
            if any(m in text for m in
                   ("<SIL>", "<NOISE>", "<MUSIC>", "<OTHER>")):
                continue
            for ori, rpl in (repl_wo if remove_punct else repl_w):
                text = text.replace(ori, rpl)
            transcript.write(text.lower() + "\n")
PYEOF

echo "Learning the subword model..."
if python3 -c "import sentencepiece" 2>/dev/null; then
    python3 - "$LOCAL_TRANSCRIPT" "$THIS_DIR/spm" <<'PYEOF'
import sys
import sentencepiece as spm
spm.SentencePieceTrainer.train(
    input=sys.argv[1], model_prefix=sys.argv[2], vocab_size=10000,
    character_coverage=1.0, model_type="unigram")
PYEOF
    cp $THIS_DIR/spm.model $DATA_PATH/spm.model
    cp $THIS_DIR/spm.vocab $DATA_PATH/spm.vocab
    rm $THIS_DIR/spm.model $THIS_DIR/spm.vocab
else
    echo "sentencepiece unavailable; learning 10k BPE via neurst_tpu.cli.learn_bpe"
    python3 -m neurst_tpu.cli.learn_bpe \
        --input $LOCAL_TRANSCRIPT --symbols 10000 \
        --output $DATA_PATH/codes.bpe \
        --write_vocabulary $DATA_PATH/vocab.txt
    echo "NOTE: switch asr_data_prep.yml's subtokenizer to bpe paths."
fi
rm $LOCAL_TRANSCRIPT

ASR_OUTPUT_PATH=$DATA_PATH/asr
mkdir -p $ASR_OUTPUT_PATH/train
sed -e "s#DATA_PATH#${DATA_PATH}#g" -e "s#SUBSET#${SUBSET}#g" \
    -e "s#REMOVE_PUNCTUATION#${REMOVE_PUNCTUATION}#g" \
    $THIS_DIR/asr_data_prep.yml > $ASR_OUTPUT_PATH/asr_data_prep.yml

rm -f FAILED
if [[ $SUBSET == "XS" ]]; then
    nice -n 10 python3 -m neurst_tpu.cli.create_records \
        --processor_id 0 --num_processors 1 \
        --num_output_shards 1 \
        --output_range_begin 0 --output_range_end 1 \
        --output_template $ASR_OUTPUT_PATH/train/train.tfrecords-%5.5d-of-%5.5d \
        --config_paths $ASR_OUTPUT_PATH/asr_data_prep.yml
else
    PROCESSORS_IN_PARALLEL=8
    NUM_PROCESSORS=32
    TOTAL_SHARDS=256
    SHARD_PER_PROCESS=$((TOTAL_SHARDS / NUM_PROCESSORS))
    LOOP=$((NUM_PROCESSORS / PROCESSORS_IN_PARALLEL))
    for loopid in $(seq 1 ${LOOP}); do
        start=$(($((loopid - 1)) * ${PROCESSORS_IN_PARALLEL}))
        end=$(($start + PROCESSORS_IN_PARALLEL - 1))
        for procid in $(seq $start $end); do
            nice -n 10 python3 -m neurst_tpu.cli.create_records \
                --processor_id $procid --num_processors $NUM_PROCESSORS \
                --num_output_shards $TOTAL_SHARDS \
                --output_range_begin "$((SHARD_PER_PROCESS * procid))" \
                --output_range_end "$((SHARD_PER_PROCESS * procid + SHARD_PER_PROCESS))" \
                --output_template $ASR_OUTPUT_PATH/train/train.tfrecords-%5.5d-of-%5.5d \
                --config_paths $ASR_OUTPUT_PATH/asr_data_prep.yml || touch FAILED &
        done
        wait
        ! [[ -f FAILED ]]
    done
fi
