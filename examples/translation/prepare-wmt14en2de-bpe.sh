#!/usr/bin/env bash
# Copyright 2026 The NeurST-TPU Authors. Licensed under Apache-2.0.
#
# WMT14 En->De data preparation, BPE variant.
# Parity: /root/reference/examples/translation/prepare-wmt14en2de-bpe.sh
# but fully self-contained: moses tokenization + punctuation
# normalization run through `neurst_tpu.cli.process_text` (sacremoses)
# and joint-BPE learning through `neurst_tpu.cli.learn_bpe` — no
# MOSES_DIR checkout and no external subword-nmt needed.
#
# Usage: ./prepare-wmt14en2de-bpe.sh [DATA_PATH]
set -e

THIS_DIR="$( cd "$( dirname "$0" )" && pwd )"
DATA_PATH=${1:-wmt14_en_de}
mkdir -p ${DATA_PATH}
DATA_PATH="$( cd "$DATA_PATH" && pwd )"

# 1) download data
python3 $THIS_DIR/download_wmt14en2de.py --output_dir $DATA_PATH

TRAIN_SRC=$DATA_PATH/train.en.txt
TRAIN_TRG=$DATA_PATH/train.de.txt

# 2) shuffle the training corpus (paired: same permutation both sides)
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

# 3) normalize + tokenize
echo "pre-processing train data..."
tokenize() {
    # INP LANG OUT
    python3 -m neurst_tpu.cli.process_text \
        --tokenizer moses --language $2 --normalize_punctuation \
        --input $1 --output $3
}
tokenize $TRAIN_SRC en $DATA_PATH/train.en.tok.txt &
tokenize $TRAIN_TRG de $DATA_PATH/train.de.tok.txt &
wait

# 4) learn joint 40k BPE + per-language vocabularies
echo "learn joint 40k BPE..."
python3 -m neurst_tpu.cli.learn_bpe \
    --input $DATA_PATH/train.en.tok.txt $DATA_PATH/train.de.tok.txt \
    --symbols 40000 \
    --output $DATA_PATH/codes.bpe \
    --write_vocabulary $DATA_PATH/vocab.en $DATA_PATH/vocab.de

# 5) apply BPE to the training corpus (train data is stored processed;
#    dev/test stay raw — the TextDataPipeline applies BPE on the fly)
echo "apply BPE..."
python3 -m neurst_tpu.cli.process_text \
    --tokenizer bpe --subtokenizer_codes $DATA_PATH/codes.bpe \
    --input $DATA_PATH/train.en.tok.txt \
    --output $DATA_PATH/train.en.tok.bpe.txt &
python3 -m neurst_tpu.cli.process_text \
    --tokenizer bpe --subtokenizer_codes $DATA_PATH/codes.bpe \
    --input $DATA_PATH/train.de.tok.txt \
    --output $DATA_PATH/train.de.tok.bpe.txt &
wait

# 6) emit ready-to-run configs next to the data
cp $THIS_DIR/training_args.yml $DATA_PATH/training_args.yml

cat $THIS_DIR/validation_args.yml | \
    sed "s#DEV_SRC#$DATA_PATH/newstest2013.en.txt#" | \
    sed "s#DEV_TRG#$DATA_PATH/newstest2013.de.txt#" \
    > $DATA_PATH/validation_args.yml

cat $THIS_DIR/prediction_args.yml | \
    sed "s#DEV_SRC#$DATA_PATH/newstest2013.en.txt#" | \
    sed "s#DEV_TRG#$DATA_PATH/newstest2013.de.txt#" | \
    sed "s#TEST_SRC#$DATA_PATH/newstest2014.en.txt#" | \
    sed "s#TEST_TRG#$DATA_PATH/newstest2014.de.txt#" \
    > $DATA_PATH/prediction_args.yml

cat $THIS_DIR/task_args_bpe.yml | \
    sed "s#codes.bpe#$DATA_PATH/codes.bpe#" | \
    sed "s#vocab.en#$DATA_PATH/vocab.en#" | \
    sed "s#vocab.de#$DATA_PATH/vocab.de#" \
    > $DATA_PATH/task_args.yml
cat >> $DATA_PATH/task_args.yml <<EOF

dataset.class: ParallelTextDataset
dataset.params:
  src_file: $DATA_PATH/train.en.tok.bpe.txt
  trg_file: $DATA_PATH/train.de.tok.bpe.txt
  data_is_processed: true
EOF

echo "Done. Train with:"
echo "  python3 -m neurst_tpu.cli.run_exp \\"
echo "      --config_paths $DATA_PATH/task_args.yml,$DATA_PATH/training_args.yml,$DATA_PATH/validation_args.yml \\"
echo "      --model_dir $DATA_PATH/ckpt"
