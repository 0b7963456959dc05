#!/usr/bin/env bash
# Parity: reference examples/iwslt21/scripts/evaluate_mt.sh —
# downloads the released devtest files and decodes with this
# framework (reference checkpoints must be converted first via
# convert_checkpoint --converter neurst_transformer).
# Usage: ./evaluate_mt.sh TEST_SET MODEL_DIR OUTPUT_PATH
set -e
if [[ ! -n "$3" ]]; then
    echo "Usage: ./evaluate_mt.sh TEST_SET MODEL_DIR OUTPUT_PATH"
    echo "TEST_SET: mustc-{v1,v2}-{dev,tst}[-tc]"
    exit 1
fi
TEST_SET=$1
MODEL_DIR=$2
OUTPUT_PATH=$3
URL_PREFIX="http://lf3-nlp-opensource.bytetos.com/obj/nlp-opensource/neurst/iwslt21/offline"
DATA_URL_PREFIX="${URL_PREFIX}/devtests"
case $TEST_SET in
    "mustc-v1-dev")    SRC_FILE="mustc_v1.0_en-de.dev.tagen.txt";        TRG_FILE="mustc_v1.0_en-de.dev.de.txt";;
    "mustc-v1-tst")    SRC_FILE="mustc_v1.0_en-de.tst-COMMON.tagen.txt"; TRG_FILE="mustc_v1.0_en-de.tst-COMMON.de.txt";;
    "mustc-v2-dev")    SRC_FILE="mustc_v2.0_en-de.dev.tagen.txt";        TRG_FILE="mustc_v2.0_en-de.dev.de.txt";;
    "mustc-v2-tst")    SRC_FILE="mustc_v2.0_en-de.tst-COMMON.tagen.txt"; TRG_FILE="mustc_v2.0_en-de.tst-COMMON.de.txt";;
    "mustc-v1-dev-tc") SRC_FILE="mustc_v1.0_en-de.dev.en.txt";           TRG_FILE="mustc_v1.0_en-de.dev.de.txt";;
    "mustc-v1-tst-tc") SRC_FILE="mustc_v1.0_en-de.tst-COMMON.en.txt";    TRG_FILE="mustc_v1.0_en-de.tst-COMMON.de.txt";;
    "mustc-v2-dev-tc") SRC_FILE="mustc_v2.0_en-de.dev.en.txt";           TRG_FILE="mustc_v2.0_en-de.dev.de.txt";;
    "mustc-v2-tst-tc") SRC_FILE="mustc_v2.0_en-de.tst-COMMON.en.txt";    TRG_FILE="mustc_v2.0_en-de.tst-COMMON.de.txt";;
    *) echo "Unknown TEST_SET: $TEST_SET"; exit 1;;
esac
mkdir -p $OUTPUT_PATH
for f in $SRC_FILE $TRG_FILE; do
    [[ -f $OUTPUT_PATH/$f ]] || curl -L -o $OUTPUT_PATH/$f ${DATA_URL_PREFIX}/$f
done
python3 -m neurst_tpu.cli.run_exp --entry predict \
    --model_dir $MODEL_DIR \
    --dataset ParallelTextDataset \
    --src_file $OUTPUT_PATH/$SRC_FILE --trg_file $OUTPUT_PATH/$TRG_FILE \
    --search_method beam_search \
    --search_method.params "{beam_size: 4, length_penalty: 0.6, maximum_decode_length: 200}" \
    --metric bleu \
    --output_file $OUTPUT_PATH/${TEST_SET}.hypo.txt
