# Copyright 2026 The NeurST-TPU Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
"""Text (de)tokenization CLI (parity: neurst/cli/process_text.py)."""

import argparse
import sys

import neurst_tpu  # noqa: F401
from neurst_tpu.data.text.tokenizer import build_tokenizer_by_name


def main(argv=None):
    p = argparse.ArgumentParser(description="Tokenize/detokenize text.")
    p.add_argument("--tokenizer", required=True,
                   help="moses/bpe/character/jieba/spm/...")
    p.add_argument("--language", default="en")
    p.add_argument("--subtokenizer_codes", default=None,
                   help="BPE codes / spm model path.")
    p.add_argument("--detokenize", action="store_true")
    p.add_argument("--normalize_punctuation", action="store_true",
                   help="Normalize punctuation before tokenizing "
                        "(replaces the moses normalize-punctuation + "
                        "remove-non-printing-char perl stages used by "
                        "the reference recipes).")
    p.add_argument("--input", default=None, help="Input file (else stdin).")
    p.add_argument("--output", default=None,
                   help="Output file (else stdout).")
    args = p.parse_args(argv)

    normalize = None
    if args.normalize_punctuation:
        import re

        import sacremoses
        norm = sacremoses.MosesPunctNormalizer(lang=args.language)
        nonprint = re.compile(r"[\x00-\x08\x0b-\x1f\x7f-\x9f]")

        def normalize(s):
            return nonprint.sub("", norm.normalize(s))

    tok = build_tokenizer_by_name(args.tokenizer, language=args.language)
    if args.subtokenizer_codes:
        tok.init_subtokenizer(args.subtokenizer_codes)
    fin = open(args.input, encoding="utf-8") if args.input else sys.stdin
    fout = open(args.output, "w", encoding="utf-8") if args.output \
        else sys.stdout
    for line in fin:
        line = line.rstrip("\n")
        if normalize is not None:
            line = normalize(line)
        if args.detokenize:
            fout.write(tok.detokenize(line, return_str=True) + "\n")
        else:
            fout.write(tok.tokenize(line, return_str=True) + "\n")


if __name__ == "__main__":
    main()
