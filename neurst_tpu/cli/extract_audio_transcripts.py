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
"""Dump transcripts/translations from an audio corpus or record files
(parity: neurst/cli/extract_audio_transcripts.py)."""

import argparse
import logging

import neurst_tpu  # noqa: F401
from neurst_tpu.cli.run_exp import parse_and_merge
from neurst_tpu.data.datasets.dataset import build_dataset
from neurst_tpu.utils.flags_core import get_argv_dict


def main(argv=None):
    import sys
    logging.basicConfig(level=logging.INFO)
    argv = argv if argv is not None else sys.argv[1:]
    argv_dict, _ = get_argv_dict(argv)
    args = parse_and_merge(argv)
    dataset = build_dataset(args)
    # --output_*_file are the reference's flag names
    # (neurst/cli/extract_audio_transcripts.py); both spellings work
    transcript_file = (argv_dict.get("transcript_file")
                       or argv_dict.get("output_transcript_file"))
    translation_file = (argv_dict.get("translation_file")
                        or argv_dict.get("output_translation_file"))
    ft = open(transcript_file, "w", encoding="utf-8") \
        if transcript_file else None
    fl = open(translation_file, "w", encoding="utf-8") \
        if translation_file else None
    n = 0
    for ex in dataset.build_iterator()():
        if ft is not None and "transcript" in ex:
            t = ex["transcript"]
            ft.write((t if isinstance(t, str) else " ".join(map(str, t)))
                     + "\n")
        if fl is not None and "translation" in ex:
            t = ex["translation"]
            fl.write((t if isinstance(t, str) else " ".join(map(str, t)))
                     + "\n")
        n += 1
    logging.info("Extracted %d examples", n)
    for f in (ft, fl):
        if f:
            f.close()


if __name__ == "__main__":
    main()
