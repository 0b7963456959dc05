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
"""Checkpoint conversion CLI (parity: neurst/cli/convert_checkpoint.py)."""

import argparse
import logging

import neurst_tpu  # noqa: F401  (registers converters)
from neurst_tpu.utils.converters.converter import build_converter


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Convert a public checkpoint.")
    p.add_argument("--converter", required=True,
                   help="fairseq_transformer / openai_gpt2 / google_bert ...")
    p.add_argument("--from_path", required=True,
                   help="The foreign checkpoint path (.pt/.bin).")
    p.add_argument("--to_path", required=True,
                   help="Output directory for the converted checkpoint.")
    p.add_argument("--num_heads", type=int, default=None,
                   help="Attention head count for fused-projection "
                        "reshapes.")
    args = p.parse_args(argv)
    params = {}
    if args.num_heads:
        params["num_heads"] = args.num_heads
    converter = build_converter({"converter.class": args.converter,
                                 "converter.params": params})
    path = converter.convert(args.from_path, args.to_path)
    logging.info("Converted checkpoint written to %s", path)


if __name__ == "__main__":
    main()
