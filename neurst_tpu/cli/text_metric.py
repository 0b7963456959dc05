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
"""Standalone metric computation CLI (parity: neurst/cli/text_metric.py)."""

import argparse

import neurst_tpu  # noqa: F401
from neurst_tpu.metrics.metric import build_metric


def main(argv=None):
    p = argparse.ArgumentParser(description="Score hypotheses vs refs.")
    p.add_argument("--metric", default="bleu",
                   help="bleu/sacre_bleu/wer/compound_split_bleu/...")
    p.add_argument("--language", default="en")
    p.add_argument("--hypo_file", required=True)
    p.add_argument("--ref_file", required=True, nargs="+")
    args = p.parse_args(argv)

    with open(args.hypo_file, encoding="utf-8") as f:
        hyps = [line.strip() for line in f]
    refs_streams = []
    for rf in args.ref_file:
        with open(rf, encoding="utf-8") as f:
            refs_streams.append([line.strip() for line in f])
    if len(refs_streams) == 1:
        refs = refs_streams[0]
    else:
        refs = [list(rs) for rs in zip(*refs_streams)]
    metric = build_metric({"metric.class": args.metric,
                           "metric.params": {"language": args.language}})
    print(metric(hyps, refs))


if __name__ == "__main__":
    main()
