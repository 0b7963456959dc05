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
"""Compound-split tokenized BLEU (fairseq-style).

Parity: /root/reference/neurst/metrics/compound_split_bleu.py — splits
hyphen/dash compounds before tokenized BLEU, matching fairseq's
``--scoring sacrebleu --tokenizer ...`` compound-split convention used
for WMT en-de comparisons.
"""

import re

from neurst_tpu.metrics.bleu import BLEU
from neurst_tpu.metrics.metric import register_metric

__all__ = ["CompoundSplitBleu"]


def compound_split(text: str) -> str:
    """Splits compounds joined by dashes: 'rich-text' -> 'rich ##AT##-##AT## text'
    is fairseq's convention; for scoring we simply surround dashes with
    spaces (equivalent for n-gram matching)."""
    text = re.sub(r"(\S)-(\S)", r"\1 ##AT##-##AT## \2", text)
    return text


@register_metric("compound_split_bleu")
class CompoundSplitBleu(BLEU):

    def call(self, hypothesis, groundtruth=None):
        hyp = [compound_split(h) for h in hypothesis]
        if groundtruth and isinstance(groundtruth[0], (list, tuple)):
            refs = [[compound_split(r) for r in rs] for rs in groundtruth]
        else:
            refs = [compound_split(r) for r in groundtruth]
        out = super().call(hyp, refs)
        return {"CompoundSplitBleu": out["BLEU"],
                "UncasedCompoundSplitBleu": out["UncasedBLEU"]}

    def __init__(self, args=None, language="en"):
        super().__init__(args, language)
        self._flag = "CompoundSplitBleu"
