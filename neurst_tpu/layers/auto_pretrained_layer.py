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
"""Pretrained-trunk loading helpers.

Parity: /root/reference/neurst/layers/auto_pretrained_layer.py — the
reference wraps a HuggingFace model as a Keras layer.  The functional
equivalent here: resolve a local HF checkpoint through the matching
converter and graft it into a model's parameter tree by name
(``load_pretrained_into``), optionally under a sub-tree prefix (e.g.
CTNMT's ``bert/``).
"""

import logging
from typing import Optional

__all__ = ["load_pretrained_flat", "load_pretrained_into"]

_CONVERTER_BY_KIND = {
    "bert": "google_bert",
    "gpt2": "openai_gpt2",
    "wav2vec2": "fairseq_wav2vec2",
    "fairseq": "fairseq_transformer",
}


def load_pretrained_flat(checkpoint_path: str, kind: str,
                         num_heads: Optional[int] = None) -> dict:
    """HF/fairseq torch checkpoint -> our flat name->array mapping."""
    from neurst_tpu.utils.converters.converter import build_converter
    params = {}
    if num_heads:
        params["num_heads"] = num_heads
    converter = build_converter({
        "converter.class": _CONVERTER_BY_KIND.get(kind, kind),
        "converter.params": params})
    return converter.convert_to_flat(checkpoint_path)


def load_pretrained_into(model_params, checkpoint_path: str, kind: str,
                         num_heads: Optional[int] = None,
                         to_prefix: Optional[str] = None):
    """Grafts a pretrained trunk into ``model_params`` by name.

    ``to_prefix`` relocates the foreign names under a sub-tree, e.g.
    ``to_prefix="bert/"`` to fill CTNMT's fused BERT encoder.
    Returns the updated parameter pytree.
    """
    from neurst_tpu.utils.checkpoints import restore_into
    flat = load_pretrained_flat(checkpoint_path, kind, num_heads)
    if to_prefix:
        flat = {to_prefix + name: value for name, value in flat.items()}
    new_params, restored, _ = restore_into(model_params, flat)
    logging.info("Grafted %d pretrained parameters from %s", len(restored),
                 checkpoint_path)
    return new_params
