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
"""Checkpoint converter abstraction.

Parity: /root/reference/neurst/utils/converters/ — a Converter maps a
public checkpoint (fairseq / google-BERT / OpenAI GPT-2 / wav2vec2)
into this framework's flat name->array mapping, used by pretrain
restore (``--pretrain_model``) and the ``convert_checkpoint`` CLI.
"""

from typing import Dict

import numpy as np

from neurst_tpu.utils.registry import setup_registry

__all__ = ["Converter", "build_converter", "register_converter"]


class Converter(object):

    def __init__(self, args=None):
        self._args = dict(args or {})

    @staticmethod
    def class_or_method_args():
        return []

    def convert_to_flat(self, from_path: str) -> Dict[str, np.ndarray]:
        """Loads the foreign checkpoint and returns our flat mapping."""
        raise NotImplementedError

    def convert(self, from_path: str, to_path: str, step: int = 0):
        """from foreign checkpoint -> our npz checkpoint dir."""
        from neurst_tpu.utils.checkpoints import (save_checkpoint,
                                                  unflatten_params)
        flat = self.convert_to_flat(from_path)
        return save_checkpoint(to_path, step, unflatten_params(flat),
                               max_to_keep=None)

    @staticmethod
    def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
        """Loads a .pt/.bin torch checkpoint to numpy arrays."""
        import torch
        state = torch.load(path, map_location="cpu", weights_only=False)
        for key in ("model", "state_dict", "model_state_dict"):
            if isinstance(state, dict) and key in state \
                    and isinstance(state[key], dict):
                state = state[key]
                break
        return {k: np.asarray(v.detach().cpu().numpy())
                if hasattr(v, "detach") else np.asarray(v)
                for k, v in state.items()
                if hasattr(v, "shape") or isinstance(v, np.ndarray)}


def _create_converter(cls, args, **kwargs):
    return cls(args, **kwargs)


build_converter, register_converter = setup_registry(
    "converter", base_class=Converter, create_fn=_create_converter)
