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
"""Sequence search base + registry.

Parity: /root/reference/neurst/layers/search/sequence_search.py.  A
search layer binds to a model spec and maps parsed inputs to hypothesis
id arrays; the concrete searches (beam, sampling) are registered under
the ``search_method`` registry.
"""

from neurst_tpu.utils.registry import setup_registry

__all__ = ["SequenceSearch", "build_search_layer", "register_search_layer"]


class SequenceSearch(object):

    def __init__(self, args=None):
        self._args = dict(args or {})
        self._model = None

    @property
    def args(self):
        return self._args

    def set_model(self, model):
        self._model = model

    def prepare(self):
        """Host-side setup before the search is jitted (e.g. loading a
        draft model's checkpoint) — must NOT run under a trace."""

    @staticmethod
    def class_or_method_args():
        return []

    def __call__(self, params, parsed_inp: dict):
        """Returns (hypotheses [B*top_k, L], scores [B*top_k])."""
        raise NotImplementedError


def _create_search(cls, args, **kwargs):
    return cls(args, **kwargs)


build_search_layer, register_search_layer = setup_registry(
    "search_method", base_class=SequenceSearch, create_fn=_create_search)
