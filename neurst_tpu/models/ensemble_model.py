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
"""Decode-time model ensembling.

Parity: /root/reference/neurst/models/encoder_decoder_ensemble_model.py
— N restored models with per-model caches; each step combines the
member probabilities in probability space with optional weights
(beam_search.py:98-114).  The combined ``logits`` returned to the
search are exact log-probabilities (log of the weighted prob mixture),
which pass through the search's log_softmax unchanged.
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["EncoderDecoderEnsembleModel"]


class EncoderDecoderEnsembleModel(object):
    """Wraps [(model_spec, params), ...] behind the generation contract."""

    def __init__(self, models: List, params_list: List,
                 weights: Optional[Sequence[float]] = None):
        assert len(models) == len(params_list) and models
        self._models = models
        self._params_list = params_list
        if weights is None:
            weights = [1.0 / len(models)] * len(models)
        total = sum(weights)
        self._weights = [w / total for w in weights]
        self._trg_meta = models[0].trg_meta

    @property
    def trg_meta(self):
        return self._trg_meta

    def init_params(self, rng):
        return self._params_list

    def prepare_generation(self, params_list, inputs,
                           decode_padded_length: int):
        if params_list is None:
            params_list = self._params_list
        fns, inits = [], []
        for model, params in zip(self._models, params_list):
            fn, init = model.prepare_generation(params, inputs,
                                                decode_padded_length)
            fns.append(fn)
            inits.append(init)
        cache = {f"model_{i}": init["decoder_internal_cache"]
                 for i, init in enumerate(inits)}

        def symbols_to_logits_fn(ids, cache, time):
            # the shared beam ancestor matrix (cache indirection) lives
            # at the ensemble's top level and is fanned into each
            # member's cache; member copies are stripped on the way out
            # so the loop-carry structure stays fixed
            anc = cache.get("beam_anc")
            new_cache = {} if anc is None else {"beam_anc": anc}
            probs = None
            for i, fn in enumerate(fns):
                cache_i = cache[f"model_{i}"]
                if anc is not None:
                    cache_i = dict(cache_i, beam_anc=anc)
                logits_i, cache_i = fn(ids, cache_i, time)
                new_cache[f"model_{i}"] = {
                    k: v for k, v in cache_i.items() if k != "beam_anc"}
                p = jax.nn.softmax(logits_i.astype(jnp.float32), axis=-1)
                probs = p * self._weights[i] if probs is None \
                    else probs + p * self._weights[i]
            return jnp.log(jnp.maximum(probs, 1e-20)), new_cache

        generation_initializer = dict(inits[0])
        generation_initializer["decoder_internal_cache"] = cache
        # every member must honor beam_anc (a mixed ensemble with e.g.
        # a LightConv member falls back to the physical reorder)
        generation_initializer["beam_cache_indirection_ok"] = all(
            init.get("beam_cache_indirection_ok") for init in inits)
        return symbols_to_logits_fn, generation_initializer
