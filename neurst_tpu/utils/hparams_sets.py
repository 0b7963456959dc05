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
"""Named hyper-parameter bundles.

Parity with ``/root/reference/neurst/utils/hparams_sets.py``: an hparams
set is a function returning a full config dict (model + optimizer + lr
schedule).  Unknown names fall back to asking every registered model's
``build_model_args_by_name`` (this resolves parametric names like
``transformer_512_6e_6d_8h_dp0.1``).
"""

import logging
from typing import Callable, Dict, Optional

__all__ = ["register_hparams_set", "get_hyper_parameters"]

_HPARAMS_SETS: Dict[str, Callable[[], dict]] = {}


def register_hparams_set(name):
    """Decorator: ``@register_hparams_set("transformer_base")``."""
    def wrap(fn):
        if name in _HPARAMS_SETS:
            raise LookupError(f"hparams set '{name}' already registered")
        _HPARAMS_SETS[name] = fn
        return fn
    return wrap


def get_hyper_parameters(name: Optional[str]) -> dict:
    """Resolves an hparams-set name to a config dict ({} if name is None)."""
    if not name:
        return {}
    if name in _HPARAMS_SETS:
        return _HPARAMS_SETS[name]() or {}
    # fallback: parametric names understood by a model class
    from neurst_tpu.utils.registry import REGISTRIES
    seen = set()
    for cls in (REGISTRIES.get("model") or {}).values():
        if cls in seen:
            continue
        seen.add(cls)
        fn = getattr(cls, "build_model_args_by_name", None)
        if fn is None:
            continue
        try:
            params = fn(name)
        except Exception:
            params = None
        if params:
            logging.info("hparams_set '%s' resolved by %s", name, cls.__name__)
            return params
    raise LookupError(f"Unknown hparams set: {name}")


def registered_hparams_names():
    return sorted(_HPARAMS_SETS.keys())
