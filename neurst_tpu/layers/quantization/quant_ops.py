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
"""Quantization-aware training ops.

Parity: /root/reference/neurst/layers/quantization/quant_layers.py — the
reference wraps Keras layers with per-weight fake-quantizers driven by a
class-global config (``--enable_quant --quant_params``).  TPU-first
redesign: fake quantization is a *functional transform over the
parameter pytree* applied inside the jitted train step (and at export),
with straight-through gradients; no layer wrappers needed, so every
model is quantizable unchanged.
"""

import re
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["fake_quant", "quantize_params_fn", "quantize_weights"]


def fake_quant(x, bits: int = 8, clip_max=None):
    """Symmetric uniform fake-quantization with straight-through grad."""
    if clip_max is None:
        clip_max = jnp.max(jnp.abs(x)) + 1e-9
    levels = float(2 ** (bits - 1) - 1)
    scale = clip_max / levels
    clipped = jnp.clip(x, -clip_max, clip_max)
    q = jnp.round(clipped / scale) * scale
    # straight-through: forward q, gradient of identity (w.r.t. clipped)
    return clipped + jax.lax.stop_gradient(q - clipped)


def quantize_weights(params, bits: int = 8,
                     weight_pattern: str = r"(kernel|weights)$"):
    """Fake-quantizes matching leaves of the parameter pytree."""
    from neurst_tpu.utils.checkpoints import flatten_params, unflatten_params
    pat = re.compile(weight_pattern)
    flat = flatten_params(params)
    out = {}
    for name, w in flat.items():
        if pat.search(name) and hasattr(w, "ndim") and w.ndim >= 2:
            out[name] = fake_quant(w, bits)
        else:
            out[name] = w
    return unflatten_params(out)


def quantize_params_fn(enable: bool, quant_params: Optional[dict] = None):
    """Returns the params transform used by the train step / export:
    identity when disabled."""
    if not enable:
        return lambda p: p
    quant_params = quant_params or {}
    bits = int(quant_params.get("quant_bits") or 8)
    pattern = quant_params.get("weight_pattern") or r"(kernel|weights)$"
    return lambda p: quantize_weights(p, bits, pattern)
