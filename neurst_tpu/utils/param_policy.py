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
"""Parameter storage-dtype policy for inference.

Checkpoints store float32 parameters (reference parity: TF
mixed_float16 keeps f32 variables), but a bfloat16-compute model casts
every dense kernel, bias and embedding table to bf16 *at use* — so
serving from f32-at-rest params doubles the weight HBM reads of every
decode step for zero numeric benefit.  ``cast_params_for_inference``
stores those leaves in bf16 once, after restore: outputs are BITWISE
identical for the transformer families because the cast the use site
was going to perform has simply been hoisted.

Leaves consumed in float32 keep f32 storage:
  * LayerNorm / GroupNorm ``scale``/``bias`` (f32 statistics path,
    common_layers.LayerNorm);
  * learned QAT clip scalars ``*_clip_max`` (quant_layers);
and the whole cast is skipped for f32-compute models and under
``--enable_quant`` (fake quantization reads f32 kernels).
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cast_params_for_inference", "restore_inference_params"]


def restore_inference_params(model, params, flat):
    """One-stop checkpoint->serving-params path, shared by EVERY
    inference entry (predict single/ensemble/draft, evaluator,
    sequence evaluator, export): applies int8 weight-only quantization
    when ``--int8_serving`` is on (the template's kernel_q/kernel_scale
    leaves drive it — restoring a raw f32 dict into an int8 template
    would silently keep the zero placeholders), then restores, then
    stores bf16-at-rest weights for bf16-compute models.

    Returns (params, missing_names)."""
    from neurst_tpu.layers.quantization.quant_layers import (
        int8_serving_enabled, int8ify_flat_params)
    from neurst_tpu.utils import checkpoints as ckpt_lib
    if int8_serving_enabled():
        flat = int8ify_flat_params(flat, ckpt_lib.flatten_params(params))
    params, _, missing = ckpt_lib.restore_into(params, flat)
    params = cast_params_for_inference(
        params, (getattr(model, "args", None) or {}).get("dtype"))
    # commit every leaf to the device ONCE: checkpoint restore yields
    # host numpy arrays, and leaves the bf16 cast skips (int8 kernel_q,
    # f32 *_scale) would otherwise be re-transferred on every jitted
    # call — measured 43x on the int8 serving path over the tunnel
    # (host->device is the serving-latency tax the at-rest dtypes
    # exist to avoid)
    params = jax.tree_util.tree_map(
        lambda v: jax.device_put(v) if hasattr(v, "dtype") else v, params)
    return params, missing

_BF16_NAMES = ("bfloat16", "bf16")


def _is_float32(x) -> bool:
    dt = getattr(x, "dtype", None)
    return dt is not None and np.dtype(dt) == np.float32


def cast_params_for_inference(params, model_dtype: Any):
    """Casts weight leaves of ``params`` to bf16 storage when the model
    computes in bf16 (no-op otherwise, and under QAT)."""
    name = model_dtype if isinstance(model_dtype, str) \
        else jnp.dtype(model_dtype).name
    if (name or "").lower() not in _BF16_NAMES:
        return params
    from neurst_tpu.layers.quantization.quant_layers import quant_enabled
    if quant_enabled():
        return params

    def walk(node):
        if not isinstance(node, dict):
            return node
        is_norm = "scale" in node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif v is None or not _is_float32(v):
                out[k] = v
            elif k.endswith("_clip_max") or k.endswith("_scale") \
                    or (is_norm and k in ("scale", "bias")):
                out[k] = v
            else:
                out[k] = jnp.asarray(v).astype(jnp.bfloat16)
        return out

    return walk(params)
