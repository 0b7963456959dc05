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
"""Quantization-aware training with learned clip-max variables.

Parity: /root/reference/neurst/layers/quantization/quant_layers.py:18-207
— min/max fake quantization (Jacob et al., arXiv:1712.05877) driven by a
process-global config (``--enable_quant --quant_params``):

  * every quantized weight gets a trainable scalar ``<name>_clip_max``
    (init ``quant_weight_clip_max``); the symmetric minimum is
    ``-max * B / (B - 1)`` with ``B = 2^(bits-1)``;
  * every quantized activation gets a trainable ``<name>_clip_max``
    (init ``quant_act_clip_max``); relu outputs clip at [0, max],
    softmax outputs use the fixed range [0, (2^b - 1) / 2^b];
  * straight-through gradients: the rounding is invisible to autodiff,
    the clip boundaries pass gradient to the clip variables.

TPU-first shape: the quantizers live inside ``QuantDenseGeneral`` (an
einsum dense that keeps flax's kernel/bias names, shapes and partition
annotations, so checkpoints and converters are unaffected); construction
sites pick it over ``nn.DenseGeneral`` when the global config is on.
The reference's L2 regularizers on the clip variables (0.001 weights /
0.01 activations) are reproduced by ``clip_l2_penalty`` added to the
training loss.
"""

import logging
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["global_init", "get_global_config", "quant_enabled",
           "fake_quant_minmax", "QuantDenseGeneral", "dense_general",
           "clip_l2_penalty", "set_int8_serving", "int8_serving_enabled",
           "Int8DenseGeneral", "int8ify_flat_params",
           "set_int8_calibration", "calibrate_int8_act_scales",
           "write_calibrated_act_scales"]

_CONFIG = {
    "enable_quant": False,
    "quant_strategy": "min/max",
    "quant_bits": 8,
    "quant_weight_clip_max": 1.0,
    "quant_act_clip_max": 16.0,
}


def global_init(enable_quant, quant_strategy="min/max", quant_bits=8,
                quant_weight_clip_max=1.0, quant_act_clip_max=16.0,
                **kwargs):
    """Sets the process-global quantization config (parity:
    QuantLayer.global_init, quant_layers.py:27-49).  Must run before
    the model is built (both init and apply see the same config)."""
    _CONFIG["enable_quant"] = bool(enable_quant)
    if enable_quant:
        if quant_strategy != "min/max":
            raise ValueError(
                "Only min/max quantization is supported currently.")
        _CONFIG["quant_strategy"] = quant_strategy
        _CONFIG["quant_bits"] = int(quant_bits)
        _CONFIG["quant_weight_clip_max"] = float(quant_weight_clip_max)
        _CONFIG["quant_act_clip_max"] = float(quant_act_clip_max)
        logging.info("Enable min/max quantization: bits=%d "
                     "weight_clip_max=%s act_clip_max=%s", quant_bits,
                     quant_weight_clip_max, quant_act_clip_max)
    if kwargs:
        logging.info("Unknown args of quantization: %s", kwargs)


def get_global_config():
    return dict(_CONFIG)


def quant_enabled() -> bool:
    return bool(_CONFIG["enable_quant"])


def fake_quant_minmax(x, clip_min, clip_max, bits: int):
    """Uniform fake quantization over [clip_min, clip_max] with
    straight-through gradients (rounding transparent; clip boundaries
    pass gradient to the clip variables, matching
    tf.fake_quant_with_min_max_vars)."""
    x32 = x.astype(jnp.float32)
    clip_min = jnp.asarray(clip_min, jnp.float32)
    clip_max = jnp.asarray(clip_max, jnp.float32)
    scale = (clip_max - clip_min) / float(2 ** bits - 1)
    scale = jnp.maximum(scale, 1e-9)
    clipped = jnp.clip(x32, clip_min, clip_max)
    q = jnp.round((clipped - clip_min) / scale) * scale + clip_min
    return (clipped + jax.lax.stop_gradient(q - clipped)).astype(x.dtype)


def _weight_quant(module: nn.Module, w, name: str):
    cfg = _CONFIG
    clip = module.param(
        f"{name}_clip_max",
        lambda key: jnp.asarray(cfg["quant_weight_clip_max"], jnp.float32))
    cmax = jnp.maximum(clip, 0.0)
    bits_tmp = float(2 ** (cfg["quant_bits"] - 1))
    cmin = -cmax * bits_tmp / (bits_tmp - 1.0)
    return fake_quant_minmax(w, cmin, cmax, cfg["quant_bits"])


def _act_quant(module: nn.Module, x, name: str, activation: str):
    cfg = _CONFIG
    bits = cfg["quant_bits"]
    if activation == "softmax":
        cmax = float(2 ** bits - 1) / float(2 ** bits)
        return fake_quant_minmax(x, 0.0, cmax, bits)
    clip = module.param(
        f"{name}_clip_max",
        lambda key: jnp.asarray(cfg["quant_act_clip_max"], jnp.float32))
    cmax = jnp.maximum(clip, 0.0)
    if activation == "relu":
        cmin = 0.0
    else:  # generic activation: symmetric
        bits_tmp = float(2 ** (bits - 1))
        cmin = -cmax * bits_tmp / (bits_tmp - 1.0)
    return fake_quant_minmax(x, cmin, cmax, bits)


class QuantDenseGeneral(nn.Module):
    """Einsum dense with weight + output-activation fake quantization.

    Drop-in for the two ``nn.DenseGeneral`` configurations this
    framework uses (last-axis projection to a feature tuple, and
    (-2, -1)-axis contraction to a scalar feature), with identical
    kernel/bias parameter names, shapes and partition metadata."""

    features: Union[int, Tuple[int, ...]]
    axis: Union[int, Tuple[int, ...]] = -1
    use_bias: bool = True
    activation: Optional[str] = None   # for activation-quant semantics
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        axis = self.axis if isinstance(self.axis, tuple) else (self.axis,)
        axis = tuple(a % x.ndim for a in axis)
        features = self.features if isinstance(self.features, tuple) \
            else (self.features,)
        in_shape = tuple(x.shape[a] for a in axis)
        kernel = self.param("kernel", self.kernel_init,
                            in_shape + features, jnp.float32)
        kernel = _weight_quant(self, jnp.asarray(kernel), "kernel")
        batch_dims = tuple(i for i in range(x.ndim) if i not in axis)
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((*axis,), tuple(range(len(axis)))), ((), ())))
        # dot_general orders outputs as batch_dims + features
        del batch_dims
        if self.use_bias:
            bias = self.param("bias", self.bias_init, features,
                              jnp.float32)
            y = y + jnp.asarray(bias, self.dtype)
        if self.activation and self.activation != "linear":
            from neurst_tpu.layers.common_layers import activation_by_name
            y = activation_by_name(self.activation)(y)
        kind = self.activation if self.activation in ("relu", "softmax") \
            else "act"
        y = _act_quant(self, y, "output", kind)
        return y


def dense_general(features, axis=-1, use_bias=True, activation=None,
                  kernel_init=None, bias_init=None, dtype=jnp.float32,
                  name=None):
    """Factory: a quantized dense when the global config is on, a plain
    flax DenseGeneral otherwise (zero risk / zero cost when off)."""
    kernel_init = kernel_init or nn.initializers.lecun_normal()
    bias_init = bias_init or nn.initializers.zeros
    if int8_serving_enabled():
        # serving-only: the caller applies any activation (same split
        # as the plain path)
        if isinstance(features, Sequence) and not isinstance(features, tuple):
            features = tuple(features)
        return Int8DenseGeneral(
            features=features, axis=axis, use_bias=use_bias,
            kernel_init=kernel_init, bias_init=bias_init, dtype=dtype,
            name=name)
    if quant_enabled():
        if isinstance(features, Sequence) and not isinstance(features, tuple):
            features = tuple(features)
        return QuantDenseGeneral(
            features=features, axis=axis, use_bias=use_bias,
            activation=activation, kernel_init=kernel_init,
            bias_init=bias_init, dtype=dtype, name=name)
    # plain path: any activation stays with the caller, exactly as
    # before quantization existed
    return nn.DenseGeneral(
        features=features, axis=axis, use_bias=use_bias,
        kernel_init=kernel_init, bias_init=bias_init, dtype=dtype,
        name=name)


_INT8_SERVING = {"on": False, "qat_bits": 8, "activations": False,
                 "static_act": False, "calibrate": False,
                 "qat_act_paths": set()}


def set_int8_serving(on: bool, qat_bits: int = 8,
                     activations: bool = False,
                     static_activation_scales: bool = False):
    """Enables int8 weight-only serving: every ``dense_general`` site
    builds an ``Int8DenseGeneral`` (int8-stored kernels, dequantized
    per output channel after the matmul).  Must be set before the model
    is built; serving-only (training through int8 weights is
    unsupported).  Beyond-reference: the reference's quantization is
    fake-quant in TF graphs only — it never serves real int8 weights.

    QAT checkpoints: callers must turn the QAT module structure OFF
    (``global_init(False)``) — the learned ``*_clip_max`` variables in
    the checkpoint then drive the int8 ranges (int8ify_flat_params),
    reproducing the QAT weight grid exactly (the fake-quant levels are
    integer multiples of clip_max/127 in [-128, 127]).  Activation
    fake-quant is dropped at serving (weight-only)."""
    if on and quant_enabled():
        raise ValueError(
            "int8_serving builds Int8 modules; turn QAT module "
            "construction off first (global_init(False)) — the "
            "checkpoint's learned clips still drive the int8 ranges")
    _INT8_SERVING["on"] = bool(on)
    # the QAT grid the checkpoint was trained with: levels are
    # multiples of clip / (2^(bits-1) - 1) in [-2^(bits-1), 2^(bits-1)-1]
    _INT8_SERVING["qat_bits"] = int(qat_bits)
    # full-int8 matmuls: dynamically quantize activations per token and
    # run int8 x int8 -> int32 dots (the MXU's double-rate int8 path)
    _INT8_SERVING["activations"] = bool(on) and bool(activations)
    # static per-tensor activation scales (saves the per-token absmax
    # reduction): each Int8DenseGeneral gains an ``act_scale`` param,
    # filled by calibrate_int8_act_scales (absmax over calibration
    # batches / 127); until calibrated, the dynamic path is used
    _INT8_SERVING["static_act"] = (_INT8_SERVING["activations"]
                                   and bool(static_activation_scales))
    _INT8_SERVING["calibrate"] = False
    _INT8_SERVING["qat_act_paths"] = set()


def int8_serving_enabled() -> bool:
    return bool(_INT8_SERVING["on"])


def int8_static_act_enabled() -> bool:
    return bool(_INT8_SERVING["static_act"])


def set_int8_calibration(on: bool):
    """Calibration mode for static activation scales: Int8DenseGeneral
    keeps quantizing dynamically but records each call's input absmax
    into the flax "calibration" collection (reduce = running max).
    Callers apply the module with ``mutable=["calibration"]`` and feed
    the collected maxima to ``write_calibrated_act_scales``."""
    _INT8_SERVING["calibrate"] = bool(on)


def calibrate_int8_act_scales(model, params, batches, margin: float = 1.0):
    """Post-training calibration of the static activation scales:
    teacher-forces ``batches`` (model-input dicts) through the model
    with calibration recording on, takes the running per-dense input
    absmax across all batches, and writes ``act_scale = margin *
    absmax / 127`` into ``params``.  Returns the updated params.

    Standard PTQ practice (the observed ranges include the effect of
    upstream weight quantization because the dynamic int8 path runs
    during calibration).  ``margin`` > 1 leaves clip headroom for
    inputs outside the calibration set."""
    if not _INT8_SERVING["static_act"]:
        raise ValueError(
            "calibrate_int8_act_scales requires set_int8_serving("
            "activations=True, static_activation_scales=True)")
    module = getattr(model, "_module", None) or model
    set_int8_calibration(True)
    try:
        def run(p, inp):
            _, variables = module.apply(
                {"params": p}, inputs=inp, is_training=False,
                mutable=["calibration"])
            return variables["calibration"]

        agg = None
        n = 0
        for batch in batches:
            cal = jax.tree_util.tree_map(np.asarray, run(params, batch))
            agg = cal if agg is None else jax.tree_util.tree_map(
                np.maximum, agg, cal)
            n += 1
        if agg is None:
            raise ValueError("calibration got zero batches")
        logging.info("int8 activation calibration: %d batches", n)
    finally:
        set_int8_calibration(False)
    return write_calibrated_act_scales(params, agg, margin=margin)


def write_calibrated_act_scales(params, calibration, margin: float = 1.0):
    """Writes ``act_scale = margin * act_absmax / 127`` into the params
    tree at every module path where ``calibration`` recorded an
    ``act_absmax`` (the two trees are parallel by construction).
    Module paths whose scales came from QAT clips (int8ify_flat_params)
    are left alone: the learned clip is the range QAT optimized for,
    and observed-absmax would only shrink it to the calibration set."""
    qat_paths = _INT8_SERVING.get("qat_act_paths") or set()

    def walk(p, c, prefix):
        if not isinstance(c, dict):
            return p
        out = dict(p)
        for k, v in c.items():
            if k == "act_absmax":
                if prefix in qat_paths:
                    continue
                amax = float(np.max(np.asarray(v)))
                out["act_scale"] = np.float32(
                    max(amax * float(margin), 1e-9) / 127.0)
            elif isinstance(v, dict) and k in out:
                out[k] = walk(out[k], v, f"{prefix}/{k}" if prefix else k)
        return out

    return walk(params, calibration, "")


class Int8DenseGeneral(nn.Module):
    """Weight-only int8 dense for serving: the kernel is STORED int8
    (quarter the HBM reads of f32-at-rest, half of bf16-at-rest) with a
    float32 per-output-channel scale; the matmul runs in the compute
    dtype and the scale is applied to the output:

        y = (x @ q.astype(dtype)) * scale     (w_hat = q * scale)

    Same kernel/bias shapes, names (modulo the ``_q``/``_scale``
    suffixes) and partition metadata as the plain dense, so tp decode
    sharding is unchanged.  Params come from a checkpoint via
    ``int8ify_flat_params`` (absmax-per-output-channel quantization of
    the f32 kernel); the init values are placeholders."""

    features: Union[int, Tuple[int, ...]]
    axis: Union[int, Tuple[int, ...]] = -1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        axis = self.axis if isinstance(self.axis, tuple) else (self.axis,)
        axis = tuple(a % x.ndim for a in axis)
        features = self.features if isinstance(self.features, tuple) \
            else (self.features,)
        in_shape = tuple(x.shape[a] for a in axis)

        def q_init(*args):
            # keep the caller's partition metadata, swap values -> int8
            return jax.tree_util.tree_map(
                lambda v: jnp.zeros(v.shape, jnp.int8),
                self.kernel_init(*args))

        kernel_q = self.param("kernel_q", q_init, in_shape + features,
                              jnp.float32)
        kernel_scale = self.param("kernel_scale", nn.initializers.ones,
                                  features, jnp.float32)
        dims = (((*axis,), tuple(range(len(axis)))), ((), ()))
        if _INT8_SERVING["activations"]:
            # full-int8 path: int8 x int8 -> int32 on the MXU's
            # double-rate int8 path, one fused f32 dequant in the
            # epilogue.  Activation scales are dynamic per-token absmax
            # by default; with static_act + calibration, a per-tensor
            # ``act_scale`` param replaces the absmax reduction.
            x32 = x.astype(jnp.float32)
            static = _INT8_SERVING["static_act"]
            if static:
                act_scale = self.param("act_scale", nn.initializers.ones,
                                       (), jnp.float32)
            if static and _INT8_SERVING["calibrate"]:
                # record the running input absmax (the dynamic path
                # still computes this batch, so calibration outputs are
                # the dynamic-quant outputs)
                self.sow("calibration", "act_absmax",
                         jnp.max(jnp.abs(x32)).astype(jnp.float32),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros([], jnp.float32))
            if static and not _INT8_SERVING["calibrate"]:
                s = jnp.maximum(jnp.asarray(act_scale, jnp.float32), 1e-9)
                x_q = jnp.clip(jnp.round(x32 / s), -127, 127
                               ).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    x_q, jnp.asarray(kernel_q), dims,
                    preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * s
                     * jnp.asarray(kernel_scale, jnp.float32)
                     ).astype(self.dtype)
            else:
                s_x = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
                s_x = jnp.maximum(s_x, 1e-9) / 127.0
                x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127
                               ).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    x_q, jnp.asarray(kernel_q), dims,
                    preferred_element_type=jnp.int32)
                # batch dims of the dot output = non-contracted x dims,
                # in order; s_x squeezed of the contracted axes aligns
                # with them, then features broadcast on the right
                s_tok = jnp.squeeze(s_x, axis=axis)
                s_tok = s_tok.reshape(s_tok.shape + (1,) * len(features))
                y = (acc.astype(jnp.float32) * s_tok
                     * jnp.asarray(kernel_scale, jnp.float32)
                     ).astype(self.dtype)
        else:
            y = jax.lax.dot_general(
                x.astype(self.dtype),
                jnp.asarray(kernel_q).astype(self.dtype), dims)
            # dequantize in f32 (the scale's precision matters; the
            # roundtrip fuses into the matmul epilogue)
            y = (y.astype(jnp.float32)
                 * jnp.asarray(kernel_scale, jnp.float32)).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, features,
                              jnp.float32)
            y = y + jnp.asarray(bias, self.dtype)
        return y


def int8ify_flat_params(flat: dict, template_flat: dict) -> dict:
    """Rewrites a flat f32 checkpoint dict for an int8-serving model:
    for every ``<p>/kernel_q`` in the template, quantizes the
    checkpoint's ``<p>/kernel`` to int8 with an absmax per-output-
    channel scale (symmetric; channel = the trailing feature dims, read
    off the template's ``<p>/kernel_scale`` shape).

    QAT checkpoints: when ``<p>/kernel_clip_max`` exists, the learned
    clip drives a per-tensor scale ``clip/127`` with levels in
    [-128, 127] — the QAT fake-quant grid (cmin is -128/127*cmax, step
    cmax/127), so int8-served weights land on the same levels the QAT
    training optimized for."""
    out = dict(flat)
    for name, tmpl in template_flat.items():
        if not (name.endswith("/kernel_q") or name.endswith("/weights_q")):
            continue
        base = name[:-2]  # ".../kernel" or ".../weights"
        scale_name = base + "_scale"
        w = flat.get(base)
        if w is None:
            continue
        w = np.asarray(w, np.float32)
        s_shape = tuple(np.shape(template_flat[scale_name]))
        lead, trail, reduce_axes = _scale_axes(w.shape, s_shape, name)
        denom_shape = (w.shape[:lead] + (1,) * len(reduce_axes)
                       + w.shape[w.ndim - trail:])
        clip = flat.get(base + "_clip_max")
        if clip is not None and name.endswith("/kernel_q"):
            # learned QAT clip -> per-tensor scale on the grid the
            # checkpoint trained with: step clip/(2^(b-1)-1), levels
            # [-2^(b-1), 2^(b-1)-1] (fits int8 for b <= 8).  Under
            # scan_layers the clip is stacked [L] -> per-layer scale.
            b = int(_INT8_SERVING["qat_bits"])
            if b > 8:
                raise ValueError(
                    f"QAT quant_bits={b} does not fit int8 serving")
            half = 2 ** (b - 1)
            clip = np.asarray(clip, np.float32)
            scale = np.broadcast_to(
                clip.reshape(clip.shape + (1,) * (len(s_shape) - clip.ndim)),
                s_shape) / (half - 1.0)
            scale = np.maximum(scale, 1e-9 / (half - 1.0))
            q = np.clip(np.round(w / scale.reshape(denom_shape)),
                        -half, half - 1).astype(np.int8)
            out.pop(base, None)
            out.pop(base + "_clip_max", None)
            out[name] = q
            out[scale_name] = scale.astype(np.float32)
            continue
        keep = np.max(np.abs(w), axis=reduce_axes)
        scale = np.maximum(keep, 1e-9) / 127.0
        q = np.clip(np.round(w / scale.reshape(denom_shape)),
                    -127, 127).astype(np.int8)
        out.pop(base, None)
        out[name] = q
        out[scale_name] = scale.astype(np.float32)

    # QAT activation clips -> STATIC activation scales, where the QAT
    # graph provably bounds a dense input: the FFN inner activation.
    # dense1 fake-quantizes its relu output to [0, output_clip_max]
    # (quant_layers._act_quant) and feeds dense2 directly (dropout is
    # identity at serving), so the learned clip IS dense2's input range
    # and ``act_scale = clip / 127`` needs no calibration pass.  Other
    # dense inputs (q/k/v from LayerNorm, the output projection from
    # the attention context) carry no QAT bound and keep calibration /
    # dynamic per-token quantization.  Parity anchor: the reference
    # trains these clips (/root/reference/neurst/layers/quantization/
    # quant_layers.py:90-98) but never serves real int8 from them.
    _INT8_SERVING["qat_act_paths"] = set()
    if _INT8_SERVING.get("static_act"):
        for name, tmpl in template_flat.items():
            if not name.endswith("dense2/act_scale"):
                continue
            clip_name = (name[:-len("dense2/act_scale")]
                         + "dense1/output_clip_max")
            clip = flat.get(clip_name)
            if clip is None:
                continue
            clip = np.maximum(np.asarray(clip, np.float32), 1e-9)
            out[name] = np.broadcast_to(
                clip / 127.0, np.shape(tmpl)).astype(np.float32)
            out.pop(clip_name, None)
            _INT8_SERVING["qat_act_paths"].add(
                name[:-len("/act_scale")])
    return out


def _scale_axes(w_shape, scale_shape, name):
    """Splits a quantized tensor's axes into (leading-kept, trailing-
    kept, reduced) so that the kept axes reproduce ``scale_shape``.
    Covers plain dense kernels [in..., out...] with scale [out...]
    (lead 0), scan/pipeline-stacked kernels [L, in..., out...] with
    scale [L, out...] (lead 1), and embedding tables [V, D] with
    per-row scale [V] (trail 0).  Preference resolves square-shape
    ambiguity: kernels keep their TRAILING feature axes first (the
    module applies the scale on the output features), embedding tables
    their LEADING vocab axis first."""
    n, k = len(w_shape), len(scale_shape)
    leads = range(0, k + 1) if name.endswith("/kernel_q") \
        else range(k, -1, -1)
    for lead in leads:
        trail = k - lead
        if (tuple(w_shape[:lead]) == tuple(scale_shape[:lead])
                and tuple(w_shape[n - trail:])
                == tuple(scale_shape[lead:])
                and lead + trail <= n):
            return lead, trail, tuple(range(lead, n - trail))
    raise ValueError(
        f"cannot align scale shape {scale_shape} to tensor shape "
        f"{w_shape} for {name}")


def clip_l2_penalty(params) -> jnp.ndarray:
    """L2 regularization of the learned clip variables (parity:
    quant_layers.py regularizers — 0.001 on weight clips, 0.01 on
    activation clips)."""
    from neurst_tpu.utils.checkpoints import flatten_params
    total = jnp.zeros([], jnp.float32)
    for name, v in flatten_params(params).items():
        if name.endswith("kernel_clip_max"):
            total = total + 1e-3 * jnp.square(
                jnp.asarray(v, jnp.float32))
        elif name.endswith("output_clip_max"):
            total = total + 1e-2 * jnp.square(
                jnp.asarray(v, jnp.float32))
    return total
