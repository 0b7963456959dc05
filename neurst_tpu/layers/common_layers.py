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
"""Common transformer building blocks in flax.linen.

Parity: /root/reference/neurst/layers/common_layers.py (PrePostProcessing
wrapper, TransformerFFN, position embeddings) and
``neurst/layers/modalities/text_modalities.py`` (WordEmbeddingSharedWeights).

TPU-first choices:
* parameters live in float32, compute in a configurable ``dtype``
  (bfloat16 by default in training);
* kernels carry ``nn.with_partitioning`` logical-axis metadata so pjit
  shards them over the device mesh (tensor parallelism) without layer
  code changes;
* the sinusoidal signal is the T2T layout (sin block then cos block,
  concatenated over channels), matching the reference bit-for-bit so
  released checkpoints decode identically;
* modules are written in linen ``setup`` style (not ``nn.compact``) so
  multiple methods (forward / cache init / stepwise decode) share the
  same parameters.
"""

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["TransformerFFN", "WordEmbedding", "sinusoidal_position_signal",
           "activation_by_name", "LayerNorm", "apply_dropout"]

Dtype = Any


def activation_by_name(name: Optional[str]) -> Callable:
    if name is None or name == "linear":
        return lambda x: x
    return {
        "relu": jax.nn.relu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_approx": jax.nn.gelu,
        "swish": jax.nn.swish,
        "silu": jax.nn.silu,
        "tanh": jnp.tanh,
    }[name]


def apply_dropout(module: nn.Module, x, rate: float, enabled: bool):
    """Inverted dropout drawing from the module's 'dropout' rng stream.

    A plain function (not nn.Dropout) so setup-style modules can drop
    out inside any method without declaring child modules.

    On TPU the mask comes from the Pallas hardware-PRNG kernel
    (ops/fused_dropout.py): threefry mask generation is ~45% of a
    transformer_base train step, the hardware PRNG makes it an
    elementwise pass with zero residual memory (bits regenerated in
    backward).  Off-TPU keeps the stock bernoulli path.
    """
    if not enabled or rate <= 0.0:
        return x
    key = module.make_rng("dropout")
    from neurst_tpu.ops.fused_dropout import (fused_dropout,
                                              fused_dropout_available)
    if fused_dropout_available() and x.size >= (1 << 16) \
            and x.shape[-1] % 128 == 0:
        return fused_dropout(x, key, rate)
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype."""
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


class _DenseParams(nn.Module):
    """Owns kernel/bias with nn.DenseGeneral's exact parameter names,
    shapes and partition metadata, but hands the raw arrays back to
    the caller — so TransformerFFN can feed them to the fused Pallas
    FFN kernel (ops/fused_ffn.py) while checkpoints stay identical."""
    features: int
    kernel_init: Any
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_dim, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        return jnp.asarray(kernel), jnp.asarray(bias)


class TransformerFFN(nn.Module):
    """Position-wise feed-forward: dense -> activation -> dropout -> dense.

    Parity: common_layers.TransformerFFN.  Kernels are annotated
    ("embed", "mlp") / ("mlp", "embed") for tensor-parallel sharding.

    On TPU with the relu activation (and no QAT/int8), the whole block
    runs as ONE Pallas kernel (ops/fused_ffn.py): the [rows, filter]
    hidden — 128 MB per layer per direction at transformer_base
    [256, 128] — never touches HBM, and ffn-dropout draws from the
    on-core PRNG in-kernel.  Off-TPU and for tiny row counts (decode
    steps) the identical jnp math runs instead; NEURST_FUSED_FFN=0
    opts out entirely.  Parameter layout is IDENTICAL either way.
    """
    filter_size: int
    output_size: int
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        import os

        from neurst_tpu.layers.quantization.quant_layers import (
            dense_general, int8_serving_enabled, quant_enabled)
        self._quant = quant_enabled()
        self._raw_params = (
            not self._quant and not int8_serving_enabled()
            and self.activation == "relu"
            and os.environ.get("NEURST_FUSED_FFN", "1") != "0")
        if self._raw_params:
            self.dense1 = _DenseParams(
                features=self.filter_size, name="dense1",
                kernel_init=nn.with_partitioning(
                    nn.initializers.lecun_normal(), ("embed", "mlp")))
            self.dense2 = _DenseParams(
                features=self.output_size, name="dense2",
                kernel_init=nn.with_partitioning(
                    nn.initializers.lecun_normal(), ("mlp", "embed")))
            return
        self.dense1 = dense_general(
            self.filter_size, dtype=self.dtype, name="dense1",
            activation=self.activation,
            kernel_init=nn.with_partitioning(
                nn.initializers.lecun_normal(), ("embed", "mlp")),
            bias_init=nn.initializers.zeros)
        self.dense2 = dense_general(
            self.output_size, dtype=self.dtype, name="dense2",
            kernel_init=nn.with_partitioning(
                nn.initializers.lecun_normal(), ("mlp", "embed")),
            bias_init=nn.initializers.zeros)

    def __call__(self, x, is_training: bool = False):
        if self._raw_params:
            from neurst_tpu.ops.fused_ffn import (fused_ffn,
                                                  fused_ffn_available)
            k1, b1 = self.dense1(x.shape[-1])
            k2, b2 = self.dense2(self.filter_size)
            rate = self.dropout_rate if is_training else 0.0
            rows = x.size // x.shape[-1]
            if fused_ffn_available(x.shape[-1], self.filter_size,
                                   self.activation, rows,
                                   is_training=is_training,
                                   dropout_rate=rate):
                key = (self.make_rng("dropout") if rate > 0.0 else None)
                return fused_ffn(x, k1, b1, k2, b2, dropout_rate=rate,
                                 dropout_key=key)
            # identical math, plain XLA (CPU; decode-step row counts)
            dt = self.dtype
            h = jax.lax.dot_general(
                x.astype(dt), k1.astype(dt),
                (((x.ndim - 1,), (0,)), ((), ()))) + b1.astype(dt)
            h = activation_by_name(self.activation)(h)
            h = apply_dropout(self, h, self.dropout_rate, is_training)
            return jax.lax.dot_general(
                h, k2.astype(dt),
                (((h.ndim - 1,), (0,)), ((), ()))) + b2.astype(dt)
        h = self.dense1(x)
        if not self._quant:
            # under QAT the quantized dense applies (and quantizes)
            # the activation itself, reference-style
            h = activation_by_name(self.activation)(h)
        h = apply_dropout(self, h, self.dropout_rate, is_training)
        return self.dense2(h)


def sinusoidal_position_signal(length: int, channels: int, start: int = 0,
                               min_timescale: float = 1.0,
                               max_timescale: float = 1.0e4,
                               dtype=jnp.float32):
    """T2T-layout sinusoids: [length, channels] = concat(sin, cos).

    Matches PositionEmbeddingWrapper.add_sinusoids_timing_signal
    (common_layers.py:357-409): ``num_timescales = channels // 2``, log
    increment divided by (num_timescales - 1), odd channel zero-padded.
    ``start`` may be a python int or traced scalar.
    """
    position = (jnp.arange(length, dtype=jnp.float32)
                + jnp.asarray(start, jnp.float32))
    num_timescales = channels // 2
    log_timescale_increment = (
        math.log(float(max_timescale) / float(min_timescale))
        / max(float(num_timescales) - 1.0, 1.0))
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32)
        * -log_timescale_increment)
    scaled_time = position[:, None] * inv_timescales[None, :]
    signal = jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)],
                             axis=1)
    if channels % 2:
        signal = jnp.pad(signal, [[0, 0], [0, 1]])
    return signal.astype(dtype)


def sinusoidal_position_signal_at(positions, channels: int,
                                  min_timescale: float = 1.0,
                                  max_timescale: float = 1.0e4,
                                  dtype=jnp.float32):
    """Same T2T sinusoids at EXPLICIT positions ``[..., ]`` (e.g. the
    per-row decode times of speculative decoding) -> [..., channels]."""
    position = jnp.asarray(positions, jnp.float32)
    num_timescales = channels // 2
    log_timescale_increment = (
        math.log(float(max_timescale) / float(min_timescale))
        / max(float(num_timescales) - 1.0, 1.0))
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32)
        * -log_timescale_increment)
    scaled_time = position[..., None] * inv_timescales
    signal = jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)],
                             axis=-1)
    if channels % 2:
        signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, 1)])
    return signal.astype(dtype)


class WordEmbedding(nn.Module):
    """Embedding table with optional tied pre-softmax projection.

    Parity: WordEmbeddingSharedWeights (text_modalities.py:21-136):
    N(0, d^-0.5) init; ``attend`` computes logits x @ W^T (+ bias when
    ``share_softmax_weights``).  Timing handling follows
    PositionEmbeddingWrapper: with ``timing='sinusoids'`` the embedding
    is scaled by sqrt(d) before adding the signal; ``timing='emb'`` uses
    a learned position table.
    """
    vocab_size: int
    embedding_dim: int
    share_softmax_weights: bool = False
    use_bias: bool = True
    timing: Optional[str] = None   # None | "sinusoids" | "emb"
    max_positions: int = 512
    dtype: Dtype = jnp.float32

    def setup(self):
        from neurst_tpu.layers.quantization.quant_layers import \
            int8_serving_enabled
        base_init = nn.with_partitioning(
            nn.initializers.normal(self.embedding_dim ** -0.5),
            ("vocab", "embed"))
        self._int8 = int8_serving_enabled()
        if self._int8:
            # int8-at-rest table with an absmax per-vocab-row f32 scale
            # (quant_layers.int8ify_flat_params fills both at restore):
            # the same scale dequantizes gathered rows in __call__ AND
            # the logits channels in attend
            def q_init(*args):
                import jax as _jax
                return _jax.tree_util.tree_map(
                    lambda v: jnp.zeros(v.shape, jnp.int8), base_init(*args))
            self.weights_q = self.param(
                "weights_q", q_init,
                (self.vocab_size, self.embedding_dim), jnp.float32)
            self.weights_scale = self.param(
                "weights_scale", nn.initializers.ones,
                (self.vocab_size,), jnp.float32)
        else:
            self.weights = self.param(
                "weights", base_init,
                (self.vocab_size, self.embedding_dim), jnp.float32)
        if self.share_softmax_weights and self.use_bias:
            self.softmax_bias = self.param(
                "bias", nn.initializers.zeros, (self.vocab_size,),
                jnp.float32)
        if self.timing == "emb":
            self.position_table = self.param(
                "position_weights",
                nn.initializers.normal(self.embedding_dim ** -0.5),
                (self.max_positions, self.embedding_dim), jnp.float32)

    def __call__(self, ids, time=None):
        """ids [B, L] (or [B] with scalar `time`) -> [B, L, D] / [B, D]."""
        if self._int8:
            rows = jnp.take(jnp.asarray(self.weights_q), ids, axis=0)
            scale = jnp.take(jnp.asarray(self.weights_scale), ids, axis=0)
            emb = (rows.astype(jnp.float32)
                   * scale[..., None]).astype(self.dtype)
        else:
            table = jnp.asarray(self.weights).astype(self.dtype)
            emb = jnp.take(table, ids, axis=0)
        if self.timing is None:
            return emb
        squeeze = ids.ndim == 1
        if squeeze:
            emb = emb[:, None, :]
        length = emb.shape[1]
        start = 0 if time is None else time
        per_row = getattr(start, "ndim", 0) == 1  # [B] decode times
        if self.timing == "sinusoids":
            emb = emb * (self.embedding_dim ** 0.5)
            if per_row:
                # speculative decode: row b's tokens sit at positions
                # start[b] + [0..length)
                positions = start[:, None] + jnp.arange(length)
                signal = sinusoidal_position_signal_at(
                    positions, self.embedding_dim, dtype=emb.dtype)
                emb = emb + signal
            else:
                signal = sinusoidal_position_signal(
                    length, self.embedding_dim, start=start,
                    dtype=emb.dtype)
                emb = emb + signal[None, :, :]
        elif self.timing == "emb":
            pos_table = jnp.asarray(self.position_table).astype(emb.dtype)
            if per_row:
                positions = start[:, None] + jnp.arange(length)
                emb = emb + jnp.take(pos_table, positions, axis=0)
            else:
                pos_emb = jax.lax.dynamic_slice_in_dim(
                    pos_table, start, length, 0)
                emb = emb + pos_emb[None, :, :]
        else:
            raise ValueError(f"Unknown timing: {self.timing}")
        if squeeze:
            emb = emb[:, 0, :]
        return emb

    def attend(self, features):
        """[..., D] -> logits [..., vocab] via the (tied) table, fp32."""
        if self._int8:
            w = jnp.asarray(self.weights_q).astype(features.dtype)
        else:
            w = jnp.asarray(self.weights).astype(features.dtype)
        logits = jax.lax.dot_general(
            features, w,
            dimension_numbers=(((features.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if self._int8:
            # per-vocab-row dequantization lands on the channel axis
            logits = logits * jnp.asarray(self.weights_scale, jnp.float32)
        if self.share_softmax_weights and self.use_bias:
            logits = logits + self.softmax_bias
        return logits
