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
"""Jitted train/eval steps over a device mesh.

Replaces the reference's GradAccumKerasModel + tf.distribute machinery
(``/root/reference/neurst/training/gradaccum_keras_model.py:112-260``):
* forward+backward compiled once; the gradient all-reduce is inserted by
  XLA from the shardings (no NCCL/Horovod code);
* gradient accumulation over ``update_cycle`` micro-batches is a
  ``lax.scan`` inside the same jitted step (micro-batches stacked on a
  leading axis), keeping weights untouched between micro-steps exactly
  like the ON_READ accumulators in the reference;
* grad clip by value/norm before apply (gradaccum_keras_model.py:230-246).
"""

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(step=jnp.zeros([], jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_train_step(model, criterion, tx: optax.GradientTransformation,
                    update_cycle: int = 1,
                    lr_schedule: Optional[Callable] = None,
                    params_transform: Optional[Callable] = None,
                    extra_loss_fn: Optional[Callable] = None,
                    remat: bool = False):
    """Builds ``train_step(state, batch, rng) -> (state, metrics)``.

    With ``update_cycle > 1`` every array in `batch` must have leading
    shape [update_cycle, micro_batch, ...].  ``params_transform`` (e.g.
    post-training fake-quantization) is applied to the parameters
    inside the loss with straight-through gradients; ``extra_loss_fn``
    adds a params-dependent regularizer (e.g. the QAT clip-max L2
    penalty) to the loss.
    """

    # Fused softmax+CE: when the model can hand back prelogits and the
    # criterion understands them, the vocab projection runs inside the
    # CE kernel and the [B, T, V] logits never reach HBM
    # (ops/fused_ce.fused_linear_xent; NEURST_FUSED_CE=0 opts out).
    want_prelogits = (
        os.environ.get("NEURST_FUSED_CE", "1") != "0"
        and getattr(criterion, "supports_prelogits", False)
        and getattr(model, "supports_fused_softmax_ce", lambda: False)())

    def _forward(params, batch, rng):
        # call_train also surfaces model-internal auxiliary losses
        # (e.g. the MoE load-balancing term), which add to the
        # token-normalized criterion loss
        out, aux = model.call_train(params, batch,
                                    rngs={"dropout": rng},
                                    want_prelogits=want_prelogits)
        return criterion.reduce_loss(batch, out) + aux, aux

    def _forward_terms(params, batch, rng):
        out, aux = model.call_train(params, batch,
                                    rngs={"dropout": rng},
                                    want_prelogits=want_prelogits)
        loss_sum, denom = criterion.reduce_loss_terms(batch, out)
        return loss_sum, denom, aux

    if remat:
        # recompute activations in backward: HBM for FLOPs (SURVEY §0)
        _forward = jax.checkpoint(_forward)
        _forward_terms = jax.checkpoint(_forward_terms)

    def loss_fn(params, batch, rng):
        if params_transform is not None:
            params = params_transform(params)
        loss, aux = _forward(params, batch, rng)
        if extra_loss_fn is not None:
            loss = loss + extra_loss_fn(params)
        return loss, aux

    def terms_fn(params, batch, rng):
        if params_transform is not None:
            params = params_transform(params)
        loss_sum, denom, aux = _forward_terms(params, batch, rng)
        # fold the model-internal auxiliary loss (e.g. MoE load
        # balancing) in scaled by this micro-batch's token count: the
        # single final 1/sum(denom) normalization then yields the
        # token-weighted mean of the aux term across micro-batches
        # (identical to the big-batch value when token counts match)
        aux_sum = aux * jax.lax.stop_gradient(denom)
        return loss_sum + aux_sum, (denom, aux_sum)

    def extra_fn(params):
        if params_transform is not None:
            params = params_transform(params)
        return extra_loss_fn(params)

    def compute_grads(params, batch, rng):
        if update_cycle == 1:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng)
            return loss, aux, grads

        # Accumulate (loss_sum, denom) and the gradients of the *raw*
        # loss sums, then normalize once: ragged micro-batches (unequal
        # token counts from bucketed data) match big-batch semantics
        # exactly, unlike per-micro-batch normalization, which weights
        # micro-batches equally regardless of tokens.
        def micro_step(carry, micro_batch_and_rng):
            acc_loss, acc_denom, acc_aux, acc_grads = carry
            micro_batch, micro_rng = micro_batch_and_rng
            (loss_sum, (denom, aux_sum)), grads = jax.value_and_grad(
                terms_fn, has_aux=True)(params, micro_batch, micro_rng)
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(a.dtype), acc_grads, grads)
            return (acc_loss + loss_sum, acc_denom + denom,
                    acc_aux + aux_sum, acc_grads), None

        # accumulate in f32 even when params (hence grads) are bf16
        # (--bf16_params): summing update_cycle bf16 terms in bf16 would
        # round away small micro-batch contributions before the f32
        # master ever sees them
        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32)
            if jnp.issubdtype(p.dtype, jnp.inexact) else jnp.zeros_like(p),
            params)
        rngs = jax.random.split(rng, update_cycle)
        (loss_sum, denom, aux_sum, grads), _ = jax.lax.scan(
            micro_step, (jnp.zeros([], jnp.float32),
                         jnp.zeros([], jnp.float32),
                         jnp.zeros([], jnp.float32), zero_grads),
            (batch, rngs))
        inv = 1.0 / jnp.maximum(denom, 1e-8)
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        loss = loss_sum * inv
        if extra_loss_fn is not None:
            # batch-independent regularizer: added once, not per micro
            extra_val, extra_grads = jax.value_and_grad(extra_fn)(params)
            loss = loss + extra_val
            grads = jax.tree_util.tree_map(
                lambda a, g: a + g, grads, extra_grads)
        return loss, aux_sum * inv, grads

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, aux, grads = compute_grads(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = {"loss": loss,
                   "aux_loss": aux,
                   "grad_norm": optax.global_norm(grads)}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    return train_step


def make_eval_step(model, criterion):
    """``eval_step(params, batch) -> statistics tuple`` (for
    criterion.reduce_metrics aggregation)."""

    def eval_step(params, batch):
        logits = model.call(params, batch, is_training=False)
        return criterion(batch, logits)

    return eval_step
