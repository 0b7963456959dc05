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
"""The training entry.

Parity: /root/reference/neurst/exps/trainer.py — builds criterion +
optimizer + lr schedule (+ validator), restores checkpoint/pretrain
(147-178), trains for ``train_steps`` with periodic checkpointing and
throughput telemetry (secs/step, steps/sec, tokens/sec — parity with
MetricReductionCallback, callbacks.py:209-245).

TPU-first: a single jitted train step over a ("data", "model") mesh
replaces GradAccumKerasModel + tf.distribute + Horovod; gradient
accumulation is a lax.scan; bf16 compute with f32 params replaces the
fp16 loss-scaling machinery (bf16 needs no loss scale).
"""

import logging
import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from neurst_tpu.criterions.criterion import build_criterion
from neurst_tpu.exps.base_experiment import BaseExperiment, register_exp
from neurst_tpu.optimizers import (build_lr_schedule, build_optimizer,
                                   create_optax_chain)
from neurst_tpu.parallel import (TrainState, batch_sharding, make_mesh,
                                 make_train_step, params_shardings,
                                 replicated)
from neurst_tpu.parallel.mesh import logical_to_mesh_spec
from neurst_tpu.parallel.utils import put_batch
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils import compat
from neurst_tpu.utils.configurable import ModelConfigs
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["Trainer"]


@register_exp("train")
class Trainer(BaseExperiment):

    @staticmethod
    def class_or_method_args():
        return [
            ModuleFlag("criterion", "criterion",
                       default="label_smoothed_cross_entropy",
                       help="The training criterion."),
            ModuleFlag("optimizer", "optimizer", default="adam",
                       help="The optimizer."),
            ModuleFlag("lr_schedule", "lr_schedule",
                       help="The learning rate schedule."),
            Flag("train_steps", dtype=Flag.TYPE.INTEGER, default=10000000,
                 help="The maximum number of training steps."),
            Flag("save_checkpoint_steps", dtype=Flag.TYPE.INTEGER,
                 default=1000, help="Save a checkpoint every N steps."),
            Flag("summary_steps", dtype=Flag.TYPE.INTEGER, default=200,
                 help="Log training metrics every N steps."),
            Flag("checkpoints_max_to_keep", dtype=Flag.TYPE.INTEGER,
                 default=8, help="The maximum checkpoints to keep."),
            Flag("checkpoint_format", dtype=Flag.TYPE.STRING,
                 default="npz", choices=["npz", "orbax"],
                 help="npz = name-keyed flat arrays gathered to host 0 "
                      "(reference-compatible tooling); orbax = sharded "
                      "OCDBT, each process writes only its own shards "
                      "(pod-scale models)."),
            Flag("update_cycle", dtype=Flag.TYPE.INTEGER, default=1,
                 help="Accumulate gradients over N micro-batches."),
            Flag("bf16_params", dtype=Flag.TYPE.BOOLEAN, default=None,
                 help="Store live parameters in bfloat16 with a float32 "
                      "master copy inside the optimizer state (halves "
                      "parameter HBM reads; checkpoints stay float32 "
                      "via the master)."),
            Flag("clip_value", dtype=Flag.TYPE.FLOAT, default=None,
                 help="Clip gradients by value."),
            Flag("clip_norm", dtype=Flag.TYPE.FLOAT, default=None,
                 help="Clip gradients by global norm."),
            Flag("initial_global_step", dtype=Flag.TYPE.INTEGER, default=None,
                 help="The initial global step (for lr schedule resume)."),
            Flag("pretrain_model", dtype=Flag.TYPE.STRING, default=None,
                 multiple=True, help="Path(s) to pretrained checkpoints "
                                     "for partial (name-based) restore."),
            Flag("pretrain_variable_pattern", dtype=Flag.TYPE.STRING,
                 default=None, multiple=True,
                 help="Regex pattern(s) selecting variables to restore "
                      "from each pretrain_model."),
            Flag("num_model_partitions", dtype=Flag.TYPE.INTEGER, default=1,
                 help="Tensor-parallel size (mesh 'model' axis)."),
            Flag("pipeline_parallel", dtype=Flag.TYPE.INTEGER, default=1,
                 help="Pipeline-parallel size (mesh 'stage' axis); pair "
                      "with encoder/decoder.pipeline_stages set to the "
                      "same value."),
            Flag("distribution_strategy", dtype=Flag.TYPE.STRING,
                 default=None,
                 help="Kept for recipe compatibility (the mesh replaces "
                      "mirrored/horovod/byteps/tpu strategies)."),
            Flag("dtype", dtype=Flag.TYPE.STRING, default=None,
                 help="Computation dtype override for training."),
            Flag("freeze_variables", dtype=Flag.TYPE.STRING,
                 default=None, alias="experimental_frozen_variables",
                 help="Regex of variables excluded from updates."),
            Flag("gradient_remat", dtype=Flag.TYPE.BOOLEAN, default=None,
                 help="Rematerialize the forward pass in backward "
                      "(jax.checkpoint): trades FLOPs for HBM."),
            Flag("enable_tensorboard", dtype=Flag.TYPE.BOOLEAN,
                 default=True,
                 help="Write TensorBoard scalars under model_dir/train."),
            Flag("enable_profiler", dtype=Flag.TYPE.BOOLEAN, default=None,
                 help="Start the jax.profiler trace server."),
            ModuleFlag("validator", "validator",
                       help="Inline validator run every eval_steps "
                            "(or use the sidecar 'validation' entry)."),
            ModuleFlag("pruning_schedule", "pruning_schedule",
                       help="The weight pruning schedule (enables "
                            "magnitude pruning when set)."),
            Flag("pruning_variable_pattern", dtype=Flag.TYPE.STRING,
                 default=None,
                 help="Regex of variables included in pruning."),
            Flag("nopruning_variable_pattern", dtype=Flag.TYPE.STRING,
                 default=None,
                 help="Regex of variables excluded from pruning."),
            Flag("rate_scheduled_pattern", dtype=Flag.TYPE.STRING,
                 default=None,
                 help="Regex of variables with rate-scheduled updates "
                      "(CTNMT: freeze then ramp, e.g. 'bert')."),
            Flag("rate_freeze_until", dtype=Flag.TYPE.INTEGER, default=0,
                 help="Matched variables frozen until this step."),
            Flag("rate_ramp_steps", dtype=Flag.TYPE.INTEGER, default=1,
                 help="Matched variables ramp to full updates over this "
                      "many steps."),
        ]

    def run(self):
        args = self._args
        task = self._task
        model = self._model
        model_dir = self._model_dir

        # bf16 stored params default ON for bf16-compute models (the
        # f32 master keeps checkpoints f32, so this is numerics-safe;
        # halves the parameter HBM reads — BENCH_r03 measured +3.5%
        # tokens/s).  f32-compute models keep f32 storage.
        if args.get("bf16_params") is None:
            args["bf16_params"] = str(
                model.args.get("dtype") or "").startswith("bfloat16")
            if args["bf16_params"]:
                logging.info("bf16_params defaulted ON "
                             "(model dtype is bfloat16)")

        criterion = build_criterion(args)

        # ---------------- restore / init ---------------- #
        rng = jax.random.PRNGKey(int(args.get("seed") or 0))
        params = model.init_params(rng)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        logging.info("Model has %.2fM parameters", n_params / 1e6)

        restored = ckpt_lib.NameBasedCheckpointManager(
            model_dir, args.get("checkpoints_max_to_keep") or 8)
        init_step = 0
        state_restore = None
        if (args.get("checkpoint_format") or "npz") == "orbax":
            from neurst_tpu.utils import orbax_checkpoints as orbax_lib
            opath = orbax_lib.latest_orbax_checkpoint(model_dir)
            if opath is not None:
                import re as _re
                step_m = _re.search(r"ckpt-(\d+)\.orbax$", opath)
                state_restore = {
                    "params": orbax_lib.restore_checkpoint_orbax(
                        opath, params),
                    "step": int(step_m.group(1)), "path": opath}
        if state_restore is None:
            state_restore = restored.restore(params)
        if state_restore is not None:
            params = state_restore["params"]
            init_step = state_restore["step"] or 0
            logging.info("Restored checkpoint at step %d from %s",
                         init_step, state_restore["path"])
        else:
            for i, pretrain in enumerate(
                    args.get("pretrain_model") or []):
                patterns = args.get("pretrain_variable_pattern") or []
                pat = patterns[i] if i < len(patterns) else None
                flat = ckpt_lib.restore_checkpoint_params(pretrain)
                params, _, _ = ckpt_lib.restore_into(
                    params, flat, name_pattern=pat)
                logging.info("Restored pretrain model from %s", pretrain)
        if args.get("initial_global_step") is not None:
            init_step = args["initial_global_step"]
        compat.register_initial_step(init_step)

        # -------- optimizer chain (after the initial step is known,
        # so resumed lr schedules continue where they left off) -------- #
        lr_schedule = build_lr_schedule(args) \
            if args.get("lr_schedule.class") else None
        optimizer = build_optimizer(args)
        lr = lr_schedule if lr_schedule is not None \
            else (args.get("optimizer.params", {}).get("learning_rate")
                  or 1e-3)
        tx = create_optax_chain(optimizer, lr,
                                clip_value=args.get("clip_value"),
                                clip_norm=args.get("clip_norm"))
        if args.get("pruning_schedule.class"):
            from neurst_tpu.sparsity.pruning_optimizer import (
                make_variable_filter, prune_gradients)
            from neurst_tpu.sparsity.pruning_schedule import \
                build_pruning_schedule
            schedule = build_pruning_schedule(args)
            tx = prune_gradients(
                tx, schedule,
                make_variable_filter(args.get("pruning_variable_pattern"),
                                     args.get("nopruning_variable_pattern")))
            logging.info("Enabled magnitude pruning: %s",
                         args["pruning_schedule.class"])
        frozen_pattern = (args.get("freeze_variables")
                          or args.get("experimental_frozen_variables"))
        if frozen_pattern:
            import re as _re
            import optax as _optax
            pat = _re.compile(frozen_pattern)

            n_frozen = sum(
                1 for k in ckpt_lib.flatten_params(params)
                if pat.search(k))
            if n_frozen == 0:
                logging.warning(
                    "freeze_variables pattern '%s' matches NO variables "
                    "— nothing will be frozen.", frozen_pattern)
            else:
                logging.info("freeze_variables '%s': %d variables frozen.",
                             frozen_pattern, n_frozen)

            def _label(params):
                flat = ckpt_lib.flatten_params(params)
                labels = {k: ("frozen" if pat.search(k) else "train")
                          for k in flat}
                return ckpt_lib.unflatten_params(labels)
            tx = _optax.multi_transform(
                {"train": tx, "frozen": _optax.set_to_zero()}, _label)
        if args.get("rate_scheduled_pattern"):
            from neurst_tpu.optimizers.rate_schedule_optimizer import \
                rate_scheduled_updates
            tx = rate_scheduled_updates(
                tx, args["rate_scheduled_pattern"],
                freeze_until=int(args.get("rate_freeze_until") or 0),
                ramp_steps=int(args.get("rate_ramp_steps") or 1))
            logging.info("Rate-scheduled updates for pattern '%s'",
                         args["rate_scheduled_pattern"])
        tx = self._wrap_tx(tx)
        if args.get("bf16_params"):
            # OUTERMOST wrapper: pruning/freeze/rate-schedule masks must
            # act on the f32 master's updates INSIDE this boundary —
            # wrapped the other way, a masked (frozen) parameter's
            # master keeps advancing and the emitted bf16 delta moves
            # the "frozen" weight on the next step.
            from neurst_tpu.optimizers.master_weights import \
                with_bf16_params
            tx = with_bf16_params(tx)
            logging.info("bf16 stored params + f32 master enabled")

        # persist configs so predict/validation rebuild task+model
        if model_dir and jax.process_index() == 0:
            ModelConfigs.dump(task.model_configs(model), model_dir)

        # ---------------- mesh + jit ---------------- #
        tp = int(args.get("num_model_partitions") or 1)
        pp = int(args.get("pipeline_parallel") or 1)
        mesh = make_mesh(model_parallel=tp, pipeline_parallel=pp)
        num_replicas = mesh.shape["data"]
        p_shardings = params_shardings(mesh, model.params_spec(),
                                       params=params)
        params = jax.tree_util.tree_map(
            lambda p, s: jax.device_put(p, s), params, p_shardings)
        if args.get("bf16_params"):
            from neurst_tpu.optimizers.master_weights import \
                cast_params_bf16
            params = cast_params_bf16(params)
        state = TrainState.create(params, tx)
        # exact resume: restore the optimizer state sidecar when present
        if state_restore is not None:
            if state_restore["path"].endswith(".orbax"):
                from neurst_tpu.utils import orbax_checkpoints as orbax_lib
                opt_path = state_restore["path"].replace(
                    ".orbax", ".optstate.orbax")
                if os.path.isdir(opt_path):
                    opt_state = orbax_lib.restore_checkpoint_orbax(
                        opt_path, state.opt_state)
                    # host-side copies: the resharding jit below places
                    # them; orbax's committed placements would conflict
                    opt_state = jax.tree_util.tree_map(np.asarray,
                                                       opt_state)
                    state = state.replace(
                        opt_state=opt_state,
                        step=jnp.asarray(init_step, jnp.int32))
                    logging.info("Restored sharded optimizer state from "
                                 "%s", opt_path)
            else:
                opt_path = state_restore["path"].replace(
                    ".npz", ".optstate")
                if os.path.exists(opt_path):
                    with open(opt_path, "rb") as f:
                        opt_state = serialization.from_bytes(
                            state.opt_state, f.read())
                    state = state.replace(
                        opt_state=jax.tree_util.tree_map(
                            lambda x: jax.device_put(x), opt_state),
                        step=jnp.asarray(init_step, jnp.int32))
                    logging.info("Restored optimizer state from %s",
                                 opt_path)
        state_shardings = jax.tree_util.tree_map(
            lambda x: replicated(mesh), state)
        state_shardings = state_shardings.replace(
            params=p_shardings,
            opt_state=jax.tree_util.tree_map(
                lambda x: (p_shardings
                           if _is_params_like(x, params) else replicated(mesh)),
                state.opt_state,
                is_leaf=lambda x: _is_params_like(x, params)))
        state = jax.jit(
            lambda s: s, out_shardings=state_shardings)(state)

        update_cycle = int(args.get("update_cycle") or 1)
        extra_loss_fn = None
        if args.get("enable_quant"):
            # the layers quantize themselves (learned clip-max vars,
            # built under quant_layers.global_init from run_exp); here
            # we only add the reference's L2 penalty on the clip vars
            from neurst_tpu.layers.quantization.quant_layers import \
                clip_l2_penalty
            extra_loss_fn = clip_l2_penalty
            logging.info("Quantization-aware training enabled (learned "
                         "clip-max fake quantization)")
        train_step = make_train_step(model, criterion, tx,
                                     update_cycle=update_cycle,
                                     lr_schedule=lr_schedule,
                                     extra_loss_fn=extra_loss_fn,
                                     remat=bool(args.get("gradient_remat")))
        # batch shardings are inherited from put_batch's placement (the
        # batch may contain 0-d fields, e.g. waitk_lagging, which are
        # replicated rather than data-sharded)
        jit_step = jax.jit(train_step,
                           in_shardings=(state_shardings, None, None),
                           out_shardings=(state_shardings, None),
                           donate_argnums=(0,))

        # ---------------- the loop ---------------- #
        train_steps = int(args.get("train_steps") or 10_000_000)
        save_every = int(args.get("save_checkpoint_steps") or 1000)
        log_every = int(args.get("summary_steps") or 200)
        from neurst_tpu.training.summary import (SummaryWriterWrapper,
                                                 maybe_start_profiler)
        writer = SummaryWriterWrapper(
            os.path.join(model_dir, "train") if model_dir else None,
            enabled=bool(args.get("enable_tensorboard", True))
            and jax.process_index() == 0)
        maybe_start_profiler(model_dir, bool(args.get("enable_profiler")))
        validator = None
        if args.get("validator.class"):
            from neurst_tpu.training.validator import build_validator
            validator = build_validator(args).build(task, model, model_dir)
            logging.info("Inline validator: %s", args["validator.class"])
        # bucket batch sizes must divide dp (and per-micro-batch dp
        # when accumulating), and the pipeline microbatch count when
        # layer pipelining is on (layers/pipeline.py reshapes the batch
        # into [microbatches, batch//microbatches, ...])
        batch_args = dict(args)
        multiple = max(8, num_replicas * update_cycle)
        mp_cfg = dict(args.get("model.params") or {})
        for side in ("encoder", "decoder"):
            stages = int(mp_cfg.get(f"{side}.pipeline_stages") or 1)
            if stages > 1:
                mb = int(mp_cfg.get(f"{side}.pipeline_microbatches")
                         or stages)
                multiple = multiple * mb // math.gcd(multiple, mb)
        batch_args["batch_size_multiple"] = multiple
        batch_iter_fn = task.create_batch_iterator(
            self._custom_dataset, compat.ModeKeys.TRAIN, batch_args,
            num_replicas_in_sync=num_replicas,
            shard_id=jax.process_index(),
            total_shards=jax.process_count())
        step_rng = jax.random.PRNGKey(int(args.get("seed") or 0) + 1)

        step = init_step
        window_start = time.perf_counter()
        window_tokens = 0
        window_samples = 0
        last_loss = None
        logging.info("Start training from step %d to %d", step, train_steps)
        def _resilient_batches():
            """Retries transient data/IO errors up to 10 times per
            epoch (parity: reference gradaccum_keras_model.py:285-300,
            which catches only tf.errors data errors).  On retry the
            fresh iterator is fast-forwarded past the batches already
            consumed (plus the failing one) so nothing is re-trained.
            Multi-host runs fail fast instead: one host silently
            replaying or skipping batches would desynchronize per-host
            step counts at the jitted collectives."""
            retries = 0
            consumed = 0
            it = batch_iter_fn()
            while True:
                try:
                    yield next(it)
                    consumed += 1
                    continue
                except StopIteration:
                    return
                except (IOError, EOFError, ValueError) as e:
                    if jax.process_count() > 1:
                        raise
                    retries += 1
                    if retries > 10:
                        raise
                    logging.warning(
                        "data error (retry %d/10) after %d batches, "
                        "skipping the failing batch: %s",
                        retries, consumed, e)
                    it = batch_iter_fn()
                    skip = consumed + 1  # +1: skip the failing batch
                    for _ in range(skip):
                        try:
                            next(it)
                        except StopIteration:
                            return
                        except (IOError, EOFError, ValueError):
                            pass  # same bad record during fast-forward
                    consumed = skip

        with mesh:
            while step < train_steps:
                epoch_batches = 0
                for batch in _resilient_batches():
                    host_batch = batch
                    if update_cycle > 1:
                        host_batch = _split_microbatches(batch, update_cycle)
                        if host_batch is None:
                            continue
                    # micro-batched arrays carry [update_cycle, B, ...]:
                    # the example axis (1) is the data-sharded one
                    device_batch = put_batch(
                        mesh, host_batch,
                        batch_axis=1 if update_cycle > 1 else 0)
                    state, metrics = jit_step(state, device_batch, step_rng)
                    step += 1
                    epoch_batches += 1
                    if "trg_length" in batch:
                        window_tokens += int(np.sum(batch["trg_length"]))
                    window_samples += int(np.sum(
                        batch.get("sample_mask",
                                  np.ones(_lead_dim(batch)))))
                    if step % log_every == 0:
                        last_loss = float(metrics["loss"])
                        elapsed = time.perf_counter() - window_start
                        logging.info(
                            "step %d | loss %.4f | lr %.3e | grad_norm %.3f"
                            " | %.2f steps/s | %.3f secs/step |"
                            " %.0f tokens/s | %.1f samples/s",
                            step, last_loss,
                            float(metrics.get("lr", 0.0)),
                            float(metrics.get("grad_norm", 0.0)),
                            log_every / elapsed, elapsed / log_every,
                            window_tokens / elapsed,
                            window_samples / elapsed)
                        scalars = {
                            "loss": last_loss,
                            "lr": float(metrics.get("lr", 0.0)),
                            "grad_norm":
                                float(metrics.get("grad_norm", 0.0)),
                            "steps_per_sec": log_every / elapsed,
                            "tokens_per_sec": window_tokens / elapsed,
                            "samples_per_sec": window_samples / elapsed}
                        aux = float(metrics.get("aux_loss", 0.0))
                        if aux:  # model-internal term (MoE balance)
                            scalars["aux_loss"] = aux
                        writer.scalars("training", scalars, step)
                        window_start = time.perf_counter()
                        window_tokens = 0
                        window_samples = 0
                    # orbax saves are collective (every process writes
                    # its own shards); npz gathers on process 0 only
                    if step % save_every == 0 and model_dir \
                            and (self._ckpt_format(args) == "orbax"
                                 or jax.process_index() == 0):
                        self._save(model_dir, step, state, args)
                    if validator is not None \
                            and validator.should_eval(step):
                        params_host = jax.tree_util.tree_map(
                            np.asarray, state.params)
                        if validator.validate(step, params_host):
                            logging.info("Early stop at step %d.", step)
                            train_steps = step
                    if step >= train_steps:
                        break
                if epoch_batches == 0:
                    logging.warning("Empty dataset epoch; stopping.")
                    break
        if model_dir and (self._ckpt_format(args) == "orbax"
                          or jax.process_index() == 0):
            self._save(model_dir, step, state, args)
        writer.close()
        if last_loss is None and "metrics" in locals():
            # train_steps < summary_steps: no summary point was hit
            last_loss = float(metrics["loss"])
        logging.info("Training finished at step %d (last loss: %s)",
                     step, last_loss)
        return state

    def _wrap_tx(self, tx):
        """Subclass hook: wrap the final optimizer chain (e.g. the
        prune_tune partial trainer masks updates here)."""
        return tx

    @staticmethod
    def _ckpt_format(args):
        return args.get("checkpoint_format") or "npz"

    @staticmethod
    def _params_for_save(state, args):
        """With --bf16_params the live params are bf16 and the f32
        master lives in the optimizer state — checkpoints keep f32."""
        if args.get("bf16_params"):
            for entry in jax.tree_util.tree_leaves(
                    state.opt_state,
                    is_leaf=lambda x: isinstance(x, dict)
                    and "master" in x):
                if isinstance(entry, dict) and "master" in entry:
                    return entry["master"]
        return state.params

    def _save(self, model_dir, step, state, args):
        keep = args.get("checkpoints_max_to_keep") or 8
        if self._ckpt_format(args) == "orbax":
            from neurst_tpu.utils import orbax_checkpoints as orbax_lib
            path = orbax_lib.save_checkpoint_orbax(
                model_dir, step, self._params_for_save(state, args),
                max_to_keep=keep)
            orbax_lib.save_checkpoint_orbax_raw(
                path.replace(".orbax", ".optstate.orbax"),
                state.opt_state)
            return
        params_host = jax.tree_util.tree_map(
            np.asarray, self._params_for_save(state, args))
        opt_bytes = serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, state.opt_state))
        ckpt_lib.save_checkpoint(
            model_dir, step, params_host, opt_bytes,
            max_to_keep=keep)


def _lead_dim(batch):
    for v in batch.values():
        if hasattr(v, "shape") and len(v.shape) >= 1:
            return v.shape[0]
    return 1


_SPLIT_DROPPED = {"count": 0}


def _split_microbatches(batch, update_cycle):
    """[B, ...] -> [update_cycle, B//update_cycle, ...] per leaf.

    0-d fields (e.g. waitk_lagging) broadcast across micro-steps.
    Returns None (and counts it, loudly every 100 drops) when the batch
    dim does not divide update_cycle."""
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "shape") or v.dtype == object:
            continue
        if v.ndim == 0:
            out[k] = np.broadcast_to(v, (update_cycle,))
            continue
        b = v.shape[0]
        if b % update_cycle != 0:
            _SPLIT_DROPPED["count"] += 1
            if _SPLIT_DROPPED["count"] % 100 == 1:
                logging.warning(
                    "Dropped %d batches whose batch dim %% update_cycle "
                    "!= 0 (latest: %s %% %d); align bucket batch sizes "
                    "with update_cycle.", _SPLIT_DROPPED["count"], b,
                    update_cycle)
            return None
        out[k] = v.reshape((update_cycle, b // update_cycle) + v.shape[1:])
    return out


def _is_params_like(x, params):
    """Heuristic: optimizer-state subtrees with the same structure as
    params (e.g. Adam moments) shard like params."""
    try:
        return (jax.tree_util.tree_structure(x)
                == jax.tree_util.tree_structure(params))
    except Exception:
        return False
