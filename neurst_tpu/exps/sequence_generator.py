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
"""The generation ("predict") entry.

Parity: /root/reference/neurst/exps/sequence_generator.py — builds the
search layer over the model (61-84), restores checkpoints (single or
averaged), writes hypotheses and computes the metric against targets
(118-216).  Decoding is jit-compiled per padded source-shape bucket; the
bounded shape set comes from the fixed-size batcher.
"""

import logging
import time
from typing import Optional

import jax
import numpy as np

from neurst_tpu.exps.base_experiment import BaseExperiment, register_exp
from neurst_tpu.layers.search.sequence_search import build_search_layer
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.compat import ModeKeys
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["SequenceGenerator"]


@register_exp("predict", "generation")
class SequenceGenerator(BaseExperiment):

    @staticmethod
    def class_or_method_args():
        return [
            ModuleFlag("search_method", "search_method",
                       default="beam_search", help="The search layer."),
            ModuleFlag("metric", "metric", help="The evaluation metric."),
            Flag("output_file", dtype=Flag.TYPE.STRING, default=None,
                 help="The file to write hypotheses to."),
            Flag("save_metric", dtype=Flag.TYPE.STRING, default=None,
                 help="Path to dump the metric result JSON."),
            Flag("checkpoint_path", dtype=Flag.TYPE.STRING, default=None,
                 help="Explicit checkpoint path (defaults to latest in "
                      "model_dir)."),
            Flag("decode_data_parallel", dtype=Flag.TYPE.BOOLEAN,
                 default=None,
                 help="Shard decode batches over all devices (on by "
                      "default with >1 device; pass false to pin to "
                      "one)."),
            Flag("decode_tensor_parallel", dtype=Flag.TYPE.INTEGER,
                 default=None,
                 help="Shard the model's parameters (heads/mlp/vocab "
                      "logical axes) over this many devices during "
                      "decode; composes with data parallelism (mesh = "
                      "dp x tp over all devices). For models too large "
                      "for one chip's HBM."),
        ]

    def restore_params(self, params):
        path = self._args.get("checkpoint_path")
        if path is None and self._model_dir:
            path = ckpt_lib.latest_checkpoint(self._model_dir)
        if path is None:
            logging.warning("No checkpoint found; using random init.")
            return params
        flat = ckpt_lib.restore_checkpoint_params(path)
        from neurst_tpu.utils.param_policy import restore_inference_params
        params, _ = restore_inference_params(self._model, params, flat)
        logging.info("Restored generation model from %s", path)
        return params

    def _dp_placement(self, params):
        """Scale-out decode placement (the reference's predict is
        single-replica).  Default: replicate params over a "data" mesh
        and shard each batch's leading axis — XLA partitions the whole
        beam search SPMD.  With --decode_tensor_parallel N, the params'
        logical axes (heads/mlp/vocab) additionally shard over an
        N-way "model" axis (mesh = dp x tp over all devices) — serving
        models too large for one chip's HBM."""
        import jax as _jax
        tp = int(self._args.get("decode_tensor_parallel") or 1)
        dp_off = self._args.get("decode_data_parallel") is False
        if _jax.device_count() <= 1 or (tp <= 1 and dp_off):
            return None, params
        from neurst_tpu.parallel.mesh import (make_mesh, params_shardings,
                                              replicated)
        if tp > 1 and dp_off:
            # honor --decode_data_parallel false: tp-only mesh over the
            # first tp devices (batches stay whole on the size-1 axis)
            mesh = make_mesh(data_parallel=1, model_parallel=tp,
                             devices=_jax.devices()[:tp])
        else:
            mesh = make_mesh(model_parallel=max(tp, 1))
        if tp > 1 and params is not None:
            shardings = params_shardings(
                mesh, self._model.params_spec(), params)
            params = _jax.device_put(params, shardings)
            logging.info("Decode over %d-way data x %d-way tensor "
                         "parallelism", mesh.shape["data"], tp)
        else:
            params = _jax.device_put(params, replicated(mesh))
            logging.info("Data-parallel decode over %d devices",
                         mesh.shape["data"])
        return mesh, params

    def _dp_put(self, mesh, inp):
        import jax as _jax
        from neurst_tpu.parallel.mesh import batch_sharding, replicated
        dp = mesh.shape["data"]
        out = {}
        for k, v in inp.items():
            shardable = (getattr(v, "ndim", 0) >= 1
                         and v.shape[0] % dp == 0)
            out[k] = _jax.device_put(
                v, batch_sharding(mesh) if shardable else replicated(mesh))
        return out

    def _calibrate_int8_static(self, params, batch_iter):
        """Self-calibration of static int8 activation scales
        (--int8_static_activations): with calibration mode on (the
        dynamic per-token path stays active), decode the first
        --int8_calibration_batches batches, teacher-force the model's
        OWN hypotheses while recording every dense input's running
        absmax, and write ``act_scale = absmax / 127`` into the served
        params — PTQ calibration with no references needed at predict
        time."""
        from neurst_tpu.layers.quantization.quant_layers import (
            set_int8_calibration, write_calibrated_act_scales)
        n = int(self._args.get("int8_calibration_batches") or 4)
        module = self._model._module
        set_int8_calibration(True)
        try:
            generate = self.build_generation_fn(params)
            record = jax.jit(lambda p, inp: module.apply(
                {"params": p}, inputs=inp, is_training=False,
                mutable=["calibration"])[1]["calibration"])
            agg = None
            count = 0
            for batch in batch_iter():
                model_inp = {k: v for k, v in batch.items()
                             if isinstance(v, np.ndarray)
                             and v.dtype != object}
                hyp, _ = generate(model_inp)
                hyp = np.asarray(hyp)
                bos = np.asarray(model_inp["trg_input"]).reshape(-1)
                bsz = bos.shape[0]
                top = hyp[:: max(hyp.shape[0] // bsz, 1)]
                trg_input = np.concatenate(
                    [bos[:, None], top[:, :-1]], axis=1).astype(np.int32)
                cal = jax.tree_util.tree_map(
                    np.asarray,
                    record(params, dict(model_inp, trg_input=trg_input)))
                agg = cal if agg is None else jax.tree_util.tree_map(
                    np.maximum, agg, cal)
                count += 1
                if count >= n:
                    break
            if agg is None:
                logging.warning("int8 static calibration saw no batches; "
                                "act scales keep their init values")
                return params
            logging.info("Calibrated static int8 activation scales on "
                         "%d batches", count)
            return write_calibrated_act_scales(params, agg)
        finally:
            set_int8_calibration(False)

    def build_generation_fn(self, params):
        """Returns fn(model_inputs) -> (hypotheses ids, scores).

        Sampling searches receive a fresh per-batch rng (folded from a
        traced counter) so corpus decodes are not correlated batch to
        batch."""
        mesh, params = self._dp_placement(params)
        search = build_search_layer(self._args)
        search.set_model(self._model)
        search.prepare()  # host-side setup (e.g. draft model restore)
        import inspect
        takes_rng = "rng" in inspect.signature(
            search.__call__).parameters
        if takes_rng:
            base = jax.random.PRNGKey(
                int(self._args.get("seed") or 0) + 7)
            jit_search = jax.jit(
                lambda p, inp, i: search(
                    p, inp, rng=jax.random.fold_in(base, i)))
            counter = [0]

            def fn(inp):
                counter[0] += 1
                if mesh is not None:
                    inp = self._dp_put(mesh, inp)
                return jit_search(params, inp,
                                  jnp_asarray(counter[0]))
            import jax.numpy as _jnp

            def jnp_asarray(x):
                return _jnp.asarray(x, _jnp.int32)
            return fn
        jit_search = jax.jit(lambda p, inp: search(p, inp))
        if mesh is not None:
            return lambda inp: jit_search(params, self._dp_put(mesh, inp))
        return lambda inp: jit_search(params, inp)

    def _maybe_build_ensemble(self):
        """Multiple model_dirs (comma-separated) -> prob-space ensemble
        (parity: sequence_generator.py:86-109)."""
        from neurst_tpu.utils.configurable import (
            ModelConfigs, flatten_string_list,
            strip_training_only_model_flags)
        model_dirs = flatten_string_list(self._model_dir)
        if len(model_dirs) <= 1:
            return None
        from neurst_tpu.models.ensemble_model import \
            EncoderDecoderEnsembleModel
        from neurst_tpu.tasks.task import build_task
        models, params_list = [], []
        for d in model_dirs:
            cfg = ModelConfigs.load(d)
            cfg["model.params"] = strip_training_only_model_flags(
                cfg.get("model.params"))
            task = build_task(cfg)
            model = task.build_model(cfg)
            params = model.init_params(jax.random.PRNGKey(0))
            path = ckpt_lib.latest_checkpoint(d)
            from neurst_tpu.utils.param_policy import \
                restore_inference_params
            if path:
                flat = ckpt_lib.restore_checkpoint_params(path)
                params, _ = restore_inference_params(model, params, flat)
                logging.info("Restored ensemble member from %s", path)
            else:
                params, _ = restore_inference_params(model, params, {})
            models.append(model)
            params_list.append(params)
        weights = (self._args.get("ensemble_weights")
                   or (self._args.get("search_method.params")
                       or {}).get("ensemble_weights"))
        if isinstance(weights, str):
            weights = [float(x) for x in weights.split(",")]
        return EncoderDecoderEnsembleModel(models, params_list, weights)

    def run(self):
        from neurst_tpu.data.datasets.mixed_train_dataset import \
            MultipleDataset
        if isinstance(self._custom_dataset, MultipleDataset):
            # per-dataset decode + metrics with a weighted mixture
            # (parity: sequence_generator.py multi-dataset handling)
            all_results = {}
            weighted = {}
            base_output = self._args.get("output_file")
            base_metric = self._args.get("save_metric")
            for name, sub in sorted(
                    self._custom_dataset.datasets.items()):
                logging.info("===== decoding dataset '%s' =====", name)
                sub_exp = SequenceGenerator(
                    dict(self._args,
                         output_file=(f"{base_output}.{name}"
                                      if base_output else None),
                         save_metric=(f"{base_metric}.{name}"
                                      if base_metric else None)),
                    task=self._task, model=self._model,
                    custom_dataset=sub, model_dir=self._model_dir)
                res = sub_exp.run()
                all_results[name] = res
                w = self._custom_dataset.sample_weights.get(name, 0.0)
                for k, v in res.items():
                    if isinstance(v, (int, float)) and k != "samples":
                        weighted[k] = weighted.get(k, 0.0) + w * v
            logging.info("Weighted mixture metrics: %s", weighted)
            if base_metric:
                import json
                with open(base_metric, "w") as f:
                    json.dump({"datasets": {
                        k: {m: v for m, v in r.items()
                            if isinstance(v, (int, float))}
                        for k, r in all_results.items()},
                        "weighted": weighted}, f, indent=2)
            return {"datasets": all_results, "weighted": weighted}
        task = self._task
        args = self._args
        ensemble = self._maybe_build_ensemble()
        if ensemble is not None:
            self._model = ensemble
            model = ensemble
            params = None
        else:
            model = self._model
            params = self.restore_params(
                model.init_params(jax.random.PRNGKey(0)))
        batch_iter = task.create_batch_iterator(
            self._custom_dataset, ModeKeys.INFER, args)
        from neurst_tpu.layers.quantization.quant_layers import \
            int8_static_act_enabled
        if params is not None and int8_static_act_enabled():
            params = self._calibrate_int8_static(params, batch_iter)
        generate = self.build_generation_fn(params)
        postprocess = task.get_data_postprocess_fn(
            self._custom_dataset.status)
        # PROJECTED datasets still need id->text decoding of hypotheses
        from neurst_tpu.utils.compat import DataStatus
        hypo_decode = task.get_data_postprocess_fn(DataStatus.PROJECTED)

        hypotheses = []
        scores = []
        n_samples = 0
        start = time.perf_counter()
        for batch in batch_iter():
            model_inp = {k: v for k, v in batch.items()
                         if isinstance(v, np.ndarray) and v.dtype != object}
            hyp, score = generate(model_inp)
            hyp = np.asarray(hyp)
            score = np.asarray(score)
            mask = batch.get("sample_mask")
            bsz = mask.shape[0] if mask is not None else hyp.shape[0]
            top_k = hyp.shape[0] // bsz
            for i in range(bsz):
                if mask is not None and mask[i] == 0:
                    continue
                ids = hyp[i * top_k].tolist()
                hypotheses.append(hypo_decode(ids))
                scores.append(float(score[i * top_k]))
                n_samples += 1
        elapsed = time.perf_counter() - start
        logging.info("Generation of %d samples took %.2fs (%.2f samples/s)",
                     n_samples, elapsed, n_samples / max(elapsed, 1e-6))

        if args.get("output_file"):
            with open(args["output_file"], "w", encoding="utf-8") as f:
                for h in hypotheses:
                    f.write(h + "\n")
            logging.info("Hypotheses written to %s", args["output_file"])

        results = {"samples": n_samples, "samples_per_sec":
                   n_samples / max(elapsed, 1e-6)}
        targets = task.eval_targets(self._custom_dataset)
        if targets:
            # recover raw text refs (PROCESSED strings need detok too)
            from neurst_tpu.training.validator import recover_targets
            targets = recover_targets(task, self._custom_dataset,
                                      list(targets)[:len(hypotheses)])
            metric = task.get_eval_metric(args)
            metric_result = metric(hypotheses, targets)
            logging.info("Evaluation result: %s", metric_result)
            results.update(metric_result)
            if args.get("save_metric"):
                import json
                with open(args["save_metric"], "w") as f:
                    json.dump(results, f, indent=2)
        return {"hypotheses": hypotheses, "scores": scores, **results}
