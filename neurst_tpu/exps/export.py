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
"""Serving export entry.

Parity: /root/reference/neurst/exps/sequence_generator_savedmodel.py —
the reference exports a TF SavedModel for TF-Serving; the TPU-native
equivalent is a serialized StableHLO module of the jitted generation
function (plus the checkpoint and ``model_configs.yml``), loadable by
any PJRT-based runtime without Python model code.
"""

import logging
import os
import shutil

import jax
import numpy as np

from neurst_tpu.exps.base_experiment import BaseExperiment, register_exp
from neurst_tpu.exps.sequence_generator import SequenceGenerator
from neurst_tpu.layers.search.sequence_search import build_search_layer
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["GenerationExporter"]


@register_exp("export", "generation_savedmodel",
              "sequence_generator_savedmodel")
class GenerationExporter(BaseExperiment):

    @staticmethod
    def class_or_method_args():
        return [
            ModuleFlag("search_method", "search_method",
                       default="beam_search", help="The search layer."),
            Flag("export_path", dtype=Flag.TYPE.STRING, default=None,
                 help="Output directory for the exported module."),
            Flag("export_batch_size", dtype=Flag.TYPE.INTEGER, default=8,
                 help="The fixed serving batch size."),
            Flag("export_src_length", dtype=Flag.TYPE.INTEGER, default=128,
                 help="The fixed padded source length (tokens for text "
                      "models, fbank frames for speech models, raw "
                      "samples when --export_raw_audio)."),
            Flag("export_raw_audio", dtype=Flag.TYPE.BOOLEAN,
                 default=None,
                 help="Speech models: serve RAW waveforms — the module "
                      "runs log-mel fbank + CMVN on-device "
                      "(ops/device_fbank.py) before the encoder, so "
                      "clients send PCM floats, not features. "
                      "Single-channel fbank features only."),
            Flag("export_sample_rate", dtype=Flag.TYPE.INTEGER,
                 default=16000,
                 help="Serving sample rate for --export_raw_audio; must "
                      "match the rate the training features used."),
            Flag("export_fbank_params", dtype=Flag.TYPE.STRING,
                 default=None,
                 help="Overrides for the on-device extractor, e.g. "
                      "'{winlen: 0.025, winstep: 0.01, nfft: 512}' — "
                      "must mirror the data-prep feature_extractor "
                      "config."),
        ]

    def run(self):
        args = self._args
        export_path = args.get("export_path") or os.path.join(
            self._model_dir or ".", "export")
        os.makedirs(export_path, exist_ok=True)
        model = self._model
        params = model.init_params(jax.random.PRNGKey(0))
        path = ckpt_lib.latest_checkpoint(self._model_dir)
        if path:
            flat = ckpt_lib.restore_checkpoint_params(path)
            # bf16-at-rest (and int8 under --int8_serving) weights
            # inside the exported artifact: identical serving outputs,
            # half/quarter the artifact/HBM bytes
            from neurst_tpu.utils.param_policy import \
                restore_inference_params
            params, _ = restore_inference_params(model, params, flat)
        search = build_search_layer(args)
        search.set_model(model)

        batch = int(args.get("export_batch_size") or 8)
        src_len = int(args.get("export_src_length") or 128)
        feat_dim = getattr(self._task, "_audio_feature_dim", None)
        if args.get("export_raw_audio"):
            if feat_dim is None:
                raise ValueError("--export_raw_audio requires a speech "
                                 "task (audio_feature_dim).")
            channels = getattr(self._task, "_audio_feature_channels", 1)
            if channels != 1:
                raise ValueError(
                    "--export_raw_audio supports single-channel fbank "
                    f"features only (task has audio_feature_channels="
                    f"{channels}; delta channels are not computed "
                    f"on-device) — export on features instead.")
            from neurst_tpu.ops.device_fbank import device_logfbank
            fbank_kwargs = {"samplerate":
                            int(args.get("export_sample_rate") or 16000)}
            extra = args.get("export_fbank_params")
            if isinstance(extra, str):
                import yaml as _yaml
                extra = _yaml.safe_load(extra)
            fbank_kwargs.update(extra or {})
            example = {
                "audio": np.zeros([batch, src_len], np.float32),
                "audio_length": np.full([batch], src_len, np.int32),
                "trg_input": np.zeros([batch], np.int32),
            }

            def serve(p, inp):
                feats, fl = device_logfbank(
                    inp["audio"], inp["audio_length"], nfilt=feat_dim,
                    **fbank_kwargs)
                return search(p, {
                    "src": feats[..., None],
                    "src_length": fl,
                    "trg_input": inp["trg_input"]})

            fn = jax.jit(serve)
        elif feat_dim is not None:  # speech model served on features
            channels = getattr(self._task, "_audio_feature_channels", 1)
            example = {
                "src": np.zeros([batch, src_len, feat_dim, channels],
                                np.float32),
                "src_length": np.full([batch], src_len, np.int32),
                "trg_input": np.zeros([batch], np.int32),
            }
            fn = jax.jit(lambda p, inp: search(p, inp))
        else:
            example = {
                "src": np.zeros([batch, src_len], np.int32),
                "src_padding": np.zeros([batch, src_len], np.float32),
                "trg_input": np.zeros([batch], np.int32),
            }
            fn = jax.jit(lambda p, inp: search(p, inp))
        lowered = fn.lower(params, example)
        stablehlo = lowered.as_text(dialect="stablehlo")
        with open(os.path.join(export_path, "generation.stablehlo.mlir"),
                  "w") as f:
            f.write(stablehlo)
        # a serialized jax.export artifact rides along too: unlike the
        # raw MLIR text it is directly reloadable
        # (jax.export.deserialize(...).call(params, inp)) with the
        # calling convention and pytree structure preserved — the
        # TPU-native analogue of a servable SavedModel signature
        try:
            from jax import export as jax_export
            exported = jax_export.export(fn)(params, example)
            with open(os.path.join(export_path, "generation.jaxexport.bin"),
                      "wb") as f:
                f.write(exported.serialize())
        except Exception as e:  # pragma: no cover - version-dependent
            logging.warning("jax.export serialization skipped: %s", e)
        # checkpoint + configs ride along so the export dir is
        # self-contained (parity: savedmodel + model_configs.yml copy)
        ckpt_lib.save_checkpoint(export_path, 0, params, max_to_keep=None)
        cfg = os.path.join(self._model_dir or "", "model_configs.yml")
        if os.path.exists(cfg):
            shutil.copy(cfg, os.path.join(export_path, "model_configs.yml"))
        logging.info("Exported StableHLO generation module to %s",
                     export_path)
        return export_path
