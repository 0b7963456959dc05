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
"""Sequence-to-sequence task.

Parity: /root/reference/neurst/tasks/seq2seq.py — src/trg
TextDataPipelines, fairseq-compatible ``target_begin_of_sentence`` eos
option (123-135), truncation, token-bucketed training batches with
associated src/trg boundaries (251-271), eval metric from the target
language.

TPU-first: batches come from the static-shape bucketed batcher
(``neurst_tpu/data/dataset_utils.py``) and every batch carries
``sample_mask`` so padded rows never contribute to the loss.
"""

import logging
from typing import Optional

import numpy as np

from neurst_tpu.data import dataset_utils
from neurst_tpu.data.data_pipelines.data_pipeline import build_data_pipeline
from neurst_tpu.data.data_pipelines.text_data_pipeline import TextDataPipeline
from neurst_tpu.metrics.metric import build_metric
from neurst_tpu.models.model import build_model
from neurst_tpu.tasks.task import Task, register_task
from neurst_tpu.utils.compat import DataStatus, ModeKeys
from neurst_tpu.utils.configurable import deep_merge_dict
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["Seq2Seq"]


def _build_pipeline(args, key):
    cls = args.get(f"{key}.class") or "TextDataPipeline"
    params = args.get(f"{key}.params") or {}
    return build_data_pipeline(
        {"data_pipeline.class": cls, "data_pipeline.params": params})


@register_task("seq_to_seq")
class Seq2Seq(Task):

    def __init__(self, args=None):
        super().__init__(args)
        self._src_data_pipeline = _build_pipeline(self._args,
                                                  "src_data_pipeline")
        self._trg_data_pipeline = _build_pipeline(self._args,
                                                  "trg_data_pipeline")
        self._target_begin_of_sentence = self._args.get(
            "target_begin_of_sentence") or "bos"

    @property
    def src_pipeline(self):
        return self._src_data_pipeline

    @property
    def trg_pipeline(self):
        return self._trg_data_pipeline

    def get_config(self):
        return {
            "src_data_pipeline.class":
                type(self._src_data_pipeline).__name__,
            "src_data_pipeline.params": self._src_data_pipeline.config,
            "trg_data_pipeline.class":
                type(self._trg_data_pipeline).__name__,
            "trg_data_pipeline.params": self._trg_data_pipeline.config,
            "target_begin_of_sentence": self._target_begin_of_sentence,
        }

    @staticmethod
    def class_or_method_args():
        args = Task.class_or_method_args()
        args.extend([
            ModuleFlag("src_data_pipeline", "data_pipeline",
                       help="The source side data pipeline."),
            ModuleFlag("trg_data_pipeline", "data_pipeline",
                       help="The target side data pipeline."),
            Flag("target_begin_of_sentence", dtype=Flag.TYPE.STRING,
                 default="bos", choices=["bos", "eos"],
                 help="The BOS symbol for the target side ('eos' for "
                      "fairseq compatibility)."),
        ])
        return args

    def build_model(self, args, name=None, **kwargs):
        return build_model(args, src_meta=self._src_data_pipeline.meta,
                           trg_meta=self._trg_data_pipeline.meta,
                           name=name, **kwargs)

    # ----------------------- data processing --------------------- #

    def get_data_preprocess_fn(self, mode, data_status=DataStatus.RAW,
                               args=None):
        if args is None:
            args = self._args
        else:
            args = deep_merge_dict(self._args, args, local_overwrite=False)
        truncate_src = args.get("truncate_src")
        truncate_trg = args.get("truncate_trg")
        max_src_len = args.get("max_src_len")
        max_trg_len = args.get("max_trg_len")

        def _one(text, dp, trunc, max_len):
            if data_status != DataStatus.PROJECTED:
                text = dp.encode(
                    text, is_processed=(data_status == DataStatus.PROCESSED))
            text = [int(x) for x in text]
            if mode == ModeKeys.TRAIN and trunc and max_len \
                    and len(text) > max_len:
                text = text[:max_len - 1] + text[-1:]
            return text

        def _process(data):
            out = {"feature": _one(data["feature"], self._src_data_pipeline,
                                   truncate_src, max_src_len)}
            if "label" in data and mode != ModeKeys.INFER:
                out["label"] = _one(data["label"], self._trg_data_pipeline,
                                    truncate_trg, max_trg_len)
            return out
        return _process

    def get_data_postprocess_fn(self, data_status, is_src=False, **kwargs):
        dp = self._src_data_pipeline if is_src else self._trg_data_pipeline
        if data_status == DataStatus.PROJECTED:
            return dp.decode
        if data_status == DataStatus.PROCESSED:
            return dp.postprocess
        return lambda x: x

    def example_to_input(self, batch_of_data: dict, mode) -> dict:
        src = batch_of_data["feature"]
        src_len = batch_of_data.get("feature_length")
        if src_len is None:
            pad = self._src_data_pipeline.meta["pad_id"]
            src_len = np.sum((src != pad).astype(np.int32), axis=1) + 1
            src_len = np.minimum(src_len, src.shape[1])
        positions = np.arange(src.shape[1])[None, :]
        input_dict = {
            "src": src,
            "src_length": src_len,
            "src_padding": (positions >= src_len[:, None]).astype(np.float32),
        }
        if "sample_mask" in batch_of_data:
            input_dict["sample_mask"] = batch_of_data["sample_mask"]
        bos = (self._trg_data_pipeline.meta["eos_id"]
               if self._target_begin_of_sentence == "eos"
               else self._trg_data_pipeline.meta["bos_id"])
        batch = src.shape[0]
        if mode == ModeKeys.INFER:
            input_dict["trg_input"] = np.full([batch], bos, np.int32)
        else:
            trg = batch_of_data["label"]
            trg_len = batch_of_data.get("label_length")
            if trg_len is None:
                pad = self._trg_data_pipeline.meta["pad_id"]
                trg_len = np.minimum(
                    np.sum((trg != pad).astype(np.int32), axis=1) + 1,
                    trg.shape[1])
            tpos = np.arange(trg.shape[1])[None, :]
            input_dict["trg"] = trg
            input_dict["trg_length"] = trg_len
            input_dict["trg_padding"] = (
                tpos >= trg_len[:, None]).astype(np.float32)
            input_dict["trg_input"] = np.concatenate(
                [np.full([batch, 1], bos, np.int32), trg[:, :-1]], axis=1)
        return input_dict

    # -------------------------- batching ------------------------- #

    def create_batch_iterator(self, ds, mode, args=None,
                              num_replicas_in_sync=1,
                              shard_id=0, total_shards=1):
        if args is None:
            args = self._args
        else:
            args = deep_merge_dict(self._args, args, local_overwrite=False)
        preprocess = self.get_data_preprocess_fn(mode, ds.status, args)
        src_pad = self._src_data_pipeline.meta["pad_id"]
        trg_pad = self._trg_data_pipeline.meta["pad_id"]
        default_bs = None if mode == ModeKeys.TRAIN else 32
        batch_size = dataset_utils.adjust_batch_size(
            args.get("batch_size") or default_bs,
            args.get("batch_size_per_gpu") or args.get(
                "batch_size_per_replica"),
            num_replicas_in_sync, verbose=(shard_id == 0))
        length_multiple = int(args.get("pad_length_multiple") or 8)

        def make_iter():
            it = ds.build_iterator(map_func=preprocess, shard_id=shard_id,
                                   total_shards=total_shards)()
            if mode == ModeKeys.TRAIN:
                shuffle_buffer = args.get("shuffle_buffer")
                if shuffle_buffer is None or shuffle_buffer > 0:
                    it = dataset_utils.shuffle_iterator(
                        it, shuffle_buffer or 10000)
                if args.get("batch_by_tokens"):
                    max_src = args.get("max_src_len") or 128
                    max_trg = args.get("max_trg_len") or 128
                    b_src = dataset_utils.create_batch_bucket_boundaries(
                        max_src, length_multiple=length_multiple)
                    b_trg = dataset_utils.create_batch_bucket_boundaries(
                        max_trg, length_multiple=length_multiple)
                    b_src, b_trg = dataset_utils.associated_bucket_boundaries(
                        b_src, b_trg)
                    batches = dataset_utils.batch_by_tokens_bucketed(
                        it, batch_size,
                        {"feature": b_src, "label": b_trg},
                        {"feature": src_pad, "label": trg_pad},
                        lambda ex: {"feature": len(ex["feature"]),
                                    "label": len(ex["label"])},
                        batch_size_multiple=(
                            args.get("batch_size_multiple")
                            or max(8, num_replicas_in_sync)))
                else:
                    batches = dataset_utils.batch_fixed_size(
                        it, batch_size,
                        {"feature": src_pad, "label": trg_pad},
                        fields=["feature", "label"],
                        pad_length_multiple=length_multiple)
            else:
                fields = ["feature"]
                probe = None
                if mode == ModeKeys.EVAL:
                    fields.append("label")
                batches = dataset_utils.batch_fixed_size(
                    it, batch_size,
                    {"feature": src_pad, "label": trg_pad},
                    fields=fields, pad_length_multiple=length_multiple)
            yield from dataset_utils.prefetch_iterator(
                (self.example_to_input(b, mode) for b in batches))
        return make_iter

    def get_eval_metric(self, args, name="metric", ds=None):
        metric_cls = args.get(f"{name}.class") or "BLEU"
        params = dict(args.get(f"{name}.params") or {})
        params.setdefault(
            "language", self._trg_data_pipeline.meta.get("language", "en"))
        return build_metric({"metric.class": metric_cls,
                             "metric.params": params})
