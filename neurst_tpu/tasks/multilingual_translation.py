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
"""Many-to-many multilingual translation.

Parity: /root/reference/neurst/tasks/multilingual_translation.py — one
shared MultilingualTextDataPipeline; examples carry ``src_lang``/
``trg_lang``; the target language tag serves as BOS
(``trg_lang_tag_position=trg``) or is prepended to the source
(``=src``); optional source-language tag on the source side.
"""

from typing import Optional

import numpy as np

from neurst_tpu.data import dataset_utils
from neurst_tpu.data.data_pipelines.multilingual_text_data_pipeline import \
    MultilingualTextDataPipeline
from neurst_tpu.metrics.metric import build_metric
from neurst_tpu.models.model import build_model
from neurst_tpu.tasks.task import Task, register_task
from neurst_tpu.utils.compat import DataStatus, ModeKeys
from neurst_tpu.utils.configurable import deep_merge_dict
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["MultilingualTranslation"]

_TRG_LANG_TAG_POSITIONS = ("trg", "target", "src", "source")


@register_task("multilingual_translation")
class MultilingualTranslation(Task):

    def __init__(self, args=None):
        super().__init__(args)
        params = dict(self._args.get("multilingual_dp.params")
                      or self._args.get("data_pipeline.params") or {})
        self._dp = MultilingualTextDataPipeline(**params)
        self._with_src_lang_tag = bool(self._args.get("with_src_lang_tag"))
        self._trg_lang_tag_position = self._args.get(
            "trg_lang_tag_position") or "trg"
        assert self._trg_lang_tag_position in _TRG_LANG_TAG_POSITIONS

    @property
    def pipeline(self):
        return self._dp

    def get_config(self):
        return {
            "multilingual_dp.params": self._dp.config,
            "with_src_lang_tag": self._with_src_lang_tag,
            "trg_lang_tag_position": self._trg_lang_tag_position,
        }

    @staticmethod
    def class_or_method_args():
        args = Task.class_or_method_args()
        args.extend([
            ModuleFlag("multilingual_dp", "data_pipeline",
                       help="The shared multilingual data pipeline."),
            Flag("with_src_lang_tag", dtype=Flag.TYPE.BOOLEAN,
                 default=False,
                 help="Prepend the source-language tag to the source."),
            Flag("trg_lang_tag_position", dtype=Flag.TYPE.STRING,
                 default="trg", choices=list(_TRG_LANG_TAG_POSITIONS),
                 help="Where the target-language tag goes (trg = BOS)."),
        ])
        return args

    def build_model(self, args, name=None, **kwargs):
        return build_model(args, src_meta=self._dp.meta,
                           trg_meta=self._dp.meta, name=name, **kwargs)

    def get_data_preprocess_fn(self, mode, data_status=DataStatus.RAW,
                               args=None):
        if args is None:
            args = self._args
        else:
            args = deep_merge_dict(self._args, args, local_overwrite=False)
        trunc_src = args.get("truncate_src")
        trunc_trg = args.get("truncate_trg")
        max_src = args.get("max_src_len")
        max_trg = args.get("max_trg_len")

        def _one(text, trunc, max_len):
            if data_status != DataStatus.PROJECTED:
                text = self._dp.encode(
                    text, is_processed=(data_status == DataStatus.PROCESSED))
            text = [int(x) for x in text]
            if mode == ModeKeys.TRAIN and trunc and max_len \
                    and len(text) > max_len:
                text = text[:max_len - 1] + text[-1:]
            return text

        def _lang(lang):
            if isinstance(lang, str):
                if lang.startswith("<"):
                    lang = lang[1:-1]
                return self._dp.meta["lang2id"][lang]
            return int(lang)

        def _process(data):
            out = {"feature": _one(data["feature"], trunc_src, max_src),
                   "src_lang": _lang(data["src_lang"]),
                   "trg_lang": _lang(data["trg_lang"])}
            if "label" in data and mode != ModeKeys.INFER:
                out["label"] = _one(data["label"], trunc_trg, max_trg)
            return out
        return _process

    def get_data_postprocess_fn(self, data_status, **kwargs):
        if data_status == DataStatus.PROJECTED:
            return self._dp.decode
        if data_status == DataStatus.PROCESSED:
            return self._dp.postprocess
        return lambda x: x

    def example_to_input(self, batch_of_data, mode):
        src = batch_of_data["feature"]
        batch = src.shape[0]
        src_len = batch_of_data["feature_length"].copy()
        # tag prepends (parity: multilingual_translation.py:120-123)
        prepend = []
        if self._trg_lang_tag_position in ("src", "source"):
            prepend.append(batch_of_data["trg_lang"])
        if self._with_src_lang_tag:
            prepend.append(batch_of_data["src_lang"])
        for tag in prepend:
            src = np.concatenate([tag[:, None].astype(np.int32), src],
                                 axis=1)
            src_len = src_len + 1
        positions = np.arange(src.shape[1])[None, :]
        input_dict = {
            "src": src, "src_length": src_len,
            "src_padding": (positions >= src_len[:, None]).astype(
                np.float32),
        }
        if "sample_mask" in batch_of_data:
            input_dict["sample_mask"] = batch_of_data["sample_mask"]
        if self._trg_lang_tag_position in ("trg", "target"):
            target_bos = batch_of_data["trg_lang"].astype(np.int32)
        else:
            target_bos = np.full([batch], self._dp.meta["bos_id"],
                                 np.int32)
        if mode == ModeKeys.INFER:
            input_dict["trg_input"] = target_bos
        else:
            trg = batch_of_data["label"]
            trg_len = batch_of_data["label_length"]
            tpos = np.arange(trg.shape[1])[None, :]
            input_dict["trg"] = trg
            input_dict["trg_length"] = trg_len
            input_dict["trg_padding"] = (
                tpos >= trg_len[:, None]).astype(np.float32)
            input_dict["trg_input"] = np.concatenate(
                [target_bos[:, None], trg[:, :-1]], axis=1)
        return input_dict

    def create_batch_iterator(self, ds, mode, args=None,
                              num_replicas_in_sync=1,
                              shard_id=0, total_shards=1):
        if args is None:
            args = self._args
        else:
            args = deep_merge_dict(self._args, args, local_overwrite=False)
        preprocess = self.get_data_preprocess_fn(mode, ds.status, args)
        pad = self._dp.meta["pad_id"]
        default_bs = None if mode == ModeKeys.TRAIN else 32
        batch_size = dataset_utils.adjust_batch_size(
            args.get("batch_size") or default_bs,
            args.get("batch_size_per_gpu"),
            num_replicas_in_sync, verbose=(shard_id == 0))
        multiple = int(args.get("pad_length_multiple") or 8)
        lang_fields = ("src_lang", "trg_lang")

        def attach_langs(batch, examples_key="feature"):
            return batch

        def make_iter():
            it = ds.build_iterator(map_func=preprocess, shard_id=shard_id,
                                   total_shards=total_shards)()
            fields = ["feature"] if mode == ModeKeys.INFER \
                else ["feature", "label"]
            if mode == ModeKeys.TRAIN:
                shuffle_buffer = args.get("shuffle_buffer")
                if shuffle_buffer is None or shuffle_buffer > 0:
                    it = dataset_utils.shuffle_iterator(
                        it, shuffle_buffer or 10000)
                if args.get("batch_by_tokens"):
                    max_src = args.get("max_src_len") or 128
                    max_trg = args.get("max_trg_len") or 128
                    b_src = dataset_utils.create_batch_bucket_boundaries(
                        max_src, length_multiple=multiple)
                    b_trg = dataset_utils.create_batch_bucket_boundaries(
                        max_trg, length_multiple=multiple)
                    b_src, b_trg = \
                        dataset_utils.associated_bucket_boundaries(
                            b_src, b_trg)
                    batches = dataset_utils.batch_by_tokens_bucketed(
                        it, batch_size,
                        {"feature": b_src, "label": b_trg},
                        {"feature": pad, "label": pad},
                        lambda ex: {"feature": len(ex["feature"]),
                                    "label": len(ex["label"])},
                        batch_size_multiple=(
                            args.get("batch_size_multiple")
                            or max(8, num_replicas_in_sync)),
                        extra_fields=lang_fields)
                else:
                    batches = dataset_utils.batch_fixed_size(
                        it, batch_size, {"feature": pad, "label": pad},
                        fields=fields, pad_length_multiple=multiple,
                        extra_fields=lang_fields)
            else:
                batches = dataset_utils.batch_fixed_size(
                    it, batch_size, {"feature": pad, "label": pad},
                    fields=fields, pad_length_multiple=multiple,
                    extra_fields=lang_fields)

            def finalize(b):
                for f in lang_fields:
                    vals = [0 if v is None else int(v) for v in b[f]]
                    b[f] = np.asarray(vals, np.int32)
                return self.example_to_input(b, mode)
            yield from dataset_utils.prefetch_iterator(
                (finalize(b) for b in batches))
        return make_iter

    def get_eval_metric(self, args, name="metric", ds=None):
        metric_cls = args.get(f"{name}.class") or "BLEU"
        params = dict(args.get(f"{name}.params") or {})
        return build_metric({"metric.class": metric_cls,
                             "metric.params": params})
