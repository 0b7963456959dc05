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
"""Speech-to-text task (ASR / end-to-end ST).

Parity: /root/reference/neurst/tasks/speech2text.py — audio bucket
boundary generation (38-56), SpecAugment hook in the preprocess fn
(194-201), **2-D bucketing** by (frames, transcript length) via
``experimental_frame_transcript_ratio`` with the exact interpolation
formula and per-bucket batch sizes rounded to multiples of 8
(296-384), transcripts from the ``transcript`` field (ASR) or
``translation`` (ST, via ``transcript_key=translation``).

Model inputs:
    src        float [B, frames, feat_dim, channels]
    src_length int    [B]
    trg/trg_input   int [B, U]
"""

import logging
from typing import Optional

import numpy as np

from neurst_tpu.data import dataset_utils
from neurst_tpu.data.dataset_utils import round_up
from neurst_tpu.metrics.metric import build_metric
from neurst_tpu.models.model import build_model
from neurst_tpu.tasks.seq2seq import _build_pipeline
from neurst_tpu.tasks.task import Task, register_task
from neurst_tpu.utils.audio_lib import SpecAugment
from neurst_tpu.utils.compat import DataStatus, ModeKeys
from neurst_tpu.utils.configurable import deep_merge_dict
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["SpeechToText", "create_audio_bucket_boundaries"]


def create_audio_bucket_boundaries(maxlen: int, minlen: int = 128):
    """Geometric frame-count boundaries (parity: speech2text.py:38-56)."""
    if minlen is None:
        minlen = 128
    bounds = []
    x = minlen
    while x < maxlen:
        bounds.append(x)
        x = max(x + 1, int(x * 1.2))
    bounds.append(maxlen)
    return bounds


@register_task("speech2text", "audio2text", "AudioToText")
class SpeechToText(Task):

    def __init__(self, args=None):
        super().__init__(args)
        self._trg_data_pipeline = _build_pipeline(self._args,
                                                  "transcript_data_pipeline")
        self._audio_feature_dim = int(
            self._args.get("audio_feature_dim") or 80)
        self._audio_feature_channels = int(
            self._args.get("audio_feature_channels") or 1)
        self._specaug = SpecAugment.build(self._args.get("specaug"))

    @property
    def trg_pipeline(self):
        return self._trg_data_pipeline

    def get_config(self):
        return {
            "transcript_data_pipeline.class":
                type(self._trg_data_pipeline).__name__,
            "transcript_data_pipeline.params":
                self._trg_data_pipeline.config,
            "audio_feature_dim": self._audio_feature_dim,
            "audio_feature_channels": self._audio_feature_channels,
        }

    @staticmethod
    def class_or_method_args():
        args = Task.class_or_method_args()
        args.extend([
            ModuleFlag("transcript_data_pipeline", "data_pipeline",
                       help="The data pipeline for the target text."),
            Flag("audio_feature_dim", dtype=Flag.TYPE.INTEGER, default=80,
                 help="The dimension of audio features."),
            Flag("audio_feature_channels", dtype=Flag.TYPE.INTEGER,
                 default=1, help="The number of audio feature channels."),
            Flag("specaug", dtype=Flag.TYPE.STRING, default=None,
                 help="SpecAugment setting: LB/LD/SM/SS or a YAML dict."),
            Flag("min_src_bucket_boundary", dtype=Flag.TYPE.INTEGER,
                 default=128, help="The minimum audio bucket boundary."),
            Flag("experimental_frame_transcript_ratio",
                 dtype=Flag.TYPE.FLOAT, default=None,
                 help="The pre-scanned frames/transcript-length ratio for "
                      "2-D bucketing."),
            Flag("disable_batch_efficiency", dtype=Flag.TYPE.BOOLEAN,
                 default=None, help="Disable rounding bucket batch sizes "
                                    "to multiples of 8."),
            Flag("batch_by_frames", dtype=Flag.TYPE.BOOLEAN, default=True,
                 help="Interpret batch_size as an audio-frames budget "
                      "in TRAIN mode (always the case for speech "
                      "bucketed batching; kept for config parity)."),
        ])
        return args

    def build_model(self, args, name=None, **kwargs):
        src_meta = {"audio_feature_dim": self._audio_feature_dim,
                    "audio_feature_channels": self._audio_feature_channels}
        return build_model(args, src_meta=src_meta,
                           trg_meta=self._trg_data_pipeline.meta,
                           name=name, **kwargs)

    # ----------------------- data processing --------------------- #

    def get_data_preprocess_fn(self, mode, data_status=DataStatus.RAW,
                               args=None):
        if args is None:
            args = self._args
        else:
            args = deep_merge_dict(self._args, args, local_overwrite=False)
        if isinstance(data_status, dict):
            audio_status = data_status.get("audio", DataStatus.PROJECTED)
            trans_status = data_status.get("transcript", DataStatus.RAW)
        else:
            audio_status = trans_status = data_status
        if audio_status != DataStatus.PROJECTED:
            raise RuntimeError(
                "Audio must be feature-extracted in advance (parity: "
                "speech2text.py:191-192); run create_records first.")
        trunc = args.get("truncate_src")
        max_src_len = args.get("max_src_len")
        max_trg_len = args.get("max_trg_len")
        feat_elems = self._audio_feature_dim * self._audio_feature_channels
        specaug = self._specaug if mode == ModeKeys.TRAIN else None

        def _process(data):
            audio = np.asarray(data["audio"], np.float32).reshape(-1)
            if trunc and max_src_len:
                audio = audio[:max_src_len * feat_elems]
            frames = len(audio) // feat_elems
            audio = audio.reshape(frames, feat_elems)
            if specaug is not None:
                audio = specaug.apply_numpy(audio)
            out = {"audio": audio.astype(np.float32),
                   "audio_length": frames}
            transcript = data.get("transcript")
            if transcript is not None and mode != ModeKeys.INFER:
                if trans_status != DataStatus.PROJECTED:
                    transcript = self._trg_data_pipeline.encode(
                        transcript,
                        is_processed=(trans_status == DataStatus.PROCESSED))
                transcript = [int(x) for x in transcript]
                if mode == ModeKeys.TRAIN and args.get("truncate_trg") \
                        and max_trg_len and len(transcript) > max_trg_len:
                    transcript = transcript[:max_trg_len - 1] \
                        + transcript[-1:]
                out["transcript"] = transcript
            # carry a merged ST translation through to the record
            # writer untouched (AudioTripleTFRecordDataset decodes
            # either raw text or ids at load time)
            if "translation" in data:
                out["translation"] = data["translation"]
            return out
        return _process

    def get_data_postprocess_fn(self, data_status, **kwargs):
        if isinstance(data_status, dict):
            data_status = data_status.get("transcript", DataStatus.RAW)
        if data_status == DataStatus.PROJECTED:
            return self._trg_data_pipeline.decode
        if data_status == DataStatus.PROCESSED:
            return self._trg_data_pipeline.postprocess
        return lambda x: x

    def example_to_input(self, batch_of_data: dict, mode) -> dict:
        audio = batch_of_data["audio"]
        batch = audio.shape[0]
        frames = audio.shape[1]
        input_dict = {
            "src": audio.reshape(batch, frames, self._audio_feature_dim,
                                 self._audio_feature_channels),
            "src_length": batch_of_data["audio_length"],
        }
        if "sample_mask" in batch_of_data:
            input_dict["sample_mask"] = batch_of_data["sample_mask"]
        meta = self._trg_data_pipeline.meta
        bos = meta["bos_id"]
        if mode == ModeKeys.INFER:
            input_dict["trg_input"] = np.full([batch], bos, np.int32)
        else:
            trg = batch_of_data["transcript"]
            trg_len = batch_of_data["transcript_length"]
            tpos = np.arange(trg.shape[1])[None, :]
            input_dict["trg"] = trg
            input_dict["trg_length"] = trg_len
            input_dict["trg_padding"] = (
                tpos >= trg_len[:, None]).astype(np.float32)
            input_dict["trg_input"] = np.concatenate(
                [np.full([batch, 1], bos, np.int32), trg[:, :-1]], axis=1)
        return input_dict

    # -------------------------- batching ------------------------- #

    def _batch_text_fields(self):
        """[(field_name, pad_id)] text fields carried through bucketed
        batching (multi-task subclasses add their extra targets)."""
        return [("transcript", self._trg_data_pipeline.meta["pad_id"])]

    def create_batch_iterator(self, ds, mode, args=None,
                              num_replicas_in_sync=1,
                              shard_id=0, total_shards=1):
        if args is None:
            args = self._args
        else:
            args = deep_merge_dict(self._args, args, local_overwrite=False)
        preprocess = self.get_data_preprocess_fn(mode, ds.status, args)
        text_fields = self._batch_text_fields()
        feat_elems = self._audio_feature_dim * self._audio_feature_channels

        if mode == ModeKeys.TRAIN:
            return self._train_iterator(ds, preprocess, args,
                                        num_replicas_in_sync, text_fields,
                                        shard_id, total_shards)

        batch_size = dataset_utils.adjust_batch_size(
            args.get("batch_size") or 16,
            args.get("batch_size_per_gpu") or args.get(
                "batch_size_per_replica"),
            num_replicas_in_sync, verbose=(shard_id == 0))

        def make_iter():
            it = ds.build_iterator(map_func=preprocess, shard_id=shard_id,
                                   total_shards=total_shards)()

            def to_flat(ex):
                # audio padding happens on the flattened feature axis so
                # the generic batcher can treat it as one sequence field
                out = {"audio": ex["audio"].reshape(-1),
                       "audio_frames": ex["audio_length"]}
                for f, _ in text_fields:
                    if f in ex:
                        out[f] = ex[f]
                return out

            fields = ["audio"] + (
                [] if mode == ModeKeys.INFER
                else [f for f, _ in text_fields])
            batches = dataset_utils.batch_fixed_size(
                (to_flat(ex) for ex in it), batch_size,
                {"audio": 0, **dict(text_fields)},
                fields=fields,
                pad_length_multiple=64 * feat_elems,
                extra_fields=("audio_frames",))
            for b in batches:
                frames = b["audio"].shape[1] // feat_elems
                audio = b["audio"].astype(np.float32).reshape(
                    batch_size, frames, feat_elems)
                lens = np.asarray(
                    [0 if x is None else int(x)
                     for x in b["audio_frames"]], np.int32)
                batch = {"audio": audio, "audio_length": lens,
                         "sample_mask": b["sample_mask"]}
                for f, _ in text_fields:
                    if f in b:
                        batch[f] = b[f]
                        batch[f + "_length"] = b[f + "_length"]
                yield self.example_to_input(batch, mode)
        return make_iter

    def _train_iterator(self, ds, preprocess, args, num_replicas,
                        text_fields, shard_id, total_shards):
        """2-D (frames x transcript) bucketed training batches."""
        batch_size = dataset_utils.adjust_batch_size(
            args.get("batch_size"),
            args.get("batch_size_per_gpu") or args.get(
                "batch_size_per_replica"),
            num_replicas, verbose=(shard_id == 0))
        max_src_len = int(args.get("max_src_len") or 3000)
        max_trg_len = int(args.get("max_trg_len") or 120)
        bounds = create_audio_bucket_boundaries(
            max_src_len, args.get("min_src_bucket_boundary"))
        bounds[-1] = round_up(bounds[-1], 8)
        bs_per_replica = batch_size // max(num_replicas, 1)
        assert bs_per_replica > max_src_len, (
            f"batch size per replica ({bs_per_replica}) must exceed "
            f"max_src_len={max_src_len} (token-style budget, parity: "
            f"speech2text.py:302-305)")
        multiple = int(args.get("batch_size_multiple")
                       or max(8, num_replicas))
        if args.get("disable_batch_efficiency"):
            bucket_sizes = [max(int(bs_per_replica // b), 1)
                            * max(num_replicas, 1) for b in bounds]
        else:
            bucket_sizes = [max(round_up(int(bs_per_replica // b), 8), 8)
                            * max(num_replicas, 1) for b in bounds]
        bucket_sizes = [round_up(b, multiple) for b in bucket_sizes]
        ratio = args.get("experimental_frame_transcript_ratio")
        if ratio is None:
            logging.warning(
                "experimental_frame_transcript_ratio not set; using "
                "max_trg_len for every audio bucket (more padding).")
            trans_bounds = [max_trg_len] * len(bounds)
        else:
            trans_bounds = [
                int(b / (ratio + i * (max_src_len / max_trg_len - ratio)
                         / len(bounds)))
                for i, b in enumerate(bounds)]
            trans_bounds = [round_up(min(t, max_trg_len), 8)
                            for t in trans_bounds]
        # one fallback shape per audio bucket: next bucket's transcript cap
        shapes = []
        for i in range(len(bounds)):
            t_next = trans_bounds[min(i + 1, len(bounds) - 1)]
            shapes.append((bucket_sizes[i], bounds[i],
                           sorted({trans_bounds[i], t_next})))
        n_shapes = sum(len(s[2]) for s in shapes)
        logging.info("speech2text: %d input shapes to be compiled", n_shapes)
        for bs, b, ts in shapes:
            logging.info("  - batch=%d frames<=%d transcript<=%s", bs, b, ts)
        feat_elems = self._audio_feature_dim * self._audio_feature_channels

        def make_iter():
            it = ds.build_iterator(map_func=preprocess, shard_id=shard_id,
                                   total_shards=total_shards)()
            shuffle_buffer = args.get("shuffle_buffer")
            if shuffle_buffer is None or shuffle_buffer > 0:
                it = dataset_utils.shuffle_iterator(it, shuffle_buffer or 512)
            buckets = [[] for _ in bounds]

            def text_len(ex):
                return max(len(ex[f]) for f, _ in text_fields)

            def emit(i, tcap):
                exs = buckets[i]
                buckets[i] = []
                bs = bucket_sizes[i]
                audio = np.zeros([bs, bounds[i], feat_elems], np.float32)
                lens = np.zeros([bs], np.int32)
                batch = {"audio": audio, "audio_length": lens}
                for f, pad in text_fields:
                    batch[f] = np.full([bs, tcap], pad, np.int32)
                    batch[f + "_length"] = np.zeros([bs], np.int32)
                for j, ex in enumerate(exs):
                    audio[j, :ex["audio_length"]] = ex["audio"]
                    lens[j] = ex["audio_length"]
                    for f, _ in text_fields:
                        ids = ex[f][:tcap]
                        batch[f][j, :len(ids)] = ids
                        batch[f + "_length"][j] = len(ids)
                mask = np.zeros([bs], np.float32)
                mask[:len(exs)] = 1.0
                batch["sample_mask"] = mask
                return self.example_to_input(batch, ModeKeys.TRAIN)

            dropped = 0
            for ex in dataset_utils.prefetch_iterator(it):
                if any(f not in ex for f, _ in text_fields):
                    continue
                al, tl = ex["audio_length"], text_len(ex)
                placed = False
                if al <= bounds[-1]:
                    for i, b in enumerate(bounds):
                        if al <= b and tl <= shapes[i][2][-1]:
                            buckets[i].append(ex)
                            placed = True
                            break
                if not placed:
                    dropped += 1
                    if dropped % 1000 == 1:
                        logging.warning(
                            "speech2text: dropped %d unbucketable "
                            "examples so far (frames=%d transcript=%d; "
                            "check experimental_frame_transcript_ratio "
                            "/ max_src_len / max_trg_len)", dropped, al,
                            tl)
                    continue
                for i in range(len(bounds)):
                    if len(buckets[i]) >= bucket_sizes[i]:
                        tmax = max(text_len(e) for e in buckets[i])
                        tcap = next((t for t in shapes[i][2] if tmax <= t),
                                    shapes[i][2][-1])
                        yield emit(i, tcap)
            for i in range(len(bounds)):
                if buckets[i]:
                    tmax = max(text_len(e) for e in buckets[i])
                    tcap = next((t for t in shapes[i][2] if tmax <= t),
                                shapes[i][2][-1])
                    yield emit(i, tcap)
        return make_iter

    def get_eval_metric(self, args, name="metric", ds=None):
        metric_cls = args.get(f"{name}.class") or "WER"
        params = dict(args.get(f"{name}.params") or {})
        params.setdefault(
            "language", self._trg_data_pipeline.meta.get("language", "en"))
        return build_metric({"metric.class": metric_cls,
                             "metric.params": params})


@register_task("multi_task_speech_translation", "MultiTaskSpeechTranslation")
class MultiTaskSpeechTranslation(SpeechToText):
    """Joint ASR+ST training from audio triples.

    BEYOND-REFERENCE: /root/reference/neurst/tasks/speech2text.py:399-495
    declares this task but leaves example_to_input / batching /
    build_model NotImplemented.  This is the working version: triple
    records (audio, transcript, translation) batch through the parent's
    2-D frames x text bucketing (text cap = the longer of the two
    sides), ``example_to_input`` emits the translation as the primary
    ``trg*`` targets and the transcript as ``asr_trg*``, and
    ``build_model`` builds a shared-encoder dual-decoder model
    (models/multi_task_speech_transformer.py) whose training loss is a
    ``joint_criterion`` over both heads.  Generation decodes the ST
    side by default; ``--generation_output asr`` decodes the transcript
    (postprocess + metric follow the side).
    """

    def __init__(self, args=None):
        super().__init__(args)
        self._translation_pipeline = _build_pipeline(
            self._args, "translation_data_pipeline") \
            if self._args.get("translation_data_pipeline.class") else None

    @staticmethod
    def class_or_method_args():
        return SpeechToText.class_or_method_args() + [
            ModuleFlag("translation_data_pipeline", "data_pipeline",
                       help="The data pipeline for the translation text."),
            Flag("generation_output", dtype=Flag.TYPE.STRING, default="st",
                 choices=["st", "asr"],
                 help="Which head generation decodes: the translation "
                      "(st) or the transcript (asr)."),
        ]

    def get_config(self):
        cfg = super().get_config()
        if self._translation_pipeline is not None:
            cfg["translation_data_pipeline.class"] = \
                type(self._translation_pipeline).__name__
            cfg["translation_data_pipeline.params"] = \
                self._translation_pipeline.config
        cfg["generation_output"] = self._gen_side
        return cfg

    @property
    def _gen_side(self):
        return self._args.get("generation_output") or "st"

    def _gen_pipeline(self):
        if self._gen_side == "asr" or self._translation_pipeline is None:
            return self._trg_data_pipeline
        return self._translation_pipeline

    def get_data_preprocess_fn(self, mode, data_status=DataStatus.RAW,
                               args=None):
        """Projects BOTH text sides (transcript via the inherited
        pipeline, translation via ``translation_data_pipeline``) —
        the offline-projection use the reference DOES implement
        (speech2text.py:455-479, used by the librispeech/must-c
        03-preprocess recipes to build asr_st records)."""
        base = super().get_data_preprocess_fn(mode, data_status, args)
        if isinstance(data_status, dict):
            trans_status = data_status.get("translation", DataStatus.RAW)
        else:
            trans_status = data_status

        def _process(data):
            out = base(data)
            translation = out.get("translation")
            if translation is not None \
                    and self._translation_pipeline is not None \
                    and trans_status != DataStatus.PROJECTED:
                out["translation"] = [int(x) for x in
                                      self._translation_pipeline.encode(
                    translation,
                    is_processed=(trans_status == DataStatus.PROCESSED))]
            return out
        return _process

    def _batch_text_fields(self):
        fields = [("transcript", self._trg_data_pipeline.meta["pad_id"])]
        if self._translation_pipeline is not None:
            fields.append(
                ("translation", self._translation_pipeline.meta["pad_id"]))
        return fields

    def example_to_input(self, batch_of_data, mode):
        audio = batch_of_data["audio"]
        batch = audio.shape[0]
        frames = audio.shape[1]
        input_dict = {
            "src": audio.reshape(batch, frames, self._audio_feature_dim,
                                 self._audio_feature_channels),
            "src_length": batch_of_data["audio_length"],
        }
        if "sample_mask" in batch_of_data:
            input_dict["sample_mask"] = batch_of_data["sample_mask"]
        st_meta = self._gen_pipeline().meta if mode == ModeKeys.INFER \
            else self._translation_pipeline.meta
        if mode == ModeKeys.INFER:
            input_dict["trg_input"] = np.full([batch], st_meta["bos_id"],
                                              np.int32)
            return input_dict

        def put(prefix, field, meta):
            trg = batch_of_data[field]
            trg_len = batch_of_data[field + "_length"]
            tpos = np.arange(trg.shape[1])[None, :]
            input_dict[prefix + "trg"] = trg
            input_dict[prefix + "trg_length"] = trg_len
            input_dict[prefix + "trg_padding"] = (
                tpos >= trg_len[:, None]).astype(np.float32)
            input_dict[prefix + "trg_input"] = np.concatenate(
                [np.full([batch, 1], meta["bos_id"], np.int32),
                 trg[:, :-1]], axis=1)

        # translation = primary head (trg*), transcript = asr head
        put("", "translation", st_meta)
        put("asr_", "transcript", self._trg_data_pipeline.meta)
        return input_dict

    def build_model(self, args, name=None, **kwargs):
        if self._translation_pipeline is None:
            raise ValueError(
                "multi_task_speech_translation requires "
                "translation_data_pipeline.class for the model build "
                "(preprocess-only use works without it)")
        src_meta = {"audio_feature_dim": self._audio_feature_dim,
                    "audio_feature_channels": self._audio_feature_channels}
        if self._gen_side == "asr":
            args = dict(args)
            params = dict(args.get("model.params") or {})
            params["generation_output"] = "asr"
            args["model.params"] = params
        return build_model(args, src_meta=src_meta,
                           trg_meta=self._translation_pipeline.meta,
                           asr_meta=self._trg_data_pipeline.meta,
                           name=name, **kwargs)

    def get_data_postprocess_fn(self, data_status, **kwargs):
        if isinstance(data_status, dict):
            key = "transcript" if self._gen_side == "asr" else "translation"
            data_status = data_status.get(key, DataStatus.RAW)
        pipeline = self._gen_pipeline()
        if data_status == DataStatus.PROJECTED:
            return pipeline.decode
        if data_status == DataStatus.PROCESSED:
            return pipeline.postprocess
        return lambda x: x

    def get_eval_metric(self, args, name="metric", ds=None):
        default_cls = "WER" if self._gen_side == "asr" else "bleu"
        metric_cls = args.get(f"{name}.class") or default_cls
        params = dict(args.get(f"{name}.params") or {})
        params.setdefault(
            "language", self._gen_pipeline().meta.get("language", "en"))
        return build_metric({"metric.class": metric_cls,
                             "metric.params": params})

    def eval_targets(self, dataset):
        """Triple datasets expose the translation as ``targets``; when
        generation decodes the ASR side the references must be the
        transcripts instead."""
        if self._gen_side == "asr":
            try:
                return [ex["transcript"]
                        for ex in dataset.build_iterator()()
                        if "transcript" in ex]
            except (AttributeError, OSError):
                return None
        return super().eval_targets(dataset)
