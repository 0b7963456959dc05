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
"""Record-backed audio datasets.

Parity: /root/reference/neurst/data/datasets/audio/audio_dataset.py
(AudioTFRecordDataset 248-365, AudioTripleTFRecordDataset 366-509):
records hold float "audio" features (flattened [frames * feat_dim])
plus int64 "transcript" (and "translation" for ST triples).  Field-name
remapping (``feature_key``/``transcript_key``/``translation_key``)
keeps reference-era files readable.
"""

from neurst_tpu.data.datasets.dataset import RecordDataset, register_dataset
from neurst_tpu.utils.compat import DataStatus
from neurst_tpu.data.datasets.parallel_text_dataset import AbstractParallelDataset
from neurst_tpu.utils.flags_core import Flag

__all__ = ["AudioRecordDataset", "AudioTripleRecordDataset"]


@register_dataset("audio_tfrecord", "AudioTFRecordDataset")
class AudioRecordDataset(RecordDataset, AbstractParallelDataset):
    """ASR: (audio features, transcript ids)."""

    def __init__(self, args=None):
        super().__init__(args)
        self._feature_key = self._args.get("feature_key") or "audio"
        self._transcript_key = self._args.get("transcript_key") \
            or "transcript"
        self._targets = None

    @staticmethod
    def class_or_method_args():
        return RecordDataset.class_or_method_args() + [
            Flag("feature_key", dtype=Flag.TYPE.STRING, default="audio",
                 help="The audio feature field name in the record."),
            Flag("transcript_key", dtype=Flag.TYPE.STRING,
                 default="transcript",
                 help="The transcript field name in the record."),
        ]

    @property
    def fields(self):
        return {self._feature_key: "float32",
                self._transcript_key: "int64"}

    @property
    def status(self):
        """Audio is always PROJECTED; the text sides are sniffed from
        the first record — stage-2 recipe records store raw strings
        (features extracted, text untouched), stage-3 records store
        token ids."""
        if getattr(self, "_sniffed_status", None) is None:
            text_status = DataStatus.PROJECTED
            try:
                ex = next(iter(self.build_iterator()()))
                if any(isinstance(ex.get(k), str)
                       for k in ("transcript", "translation")):
                    text_status = DataStatus.RAW
            except StopIteration:
                pass
            self._sniffed_status = {
                "audio": DataStatus.PROJECTED,
                "transcript": text_status,
                "translation": text_status,
            }
        return self._sniffed_status

    def parse_record(self, parsed):
        out = {"audio": parsed[self._feature_key]}
        transcript = parsed.get(self._transcript_key)
        if transcript is not None:
            if len(transcript) and isinstance(transcript[0], bytes):
                transcript = transcript[0].decode("utf-8")
            else:
                transcript = [int(x) for x in transcript]
            out["transcript"] = transcript
        return out

    @property
    def targets(self):
        if self._targets is None:
            self._targets = [ex["transcript"]
                             for ex in self.build_iterator()()]
        return self._targets


@register_dataset("audio_triple_tfrecord", "AudioTripleTFRecordDataset")
class AudioTripleRecordDataset(AudioRecordDataset):
    """ST: (audio features, transcript ids, translation ids)."""

    def __init__(self, args=None):
        super().__init__(args)
        self._translation_key = self._args.get("translation_key") \
            or "translation"

    @staticmethod
    def class_or_method_args():
        return AudioRecordDataset.class_or_method_args() + [
            Flag("translation_key", dtype=Flag.TYPE.STRING,
                 default="translation",
                 help="The translation field name in the record."),
        ]

    @property
    def fields(self):
        f = dict(super().fields)
        f[self._translation_key] = "int64"
        return f

    def parse_record(self, parsed):
        out = super().parse_record(parsed)
        translation = parsed.get(self._translation_key)
        if translation is not None:
            if len(translation) and isinstance(translation[0], bytes):
                translation = translation[0].decode("utf-8")
            else:
                translation = [int(x) for x in translation]
            out["translation"] = translation
        return out

    @property
    def targets(self):
        if self._targets is None:
            self._targets = [ex["translation"]
                             for ex in self.build_iterator()()]
        return self._targets
