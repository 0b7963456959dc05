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
"""Raw audio corpora: tarball streaming + feature extraction.

Parity: /root/reference/neurst/data/datasets/audio/audio_dataset.py
(RawAudioDataset 118-246): archives are STREAMED without extraction;
each adapter subclass knows its corpus layout (transcript files inside
the archive) and yields
    {"audio": waveform-or-features, "audio_length", "transcript"
     [, "translation"]}
Feature extraction (``feature_extractor`` registry, e.g. fbank) runs on
the fly so ``create_records`` produces PROJECTED features offline.
"""

import io
import logging
import os
import tarfile
from typing import Dict, Iterator, Optional

import numpy as np

from neurst_tpu.data.audio.feature_extractor import build_feature_extractor
from neurst_tpu.data.audio.wav_io import decode_audio
from neurst_tpu.data.datasets.dataset import Dataset, register_dataset
from neurst_tpu.utils.compat import DataStatus
from neurst_tpu.utils.flags_core import Flag, ModuleFlag

__all__ = ["RawAudioDataset"]


class RawAudioDataset(Dataset):
    """Base: stream audio files + transcripts from tar archives."""

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        self._input_tarball = self._args.get("input_tarball") \
            or self._args.get("data_path")
        fe_cls = self._args.get("feature_extractor.class")
        self._feature_extractor = None
        if fe_cls:
            self._feature_extractor = build_feature_extractor(
                {"feature_extractor.class": fe_cls,
                 "feature_extractor.params":
                     self._args.get("feature_extractor.params") or {}})
        self._transcripts_dict: Optional[Dict[str, dict]] = None

    @staticmethod
    def class_or_method_args():
        return [
            Flag("input_tarball", dtype=Flag.TYPE.STRING, default=None,
                 help="The corpus archive (streamed, not extracted)."),
            ModuleFlag("feature_extractor", "feature_extractor",
                       help="On-the-fly feature extractor (e.g. fbank)."),
        ]

    @property
    def status(self):
        return {
            "audio": (DataStatus.PROJECTED if self._feature_extractor
                      else DataStatus.RAW),
            "transcript": DataStatus.RAW,
            "translation": DataStatus.RAW,
        }

    # ------------------------------------------------------------ #

    def load_transcripts(self) -> Dict[str, dict]:
        """Scans the archive's transcript files:
        {audio_member_name: {"transcript": ..., ["translation": ...]}}.
        Subclasses implement the corpus layout."""
        raise NotImplementedError

    def _transcripts(self):
        if self._transcripts_dict is None:
            logging.info("Scanning transcripts from %s", self._input_tarball)
            self._transcripts_dict = self.load_transcripts()
            logging.info("Found %d transcribed utterances",
                         len(self._transcripts_dict))
        return self._transcripts_dict

    def _process_audio(self, file_bytes: bytes, fmt: str) -> dict:
        waveform, rate = decode_audio(file_bytes, fmt)
        if self._feature_extractor is not None:
            feats = self._feature_extractor(waveform, rate)
            return {"audio": feats.reshape(-1).astype(np.float32),
                    "audio_length": feats.shape[0]}
        return {"audio": waveform.astype(np.float32),
                "audio_length": len(waveform)}

    def _iter_archive(self):
        """Streams (member_name, read_bytes_fn) from the archive —
        tarballs (tgz etc.) or zip files (Augmented LibriSpeech, MuST-C
        distributions ship zips; parity: the reference's
        audio_dataset.py streams both)."""
        path = self._input_tarball
        import zipfile
        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as z:
                for info in z.infolist():
                    if info.is_dir():
                        continue
                    yield info.filename, (lambda i=info: z.read(i))
        else:
            with tarfile.open(path, "r|*") as tar:
                for member in tar:
                    if not member.isfile():
                        continue
                    yield member.name, \
                        (lambda m=member: tar.extractfile(m).read())

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        transcripts = self._transcripts()

        def gen():
            idx = 0
            for name, read in self._iter_archive():
                key = os.path.basename(name)
                stem = os.path.splitext(key)[0]
                meta = (transcripts.get(name)
                        or transcripts.get(key)
                        or transcripts.get(stem))
                if meta is None:
                    continue
                if total_shards > 1 and idx % total_shards != shard_id:
                    idx += 1
                    continue
                idx += 1
                data = read()
                fmt = os.path.splitext(name)[1]
                example = self._process_audio(data, fmt)
                example.update(meta)
                if map_func is not None:
                    example = map_func(example)
                if example is not None:
                    yield example
        return gen

    # helper for subclasses: read text members in one streaming pass
    def _read_members(self, *suffixes: str) -> Dict[str, bytes]:
        out = {}
        for name, read in self._iter_archive():
            if any(name.endswith(s) for s in suffixes):
                out[name] = read()
        return out


@register_dataset("aug_librispeech", "AugmentedLibriSpeech")
class AugmentedLibriSpeech(RawAudioDataset):
    """libri-trans (Augmented LibriSpeech, En->Fr).

    Parity: neurst/data/datasets/audio/aug_librispeech.py — the archive
    carries wav files plus alignment text files per split:
    ``<split>/alignments.meta`` style TSVs with columns
    (id, wav, transcript, translation).  This adapter also accepts the
    simpler layout of paired ``.txt``/``.fr`` files.
    """

    _AUDIO_EXTS = (".wav", ".flac", ".mp3", ".sph")

    def load_transcripts(self):
        out = {}
        # TSV layouts: (wav, transcript[, translation]) or
        # (id, wav, transcript[, translation])
        for name, data in self._read_members(".tsv").items():
            for line in data.decode("utf-8").splitlines():
                parts = [p.strip() for p in line.split("\t")]
                if len(parts) < 2:
                    continue
                if len(parts) >= 3 and parts[1].lower().endswith(
                        self._AUDIO_EXTS):
                    wav, rest = parts[1], parts[2:]   # id-first layout
                else:
                    wav, rest = parts[0], parts[1:]
                entry = {"transcript": rest[0]}
                if len(rest) >= 2 and rest[1]:
                    entry["translation"] = rest[1]
                out[os.path.splitext(os.path.basename(wav))[0]] = entry
        return out


@register_dataset("librispeech", "LibriSpeech")
class LibriSpeech(RawAudioDataset):
    """LibriSpeech ASR corpus.

    Parity: neurst/data/datasets/audio/librispeech.py — utterances are
    ``<spk>-<chap>-<utt>.flac`` with per-chapter
    ``<spk>-<chap>.trans.txt`` transcript files ("UTTID TEXT" lines).
    NOTE: flac decoding requires converted wav archives in this
    environment (see wav_io.decode_audio).
    """

    def load_transcripts(self):
        out = {}
        for name, data in self._read_members(".trans.txt").items():
            for line in data.decode("utf-8").splitlines():
                if not line.strip():
                    continue
                utt_id, _, text = line.partition(" ")
                for ext in (".flac", ".wav"):
                    out[utt_id + ext] = {"transcript": text.strip()}
        return out


@register_dataset("mustc", "MuSTC")
class MuSTC(RawAudioDataset):
    """MuST-C speech translation corpus.

    Parity: neurst/data/datasets/audio/mustc.py — segment-level yaml
    (``*.yaml``) plus parallel ``.en``/``.<lang>`` text files; audio is
    segmented from long wavs by (offset, duration).
    """

    def __init__(self, args=None):
        super().__init__(args)
        self._trg_lang = self._args.get("trg_lang") or "de"
        self._extraction = self._args.get("extraction")

    @staticmethod
    def class_or_method_args():
        return RawAudioDataset.class_or_method_args() + [
            Flag("trg_lang", dtype=Flag.TYPE.STRING, default="de",
                 help="The target translation language suffix."),
            Flag("extraction", dtype=Flag.TYPE.STRING, default=None,
                 help="The split to extract from the archive "
                      "(train / dev / tst-COMMON / tst-HE); parity "
                      "with the reference's --extraction flag."),
        ]

    def _in_split(self, member_name: str) -> bool:
        if not self._extraction:
            return True
        parts = member_name.replace("\\", "/").split("/")
        return self._extraction in parts

    def load_transcripts(self):
        import yaml as _yaml
        members = {name: data for name, data in self._read_members(
            ".yaml", ".en", "." + self._trg_lang).items()
            if self._in_split(name)}
        seg_yaml = None
        en_texts, trg_texts = None, None
        for name, data in members.items():
            if name.endswith(".yaml"):
                seg_yaml = _yaml.safe_load(data.decode("utf-8"))
            elif name.endswith(".en"):
                en_texts = data.decode("utf-8").splitlines()
            elif name.endswith("." + self._trg_lang):
                trg_texts = data.decode("utf-8").splitlines()
        if not (seg_yaml and en_texts and trg_texts):
            raise FileNotFoundError(
                "MuST-C archive must contain segments yaml + .en + "
                f".{self._trg_lang} members")
        # segments reference their source wav; store per-segment info
        out = {}
        self._segments = []
        for i, seg in enumerate(seg_yaml):
            self._segments.append({
                "wav": seg["wav"], "offset": float(seg["offset"]),
                "duration": float(seg["duration"]),
                "transcript": en_texts[i].strip(),
                "translation": trg_texts[i].strip()})
        for i, seg in enumerate(self._segments):
            out.setdefault(seg["wav"], []).append(i)
        return out

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        wav_to_segments = self._transcripts()

        def gen():
            idx = 0
            for name, read in self._iter_archive():
                if not self._in_split(name):
                    continue
                key = os.path.basename(name)
                seg_ids = (wav_to_segments.get(key)
                           or wav_to_segments.get(name)
                           or wav_to_segments.get(
                               os.path.splitext(key)[0]))
                if not seg_ids:
                    continue
                data = read()
                from neurst_tpu.data.audio.wav_io import decode_audio
                waveform, rate = decode_audio(
                    data, os.path.splitext(name)[1])
                for si in seg_ids:
                    seg = self._segments[si]
                    if total_shards > 1 \
                            and idx % total_shards != shard_id:
                        idx += 1
                        continue
                    idx += 1
                    start = int(seg["offset"] * rate)
                    stop = start + int(seg["duration"] * rate)
                    clip = waveform[start:stop]
                    if self._feature_extractor is not None:
                        feats = self._feature_extractor(clip, rate)
                        example = {
                            "audio":
                                feats.reshape(-1).astype(np.float32),
                            "audio_length": feats.shape[0]}
                    else:
                        example = {"audio": clip.astype(np.float32),
                                   "audio_length": len(clip)}
                    example["transcript"] = seg["transcript"]
                    example["translation"] = seg["translation"]
                    if map_func is not None:
                        example = map_func(example)
                    if example is not None:
                        yield example
        return gen


@register_dataset("common_voice", "CommonVoice")
class CommonVoice(RawAudioDataset):
    """Mozilla CommonVoice (parity: audio/common_voice.py): a TSV index
    (path, sentence) and mp3 clips (convert to wav for this env)."""

    def load_transcripts(self):
        out = {}
        for name, data in self._read_members(".tsv").items():
            lines = data.decode("utf-8").splitlines()
            if not lines:
                continue
            header = lines[0].split("\t")
            try:
                path_col = header.index("path")
                sent_col = header.index("sentence")
            except ValueError:
                continue
            for line in lines[1:]:
                parts = line.split("\t")
                if len(parts) > max(path_col, sent_col):
                    # key by the extensionless stem so wav-converted
                    # archives still match the .mp3 index entries
                    stem = os.path.splitext(
                        os.path.basename(parts[path_col]))[0]
                    out[stem] = {"transcript": parts[sent_col].strip()}
        return out


@register_dataset("tedlium", "TedLium")
class TedLium(RawAudioDataset):
    """TED-LIUM release archives (parity: audio/tedlium.py): STM
    transcript files reference sph audio segments by (start, end);
    sph decodes natively (sph_io.py), wav/flac also accepted."""

    def load_transcripts(self):
        out = {}
        self._segments = []
        for name, data in self._read_members(".stm").items():
            for line in data.decode("utf-8", errors="ignore").splitlines():
                parts = line.split(None, 6)
                # <wav> <channel> <speaker> <start> <end> <label> <text>
                if len(parts) < 7 or parts[6].strip() == "ignore_time_segment_in_scoring":
                    continue
                self._segments.append({
                    "wav": parts[0], "start": float(parts[3]),
                    "end": float(parts[4]),
                    "transcript": parts[6].strip()})
        for i, seg in enumerate(self._segments):
            for ext in (".sph", ".wav"):
                out.setdefault(seg["wav"] + ext, []).append(i)
        return out

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        wav_to_segments = self._transcripts()

        def gen():
            idx = 0
            with tarfile.open(self._input_tarball, "r|*") as tar:
                for member in tar:
                    if not member.isfile():
                        continue
                    key = os.path.basename(member.name)
                    if os.path.splitext(key)[1].lower() not in \
                            (".wav", ".sph", ".flac"):
                        continue  # transcript/metadata members
                    stem = os.path.splitext(key)[0]
                    seg_ids = (wav_to_segments.get(key)
                               or wav_to_segments.get(stem + ".wav")
                               or wav_to_segments.get(stem))
                    if not seg_ids:
                        continue
                    data = tar.extractfile(member).read()
                    waveform, rate = decode_audio(
                        data, os.path.splitext(member.name)[1])
                    for si in seg_ids:
                        seg = self._segments[si]
                        if total_shards > 1 \
                                and idx % total_shards != shard_id:
                            idx += 1
                            continue
                        idx += 1
                        clip = waveform[int(seg["start"] * rate):
                                        int(seg["end"] * rate)]
                        if self._feature_extractor is not None:
                            feats = self._feature_extractor(clip, rate)
                            ex = {"audio":
                                  feats.reshape(-1).astype(np.float32),
                                  "audio_length": feats.shape[0]}
                        else:
                            ex = {"audio": clip.astype(np.float32),
                                  "audio_length": len(clip)}
                        ex["transcript"] = seg["transcript"]
                        if "translation" in seg:
                            ex["translation"] = seg["translation"]
                        if map_func is not None:
                            ex = map_func(ex)
                        if ex is not None:
                            yield ex
        return gen


@register_dataset("gigaspeech", "GigaSpeech")
class GigaSpeech(RawAudioDataset):
    """GigaSpeech (parity: audio/gigaspeech.py): a JSON index with
    per-segment (begin_time, end_time, text_tn) into long opus/wav.
    Filters to the chosen ``subset`` tag at both the audio and segment
    level, maps punctuation tags to symbols, drops garbage-only
    segments, and optionally merges GigaST translations by segment id
    (``extra_translation_json``, parity:
    examples/speech_transformer/gigast/convert_data.py)."""

    SUBSET_CHOICES = ("XS", "S", "M", "L", "XL",
                      "DEV", "TEST")
    _TAG_MAP = (("<QUESTIONMARK>", "?"), ("<EXCLAMATIONPOINT>", "!"),
                ("<PERIOD>", "."), ("<COMMA>", ","),
                # collapse the space the tags leave behind (parity:
                # reference gigaspeech.py repl_marks)
                (" ?", "?"), (" !", "!"), (" .", "."), (" ,", ","))
    _GARBAGE = ("<SIL>", "<NOISE>", "<MUSIC>", "<OTHER>")

    def __init__(self, args=None):
        super().__init__(args)
        subset = self._args.get("subset") or "XL"
        if subset not in self.SUBSET_CHOICES:
            raise ValueError(
                f"GigaSpeech subset must be one of "
                f"{list(self.SUBSET_CHOICES)}, got '{subset}' (subsets "
                f"are case-sensitive tags in the corpus index)")

    @staticmethod
    def class_or_method_args():
        return RawAudioDataset.class_or_method_args() + [
            Flag("subset", dtype=Flag.TYPE.STRING, default="XL",
                 choices=list(GigaSpeech.SUBSET_CHOICES),
                 help="The GigaSpeech subset tag to keep."),
            Flag("extra_translation_json", dtype=Flag.TYPE.STRING,
                 default=None,
                 help="GigaST json whose per-sid translations are "
                      "merged into the segments."),
        ]

    def _load_translations(self):
        path = self._args.get("extra_translation_json")
        if not path:
            return {}
        import json as _json
        with open(path, encoding="utf-8") as f:
            meta = _json.load(f)
        sid_to_text = {}
        for audio in meta.get("audios", []):
            for seg in audio.get("segments", []):
                if "sid" in seg:
                    sid_to_text[seg["sid"]] = (
                        seg.get("text_raw") or seg.get("text_tn")
                        or "").strip()
        return sid_to_text

    def load_transcripts(self):
        import json as _json
        subset = "{" + (self._args.get("subset") or "XL") + "}"
        translations = self._load_translations()
        out = {}
        self._segments = []
        n_dropped = 0
        members = self._read_members(".json")
        for name, data in members.items():
            meta = _json.loads(data.decode("utf-8"))
            for audio in meta.get("audios", []):
                if subset not in (audio.get("subsets") or [subset]):
                    continue
                path = os.path.splitext(
                    os.path.basename(audio.get("path", "")))[0]
                for seg in audio.get("segments", []):
                    if subset not in (seg.get("subsets") or [subset]):
                        continue
                    text = seg.get("text_tn", "").strip()
                    if any(g in text for g in self._GARBAGE):
                        n_dropped += 1
                        continue
                    for tag, sym in self._TAG_MAP:
                        text = text.replace(tag, sym)
                    text = text.lower()  # parity: reference lowercases
                    entry = {
                        "wav": path,
                        "start": float(seg.get("begin_time", 0)),
                        "end": float(seg.get("end_time", 0)),
                        "transcript": text}
                    sid = seg.get("sid")
                    if sid is not None and sid in translations:
                        entry["translation"] = translations[sid]
                    self._segments.append(entry)
        if translations:
            n_st = sum(1 for s in self._segments if "translation" in s)
            logging.info("GigaST merge: %d/%d segments matched a "
                         "translation.", n_st, len(self._segments))
        if n_dropped:
            logging.info("GigaSpeech: dropped %d garbage-only segments.",
                         n_dropped)
        for i, seg in enumerate(self._segments):
            out.setdefault(seg["wav"], []).append(i)
        return out

    build_iterator = TedLium.build_iterator


@register_dataset("iwslt_audio", "IWSLTAudio")
class IWSLTAudio(RawAudioDataset):
    """IWSLT evaluation sets (parity: audio/iwslt.py): segment yaml
    (wav, offset, duration) + parallel text files, MuST-C-style."""

    def load_transcripts(self):
        import yaml as _yaml
        members = self._read_members(".yaml", ".en", ".de", ".fr")
        seg_yaml, texts = None, {}
        for name, data in members.items():
            if name.endswith(".yaml"):
                seg_yaml = _yaml.safe_load(data.decode("utf-8"))
            else:
                texts[name.rsplit(".", 1)[1]] = \
                    data.decode("utf-8").splitlines()
        if seg_yaml is None:
            raise FileNotFoundError("IWSLT archive needs a segments yaml")
        out = {}
        self._segments = []
        src = texts.get("en", [None] * len(seg_yaml))
        trg = texts.get("de") or texts.get("fr") \
            or [None] * len(seg_yaml)
        for i, seg in enumerate(seg_yaml):
            entry = {"wav": seg["wav"], "start": float(seg["offset"]),
                     "end": float(seg["offset"]) + float(seg["duration"])}
            if i < len(src) and src[i] is not None:
                entry["transcript"] = src[i].strip()
            if i < len(trg) and trg[i] is not None:
                entry["translation"] = trg[i].strip()
            self._segments.append(entry)
        for i, seg in enumerate(self._segments):
            out.setdefault(seg["wav"], []).append(i)
        return out

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        wav_to_segments = self._transcripts()

        def gen():
            idx = 0
            with tarfile.open(self._input_tarball, "r|*") as tar:
                for member in tar:
                    if not member.isfile():
                        continue
                    key = os.path.basename(member.name)
                    seg_ids = (wav_to_segments.get(key)
                               or wav_to_segments.get(member.name)
                               or wav_to_segments.get(
                                   os.path.splitext(key)[0]))
                    if not seg_ids:
                        continue
                    data = tar.extractfile(member).read()
                    waveform, rate = decode_audio(
                        data, os.path.splitext(member.name)[1])
                    for si in seg_ids:
                        seg = self._segments[si]
                        if total_shards > 1 \
                                and idx % total_shards != shard_id:
                            idx += 1
                            continue
                        idx += 1
                        clip = waveform[int(seg["start"] * rate):
                                        int(seg["end"] * rate)]
                        if self._feature_extractor is not None:
                            feats = self._feature_extractor(clip, rate)
                            ex = {"audio":
                                  feats.reshape(-1).astype(np.float32),
                                  "audio_length": feats.shape[0]}
                        else:
                            ex = {"audio": clip.astype(np.float32),
                                  "audio_length": len(clip)}
                        for k in ("transcript", "translation"):
                            if k in seg:
                                ex[k] = seg[k]
                        if map_func is not None:
                            ex = map_func(ex)
                        if ex is not None:
                            yield ex
        return gen
