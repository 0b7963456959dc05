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
"""Dataset abstractions (parity: /root/reference/neurst/data/datasets/dataset.py).

TPU-first redesign: instead of tf.data graphs, a Dataset exposes a plain
python generator (``build_iterator``) that yields example dicts; the
host-side batcher (``neurst_tpu/data/dataset_utils.py``) turns it into
static-shaped numpy batches with background prefetch.  Sharding for
multi-host data parallelism is by ``shard_id/total_shards`` round-robin,
replacing tf.data's ``shard``.
"""

import logging
from typing import Callable, Iterator, Optional

from neurst_tpu.utils.compat import DataStatus
from neurst_tpu.utils.registry import setup_registry

__all__ = ["Dataset", "TextGenDataset", "RecordDataset",
           "build_dataset", "register_dataset"]


class Dataset(object):
    """Base dataset: an iterable of example dicts."""

    def __init__(self, args: Optional[dict] = None):
        self._args = dict(args or {})

    @property
    def args(self):
        return self._args

    @property
    def status(self) -> str:
        """DataStatus of the fields this dataset yields (RAW by default)."""
        return DataStatus.RAW

    @property
    def fields(self) -> Optional[dict]:
        """Record field declaration ({name: dtype str}) or None."""
        return None

    @staticmethod
    def class_or_method_args():
        return []

    def build_iterator(self, map_func: Optional[Callable] = None,
                       shard_id: int = 0, total_shards: int = 1
                       ) -> Callable[[], Iterator[dict]]:
        """Returns a zero-arg callable producing a fresh iterator.

        Args:
            map_func: Optional per-example transform applied on the fly
                (e.g. a task's data preprocess fn).
            shard_id/total_shards: Round-robin sharding for multi-host DP
                or offline parallel preprocessing.
        """
        raise NotImplementedError

    @property
    def num_samples(self) -> Optional[int]:
        """The number of examples; counts by scanning when unknown."""
        try:
            n = 0
            for _ in self.build_iterator()():
                n += 1
            return n
        except NotImplementedError:
            return None


class TextGenDataset(Dataset):
    """Dataset for text generation evaluation: has (optional) targets."""

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        self._targets = None
        self._raw_targets = None

    @property
    def targets(self):
        """Target-side (possibly processed) reference texts."""
        return self._targets

    @property
    def raw_targets(self):
        """Raw (untokenized) reference texts, for detokenized metrics."""
        return self._raw_targets or self._targets


class RecordDataset(Dataset):
    """Base for datasets stored as TFRecord-format files.

    Subclasses declare ``fields`` ({name: "int64"/"float32"/"bytes"}) and
    optionally a ``name_mapping``.
    """

    def __init__(self, args: Optional[dict] = None):
        super().__init__(args)
        self._data_path = self._args.get("data_path")

    @property
    def status(self):
        return DataStatus.PROJECTED

    @staticmethod
    def class_or_method_args():
        from neurst_tpu.utils.flags_core import Flag
        return [
            Flag("data_path", dtype=Flag.TYPE.STRING, default=None,
                 help="The path (file/dir/glob) to the record files."),
            Flag("shuffle_files", dtype=Flag.TYPE.BOOLEAN, default=True,
                 help="Whether to shuffle file order between epochs."),
        ]

    def build_iterator(self, map_func=None, shard_id=0, total_shards=1):
        from neurst_tpu.data.recordio import (glob_record_files,
                                              parse_example, record_iterator)
        files = glob_record_files(self._data_path)
        if not files:
            raise FileNotFoundError(
                f"No record files matched: {self._data_path}")

        def gen():
            idx = 0
            for fpath in files:
                # a framing/crc error makes the rest of THIS file
                # unrecoverable (no resync point in the TFRecord
                # format); contain it and continue with the next file
                # — matching tf.data's corrupt-file behavior — so one
                # bad shard cannot void a whole epoch's buckets
                records = record_iterator(fpath, check_crc=True)
                while True:
                    try:
                        record = next(records)
                    except StopIteration:
                        break
                    except (IOError, EOFError, ValueError) as e:
                        logging.warning(
                            "corrupt record in %s (%s); skipping the "
                            "rest of this file", fpath, e)
                        break
                    if total_shards > 1 and idx % total_shards != shard_id:
                        idx += 1
                        continue
                    idx += 1
                    try:
                        # framing + crc were valid; a payload that still
                        # fails to parse is contained to this record
                        example = self.parse_record(parse_example(record))
                    except Exception as e:  # noqa: BLE001 - any decode err
                        logging.warning(
                            "unparseable record %d in %s (%s: %s); "
                            "skipped", idx - 1, fpath,
                            type(e).__name__, e)
                        continue
                    if map_func is not None:
                        example = map_func(example)
                    if example is not None:
                        yield example
        return gen

    def parse_record(self, parsed: dict) -> dict:
        """Post-processes a parsed record dict (override per dataset)."""
        return parsed


def _create_dataset(cls, args, **kwargs):
    return cls(args, **kwargs)


build_dataset, register_dataset = setup_registry(
    "dataset", base_class=Dataset, create_fn=_create_dataset)
