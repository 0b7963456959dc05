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
"""Offline sharded preprocessing into TFRecord-format files.

Parity: /root/reference/neurst/cli/create_tfrecords.py — builds
task + dataset, runs the task's TRAIN preprocess function over the
dataset (RAW -> PROJECTED once, offline), and writes
``<prefix>-%05d-of-%05d`` shards.  ``--processor_id/--num_processors``
split the input for parallel processes; ``--num_output_shards`` is the
global shard count (this processor writes its own subrange).

Usage:
    python -m neurst_tpu.cli.create_records --config_paths data.yml \
        --dataset parallel_text --src_file ... --trg_file ... \
        --output_template train.tfrecords-%5.5d-of-%5.5d \
        --num_output_shards 8 [--processor_id 0 --num_processors 1]
"""

import logging
import os
import sys

import numpy as np

from neurst_tpu.cli.run_exp import parse_and_merge
from neurst_tpu.data.datasets.dataset import build_dataset
from neurst_tpu.data.recordio import RecordWriter, build_example
from neurst_tpu.tasks.task import build_task
from neurst_tpu.utils.compat import ModeKeys
from neurst_tpu.utils.flags_core import get_argv_dict


def _to_feature_dict(example: dict) -> dict:
    out = {}
    for k, v in example.items():
        arr = np.asarray(v)
        if arr.dtype.kind == "f":
            out[k] = arr.astype(np.float32)
        elif arr.dtype.kind in ("i", "u"):
            out[k] = arr.astype(np.int64)
        elif arr.dtype.kind in ("U", "S", "O"):
            out[k] = [str(v).encode("utf-8")]
        else:
            raise ValueError(f"Unsupported field {k}: {arr.dtype}")
    return out


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    argv = argv if argv is not None else sys.argv[1:]
    argv_dict, _ = get_argv_dict(argv)
    args = parse_and_merge(argv)
    processor_id = int(argv_dict.get("processor_id", 0))
    num_processors = int(argv_dict.get("num_processors", 1))
    num_output_shards = int(argv_dict.get("num_output_shards", 1))
    template = argv_dict.get("output_template")
    if template is None:
        raise ValueError("--output_template is required "
                         "(e.g. train.tfrecords-%5.5d-of-%5.5d)")

    dataset = build_dataset(args)
    if args.get("task.class"):
        task = build_task(args)
        preprocess = task.get_data_preprocess_fn(ModeKeys.TRAIN,
                                                 dataset.status)
    else:
        # no task: store what the dataset yields (e.g. fbank features +
        # raw transcripts from a RawAudioDataset — the reference's
        # 02-audio_feature_extraction stage runs create_tfrecords the
        # same way, without a task)
        preprocess = None

    # shards owned by this processor (the explicit range flags mirror
    # the reference's create_tfrecords surface so its recipes run
    # unchanged; by default the range is derived from processor_id)
    shards_per_proc = num_output_shards // num_processors
    begin = int(argv_dict.get("output_range_begin",
                              processor_id * shards_per_proc))
    end = int(argv_dict.get("output_range_end", begin + shards_per_proc))
    own = list(range(begin, end))
    writers = []
    for s in own:
        path = template % (s, num_output_shards) if "%" in template \
            else f"{template}-{s:05d}-of-{num_output_shards:05d}"
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        writers.append(RecordWriter(path))

    n = 0
    it = dataset.build_iterator(map_func=preprocess,
                                shard_id=processor_id,
                                total_shards=num_processors)()
    for example in it:
        w = writers[n % len(writers)]
        w.write(build_example(_to_feature_dict(example)))
        n += 1
        if n % 1000 == 0:
            logging.info("Processed %d examples", n)
    for w in writers:
        w.close()
    logging.info("Done: %d examples into %d shards", n, len(writers))


if __name__ == "__main__":
    main()
