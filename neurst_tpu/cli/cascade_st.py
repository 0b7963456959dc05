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
"""Cascade speech translation: ASR model -> MT model.

Parity: /root/reference/neurst/cli/cascade_st.py:29-50 — decode audio
with the ASR model, pipe the transcripts through the MT model, score
BLEU against the references.

Usage:
    python -m neurst_tpu.cli.cascade_st \
        --asr_model_dir asr_ckpt --mt_model_dir mt_ckpt \
        --dataset audio_triple_tfrecord --data_path test.tfrecords \
        [--asr_search/mt_search flags ...] --output_file out.txt
"""

import argparse
import logging

import jax
import numpy as np

import neurst_tpu  # noqa: F401
from neurst_tpu.data.datasets.dataset import build_dataset
from neurst_tpu.data.datasets.parallel_text_dataset import \
    InMemoryParallelTextDataset
from neurst_tpu.layers.search.sequence_search import build_search_layer
from neurst_tpu.tasks.task import build_task
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.compat import DataStatus, ModeKeys
from neurst_tpu.utils.configurable import (ModelConfigs,
                                           strip_training_only_model_flags)


def _decode_dataset(model_dir, dataset, beam_size, max_len, batch_size):
    """Generic: rebuild task+model from model_dir, beam-decode dataset."""
    cfg = ModelConfigs.load(model_dir)
    cfg["model.params"] = strip_training_only_model_flags(
        cfg.get("model.params"))
    task = build_task(cfg)
    model = task.build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    path = ckpt_lib.latest_checkpoint(model_dir)
    if path:
        flat = ckpt_lib.restore_checkpoint_params(path)
        params, _, _ = ckpt_lib.restore_into(params, flat)
        logging.info("Restored %s", path)
    search = build_search_layer({
        "search_method.class": "beam_search",
        "search_method.params": {"beam_size": beam_size,
                                 "maximum_decode_length": max_len}})
    search.set_model(model)
    jit_search = jax.jit(lambda p, inp: search(p, inp))
    decode_fn = task.get_data_postprocess_fn(DataStatus.PROJECTED)
    hypotheses = []
    it = task.create_batch_iterator(dataset, ModeKeys.INFER,
                                    {"batch_size": batch_size})
    for batch in it():
        model_inp = {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray) and v.dtype != object}
        hyp, _ = jit_search(params, model_inp)
        hyp = np.asarray(hyp)
        mask = batch.get("sample_mask")
        bsz = mask.shape[0] if mask is not None else hyp.shape[0]
        top_k = hyp.shape[0] // bsz
        for i in range(bsz):
            if mask is not None and mask[i] == 0:
                continue
            hypotheses.append(decode_fn(hyp[i * top_k].tolist()))
    return task, hypotheses


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Cascade ST (ASR -> MT).")
    p.add_argument("--asr_model_dir", required=True)
    p.add_argument("--mt_model_dir", required=True)
    p.add_argument("--dataset", required=True,
                   help="The audio dataset class (e.g. audio_tfrecord).")
    p.add_argument("--data_path", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--asr_beam_size", type=int, default=4)
    p.add_argument("--mt_beam_size", type=int, default=4)
    p.add_argument("--maximum_decode_length", type=int, default=160)
    p.add_argument("--output_file", default=None)
    p.add_argument("--ref_file", default=None,
                   help="Reference translations for BLEU.")
    args = p.parse_args(argv)

    audio_ds = build_dataset({"dataset.class": args.dataset,
                              "dataset.params": {
                                  "data_path": args.data_path}})
    _, transcripts = _decode_dataset(
        args.asr_model_dir, audio_ds, args.asr_beam_size,
        args.maximum_decode_length, args.batch_size)
    logging.info("ASR produced %d transcripts", len(transcripts))

    text_ds = InMemoryParallelTextDataset(transcripts)
    mt_task, translations = _decode_dataset(
        args.mt_model_dir, text_ds, args.mt_beam_size,
        args.maximum_decode_length, args.batch_size)
    logging.info("MT produced %d translations", len(translations))

    if args.output_file:
        with open(args.output_file, "w", encoding="utf-8") as f:
            for t in translations:
                f.write(t + "\n")
    if args.ref_file:
        with open(args.ref_file, encoding="utf-8") as f:
            refs = [line.strip() for line in f][:len(translations)]
        metric = mt_task.get_eval_metric({})
        print(metric(translations, refs))


if __name__ == "__main__":
    main()
