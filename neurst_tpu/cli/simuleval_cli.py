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
"""Simultaneous-translation evaluation CLI.

Parity: /root/reference/neurst/cli/simuleval_cli.py — the reference
forks SimulEval's client/server loop.  This CLI ships a built-in
simulator (no external service): it streams each source sentence
token-by-token through the wait-k agent, reporting quality (BLEU) and
latency (AL — Average Lagging, CW — Consecutive Wait).

Usage:
    python -m neurst_tpu.cli.simuleval_cli --model_dir waitk_ckpt \
        --src_file test.src --ref_file test.ref [--wait_k 3]
"""

import argparse
import logging

import jax
import numpy as np

import neurst_tpu  # noqa: F401
from neurst_tpu.tasks.task import build_task
from neurst_tpu.utils import checkpoints as ckpt_lib
from neurst_tpu.utils.compat import DataStatus
from neurst_tpu.utils.configurable import (ModelConfigs,
                                           strip_training_only_model_flags)
from neurst_tpu.utils.simuleval_agents.simul_trans_text_agent import (
    SimulTransTextAgent, average_lagging)


def run_online(agent, task, hostname, port):
    """Evaluates against an external SimulEval v1 server (parity:
    reference simuleval_cli.py start_client loop): READ pulls source
    units from GET /src, WRITE pushes units via PUT /hypo, and the
    server computes quality+latency, returned from GET /result."""
    from neurst_tpu.utils.simuleval_agents.online_client import (
        DEFAULT_EOS, SimulEvalClient)
    client = SimulEvalClient(hostname, port)
    info = client.corpus_info()
    n = int(info["num_sentences"])
    src_pipeline = task.src_pipeline
    trg_pipeline = task.trg_pipeline
    trg_meta = trg_pipeline.meta
    src_eos = src_pipeline.meta["eos_id"]
    for i in range(n):
        state = {"exhausted": False, "pending": []}

        def read_fn(instance=i, state=state):
            if state["exhausted"]:
                return None
            seg = client.get_source(instance)["segment"]
            if seg == DEFAULT_EOS or seg == "":
                # terminate the source exactly as training/offline did:
                # the encoder must see the sentence-final eos
                # (parity: the reference agent appends DEFAULT_EOS to
                # states.units.source when reading finishes)
                state["exhausted"] = True
                return [src_eos]
            # drop the per-segment eos our pipeline appends: units
            # stream in one segment at a time
            return src_pipeline.encode(seg)[:-1]

        def flush(instance=i, state=state):
            if state["pending"]:
                client.send_hypo(
                    instance, trg_pipeline.decode(
                        state["pending"] + [trg_meta["eos_id"]]))
                state["pending"] = []

        def on_write(token_id, instance=i, state=state):
            """Merge subword units into full words before sending
            (parity: reference agent units_to_segment): a unit whose
            raw token carries a continuation marker ('@@' BPE /
            wordpiece '_' absence) keeps buffering."""
            state["pending"].append(int(token_id))
            token = trg_pipeline.vocab.map_id_to_token(int(token_id))
            if not (isinstance(token, str) and token.endswith("@@")):
                flush(instance, state)

        agent.translate_stream(read_fn, eos_id=trg_meta["eos_id"],
                               bos_id=trg_meta.get("bos_id"),
                               on_write=on_write)
        flush()
        client.send_hypo(i, DEFAULT_EOS)
    scores = client.get_scores()
    logging.info("SimulEval server scores: %s", scores)
    print(scores)
    return scores


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Simultaneous MT evaluation.")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--src_file", default=None,
                   help="Offline mode: source sentences (built-in "
                        "simulator).")
    p.add_argument("--hostname", default=None,
                   help="Online mode: SimulEval server hostname.")
    p.add_argument("--port", type=int, default=12321,
                   help="Online mode: SimulEval server port.")
    p.add_argument("--ref_file", default=None)
    p.add_argument("--wait_k", type=int, default=None,
                   help="Override the decode-time lagging.")
    p.add_argument("--max_decode_len", type=int, default=200)
    p.add_argument("--output_file", default=None)
    args = p.parse_args(argv)

    cfg = ModelConfigs.load(args.model_dir)
    cfg["model.params"] = strip_training_only_model_flags(
        cfg.get("model.params"))
    task = build_task(cfg)
    model = task.build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    path = ckpt_lib.latest_checkpoint(args.model_dir)
    if path:
        flat = ckpt_lib.restore_checkpoint_params(path)
        params, _, _ = ckpt_lib.restore_into(params, flat)
        logging.info("Restored %s", path)
    agent = SimulTransTextAgent(model, params, k=args.wait_k,
                                max_decode_len=args.max_decode_len)

    if args.hostname:
        return run_online(agent, task, args.hostname, args.port)
    if not args.src_file:
        p.error("either --src_file (offline) or --hostname (online) "
                "is required")

    src_pipeline = task.src_pipeline
    trg_pipeline = task.trg_pipeline
    eos = src_pipeline.meta["eos_id"]
    trg_meta = trg_pipeline.meta

    hypotheses, lags, cws = [], [], []
    with open(args.src_file, encoding="utf-8") as f:
        sources = [line.strip() for line in f]
    for i, src in enumerate(sources):
        src_ids = src_pipeline.encode(src)
        out_ids, delays = agent.translate(
            src_ids, eos_id=trg_meta["eos_id"],
            bos_id=trg_meta.get("bos_id"))
        hyp = trg_pipeline.decode(out_ids + [trg_meta["eos_id"]])
        hypotheses.append(hyp)
        lags.append(average_lagging(delays, len(src_ids), len(out_ids)))
        # CW: mean consecutive-read run length between writes
        runs, run = [], 0
        prev = 0
        for d in delays:
            runs.append(d - prev)
            prev = d
        cws.append(float(np.mean([r for r in runs if r > 0] or [0])))
        if i < 3:
            logging.info("sample %d | AL=%.2f | hyp: %s", i, lags[-1],
                         hyp[:100])
    results = {"AL": float(np.mean(lags)), "CW": float(np.mean(cws)),
               "samples": len(hypotheses)}
    if args.ref_file:
        with open(args.ref_file, encoding="utf-8") as f:
            refs = [line.strip() for line in f][:len(hypotheses)]
        metric = task.get_eval_metric({})
        results.update(metric(hypotheses, refs))
    if args.output_file:
        with open(args.output_file, "w", encoding="utf-8") as f:
            for h in hypotheses:
                f.write(h + "\n")
    print(results)
    return results


if __name__ == "__main__":
    main()
