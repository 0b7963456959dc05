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
"""Wait-k simultaneous text translation agent.

Parity: /root/reference/neurst/utils/simuleval_agents/
simul_trans_text_agent.py:45-245 — the wait-k READ/WRITE ``policy``
(184-211): READ while ``len(read) - len(written) < k`` and source
remains; WRITE = one incremental decode step (212-245).  On each READ
the (monotonic) encoder re-encodes the padded source prefix and the
cross-attention k/v cache is rebuilt while the self-attention cache
(unchanged target prefix) is carried over.

The agent is framework-standalone; ``neurst_tpu/cli/simuleval_cli.py``
drives it with a built-in latency-measuring simulator, and it can be
wrapped as a SimulEval TextAgent when that package is installed.
"""

from typing import List, Optional

import numpy as np

__all__ = ["SimulTransTextAgent", "average_lagging"]

READ = "READ"
WRITE = "WRITE"


def average_lagging(delays: List[int], src_len: int, trg_len: int) -> float:
    """AL metric (Ma et al., 2019): mean over the first tau outputs of
    d_t - (t-1) * src_len/trg_len, where tau = first t with d_t = |src|.
    """
    if not delays:
        return 0.0
    gamma = trg_len / max(src_len, 1)
    tau = len(delays)
    for t, d in enumerate(delays, start=1):
        if d >= src_len:
            tau = t
            break
    vals = [delays[t - 1] - (t - 1) / gamma for t in range(1, tau + 1)]
    return float(np.mean(vals))


class SimulTransTextAgent(object):
    """Streams one sentence through a wait-k model."""

    def __init__(self, model, params, k: Optional[int] = None,
                 max_decode_len: int = 200, pad_multiple: int = 8):
        import jax
        self._model = model
        self._params = params
        self._k = k if k is not None else model.wait_k
        self._max_decode_len = max_decode_len
        self._pad_multiple = pad_multiple
        self._jit_encode = jax.jit(
            lambda p, src, pad: model.incremental_encode(p, src, pad))
        self._jit_init_cache = jax.jit(
            lambda p, enc, pad: model.module.apply(
                {"params": p}, enc, pad, max_decode_len,
                method=model.module.init_cache))
        self._jit_step = jax.jit(
            lambda p, ids, cache, t: model.incremental_decode(
                p, ids, cache, t))

    def policy(self, n_read: int, n_written: int, src_exhausted: bool,
               finished: bool) -> str:
        if finished:
            return WRITE  # driver stops on finished anyway
        if not src_exhausted and n_read - n_written < self._k:
            return READ
        return WRITE

    def translate(self, src_ids: List[int], eos_id: int,
                  bos_id: Optional[int] = None):
        """Returns (output_ids, delays): delays[i] = #src tokens read
        before emitting output i."""
        it = iter(src_ids)

        def read_fn():
            try:
                return [next(it)]
            except StopIteration:
                return None

        return self.translate_stream(read_fn, eos_id, bos_id=bos_id)

    def translate_stream(self, read_fn, eos_id: int,
                         bos_id: Optional[int] = None, on_write=None):
        """Streaming form for online (SimulEval-style) evaluation.

        ``read_fn()`` supplies the next source segment as a list of
        token ids, or None once the source is exhausted (parity:
        reference simul_trans_text_agent.py policy/predict READ-WRITE
        loop against simuleval states).  ``on_write(token_id)`` is
        called for every emitted unit.  Returns (output_ids, delays).
        """
        import jax.numpy as jnp
        bos = bos_id if bos_id is not None else eos_id
        n_read, cache = 0, None
        src_ids: List[int] = []
        out_ids: List[int] = []
        delays: List[int] = []
        last_id = bos
        exhausted = False
        while len(out_ids) < self._max_decode_len:
            action = self.policy(n_read, len(out_ids), exhausted, False)
            if cache is None:
                action = READ  # must encode something before writing
            if action == READ and not exhausted:
                segment = read_fn()
                if segment is None:
                    exhausted = True
                    if cache is None:
                        break  # empty source
                    continue
                src_ids.extend(segment)
                n_read = len(src_ids)
                # re-encode padded prefix (bounded shape set)
                pad_len = -(-n_read // self._pad_multiple) \
                    * self._pad_multiple
                src = np.full([1, pad_len], eos_id, np.int32)
                src[0, :n_read] = src_ids[:n_read]
                padding = np.zeros([1, pad_len], np.float32)
                padding[0, n_read:] = 1.0
                enc, pad = self._jit_encode(self._params, src, padding)
                new_cache = self._jit_init_cache(self._params, enc, pad)
                if cache is not None:
                    # carry over target-side self-attention state
                    new_cache = dict(new_cache)
                    layers = {}
                    for lname, lcache in new_cache["layers"].items():
                        lc = dict(lcache)
                        lc["self"] = cache["layers"][lname]["self"]
                        layers[lname] = lc
                    new_cache["layers"] = layers
                cache = new_cache
                continue
            # WRITE
            t = len(out_ids)
            logits, cache = self._jit_step(
                self._params, jnp.asarray([last_id], jnp.int32), cache, t)
            next_id = int(np.asarray(logits).argmax(-1)[0])
            if next_id == eos_id:
                break
            out_ids.append(next_id)
            delays.append(n_read)
            last_id = next_id
            if on_write is not None:
                on_write(next_id)
        return out_ids, delays
