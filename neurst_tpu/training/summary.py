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
"""TensorBoard scalars + profiler hooks.

Parity: /root/reference/neurst/training/callbacks.py:209-245 (TB scalars
under ``training/`` and ``valid/`` prefixes, throughput counters) and
SURVEY.md §5's plan: ``jax.profiler`` replaces the reference's absent
profiler integration.
"""

import logging
import os
from typing import Optional

__all__ = ["SummaryWriterWrapper", "maybe_start_profiler"]


class SummaryWriterWrapper(object):
    """Thin wrapper over torch's TB writer (no-op when unavailable)."""

    def __init__(self, logdir: Optional[str], enabled: bool = True):
        self._writer = None
        if not enabled or not logdir:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
            os.makedirs(logdir, exist_ok=True)
            self._writer = SummaryWriter(logdir)
            logging.info("TensorBoard summaries -> %s", logdir)
        except Exception as e:  # pragma: no cover
            logging.warning("TensorBoard writer unavailable: %s", e)

    def scalars(self, prefix: str, values: dict, step: int):
        if self._writer is None:
            return
        for k, v in values.items():
            try:
                self._writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


def maybe_start_profiler(model_dir: Optional[str], enabled: bool,
                         port: int = 9999):
    """Starts the jax profiler trace server; capture traces with
    TensorBoard's profile plugin or jax.profiler.trace()."""
    if not enabled:
        return
    import jax
    try:
        jax.profiler.start_server(port)
        logging.info("jax.profiler server on port %d "
                     "(connect via TensorBoard profile plugin)", port)
        if model_dir:
            trace_dir = os.path.join(model_dir, "plugins", "profile")
            os.makedirs(trace_dir, exist_ok=True)
    except Exception as e:  # pragma: no cover
        logging.warning("profiler server failed to start: %s", e)
