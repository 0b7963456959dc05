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
"""NeurST-TPU: a TPU-native (JAX/XLA/Pallas) speech translation, ASR and
NMT framework with the capabilities of bytedance/neurst.

Importing this package eagerly registers all built-in components
(parity with /root/reference/neurst/__init__.py:25-48): tasks, models,
datasets, tokenizers, criterions, optimizers, lr schedules, metrics,
search methods, validators, experiment entries, converters and feature
extractors are discoverable by name through the registry.
"""

__version__ = "0.1.0"

# Registration imports (order matters: registries before users).
from neurst_tpu.data import text  # noqa: F401
from neurst_tpu.data import data_pipelines  # noqa: F401
from neurst_tpu.data import datasets  # noqa: F401
from neurst_tpu.data import audio  # noqa: F401
from neurst_tpu import criterions  # noqa: F401
from neurst_tpu import metrics  # noqa: F401
from neurst_tpu import optimizers  # noqa: F401
from neurst_tpu import models  # noqa: F401
from neurst_tpu import tasks  # noqa: F401
from neurst_tpu import exps  # noqa: F401
from neurst_tpu import training  # noqa: F401
from neurst_tpu.layers import search  # noqa: F401
from neurst_tpu.utils import converters  # noqa: F401
from neurst_tpu import sparsity  # noqa: F401
