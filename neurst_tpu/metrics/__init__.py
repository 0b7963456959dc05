from neurst_tpu.metrics.metric import (Metric, MetricWrapper, build_metric,  # noqa: F401
                                       register_metric)
from neurst_tpu.metrics import bleu  # noqa: F401
from neurst_tpu.metrics import wer  # noqa: F401
from neurst_tpu.metrics import compound_split_bleu  # noqa: F401
