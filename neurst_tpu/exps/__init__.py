from neurst_tpu.exps.base_experiment import (BaseExperiment, build_exp,  # noqa: F401
                                             register_exp)
from neurst_tpu.exps import trainer  # noqa: F401
from neurst_tpu.exps import evaluator  # noqa: F401
from neurst_tpu.exps import sequence_generator  # noqa: F401
from neurst_tpu.exps import validation  # noqa: F401
from neurst_tpu.exps import sequence_evaluator  # noqa: F401
from neurst_tpu.exps import export  # noqa: F401
