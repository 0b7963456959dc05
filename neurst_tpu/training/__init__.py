from neurst_tpu.training.validator import (TrainingStatusRecorder,  # noqa: F401
                                           Validator, build_validator,
                                           register_validator)
from neurst_tpu.training import criterion_validator  # noqa: F401
from neurst_tpu.training import seq_generation_validator  # noqa: F401
