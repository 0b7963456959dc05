from neurst_tpu.criterions.criterion import (Criterion, build_criterion,  # noqa: F401
                                             register_criterion)
from neurst_tpu.criterions import label_smoothed_cross_entropy  # noqa: F401
from neurst_tpu.criterions import label_smoothed_cross_entropy_with_kd  # noqa: F401
from neurst_tpu.criterions import joint_criterion  # noqa: F401
