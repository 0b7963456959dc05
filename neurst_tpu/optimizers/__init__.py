from neurst_tpu.optimizers.optimizers import (Optimizer, build_optimizer,  # noqa: F401
                                              create_optax_chain,
                                              register_optimizer)
from neurst_tpu.optimizers.schedules.lr_schedules import (  # noqa: F401
    LRSchedule, build_lr_schedule, register_lr_schedule)
