from neurst_tpu.optimizers.schedules.lr_schedules import *  # noqa: F401,F403
