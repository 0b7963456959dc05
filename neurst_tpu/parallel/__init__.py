from neurst_tpu.parallel.mesh import (LOGICAL_AXIS_RULES, batch_sharding,  # noqa: F401
                                      logical_to_mesh_sharding, make_mesh,
                                      params_shardings, replicated)
from neurst_tpu.parallel.train_step import (TrainState, make_eval_step,  # noqa: F401
                                            make_train_step)
