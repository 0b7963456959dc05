from neurst_tpu.sparsity.pruning_schedule import (ConstantSparsity,  # noqa: F401
                                                  PolynomialDecay,
                                                  PruningSchedule,
                                                  build_pruning_schedule)
from neurst_tpu.sparsity.pruning_optimizer import (make_variable_filter,  # noqa: F401
                                                   prune_gradients)
