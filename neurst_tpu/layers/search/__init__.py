from neurst_tpu.layers.search.sequence_search import (SequenceSearch,  # noqa: F401
                                                      build_search_layer,
                                                      register_search_layer)
from neurst_tpu.layers.search import beam_search  # noqa: F401
from neurst_tpu.layers.search import sampling  # noqa: F401
from neurst_tpu.layers.search import speculative  # noqa: F401
