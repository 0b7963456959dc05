from neurst_tpu.layers.quantization.quant_ops import (fake_quant,  # noqa: F401
                                                      quantize_params_fn,
                                                      quantize_weights)
