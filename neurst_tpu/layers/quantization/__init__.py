"""Quantization: QAT fake-quant layers (quant_layers) + int8 serving.

The legacy pytree fake-quant helpers (quant_ops) were absorbed into
quant_layers in round 4 — ``fake_quant_minmax`` is the single
fake-quantization primitive (QAT training, int8 scale derivation and
the tests all use it).
"""
