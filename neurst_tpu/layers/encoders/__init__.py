from neurst_tpu.layers.encoders.transformer_encoder import TransformerEncoder  # noqa: F401
