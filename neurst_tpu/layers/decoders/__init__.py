from neurst_tpu.layers.decoders.transformer_decoder import TransformerDecoder  # noqa: F401
