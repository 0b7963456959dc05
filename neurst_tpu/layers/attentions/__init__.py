from neurst_tpu.layers.attentions.multi_head_attention import (  # noqa: F401
    MultiHeadAttention, MultiHeadSelfAttention)
