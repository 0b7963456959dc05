from neurst_tpu.data.text.tokenizer import (Tokenizer, build_tokenizer,  # noqa: F401
                                            register_tokenizer)
from neurst_tpu.data.text.vocab import PaddingMode, Vocab  # noqa: F401
from neurst_tpu.data.text import bpe  # noqa: F401
from neurst_tpu.data.text import character  # noqa: F401
from neurst_tpu.data.text import moses  # noqa: F401
from neurst_tpu.data.text import spm  # noqa: F401
from neurst_tpu.data.text import jieba_tokenizer  # noqa: F401
from neurst_tpu.data.text import huggingface_tokenizer  # noqa: F401
from neurst_tpu.data.text import thai  # noqa: F401
from neurst_tpu.data.text import subtokenizer  # noqa: F401
