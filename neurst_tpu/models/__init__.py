from neurst_tpu.models.model import BaseModel, build_model, register_model  # noqa: F401
from neurst_tpu.models.encoder_decoder_model import EncoderDecoderModel  # noqa: F401
from neurst_tpu.models import transformer  # noqa: F401
from neurst_tpu.models import speech_transformer  # noqa: F401
from neurst_tpu.models import multi_task_speech_transformer  # noqa: F401
from neurst_tpu.models import gpt2  # noqa: F401
from neurst_tpu.models import bert  # noqa: F401
from neurst_tpu.models import waitk_transformer  # noqa: F401
from neurst_tpu.models.ensemble_model import EncoderDecoderEnsembleModel  # noqa: F401
from neurst_tpu.models import light_convolution_model  # noqa: F401
from neurst_tpu.models import ctnmt_transformer  # noqa: F401
from neurst_tpu.models import wav2vec2  # noqa: F401
