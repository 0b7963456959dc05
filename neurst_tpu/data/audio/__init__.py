from neurst_tpu.data.audio.feature_extractor import (FeatureExtractor,  # noqa: F401
                                                     build_feature_extractor,
                                                     register_feature_extractor)
from neurst_tpu.data.audio import log_mel_fbank  # noqa: F401
