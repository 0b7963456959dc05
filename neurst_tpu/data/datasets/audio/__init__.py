from neurst_tpu.data.datasets.audio import audio_record_dataset  # noqa: F401
