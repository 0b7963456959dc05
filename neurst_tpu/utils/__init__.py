from neurst_tpu.utils.registry import REGISTRIES, setup_registry  # noqa: F401
