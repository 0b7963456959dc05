from neurst_tpu.tasks.task import Task, build_task, register_task  # noqa: F401
from neurst_tpu.tasks import seq2seq  # noqa: F401
from neurst_tpu.tasks import translation  # noqa: F401
from neurst_tpu.tasks import speech2text  # noqa: F401
from neurst_tpu.tasks import language_model  # noqa: F401
from neurst_tpu.tasks import waitk_translation  # noqa: F401
from neurst_tpu.tasks import multilingual_translation  # noqa: F401
