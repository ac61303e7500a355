from f5tts_tpu.models import modules  # noqa: F401
