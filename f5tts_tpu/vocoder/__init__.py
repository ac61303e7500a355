from f5tts_tpu.vocoder.vocos import VocosConfig, init_vocos, vocos_decode  # noqa: F401
