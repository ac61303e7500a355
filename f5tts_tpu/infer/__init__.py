from f5tts_tpu.infer.pipeline import (  # noqa: F401
    InferencePipeline,
    chunk_text,
    cross_fade,
    estimate_duration_frames,
)
