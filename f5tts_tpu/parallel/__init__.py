from f5tts_tpu.parallel.mesh import (  # noqa: F401
    dit_param_specs,
    make_mesh,
    shard_params,
)
