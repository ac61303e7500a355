"""f5tts_tpu — TPU-native flow-matching TTS framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of F5-TTS (reference:
/root/reference, SWivid/F5-TTS v1.1.20) designed TPU-first:

- DiT / UNetT / MMDiT backbones as pure-functional pytree modules
- CFM ODE sampling as a single jitted `lax.scan` (no per-step host dispatch)
- Pallas flash-attention for the DiT hot kernel
- Vocos vocoder with a matmul-ISTFT head
- Sharding via one global `jax.sharding.Mesh` (data/model axes)
"""

__version__ = "0.1.0"

from f5tts_tpu.config import (  # noqa: F401
    CFMConfig,
    MelConfig,
    ModelArch,
    TrainConfig,
    load_model_config,
)
