from f5tts_tpu.compat.torch_import import (  # noqa: F401
    convert_backbone_state_dict,
    convert_f5tts_state_dict,
    convert_unett_state_dict,
    convert_vocos_state_dict,
    extract_ema_state_dict,
    load_torch_checkpoint,
)
