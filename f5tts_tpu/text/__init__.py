from f5tts_tpu.text.vocab import (  # noqa: F401
    get_tokenizer,
    list_str_to_idx,
    list_str_to_tensor,
    load_vocab,
)
from f5tts_tpu.text.pinyin import convert_char_to_pinyin  # noqa: F401
