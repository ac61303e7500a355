from f5tts_tpu.eval.utils_eval import (  # noqa: F401
    compute_wer,
    get_inference_prompt,
    get_librispeech_test_clean_metainfo,
    get_seedtts_testset_metainfo,
)
