from f5tts_tpu.ops.stft import frame_signal, hann_window, istft_center, stft_magnitude  # noqa: F401
from f5tts_tpu.ops.mel import MelFrontend, mel_filterbank  # noqa: F401
