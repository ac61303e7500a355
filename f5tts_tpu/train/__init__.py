from f5tts_tpu.train.step import TrainState, make_train_step, make_optimizer  # noqa: F401
