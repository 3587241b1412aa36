from audiossl_tpu.methods.atstframe.method import (
    FramePretrainConfig,
    FrameMethod,
    frame_train_views,
)

__all__ = ["FramePretrainConfig", "FrameMethod", "frame_train_views"]
