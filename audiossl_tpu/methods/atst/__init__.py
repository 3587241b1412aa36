from audiossl_tpu.methods.atst.method import (
    ClipPretrainConfig,
    ClipMethod,
    clip_train_views,
)

__all__ = ["ClipPretrainConfig", "ClipMethod", "clip_train_views"]
