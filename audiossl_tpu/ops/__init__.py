from audiossl_tpu.ops.melspec import (
    MelConfig,
    hann_window,
    mel_filterbank,
    power_spectrogram,
    amplitude_to_db,
    minmax_scale,
    log_melspec,
    MEL_MIN,
    MEL_MAX,
)
from audiossl_tpu.ops.masking import (
    random_token_mask,
    block_token_mask,
    uniform_span_mask,
)
from audiossl_tpu.ops.interpolate import resize_bicubic

__all__ = [
    "MelConfig",
    "hann_window",
    "mel_filterbank",
    "power_spectrogram",
    "amplitude_to_db",
    "minmax_scale",
    "log_melspec",
    "MEL_MIN",
    "MEL_MAX",
    "random_token_mask",
    "block_token_mask",
    "uniform_span_mask",
    "resize_bicubic",
]
