from audiossl_tpu.transforms.augment import (
    random_crop_wav,
    sample_crop_lengths,
    mixup_log,
    mix_gaussian_noise,
    random_resize_crop,
    freq_mask,
    time_mask,
    gaussian_noise,
    normalize,
    min_max,
)

__all__ = [
    "random_crop_wav",
    "sample_crop_lengths",
    "mixup_log",
    "mix_gaussian_noise",
    "random_resize_crop",
    "freq_mask",
    "time_mask",
    "gaussian_noise",
    "normalize",
    "min_max",
]
