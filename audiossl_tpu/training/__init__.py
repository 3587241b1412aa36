from audiossl_tpu.training.schedules import (
    cosine_schedule,
    cosine_schedule_array,
)
