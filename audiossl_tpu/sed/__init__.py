"""Sound-event-detection stack (reference ``datasets/dcase_utils`` +
``downstream/utils_psds_eval`` + ``downstream/utils_dcase``):
ManyHotEncoder, on-device decode (median filter) and intersection
metrics, the strong/weak SED head, and host-side PSDS / event-F1
scoring."""
from audiossl_tpu.sed.encoder import ManyHotEncoder
from audiossl_tpu.sed.decode import (
    median_filter_1d,
    decode_preds,
    preds_to_events,
)
from audiossl_tpu.sed.metrics import intersection_stats, f1_from_stats
from audiossl_tpu.sed.head import SEDHead

__all__ = [
    "ManyHotEncoder",
    "median_filter_1d",
    "decode_preds",
    "preds_to_events",
    "intersection_stats",
    "f1_from_stats",
    "SEDHead",
]
