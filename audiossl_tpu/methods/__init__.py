"""Pretraining methods (TPU-native recipes of the reference's
``audiossl/methods/``): ATST-Clip, ATST-Frame, MAE, and distillation."""
