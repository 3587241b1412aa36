from audiossl_tpu.methods.dual.method import DualConfig, DualMethod, DualModel

__all__ = ["DualConfig", "DualMethod", "DualModel"]
