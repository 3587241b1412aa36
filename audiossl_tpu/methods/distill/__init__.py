from audiossl_tpu.methods.distill.method import DistillConfig, DistillMethod

__all__ = ["DistillConfig", "DistillMethod"]
