from audiossl_tpu.methods.mae.method import MAEConfig, MAEMethod, MAEModel

__all__ = ["MAEConfig", "MAEMethod", "MAEModel"]
