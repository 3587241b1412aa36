from audiossl_tpu.utils.common import bool_flag, get_params_groups

__all__ = ["bool_flag", "get_params_groups"]
