from audiossl_tpu.models.atst import (
    AudioTransformer,
    ast_small,
    ast_base,
    ast_large,
    frame_ast_small,
    frame_ast_base,
    frame_ast_large,
)
from audiossl_tpu.models.byol import Projector, ByolLossState, byol_pair_loss
from audiossl_tpu.models.heads import LinearHead, AttentionHead
