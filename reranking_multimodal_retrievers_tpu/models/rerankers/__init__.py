from .cross_encoder import CrossEncoder
from .losses import prepare_logits_labels, rerank_loss
from .rerank_model import RerankModel, FullContextRerankModel, RerankConfig
from .interaction import InteractionRerankModel, MORESSym, InteractionRerankConfig
from .decoder import (
    DecoderRerankModel,
    DecoderHeadRerankModel,
    DecoderRerankConfig,
    Blip2DecoderRerankModel,
    Blip2DecoderHeadRerankModel,
    Blip2RerankConfig,
    VisionSeq2SeqLM,
    prepare_decoder_rerank_inputs,
)

__all__ = [
    "Blip2DecoderRerankModel",
    "Blip2DecoderHeadRerankModel",
    "Blip2RerankConfig",
    "CrossEncoder",
    "prepare_logits_labels",
    "rerank_loss",
    "RerankModel",
    "FullContextRerankModel",
    "RerankConfig",
    "InteractionRerankModel",
    "MORESSym",
    "InteractionRerankConfig",
]
