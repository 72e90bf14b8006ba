from .bert import BertConfig, BertModel, BertEncoder
from .vit import CLIPVisionConfig, CLIPVisionModel
from .flmr import FLMRConfig, FLMRModelForRetrieval, FLMRQueryOutput, FLMRContextOutput
from .opt import OPTConfig, OPTForCausalLM
from .t5 import T5Config, T5ForConditionalGeneration
from .blip2 import (
    Blip2Config,
    Blip2VisionConfig,
    Blip2QFormerConfig,
    Blip2ForConditionalGeneration,
)

__all__ = [
    "OPTConfig",
    "OPTForCausalLM",
    "T5Config",
    "T5ForConditionalGeneration",
    "Blip2Config",
    "Blip2VisionConfig",
    "Blip2QFormerConfig",
    "Blip2ForConditionalGeneration",
    "BertConfig",
    "BertModel",
    "BertEncoder",
    "CLIPVisionConfig",
    "CLIPVisionModel",
    "FLMRConfig",
    "FLMRModelForRetrieval",
    "FLMRQueryOutput",
    "FLMRContextOutput",
]
