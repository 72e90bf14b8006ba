from .bert import BertConfig, BertModel, BertEncoder
from .vit import CLIPVisionConfig, CLIPVisionModel
from .flmr import FLMRConfig, FLMRModelForRetrieval, FLMRQueryOutput, FLMRContextOutput

__all__ = [
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
