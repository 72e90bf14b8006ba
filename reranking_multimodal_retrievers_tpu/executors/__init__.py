from .base import BaseExecutor
from .flmr_executor import FLMRExecutor
from .reranker_executor import RerankerExecutor
from .rag_executor import RagExecutor

__all__ = ["BaseExecutor", "FLMRExecutor", "RerankerExecutor", "RagExecutor"]
