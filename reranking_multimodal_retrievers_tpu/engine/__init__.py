from .index import QuantizedTokenIndex, TokenIndex, encode_corpus
from .search import Searcher, make_search_fn_int8, search_exhaustive
from .rerank_eval import make_chunked_rerank_fn
from .streaming import (
    HostQuantizedTokenIndex,
    HostTokenIndex,
    StreamingSearcher,
)

__all__ = [
    "TokenIndex",
    "QuantizedTokenIndex",
    "encode_corpus",
    "Searcher",
    "search_exhaustive",
    "make_search_fn_int8",
    "make_chunked_rerank_fn",
    "HostTokenIndex",
    "HostQuantizedTokenIndex",
    "StreamingSearcher",
]
from .data import Queries, Collection, Ranking, Examples
from .infra import EngineConfig, Provenance, Run
from .compress import pool_doc_tokens, pool_index
from . import utility
