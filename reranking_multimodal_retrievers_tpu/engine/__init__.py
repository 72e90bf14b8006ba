from .index import TokenIndex, encode_corpus
from .search import Searcher, search_exhaustive
from .rerank_eval import make_chunked_rerank_fn

__all__ = [
    "TokenIndex",
    "encode_corpus",
    "Searcher",
    "search_exhaustive",
    "make_chunked_rerank_fn",
]
from .data import Queries, Collection, Ranking, Examples
from .infra import EngineConfig, Provenance, Run
from .compress import pool_doc_tokens, pool_index
