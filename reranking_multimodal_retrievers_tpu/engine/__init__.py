from .index import TokenIndex, encode_corpus
from .search import Searcher, search_exhaustive

__all__ = ["TokenIndex", "encode_corpus", "Searcher", "search_exhaustive"]
