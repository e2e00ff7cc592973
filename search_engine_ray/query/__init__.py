from .engine import IndexSearcher
from .scorer import bm25_idf, bm25_score_arrays

__all__ = ["IndexSearcher", "bm25_idf", "bm25_score_arrays"]
