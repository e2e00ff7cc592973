from .engine import IndexSearcher
from .scorer import bm25_idf, bm25_score_arrays
from .validate import QueryValidationError, validate_query

__all__ = [
    "IndexSearcher",
    "bm25_idf",
    "bm25_score_arrays",
    "QueryValidationError",
    "validate_query",
]
