from .analyzers import (
    ANALYZERS,
    REFERENCE_TEST_STOPWORDS,
    advanced_analyzer,
    custom_analyzer,
    email_analyzer,
    keyword_analyzer,
    pattern_analyzer,
    phone_analyzer,
    simple_analyzer,
    standard_analyzer,
    tokenize,
    url_analyzer,
    whitespace_analyzer,
)
from .html_extract import extract_text
from .stemmer import porter_stem

__all__ = [
    "ANALYZERS",
    "REFERENCE_TEST_STOPWORDS",
    "advanced_analyzer",
    "custom_analyzer",
    "email_analyzer",
    "extract_text",
    "keyword_analyzer",
    "pattern_analyzer",
    "phone_analyzer",
    "porter_stem",
    "simple_analyzer",
    "standard_analyzer",
    "tokenize",
    "url_analyzer",
    "whitespace_analyzer",
]
