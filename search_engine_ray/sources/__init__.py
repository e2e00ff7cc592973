from .parquet import read_parquet_clean
from .webpages import generate_pages, page_schema

__all__ = ["generate_pages", "page_schema", "read_parquet_clean"]
