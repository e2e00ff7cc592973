from .webpages import generate_pages, page_schema

__all__ = ["generate_pages", "page_schema"]
