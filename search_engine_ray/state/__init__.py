from .stats import GlobalStats

__all__ = ["GlobalStats"]
