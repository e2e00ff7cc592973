from .personalization import PersonalizationEngine
from .stats import GlobalStats

__all__ = ["GlobalStats", "PersonalizationEngine"]
